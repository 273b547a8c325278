"""Synthetic .bin fixtures following the reference byte layouts."""

import numpy as np

from hand3d_tpu.data.codec import (
    RHD_IMAGE_SIZE,
    STB_IMAGE_SIZE,
    write_rhd_record,
    write_stb_record,
)


def make_rhd_bin(path, num_records=4, seed=0, dominant="left"):
    """Write a synthetic RHD .bin. Keypoints form a plausible cloud whose uv
    is the true K-projection of xyz (so intrinsics consistency is testable,
    like the reference's reader smoke test); the part mask makes
    ``dominant`` the more prominent hand."""
    rng = np.random.RandomState(seed)
    h, w = RHD_IMAGE_SIZE
    with open(path, "wb") as f:
        for _ in range(num_records):
            cam = np.array(
                [[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1.0]], np.float32
            )
            offset = rng.uniform(-0.1, 0.1, size=(1, 3))
            kp_xyz = (
                rng.randn(42, 3).astype(np.float32) * 0.04 + [0, 0, 0.5] + offset
            ).astype(np.float32)
            proj = kp_xyz @ cam.T
            kp_uv = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
            center = np.mean(kp_uv[:21][:, ::-1], axis=0)[::-1]  # (u, v) mean
            image = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            parts = np.zeros((h, w), np.uint8)
            # background person pixels = 1, dominant hand blob 40x40
            parts[:50, :50] = 1
            r0, c0 = int(center[1]) - 20, int(center[0]) - 20
            val = 5 if dominant == "left" else 20
            parts[r0 : r0 + 40, c0 : c0 + 40] = val
            # a few pixels of the other hand
            other = 20 if dominant == "left" else 5
            parts[0:5, 300:305] = other
            vis = (rng.rand(42) > 0.2).astype(np.uint8)
            vis[12] = 1  # crop center keypoint always visible
            vis[33] = 1
            write_rhd_record(f, kp_xyz, kp_uv, cam, image, parts, vis)
    return path


STB_K = np.array(
    [[822.79041, 0.0, 318.47345], [0.0, 822.79041, 250.31296], [0.0, 0.0, 1.0]],
    np.float32,
)


def make_stb_bin(path, num_records=4, seed=0):
    """Synthetic STB .bin with uv = K-projection of the (mm) xyz."""
    rng = np.random.RandomState(seed)
    h, w = STB_IMAGE_SIZE
    with open(path, "wb") as f:
        for _ in range(num_records):
            offset = rng.uniform(-60, 60, size=(1, 3))
            kp_xyz_mm = (
                rng.randn(21, 3).astype(np.float32) * 25 + [0, 0, 600] + offset
            ).astype(np.float32)
            proj = kp_xyz_mm @ STB_K.T
            kp_uv = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
            vis = np.ones(21, np.float32)
            image = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            write_stb_record(f, kp_xyz_mm, kp_uv, vis, image)
    return path
