"""Synthetic .bin fixtures following the reference byte layouts."""

import numpy as np

from hand3d_tpu.data.codec import (
    RHD_IMAGE_SIZE,
    STB_IMAGE_SIZE,
    write_rhd_record,
    write_stb_record,
)


def make_rhd_bin(path, num_records=4, seed=0, dominant="left"):
    """Write a synthetic RHD .bin. Keypoints are placed in a blob so crop
    logic has something to latch onto; the part mask makes ``dominant`` the
    more prominent hand."""
    rng = np.random.RandomState(seed)
    h, w = RHD_IMAGE_SIZE
    with open(path, "wb") as f:
        for _ in range(num_records):
            kp_xyz = rng.randn(42, 3).astype(np.float32) * 0.05 + [0, 0, 0.5]
            center = rng.uniform(100, 220, size=2)
            kp_uv = (center + rng.uniform(-40, 40, (42, 2))).astype(np.float32)
            cam = np.array(
                [[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1.0]], np.float32
            )
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


def make_stb_bin(path, num_records=4, seed=0):
    rng = np.random.RandomState(seed)
    h, w = STB_IMAGE_SIZE
    with open(path, "wb") as f:
        for _ in range(num_records):
            kp_xyz_mm = rng.randn(21, 3).astype(np.float32) * 30 + [0, 0, 600]
            center = rng.uniform(200, 400, size=2)
            kp_uv = (center + rng.uniform(-60, 60, (21, 2))).astype(np.float32)
            vis = np.ones(21, np.float32)
            image = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            write_stb_record(f, kp_xyz_mm, kp_uv, vis, image)
    return path
