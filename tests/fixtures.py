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


# 21 visually-distinct joint colors (HSV wheel), so a rendered image carries
# unambiguous pixel evidence of every joint's location — the property that
# makes train/val GENERALIZATION measurable on synthetic data (VERDICT r4 #4;
# the plain make_rhd_bin noise images only support memorization).
def _joint_palette():
    h = np.linspace(0.0, 1.0, 21, endpoint=False)
    # classic full-saturation hsv->rgb per sector
    out = np.zeros((21, 3))
    for j, hue in enumerate(h):
        k = int(hue * 6) % 6
        fr = hue * 6 - int(hue * 6)
        if k == 0:
            out[j] = (1, fr, 0)
        elif k == 1:
            out[j] = (1 - fr, 1, 0)
        elif k == 2:
            out[j] = (0, 1, fr)
        elif k == 3:
            out[j] = (0, 1 - fr, 1)
        elif k == 4:
            out[j] = (fr, 0, 1)
        else:
            out[j] = (1, 0, 1 - fr)
    return (out * 255).astype(np.uint8)


_PALETTE = _joint_palette()

# wrist -> knuckle, then tip<-..<-base chains in the RHD tip-first order:
# left-hand joint f*4+1 is the fingertip, f*4+4 the base (SURVEY §2.3).
_FINGER_BONES = [(0, 4 * f + 4) for f in range(5)] + [
    (4 * f + s, 4 * f + s + 1) for f in range(5) for s in (1, 2, 3)
]


def _random_rotation(rng):
    a = rng.randn(3, 3)
    q, r = np.linalg.qr(a)
    return q * np.sign(np.diag(r))


def _hand_skeleton(rng):
    """Random-but-plausible 21-joint left hand in camera space (meters)."""
    joints = np.zeros((21, 3), np.float32)
    for f in range(5):
        fan = (f - 2) * 0.32 + rng.uniform(-0.08, 0.08)
        base_dir = np.array([np.sin(fan), np.cos(fan), 0.0])
        knuckle = base_dir * rng.uniform(0.065, 0.085)
        d = base_dir.copy()
        seg_len = rng.uniform(0.022, 0.032)
        pos = knuckle.copy()
        chain = [knuckle.copy()]
        for _ in range(3):
            bend = rng.uniform(-0.35, 0.75)
            d = d + np.array([rng.uniform(-0.15, 0.15),
                              rng.uniform(-0.1, 0.1), bend * 0.45])
            d /= np.linalg.norm(d)
            pos = pos + d * seg_len
            chain.append(pos.copy())
        # RHD order: tip first (index 4f+1) down to base (4f+4)
        joints[4 * f + 1:4 * f + 5] = np.stack(chain[::-1])
    R = _random_rotation(rng)
    joints = joints @ R.T
    root = np.array([rng.uniform(-0.06, 0.06), rng.uniform(-0.06, 0.06),
                     rng.uniform(0.45, 0.62)])
    return (joints + root).astype(np.float32)


def _stamp_disk(image, parts, u, v, radius, color, part_val):
    h, w = parts.shape
    r0, r1 = max(int(v - radius), 0), min(int(v + radius) + 2, h)
    c0, c1 = max(int(u - radius), 0), min(int(u + radius) + 2, w)
    if r0 >= r1 or c0 >= c1:
        return
    yy, xx = np.mgrid[r0:r1, c0:c1]
    mask = (yy - v) ** 2 + (xx - u) ** 2 <= radius ** 2
    image[r0:r1, c0:c1][mask] = color
    parts[r0:r1, c0:c1][mask] = part_val


def _stamp_line(image, parts, uv_a, uv_b, color, part_val):
    length = float(np.hypot(*(uv_b - uv_a)))
    n = max(int(length), 2)
    for t in np.linspace(0.0, 1.0, n):
        u, v = uv_a + t * (uv_b - uv_a)
        _stamp_disk(image, parts, u, v, 1.5, color, part_val)


def make_rhd_bin_rendered(path, num_records=64, seed=0):
    """Synthetic RHD .bin with RENDERED hands: pixels encode the pose.

    Each record draws the left hand's skeleton into the image — bones as
    gray strokes, each joint as a disk in its fixed palette color — over a
    smooth random background, with uv the exact K-projection of a random
    articulated skeleton. A network trained on one split of these records
    can generalize to another (same renderer, disjoint poses), which is
    what tools/generalization_check.py measures. Byte layout identical to
    make_rhd_bin (data/codec.py).
    """
    rng = np.random.RandomState(seed)
    h, w = RHD_IMAGE_SIZE
    cam = np.array(
        [[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1.0]], np.float32
    )
    bone_color = np.array([90, 90, 90], np.uint8)
    with open(path, "wb") as f:
        for _ in range(num_records):
            kp_left = _hand_skeleton(rng)
            # right hand: a far-away token cloud, never rendered (the part
            # mask makes LEFT dominant, like make_rhd_bin's `dominant`)
            kp_right = (rng.randn(21, 3).astype(np.float32) * 0.04
                        + [0.3, 0.3, 0.8]).astype(np.float32)
            kp_xyz = np.concatenate([kp_left, kp_right], 0)
            proj = kp_xyz @ cam.T
            kp_uv = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)

            base = rng.randint(40, 200, (1, 1, 3))
            image = np.clip(
                base + rng.randn(h, w, 3) * 8, 0, 255
            ).astype(np.uint8)
            parts = np.zeros((h, w), np.uint8)
            parts[:40, :40] = 1  # background person pixels
            for a, b in _FINGER_BONES:
                _stamp_line(image, parts, kp_uv[a], kp_uv[b],
                            bone_color, 5)
            for j in range(21):
                _stamp_disk(image, parts, kp_uv[j][0], kp_uv[j][1], 4.0,
                            _PALETTE[j], 5)
            # token other-hand pixels so the hand-side logic sees both
            parts[0:4, 300:304] = 20
            vis = np.zeros(42, np.uint8)
            vis[:21] = 1
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
