"""Image op tests against per-pixel numpy goldens of the TF1 kernels."""

import numpy as np
import jax.numpy as jnp

from hand3d_tpu.ops import (
    resize_bilinear,
    crop_and_resize,
    crop_image_from_xy,
    create_gaussian_maps,
)


def np_resize_bilinear_tf1(img, out_hw):
    """Golden: TF1 resize_images BILINEAR, align_corners=False (asymmetric)."""
    h, w, c = img.shape
    oh, ow = out_hw
    out = np.zeros((oh, ow, c), np.float32)
    for i in range(oh):
        sy = i * h / oh
        y0 = min(int(np.floor(sy)), h - 1)
        y1 = min(y0 + 1, h - 1)
        wy = sy - y0
        for j in range(ow):
            sx = j * w / ow
            x0 = min(int(np.floor(sx)), w - 1)
            x1 = min(x0 + 1, w - 1)
            wx = sx - x0
            top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
            bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
            out[i, j] = top * (1 - wy) + bot * wy
    return out


def np_crop_and_resize_tf(img, box, crop_hw, extrap=0.0):
    """Golden: TF crop_and_resize bilinear for one image/box.

    Sample positions use float32 arithmetic in the same association order as
    the kernel (lo*(size-1) + i*step) — the TF kernel itself is float32, and
    float64 goldens disagree at exact in/out-of-image knife edges (found by
    hypothesis: a box edge mathematically at 0.0 rounds to ±1e-7 differently).
    """
    f32 = np.float32
    h, w, c = img.shape
    ch, cw = crop_hw
    y1, x1, y2, x2 = (f32(v) for v in box)
    out = np.full((ch, cw, c), extrap, np.float32)
    step_y = f32(f32(y2 - y1) * (h - 1) / (ch - 1)) if ch > 1 else f32(0)
    step_x = f32(f32(x2 - x1) * (w - 1) / (cw - 1)) if cw > 1 else f32(0)
    for i in range(ch):
        in_y = f32(f32(y1 * (h - 1)) + f32(i) * step_y) if ch > 1 else f32(0.5 * (y1 + y2) * (h - 1))
        if in_y < 0 or in_y > h - 1:
            continue
        ty, by = int(np.floor(in_y)), int(np.ceil(in_y))
        ly = in_y - ty
        for j in range(cw):
            in_x = f32(f32(x1 * (w - 1)) + f32(j) * step_x) if cw > 1 else f32(0.5 * (x1 + x2) * (w - 1))
            if in_x < 0 or in_x > w - 1:
                continue
            lx_, rx = int(np.floor(in_x)), int(np.ceil(in_x))
            lx = in_x - lx_
            top = img[ty, lx_] * (1 - lx) + img[ty, rx] * lx
            bot = img[by, lx_] * (1 - lx) + img[by, rx] * lx
            out[i, j] = top * (1 - ly) + bot * ly
    return out


def test_resize_bilinear_matches_tf1_golden(rng):
    img = rng.rand(7, 9, 3).astype(np.float32)
    for out_hw in [(14, 18), (32, 32), (5, 6), (7, 9)]:
        got = np.asarray(resize_bilinear(jnp.asarray(img), out_hw))
        want = np_resize_bilinear_tf1(img, out_hw)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_bilinear_batched(rng):
    imgs = rng.rand(3, 8, 8, 2).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(imgs), (16, 16)))
    assert got.shape == (3, 16, 16, 2)
    for b in range(3):
        np.testing.assert_allclose(
            got[b], np_resize_bilinear_tf1(imgs[b], (16, 16)), atol=1e-5
        )


def test_crop_and_resize_matches_tf_golden(rng):
    imgs = rng.rand(2, 12, 15, 3).astype(np.float32)
    boxes = np.array(
        [[0.1, 0.2, 0.8, 0.9], [-0.2, 0.3, 1.1, 0.7]], np.float32
    )  # second box extends out of the image -> extrapolation zeros
    got = np.asarray(crop_and_resize(jnp.asarray(imgs), jnp.asarray(boxes), (8, 10)))
    for b in range(2):
        want = np_crop_and_resize_tf(imgs[b], boxes[b], (8, 10))
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_crop_image_from_xy_semantics(rng):
    # box math mirrors general.py:163-196: y1 = center - floor(size/scale / 2)
    img = rng.rand(1, 40, 40, 1).astype(np.float32)
    center = jnp.asarray([[20.0, 20.0]])
    crop = np.asarray(crop_image_from_xy(jnp.asarray(img), center, 16, scale=1.0))
    assert crop.shape == (1, 16, 16, 1)
    # scale 1, size 16: y1 = 20-8 = 12, y2 = 28; grid samples
    # in_y = (12 + i*16/15) /40*(40-1)... verify via golden
    boxes = np.array([[12 / 40, 12 / 40, 28 / 40, 28 / 40]], np.float32)
    want = np_crop_and_resize_tf(img[0], boxes[0], (16, 16))
    np.testing.assert_allclose(crop[0], want, atol=1e-5)


def test_gaussian_maps_truncation_and_validity():
    coords = jnp.asarray(
        [[[8.7, 8.2], [0.5, 5.0], [31.0, 31.0], [5.0, 5.0]]], jnp.float32
    )
    valid = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    maps = np.asarray(create_gaussian_maps(coords, (32, 32), 2.0, valid))
    assert maps.shape == (1, 32, 32, 4)
    # peak at truncated int coords (8, 8)
    assert maps[0, 8, 8, 0] == 1.0
    assert maps[0, 9, 8, 0] < 1.0
    # kp at row 0.5 -> trunc 0 -> fails (coord > 0) -> zero map
    assert maps[0, :, :, 1].max() == 0.0
    # kp at 31 == size-1 -> fails (coord < size-1) -> zero map
    assert maps[0, :, :, 2].max() == 0.0
    # invisible kp -> zero map
    assert maps[0, :, :, 3].max() == 0.0
    # gaussian value one pixel away: exp(-1/sigma^2)
    np.testing.assert_allclose(maps[0, 8, 9, 0], np.exp(-1 / 4.0), atol=1e-6)
