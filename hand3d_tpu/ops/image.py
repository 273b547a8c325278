"""Batched image ops with TF1-parity sampling semantics.

The reference leaned on three native TF kernels here; these are their
shape-static XLA equivalents:

  * tf.image.resize_images bilinear, align_corners=False (TF 1.3 "legacy
    asymmetric" grid: src = dst * in/out) — used to upsample scoremaps
    (ColorHandPose3DNetwork.py:97,128,166) and downscale images
    (eval2d.py:53, eval_full.py:50). jax.image.resize uses half-pixel
    centers, which does NOT match the grid the shipped weights were trained
    with, so we build the legacy grid explicitly. Since shapes are static,
    the gather indices/weights are compile-time constants and XLA fuses the
    two 1D passes.
  * tf.image.crop_and_resize (utils/general.py:195) — per-sample dynamic
    boxes with a fixed output size; implemented as two axis-separable
    batched gathers with bilinear blending and zero extrapolation.
  * the Gaussian scoremap renderer (data/BinaryDbReader.py:412-459).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _legacy_lin_coeffs(in_size, out_size, align_corners=False):
    """Static gather indices + lerp weights for one axis (numpy, trace-time)."""
    if align_corners and out_size > 1:
        src = np.arange(out_size) * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = np.arange(out_size) * (in_size / out_size)
    lo = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


def resize_bilinear(x, out_hw, align_corners=False):
    """Bilinear resize of [B, H, W, C] (or [H, W, C]) to ``out_hw``.

    Matches TF1 tf.image.resize_images(..., BILINEAR, align_corners=False)
    exactly (asymmetric source grid, edge clamping).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    dtype = x.dtype
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)

    if oh != h:
        lo, hi, wt = _legacy_lin_coeffs(h, oh, align_corners)
        wt = wt[None, :, None, None]
        x = jnp.take(x, lo, axis=1) * (1.0 - wt) + jnp.take(x, hi, axis=1) * wt
    if ow != w:
        lo, hi, wt = _legacy_lin_coeffs(w, ow, align_corners)
        wt = wt[None, None, :, None]
        x = jnp.take(x, lo, axis=2) * (1.0 - wt) + jnp.take(x, hi, axis=2) * wt

    # preserve reduced-precision float inputs (bf16 compute path) but keep
    # integer inputs as float32 — TF1 resize_images always returns float,
    # and truncating interpolated uint8 values would silently lose the
    # fractional part
    if dtype != jnp.float32 and jnp.issubdtype(dtype, jnp.floating):
        x = x.astype(dtype)
    return x[0] if squeeze else x


def _axis_sample(x, axis, in_size, lo_f, frac, valid, extrapolation_value):
    """Per-batch dynamic bilinear sampling along ``axis``, as a matmul.

    x: [B, ..., C]; lo_f/frac/valid: [B, out_size] float/bool.

    Instead of a dynamic gather (take_along_axis with per-sample indices
    lowers to a general gather, which measured ~250 ms/batch on TPU v5e —
    two orders of magnitude over everything else in the cascade), build a
    sparse-in-dense interpolation matrix W[b, out, in] with (1 - frac) at
    floor(pos) and frac at ceil(pos), zeroed where the sample falls outside
    the image, and contract it with the image on the MXU. Arithmetic is
    identical to the two-tap lerp (the extra terms are exact zeros).
    """
    lo = jnp.clip(lo_f, 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo_f + 1.0, 0, in_size - 1).astype(jnp.int32)
    iota = jnp.arange(in_size, dtype=jnp.int32)[None, None, :]
    w = (iota == lo[:, :, None]) * (1.0 - frac)[:, :, None]
    # where lo == hi (integer or clipped positions) the taps coincide and
    # the weights must sum, matching top*(1-f) + bottom*f with top == bottom
    w = w + (iota == hi[:, :, None]) * frac[:, :, None]
    w = jnp.where(valid[:, :, None], w, 0.0).astype(x.dtype)

    x_moved = jnp.moveaxis(x, axis, 1)  # [B, in, ...]
    # Precision.HIGHEST: at the TPU default this einsum would round the f32
    # pixels through bf16 MXU passes (~1e-2 abs error on N(0,1) images),
    # breaking the TF-parity contract of the crop; with two taps per row
    # the matmul is thin, so exact f32 costs nothing measurable.
    out = jnp.einsum("boi,bi...->bo...", w, x_moved,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    if extrapolation_value != 0.0:
        fill = jnp.where(valid, 0.0, extrapolation_value)  # [B, out]
        out = out + fill.reshape(fill.shape + (1,) * (out.ndim - 2))
    return jnp.moveaxis(out, 1, axis)


def crop_and_resize(image, boxes, crop_size, extrapolation_value=0.0):
    """TF-parity crop_and_resize: per-sample normalized boxes -> fixed crops.

    Args:
      image: [B, H, W, C] float.
      boxes: [B, 4] of (y1, x1, y2, x2) in normalized coordinates (may exceed
        [0, 1]; out-of-image samples get ``extrapolation_value``).
      crop_size: (crop_h, crop_w) static ints.
    Returns:
      [B, crop_h, crop_w, C] float32.

    Sampling grid matches the TF kernel: for crop_h > 1,
    in_y = y1*(H-1) + i * (y2-y1)*(H-1)/(crop_h-1); bilinear between
    floor/ceil. Axis-separable because boxes are axis-aligned, so the whole
    op is two batched gathers instead of a per-sample loop.
    """
    image = image.astype(jnp.float32)
    b, h, w, _ = image.shape
    ch, cw = crop_size
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))

    def grid(lo, hi, n, size):
        i = jnp.arange(n, dtype=jnp.float32)
        if n > 1:
            step = (hi - lo) * (size - 1) / (n - 1)
            pos = lo[:, None] * (size - 1) + i[None, :] * step[:, None]
        else:
            pos = jnp.broadcast_to(0.5 * (lo + hi)[:, None] * (size - 1), (b, n))
        valid = (pos >= 0.0) & (pos <= size - 1.0)
        return jnp.floor(pos), pos - jnp.floor(pos), valid

    ylo, yfrac, yvalid = grid(y1, y2, ch, h)
    out = _axis_sample(image, 1, h, ylo, yfrac, yvalid, extrapolation_value)
    xlo, xfrac, xvalid = grid(x1, x2, cw, w)
    out = _axis_sample(out, 2, w, xlo, xfrac, xvalid, extrapolation_value)
    return out


def crop_image_from_xy(image, crop_location, crop_size, scale=1.0):
    """Batched crop around per-sample centers with per-sample scale.

    Mirrors utils/general.crop_image_from_xy (:163-196) including the float
    floor-division when centering the box.

    Args:
      image: [B, H, W, C].
      crop_location: [B, 2] (row, col) crop centers, in pixels.
      crop_size: static int, output height == width.
      scale: scalar or [B]; output covers crop_size/scale source pixels.
    Returns:
      [B, crop_size, crop_size, C] float32.
    """
    b, h, w, _ = image.shape
    scale = jnp.broadcast_to(jnp.reshape(jnp.asarray(scale, jnp.float32), (-1,)), (b,))
    loc = jnp.reshape(crop_location.astype(jnp.float32), (b, 2))

    size_scaled = jnp.float32(crop_size) / scale
    y1 = loc[:, 0] - jnp.floor(size_scaled / 2.0)
    y2 = y1 + size_scaled
    x1 = loc[:, 1] - jnp.floor(size_scaled / 2.0)
    x2 = x1 + size_scaled
    boxes = jnp.stack([y1 / h, x1 / w, y2 / h, x2 / w], axis=-1)
    return crop_and_resize(image, boxes, (crop_size, crop_size))


def create_gaussian_maps(coords_hw, output_size, sigma, valid=None):
    """Render per-keypoint Gaussian scoremaps.

    Mirrors BinaryDbReader.create_multiple_gaussian_map (:412-459): the
    keypoint location is truncated to integer pixels first, keypoints outside
    the open interval (0, size-1) or invisible ones render as zero.

    Args:
      coords_hw: [B, K, 2] (row, col) keypoint locations in pixels.
      output_size: (H, W) static.
      sigma: Gaussian width (the map is exp(-d^2 / sigma^2), no 2x factor).
      valid: optional [B, K] bool/float visibility.
    Returns:
      [B, H, W, K] float32.
    """
    oh, ow = output_size
    coords = jnp.asarray(coords_hw, jnp.float32)
    b, k, _ = coords.shape
    coords_i = coords.astype(jnp.int32)  # trunc-toward-zero, like tf.cast

    cond_in = (
        (coords_i[..., 0] < oh - 1)
        & (coords_i[..., 0] > 0)
        & (coords_i[..., 1] < ow - 1)
        & (coords_i[..., 1] > 0)
    )
    if valid is not None:
        cond_in = cond_in & (jnp.asarray(valid, jnp.float32) > 0.5)

    coords_f = coords_i.astype(jnp.float32)
    rows = jnp.arange(oh, dtype=jnp.float32)[None, :, None, None]
    cols = jnp.arange(ow, dtype=jnp.float32)[None, None, :, None]
    du = rows - coords_f[:, None, None, :, 0]
    dv = cols - coords_f[:, None, None, :, 1]
    dist = du * du + dv * dv
    maps = jnp.exp(-dist / jnp.float32(sigma) ** 2)
    return maps * cond_in[:, None, None, :].astype(jnp.float32)
