"""Keypoint decoding + coordinate transforms, on-device.

The reference ran these on the host in numpy after every sess.run
(utils/general.py:331-357, called from run.py:72-74, eval2d.py:93-95,
eval2d_gt_cropped.py:77-79). Folding them into the jitted program removes a
host round trip per batch and is where most of the single-image latency win
comes from.
"""

import os

import jax
import jax.numpy as jnp


def detect_keypoints_2d(scoremaps):
    """Per-channel argmax -> pixel coordinates.

    Vectorized equivalent of utils/general.detect_keypoints (:331-344).

    Args:
      scoremaps: [B, H, W, K] (or [H, W, K], treated as B=1).
    Returns:
      [B, K, 2] float32 (row, col) per keypoint ([K, 2] if unbatched input).
    """
    squeeze = scoremaps.ndim == 3
    if squeeze:
        scoremaps = scoremaps[None]
    b, h, w, k = scoremaps.shape
    flat = jnp.reshape(jnp.transpose(scoremaps, (0, 3, 1, 2)), (b, k, h * w))
    idx = jnp.argmax(flat, axis=-1).astype(jnp.int32)
    coords = jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.float32)
    return coords[0] if squeeze else coords


def soft_argmax_2d(scoremaps, beta=1.0):
    """Differentiable sub-pixel keypoint decoding (softmax expectation).

    Not present in the reference (which uses hard argmax); provided as an
    optional decoder — useful for end-to-end finetuning and usually slightly
    more accurate than argmax at 32x32 heatmap resolution.

    Args:
      scoremaps: [B, H, W, K].
      beta: softmax temperature multiplier.
    Returns:
      [B, K, 2] float32 (row, col).
    """
    b, h, w, k = scoremaps.shape
    flat = jnp.reshape(jnp.transpose(scoremaps, (0, 3, 1, 2)), (b, k, h * w))
    weights = jax.nn.softmax(beta * flat, axis=-1)
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    grid = jnp.stack(
        [jnp.repeat(rows, w), jnp.tile(cols, h)], axis=-1
    )  # [H*W, 2]
    return jnp.einsum("bkn,nc->bkc", weights, grid)


def decode_upsampled(scoremap, factor, method="auto"):
    """Argmax keypoint decode over an f-times bilinear upsampling of
    ``scoremap`` [B, h, w, K] -> [B, K, 2] (row, col in the upsampled grid).

    method "pallas" computes it without materializing the upsampled map
    (ops/pallas/decode.py; ~350 MB of HBM traffic saved per 32-batch at
    32->256); "xla" is resize_bilinear + detect_keypoints_2d. Both are
    bit-identical (tested, including argmax tie-breaks). "auto" resolves
    per LOWERING platform (lax.platform_dependent), so cross-device jits
    and multi-platform exports each get the right path from one trace.
    "auto" can be overridden process-wide by HAND3D_DECODE=pallas|xla or
    the blanket HAND3D_PALLAS=0 kill switch (read at trace time) — the
    escape hatch for compiler-stack states where a Pallas call wedges
    inside outer control flow (docs/DESIGN.md "Pallas inside lax.scan").
    """
    if method == "auto":
        method = os.environ.get("HAND3D_DECODE", "auto")
        assert method in ("auto", "pallas", "xla"), method
        if method == "auto" and os.environ.get("HAND3D_PALLAS") == "0":
            method = "xla"

    def _pallas(scoremap):
        from hand3d_tpu.ops.pallas.decode import decode_keypoints_upsampled_pallas

        return decode_keypoints_upsampled_pallas(scoremap, factor)

    def _xla(scoremap):
        from hand3d_tpu.ops.image import resize_bilinear

        _, h, w, _ = scoremap.shape
        return detect_keypoints_2d(
            resize_bilinear(scoremap, (h * factor, w * factor)))

    if method == "pallas":
        return _pallas(scoremap)
    if method == "xla":
        return _xla(scoremap)
    return jax.lax.platform_dependent(scoremap, tpu=_pallas, default=_xla)


def trafo_coords(keypoints_crop_coords, centers, scale, crop_size):
    """Crop-frame -> global-image coordinates.

    Mirrors utils/general.trafo_coords (:347-357): subtract crop_size // 2,
    divide by the crop scale, add the crop center. Batched.

    Args:
      keypoints_crop_coords: [B, K, 2].
      centers: [B, 2] (same axis order as the coords).
      scale: scalar or [B] or [B, 1].
      crop_size: static int.
    Returns:
      [B, K, 2] float32.
    """
    scale = jnp.reshape(jnp.asarray(scale, jnp.float32), (-1, 1, 1))
    coords = keypoints_crop_coords.astype(jnp.float32) - crop_size // 2
    return coords / scale + centers[:, None, :].astype(jnp.float32)
