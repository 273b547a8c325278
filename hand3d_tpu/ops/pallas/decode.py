"""Pallas TPU kernel: keypoint argmax over a bilinearly-upsampled scoremap,
without materializing the upsampled map.

The cascade decodes 2D keypoints as argmax over the 32x32 PoseNet scoremap
upsampled 8x to 256x256 (reference: resize at ColorHandPose3DNetwork.py:97
then host argmax at general.py:331-344). Materializing that map costs
~350 MB of HBM traffic per 32-batch just to take an argmax.

Key observation: with the TF1 asymmetric resize grid and integer factor f,
destination pixel (f*i + a, f*j + b) interpolates the 2x2 source cell at
(i, j) with fixed weights (a/f, b/f). So the upsampled map is exactly f*f
weighted overlays of the small map, and its argmax is a running max over
those 64 overlays — all in VMEM. Tie-breaking matches np/jnp argmax (first
occurrence in row-major order of the big map): maximum value wins, then the
smallest flat index.

Grid: one program per batch element; all channels decoded together.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_clamp(m, axis):
    """m[i+1] with edge clamp (last element repeats) along ``axis``."""
    size = m.shape[axis]
    rolled = pltpu.roll(m, size - 1, axis)  # m[i+1] circularly
    idx = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)
    return jnp.where(idx < size - 1, rolled, m)


def _kernel(factor, sm_ref, row_ref, col_ref):
    m = sm_ref[0]  # [h, w, K]
    h, w, k = m.shape
    big_w = w * factor

    m_down = _shift_clamp(m, 0)  # m[i+1, j]
    flat_base = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w, k), 0) * factor * big_w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w, k), 1) * factor
    )

    big = jnp.int32(h * factor * big_w)
    best_v = jnp.full((1, k), -jnp.inf, jnp.float32)
    best_p = jnp.full((1, k), big, jnp.int32)

    for a in range(factor):
        wa = jnp.float32(a / factor)
        r = m * (1.0 - wa) + m_down * wa  # row lerp, same assoc as resize
        r_right = _shift_clamp(r, 1)
        for b in range(factor):
            wb = jnp.float32(b / factor)
            v = r * (1.0 - wb) + r_right * wb  # [h, w, K]
            pos = flat_base + jnp.int32(a * big_w + b)

            vmax = jnp.max(v, axis=(0, 1), keepdims=True)[0]  # [1, K]
            pmin = jnp.min(
                jnp.where(v == vmax[None], pos, big), axis=(0, 1), keepdims=True
            )[0]
            take = (vmax > best_v) | ((vmax == best_v) & (pmin < best_p))
            best_v = jnp.where(take, vmax, best_v)
            best_p = jnp.where(take, pmin, best_p)

    row_ref[0] = (best_p // big_w).astype(jnp.float32)
    col_ref[0] = (best_p % big_w).astype(jnp.float32)


def decode_keypoints_upsampled_pallas(scoremap, factor, interpret=None):
    """[B, h, w, K] scoremap -> [B, K, 2] (row, col) argmax coordinates in
    the (h*factor, w*factor) TF1-asymmetric bilinear upsampling — bit-equal
    to detect_keypoints_2d(resize_bilinear(sm, (h*f, w*f))).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # inner jit: an eager pallas_call wedges on remote-device platforms
    # (axon tunnel) — docs/DESIGN.md "Pallas dispatch wedge"
    return _decode_jit(scoremap.astype(jnp.float32), factor, interpret)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _decode_jit(scoremap, factor, interpret):
    b, h, w, k = scoremap.shape
    kernel = functools.partial(_kernel, factor)
    rows, cols = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=factor * factor * 6 * h * w * k,
            bytes_accessed=h * w * k * 4,
            transcendentals=0,
        ),
    )(scoremap.astype(jnp.float32))
    return jnp.stack([rows[:, 0, :], cols[:, 0, :]], axis=-1)
