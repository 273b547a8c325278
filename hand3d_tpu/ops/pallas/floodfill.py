"""Pallas TPU kernel: morphological flood fill for single-blob extraction.

This is the compute core of single_obj_scoremap (ref:
utils/general.py:233-268): grow a one-pixel seed by repeated 21x21 dilation
ANDed with a binary foreground mask until it fills the connected component
containing the seed.

The XLA formulation (lax.fori_loop over two separable reduce_windows) round
trips the object map through HBM ~50 times per image. This kernel keeps the
whole map in VMEM for all passes (240x320 f32 = 300 KB, well under the
16 MB/core budget), computes each 21-tap windowed max as a log-time shift
tree (L2/L4/L8/L16 doubling + 3-way combine = 8 masked rolls per axis
instead of 21 taps), and early-exits via lax.while_loop once the map reaches
its fixed point — extra passes past convergence are no-ops, so this matches
the reference's fixed-pass-count result exactly.

Grid: one program per batch element.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WINDOW = 21  # general.py:236
_HALF = _WINDOW // 2


def _shift(v, s, axis, idx, size):
    """result[i] = v[i + s], zero outside [0, size)."""
    if s == 0:
        return v
    # pltpu.roll requires a non-negative shift; rolls are circular so
    # shifting by -s is shifting by size - s
    rolled = pltpu.roll(v, (-s) % size, axis)
    valid = (idx + s >= 0) & (idx + s <= size - 1)
    return jnp.where(valid, rolled, 0.0)


def _win21_max(v, axis, idx, size):
    """Centered 21-tap windowed max along ``axis`` via shift doubling."""
    l2 = jnp.maximum(v, _shift(v, 1, axis, idx, size))
    l4 = jnp.maximum(l2, _shift(l2, 2, axis, idx, size))
    l8 = jnp.maximum(l4, _shift(l4, 4, axis, idx, size))
    l16 = jnp.maximum(l8, _shift(l8, 8, axis, idx, size))
    # [i-10, i+10] = L16[i-10] U L4[i+6] U v[i+10]
    return jnp.maximum(
        jnp.maximum(
            _shift(l16, -_HALF, axis, idx, size),
            _shift(l4, 6, axis, idx, size),
        ),
        _shift(v, _HALF, axis, idx, size),
    )


def _kernel(num_passes, det_ref, seed_ref, out_ref):
    det = det_ref[0]
    h, w = det.shape
    b = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    seed = ((rows == seed_ref[b, 0]) & (cols == seed_ref[b, 1])).astype(
        jnp.float32
    )

    def cond(state):
        i, _, changed = state
        return (i < num_passes) & changed

    def body(state):
        i, obj, _ = state
        grown = _win21_max(obj, 0, rows, h)
        grown = _win21_max(grown, 1, cols, w)
        new = det * grown
        changed = jnp.any(new != obj)
        return i + 1, new, changed

    _, obj, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), seed, jnp.bool_(True))
    )
    out_ref[0] = obj


def flood_fill_pallas(detmap, seed_rc, num_passes, interpret=None):
    """Grow one-pixel seeds into their connected foreground components.

    Args:
      detmap: [B, H, W] float32 binary foreground mask.
      seed_rc: [B, 2] int32 (row, col) seed per sample.
      num_passes: max dilation passes (the reference's max(H, W) // 10).
      interpret: force Pallas interpreter mode (defaults to True off-TPU so
        the same code path runs in CPU tests).
    Returns:
      [B, H, W] float32 object map.

    Always dispatches through an inner ``jax.jit``: an EAGER ``pallas_call``
    wedges indefinitely on remote-device platforms (axon tunnel) — see
    docs/DESIGN.md "Pallas dispatch wedge". Inside an outer jit the inner
    jit is inlined; eager callers get the jitted path instead of the wedge.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flood_fill_jit(detmap.astype(jnp.float32),
                           seed_rc.astype(jnp.int32), num_passes, interpret)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _flood_fill_jit(detmap, seed_rc, num_passes, interpret):
    b, h, w = detmap.shape
    kernel = functools.partial(_kernel, num_passes)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # whole seed table in SMEM (TPU lowering requires SMEM blocks to
            # match the full array dims here); kernel indexes by program_id
            pl.BlockSpec((b, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=num_passes * 16 * h * w, bytes_accessed=2 * h * w * 4,
            transcendentals=0,
        ),
    )(detmap.astype(jnp.float32), seed_rc.astype(jnp.int32))
