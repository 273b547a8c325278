"""Mask post-processing: blob selection and bounding boxes (batched, jit-safe).

The reference implemented these with Python loops over the batch and native
TF kernels (dilation2d, sparse_to_dense, boolean_mask) in
utils/general.py:199-328. Here every op is fully batched and shape-static:

  * the flood fill is a fixed-trip lax.fori_loop whose body is a separable
    21x21 max-pool (two lax.reduce_window passes) ANDed with the foreground
    mask — bitwise the same fixed point as the reference's
    "dilation2d + round" construction;
  * boolean_mask min/max reductions become +/-inf-masked reductions, so the
    empty-mask fallbacks (general.py:311-320) arise from the same non-finite
    arithmetic as in the reference.
"""

import os

import jax
import jax.numpy as jnp

_DILATION_FILTER_SIZE = 21  # general.py:236
# XLA flood-fill switches to an early-exit while_loop at/below this batch
# (latency regime); above it, the fixed-trip fori_loop pipelines better
_EARLY_EXIT_MAX_BATCH = 4


def find_max_location(scoremap):
    """[B, H, W] -> [B, 2] (row, col) of the per-sample argmax.

    Replaces the Python-over-batch loop at general.py:224-228 with one
    vectorized argmax + unravel.
    """
    b, h, w = scoremap.shape
    flat_idx = jnp.argmax(jnp.reshape(scoremap, (b, -1)), axis=1).astype(jnp.int32)
    return jnp.stack([flat_idx // w, flat_idx % w], axis=-1)


def _maxpool_same(x, size):
    """Separable size x size stride-1 SAME max-pool over [B, H, W]."""
    for dims in ((1, size, 1), (1, 1, size)):
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, dims, (1, 1, 1), "SAME"
        )
    return x


def single_obj_scoremap(scoremap, num_passes=None, method="auto"):
    """Keep only the connected foreground blob containing the global maximum.

    Mirrors utils/general.single_obj_scoremap (:233-268): softmax over
    classes, foreground prob = max over non-background channels, binarize by
    rounding, then grow a seed placed at the foreground argmax by repeated
    dilation ANDed with the binary mask. The reference's dilation2d with a
    constant 1/441 kernel followed by round() is exactly
    ``mask * max_pool_21x21`` on {0,1} maps, which is what the loop body
    computes (the +1/441 never survives the round).

    Args:
      scoremap: [B, H, W, C] segmentation logits (C >= 2, channel 0 = bg).
      num_passes: dilation pass count; defaults to the reference's
        max(H, W) // 10 (general.py:256).
      method: "pallas" (VMEM-resident flood-fill kernel with early exit,
        see ops/pallas/floodfill.py), "xla" (fori_loop over separable
        reduce_windows), or "auto" (resolved per LOWERING platform via
        lax.platform_dependent — pallas on TPU, xla elsewhere — so one
        trace serves cross-device jits and multi-platform AOT exports;
        the process-global default_backend() would pick the pallas path
        even for programs jitted onto a CPU device of a TPU process).
        "auto" can be overridden process-wide by HAND3D_FLOODFILL=pallas|xla
        or the blanket HAND3D_PALLAS=0 kill switch
        (read at trace time): the escape hatch for compiler-stack states
        where the pallas path wedges inside outer control flow
        (docs/DESIGN.md "Pallas inside lax.scan").
    Returns:
      [B, H, W, 1] float32 binary object map.
    """
    b, h, w, c = scoremap.shape
    if num_passes is None:
        num_passes = max(h, w) // (_DILATION_FILTER_SIZE // 2)

    probs = jax.nn.softmax(scoremap, axis=-1)
    fg = jnp.max(probs[..., 1:], axis=-1)  # [B, H, W]
    detmap = jnp.round(fg)
    max_loc = find_max_location(fg)  # [B, 2]

    def _pallas(detmap, max_loc):
        from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

        return flood_fill_pallas(detmap, max_loc, num_passes)[..., None]

    def _xla(detmap, max_loc):
        rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]
        cols = jnp.arange(w, dtype=jnp.int32)[None, None, :]
        seed = (
            (rows == max_loc[:, 0:1, None]) & (cols == max_loc[:, None, 1:2])
        ).astype(jnp.float32)

        if b <= _EARLY_EXIT_MAX_BATCH:
            # serving-latency regime: the fill is a monotone fixed-point
            # iteration (extra passes are no-ops), so stopping at the fixed
            # point is bit-identical to the full trip count. Real masks
            # converge in far fewer than the worst-case max(H, W)//10
            # passes; at batch 1 the measured flood fill is ~0.19 ms of the
            # 1.78 ms cascade (docs/DESIGN.md batch-1 analysis). At large
            # batch ALL images must converge and the per-pass convergence
            # reduction + the while_loop's weaker pipelining cost more than
            # they save, so the fixed-trip fori_loop stays.
            def cond(state):
                i, obj, changed = state
                return (i < num_passes) & changed

            def step(state):
                i, obj, _ = state
                new = detmap * _maxpool_same(obj, _DILATION_FILTER_SIZE)
                return i + 1, new, jnp.any(new != obj)

            _, obj, _ = jax.lax.while_loop(
                cond, step, (jnp.int32(0), seed, jnp.bool_(True)))
            return obj[..., None]

        def body(_, obj):
            return detmap * _maxpool_same(obj, _DILATION_FILTER_SIZE)

        return jax.lax.fori_loop(0, num_passes, body, seed)[..., None]

    if method == "auto":
        method = os.environ.get("HAND3D_FLOODFILL", "auto")
        assert method in ("auto", "pallas", "xla"), method
        if method == "auto" and os.environ.get("HAND3D_PALLAS") == "0":
            method = "xla"
    if method == "pallas":
        return _pallas(detmap, max_loc)
    if method == "xla":
        return _xla(detmap, max_loc)
    return jax.lax.platform_dependent(detmap, max_loc,
                                      tpu=_pallas, default=_xla)


def calc_center_bb(binary_class_mask, fallback_center=(160.0, 160.0),
                   fallback_size=100.0):
    """Bounding box, center, and square crop size of a binary mask.

    Mirrors utils/general.calc_center_bb (:271-328) with where-masked
    reductions instead of boolean_mask + per-sample loops. An empty mask
    yields non-finite intermediates exactly like the reference and triggers
    the same fallbacks — center (160, 160), crop size 100 by default;
    callers operating on a downscaled mask pass pre-scaled fallbacks so
    the values land on the reference constants after mapping back to
    full-image coordinates (models/cascade.py seg_scale).

    Args:
      binary_class_mask: [B, H, W] or [B, H, W, 1]; nonzero == foreground.
    Returns:
      center [B, 2] (row, col) float32, bb [B, 2, 2] (bb[:, :, 0] = min corner,
      bb[:, :, 1] = max corner), crop_size [B, 1] float32.
    """
    if binary_class_mask.ndim == 4:
        binary_class_mask = binary_class_mask[..., 0]
    mask = binary_class_mask.astype(jnp.int32) == 1
    _, h, w = mask.shape

    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None], mask.shape)
    cols = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :], mask.shape)

    def masked_reduce(vals, fn, fill):
        return fn(jnp.where(mask, vals, fill), axis=(1, 2))

    x_min = masked_reduce(rows, jnp.min, jnp.inf)
    x_max = masked_reduce(rows, jnp.max, -jnp.inf)
    y_min = masked_reduce(cols, jnp.min, jnp.inf)
    y_max = masked_reduce(cols, jnp.max, -jnp.inf)

    start = jnp.stack([x_min, y_min], axis=1)
    end = jnp.stack([x_max, y_max], axis=1)
    bb = jnp.stack([start, end], axis=2)

    center = 0.5 * (start + end)
    center_ok = jnp.all(jnp.isfinite(center), axis=1, keepdims=True)
    center = jnp.where(center_ok, center,
                       jnp.asarray(fallback_center, jnp.float32))

    crop_size = jnp.maximum(x_max - x_min, y_max - y_min)[:, None]
    crop_size = jnp.where(jnp.isfinite(crop_size), crop_size,
                          jnp.float32(fallback_size))

    return center, bb, crop_size
