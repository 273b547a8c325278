"""Post-training int8 quantization of the conv/FC hot path.

The reference has no quantization (TF1.3, fp32 throughout); this is a
TPU-native extension. The v5e MXU runs int8 matmuls/convs at ~2.1x the
bf16 rate (measured on this chip: ~390 vs ~185 effective TFLOP/s on the
cascade's conv shapes), and the cascade is ~85% conv time, so int8 is the
one dtype lever that actually pays on this hardware (bf16 does not — see
docs/DESIGN.md).

Scheme (standard symmetric PTQ, accuracy-friendly):
  * weights: per-output-channel symmetric int8
    (``w_q = round(w / s_w)``, ``s_w[oc] = max|w[..., oc]| / 127``);
  * activations: dynamic per-sample symmetric int8, scale computed on
    device from the live batch (no calibration set needed);
  * accumulation in int32 on the MXU, dequantize + bias in fp32, so all
    glue ops / nonlinearities / pooling stay exact fp32.

Quantization is a *parameter-tree transform*: ``quantize_params_int8``
rewrites every ``{"weights", "biases"}`` layer dict into
``{"weights_q", "weight_scale", "biases"}`` and ``ops.nn.conv2d`` /
``ops.nn.dense`` dispatch on that layout — model code is untouched, and any
param tree (fresh init, converted reference pickle, training snapshot)
can be quantized. Transposed convs dequantize on the fly (they are not on
the shipped nets' hot path).

Accuracy: numerically validated against fp32 within quantization
tolerance in tests; end-to-end EPE deltas on the published benchmarks
require the real datasets/weights (ROADMAP.md).
"""

import jax
import jax.numpy as jnp

_QMAX = 127.0
_EPS = 1e-12  # guards all-zero tensors; scale of a zero tensor is irrelevant


def _weight_scale(w):
    """Per-output-channel symmetric scale — the ONE definition shared by
    deployment quantization and the QAT fake-quant view (they must agree)."""
    axes = tuple(range(w.ndim - 1))
    return jnp.maximum(jnp.max(jnp.abs(w), axis=axes), _EPS) / _QMAX


def quantize_weights_int8(w):
    """[..., oc] float kernel -> (int8 kernel, [oc] float32 scale)."""
    scale = _weight_scale(w)
    w_q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def quantize_act_int8(x):
    """Per-sample dynamic quantization of [B, ...] activations.

    Per-sample (not per-batch) scales keep predictions independent of batch
    composition — a padded serving batch must not perturb real samples.
    """
    axes = tuple(range(1, x.ndim))
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=axes, keepdims=True), _EPS)
    scale = scale / _QMAX
    x_q = jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return x_q, scale.astype(jnp.float32)


def is_quantized(params):
    return isinstance(params, dict) and "weights_q" in params


# --- static per-channel activation scales (calibrated) ----------------------
#
# The dynamic per-sample scheme above quantizes each sample's activations on
# a grid set by that sample's OWN max — one outlier coarsens the grid for
# every channel of the tensor. The static scheme instead calibrates a
# per-INPUT-CHANNEL scale s_in[ic] offline and folds it into the weights:
#
#   conv(x, w) = conv(x / s_in, w * s_in)        (exact: s_in is per-ic)
#
# so the deployed op is x_q = round(x / s_in) (elementwise, NO reduction
# over the live activations) followed by the same int8 conv with
# weight scales computed on w' = w * s_in. Benefits: (a) channel ranges are
# equalized, so low-range channels keep fine grids (the dominant term of
# the measured PoseNet2D drift); (b) the per-sample abs-max reduction pass
# over the largest activations disappears from the hot path. Cost:
# activations beyond the calibrated range clip at 127 — calibrate on
# representative data and keep ``margin`` >= 1.


def calibrate_act_scales(run_float, params, batches, margin=1.0):
    """Observe per-input-channel activation ranges of every conv/FC layer.

    ``run_float(params, batch)`` must execute the FLOAT model EAGERLY (no
    jit — the observer records concrete values as layers execute; tracers
    are skipped). Layers are keyed by the identity of their "weights" leaf,
    so pass the SAME ``params`` tree object to quantize_params_int8's
    ``act_scales``.

    Returns {id(weights_leaf): s_in} with s_in = margin * amax[ic] / 127.
    """
    import numpy as np

    from hand3d_tpu.ops import nn as _nn

    amax = {}

    def observe(x, layer_params):
        if isinstance(x, jax.core.Tracer):
            return
        w = layer_params.get("weights")
        if w is None:
            return
        axes = tuple(range(x.ndim - 1))
        m = np.asarray(jnp.max(jnp.abs(x), axis=axes))
        key = id(w)
        amax[key] = np.maximum(amax[key], m) if key in amax else m

    prev = _nn._act_observer
    _nn._act_observer = observe
    try:
        for batch in batches:
            run_float(params, batch)
    finally:
        _nn._act_observer = prev
    return {k: (margin * np.maximum(m, _EPS) / _QMAX).astype(np.float32)
            for k, m in amax.items()}


def unit_act_scales(params, min_in_chan=128, min_out_chan=32,
                    skip_substrings=("upconv", "deconv")):
    """All-ones "calibration" for every eligible layer.

    Produces the exact DEPLOYED static-int8 compute graph (elementwise
    quantize, no per-sample reduction) without a calibration run — for
    SPEED benchmarking only: the grid is wrong unless activations happen
    to live in [-127, 127]. Accuracy work must use calibrate_act_scales.
    """
    import numpy as np

    out = {}

    def walk(p):
        if not isinstance(p, dict):
            return
        if "weights" in p and "biases" in p:
            w = jnp.asarray(p["weights"])
            if _eligible(w, min_in_chan, min_out_chan):
                ic = w.shape[-2] if w.ndim == 4 else w.shape[0]
                out[id(p["weights"])] = np.ones((ic,), np.float32)
            return
        for k, v in p.items():
            if not any(s in k for s in skip_substrings):
                walk(v)

    walk(params)
    return out


def _eligible(w, min_in_chan, min_out_chan):
    """Shared PTQ/QAT layer gate — the two paths MUST quantize the same set.

    ``in_chan`` gates the bandwidth-bound early layers (no MXU win there);
    ``out_chan`` gates the PREDICTION HEADS: the 21-channel scoremap convs
    (posenet conv5_2/conv6_7/conv7_7, handsegnet conv6_2) are where int8
    rounding turns directly into keypoint argmax flips — the dominant term
    of the measured int8 drift bound (docs/PRESETS.md) — while their FLOPs
    share is ~0.1% of the cascade, so keeping them float is accuracy for
    free. 1x1 convs and FCs with >= 32 outputs stay quantized.
    """
    in_chan = w.shape[-2] if w.ndim == 4 else w.shape[0]
    return in_chan >= min_in_chan and w.shape[-1] >= min_out_chan


def resolve_scopes(params, scopes):
    """Map case-insensitive stage names to the tree's top-level scope keys.

    ``{"handsegnet"}`` -> ``{"HandSegNet"}`` etc. Raises on names that match
    no scope — a silently-ignored typo would quietly serve the full-float
    model while claiming a quantized preset.
    """
    by_lower = {k.lower(): k for k in params}
    out = set()
    for s in scopes:
        k = by_lower.get(str(s).lower())
        if k is None:
            raise ValueError(
                f"unknown quantize scope {s!r}; available: {sorted(params)}")
        out.add(k)
    return out


def quantize_params_int8(params, min_in_chan=128, min_out_chan=32,
                         skip_substrings=("upconv", "deconv"), scopes=None,
                         act_scales=None, include_substrings=None):
    """Rewrite {"weights", "biases"} layer dicts in a param pytree into the
    int8 layout ({"weights_q", "weight_scale", "biases"}). Idempotent.

    ``scopes``: optional set of top-level stage names (case-insensitive,
    e.g. {"handsegnet"}) — only those subtrees are quantized, the rest stay
    float. The measured ablation (docs/DESIGN.md) localizes ALL int8
    activation drift to PoseNet2D; HandSegNet-only int8 carries ~half the
    cascade FLOPs (61.3 of 121.8 GFLOP/frame) at zero measured uv drift,
    so it is the drift-free half of the int8 speedup.

    ``min_in_chan``: layers with fewer input channels stay float. The early
    VGG blocks (3->64->128 channels at full resolution) are
    bandwidth-bound, not MXU-bound — quantizing them adds quant/dequant
    passes over the largest activations in the net for no MXU win (the
    int8 path measured *slower* there; full quantization nets out to zero
    cascade speedup, selective quantization keeps the ~1.8x on the wide
    layers). 128 keeps conv3_1 onwards + the PoseNet refiners + all FC
    layers quantized. Pass 0 to quantize everything.

    ``min_out_chan``: layers with fewer OUTPUT channels stay float — this
    keeps the prediction heads exact (see ``_eligible``). Pass 0 to
    disable.

    ``skip_substrings``: subtrees whose key matches stay float. Defaults to
    transposed-conv names: their kernels use the [kh, kw, OUT, IN] layout
    (so the channel gate and per-output-channel scales would read the
    wrong axes), and nn.conv2d_transpose dequantizes before computing
    anyway — quantizing them adds rounding noise for zero speed win.

    ``act_scales``: optional calibration from :func:`calibrate_act_scales`
    (keyed by id of each layer's ORIGINAL "weights" leaf). Layers found in
    it use STATIC per-input-channel activation scales — the scale is folded
    into the weights before weight quantization and stored as "act_scale"
    for the elementwise input quantization; layers not found keep the
    dynamic per-sample scheme.

    ``include_substrings``: optional POSITIVE filter — only subtrees whose
    key matches an entry are quantized (everything else stays float).
    Composes with ``scopes``: e.g. ``scopes={"posenet2d"},
    include_substrings={"conv6", "conv7"}`` quantizes only the PoseNet
    refinement units.
    """
    if scopes is not None:
        keys = resolve_scopes(params, scopes)
        return {
            k: (quantize_params_int8(v, min_in_chan, min_out_chan,
                                     skip_substrings, act_scales=act_scales,
                                     include_substrings=include_substrings)
                if k in keys else v)
            for k, v in params.items()
        }
    if isinstance(params, dict):
        if "weights" in params and "biases" in params:
            if include_substrings is not None:
                # reached a leaf layer without matching the positive filter
                return dict(params)
            w = jnp.asarray(params["weights"])
            if not _eligible(w, min_in_chan, min_out_chan):
                return dict(params)
            s_in = (act_scales or {}).get(id(params["weights"]))
            if s_in is not None:
                s_in = jnp.asarray(s_in, jnp.float32)
                # fold the static input scale into the kernel: conv(x, w)
                # == conv(x / s_in, w * s_in) exactly (per-ic scale), so
                # the int8 grid sees range-equalized channels
                w_ic_axis = w.ndim - 2  # HWIO ic / dense [in, out] in
                shape = [1] * w.ndim
                shape[w_ic_axis] = w.shape[w_ic_axis]
                w_q, scale = quantize_weights_int8(
                    w * s_in.reshape(shape))
                return {
                    "weights_q": w_q,
                    "weight_scale": scale,
                    "act_scale": s_in,
                    "biases": jnp.asarray(params["biases"], jnp.float32),
                }
            w_q, scale = quantize_weights_int8(w)
            return {
                "weights_q": w_q,
                "weight_scale": scale,
                "biases": jnp.asarray(params["biases"], jnp.float32),
            }
        if is_quantized(params):
            return dict(params)
        out = {}
        for k, v in params.items():
            if any(s in k for s in skip_substrings):
                out[k] = v
                continue
            inc = include_substrings
            if inc is not None and any(s in k for s in inc):
                inc = None  # matched: quantize this whole subtree
            out[k] = quantize_params_int8(v, min_in_chan, min_out_chan,
                                          skip_substrings,
                                          act_scales=act_scales,
                                          include_substrings=inc)
        return out
    return params


def dequantize_weights(params):
    """Recover a float kernel from a quantized layer dict (exact to within
    the original rounding): used by ops that have no int8 fast path."""
    w = params["weights_q"].astype(jnp.float32) * params["weight_scale"]
    if "act_scale" in params:
        # static layers store w * s_in — unfold to recover the kernel
        s_in = params["act_scale"]
        shape = [1] * w.ndim
        shape[w.ndim - 2] = s_in.shape[0]
        w = w / s_in.reshape(shape)
    return w


def _ste(x, quantized):
    """Straight-through estimator: forward = quantized, gradient = identity."""
    return x + jax.lax.stop_gradient(quantized - x)


def fake_quant_weights(w):
    """QDQ view of a kernel: forward equals dequantize(quantize(w)) with the
    same per-output-channel scales as quantize_weights_int8; gradients pass
    straight through (scales are stop-gradiented, standard QAT practice)."""
    scale = jax.lax.stop_gradient(_weight_scale(w))
    q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX) * scale
    return _ste(w, q)


def fake_quant_act(x):
    """QDQ view of activations with the same dynamic per-sample scales as
    quantize_act_int8 — the training-time twin of the inference path."""
    axes = tuple(range(1, x.ndim))
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=axes, keepdims=True), _EPS)
    scale = jax.lax.stop_gradient(scale / _QMAX)
    q = jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX) * scale
    return _ste(x, q)


def fake_quant_weights_static(w, s_in):
    """QDQ kernel view matching the STATIC deployment path exactly.

    Deployment folds s_in into the kernel before per-oc quantization
    (quantize_params_int8 act_scales path); the training twin quantizes
    the FOLDED kernel and unfolds, so the effective forward kernel equals
    dequantize(w'_q)/s_in. Gradients pass straight through to ``w``."""
    ic_axis = w.ndim - 2
    shape = [1] * w.ndim
    shape[ic_axis] = w.shape[ic_axis]
    s_in = jax.lax.stop_gradient(jnp.asarray(s_in, w.dtype).reshape(shape))
    folded = w * s_in
    scale = jax.lax.stop_gradient(_weight_scale(folded))
    q = jnp.clip(jnp.round(folded / scale), -_QMAX, _QMAX) * scale / s_in
    return _ste(w, q)


def fake_quant_act_static(x, s_in):
    """QDQ activation view of the STATIC scheme: elementwise per-input-
    channel grid with out-of-calibration clipping at ±127·s_in — identical
    forward values to the deployed round(x / s_in) int8 path."""
    s_in = jax.lax.stop_gradient(jnp.asarray(s_in, x.dtype))
    q = jnp.clip(jnp.round(x / s_in), -_QMAX, _QMAX) * s_in
    return _ste(x, q)


def qat_view(params, min_in_chan=128, min_out_chan=32,
             skip_substrings=("upconv", "deconv"), scopes=None,
             act_scales=None):
    """Quantization-aware-training view of a param tree.

    Renames each eligible layer's "weights" to "weights_fq" (arrays are
    shared, so gradients flow to the original leaves) — ops.nn.conv2d /
    dense dispatch on that key and apply fake_quant_weights +
    fake_quant_act before a float conv/matmul. Because the int8 kernel is
    linear, conv(QDQ(x), QDQ(w)) == dequant(conv(quant(x), quant(w))) up
    to the accumulation/rounding of the float conv itself — bit-exact at
    f32 accumulation (the unit tests assert forward == PTQ on CPU); on
    TPU the deployed path accumulates int8xint8 in exact int32 while the
    QAT conv inherits the float conv's MXU rounding, so training numerics
    match deployment up to that hardware rounding, not bitwise. Same
    ``min_in_chan``/``skip_substrings`` selectivity as
    quantize_params_int8 (the two MUST agree so training and deployment
    quantize the same layer set). ``scopes`` mirrors quantize_params_int8's
    stage scoping — QAT for a scoped deployment preset must fake-quantize
    exactly the scoped stages.

    ``act_scales``: optional calibration from :func:`calibrate_act_scales`
    — the QAT-STATIC tightener (DESIGN.md): layers found in it train
    through the STATIC per-input-channel fake quantizer
    (fake_quant_weights_static / fake_quant_act_static), so the weights
    adapt to the exact grids the int8_static deployment will use. Layers
    not found keep the dynamic fake quantizer. Deployment pairing:
    quantize_params_int8(params, act_scales=SAME calibration).

    Usage (wrap the loss; params/optimizer stay float):
        loss_qat = lambda p, batch, key: loss_fn(qat_view(p), batch, key)
    After training, quantize_params_int8(params) produces the deployment
    tree with the scales the weights were trained under.
    """
    if scopes is not None:
        keys = resolve_scopes(params, scopes)
        return {
            k: (qat_view(v, min_in_chan, min_out_chan, skip_substrings,
                         act_scales=act_scales)
                if k in keys else v)
            for k, v in params.items()
        }
    if isinstance(params, dict):
        if "weights" in params and "biases" in params:
            if not _eligible(params["weights"], min_in_chan, min_out_chan):
                return params
            out = {"weights_fq": params["weights"],
                   "biases": params["biases"]}
            s_in = (act_scales or {}).get(id(params["weights"]))
            if s_in is not None:
                out["act_scale_fq"] = s_in
            return out
        return {k: (v if any(s in k for s in skip_substrings)
                    else qat_view(v, min_in_chan, min_out_chan,
                                  skip_substrings, act_scales=act_scales))
                for k, v in params.items()}
    return params


def _native_int8():
    """True where int8 matmuls/convs have a fast path (the TPU MXU).

    XLA:CPU lowers int8 convolution to a generic scalar loop (~200x slower
    than f32 — measured 2.4 s vs 12 ms for one 3x3x256 conv), so on non-TPU
    backends the quantized ops run in f32 arithmetic over the SAME
    quantized integer values: identical quantization semantics, differing
    only in accumulator rounding past 2^24 (negligible vs the int8
    quantization noise itself, and only the TPU path ships to production).
    """
    return jax.default_backend() == "tpu"


def _quantize_input(x, params):
    """Input quantization for the int8 ops: static (calibrated, elementwise)
    when the layer carries "act_scale", else dynamic per-sample.

    Returns (x_q, s_x) where s_x broadcasts over the OUTPUT of the matmul —
    for static layers s_x is 1.0 because the input scale was folded into
    the weights at quantization time."""
    s_in = params.get("act_scale")
    if s_in is not None:
        x_q = jnp.clip(jnp.round(x / s_in), -_QMAX, _QMAX).astype(jnp.int8)
        return x_q, jnp.float32(1.0)
    return quantize_act_int8(x)


def conv2d_int8(x, params, stride=1, dimension_numbers=("NHWC", "HWIO", "NHWC")):
    """int8 x int8 -> int32 conv on the MXU, dequantized to fp32 + bias."""
    x_q, s_x = _quantize_input(x, params)
    if _native_int8():
        acc_dtype, w_q = jnp.int32, params["weights_q"]
    else:
        acc_dtype = jnp.float32
        x_q = x_q.astype(jnp.float32)
        w_q = params["weights_q"].astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, (stride, stride), "SAME",
        dimension_numbers=dimension_numbers,
        preferred_element_type=acc_dtype,
    )
    # s_x: [B,1,1,1]; weight_scale: [oc] broadcasting over NHWC's C
    y = y.astype(jnp.float32) * (s_x * params["weight_scale"])
    return y + params["biases"]


def dense_int8(x, params):
    """int8 matmul + fp32 dequant + bias."""
    x_q, s_x = _quantize_input(x, params)  # dynamic s_x: [B, 1]; static: 1.0
    if _native_int8():
        acc_dtype, w_q = jnp.int32, params["weights_q"]
    else:
        acc_dtype = jnp.float32
        x_q = x_q.astype(jnp.float32)
        w_q = params["weights_q"].astype(jnp.float32)
    y = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )
    y = y.astype(jnp.float32) * (s_x * params["weight_scale"])
    return y + params["biases"]
