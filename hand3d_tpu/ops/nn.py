"""NN primitives (the reference's NetworkOps, utils/general.py:26-160).

Pure functions over explicit parameter dicts. Parameters use TF-native
layouts (conv kernels HWIO, dense kernels [in, out]) so converted reference
weights drop in without transposition; activations are NHWC, which XLA maps
onto the MXU directly.

Each layer's parameters live in a dict {"weights": ..., "biases": ...} keyed
by the same names the reference used, so a converted TF1 pickle
(hand3d_tpu.weights.convert) is structurally identical to a freshly
initialized tree.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

NEG_SLOPE_OF_RELU = 0.01  # general.py:28
CONV_BIAS_INIT = 1e-4  # general.py:50
FC_BIAS_INIT = 1e-4  # general.py:126
_DN = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x):
    """max(x, 0.01 x) — general.py:30-33."""
    return jnp.maximum(x, NEG_SLOPE_OF_RELU * x)


# Activation-range observer (ops.quant.calibrate_act_scales): set to a
# callable during EAGER calibration runs only; None in production, so the
# hot path costs one global load at trace time.
_act_observer = None


def conv2d(x, params, stride=1, compute_dtype=None):
    """SAME-padded conv + bias. params: {"weights": [kh,kw,ic,oc], "biases": [oc]}.

    A layer dict in the int8 layout (ops.quant.quantize_params_int8) takes
    the int8 MXU path instead; compute_dtype is ignored for those. The QAT
    layout ({"weights_fq", ...}, ops.quant.qat_view) applies fake
    quantization to weights and activations, then runs the float path.
    """
    if _act_observer is not None:
        _act_observer(x, params)
    if "weights_q" in params:
        from hand3d_tpu.ops import quant

        return quant.conv2d_int8(x, params, stride, dimension_numbers=_DN)
    if "weights_p2" in params:
        from hand3d_tpu.ops import phasepack

        assert stride == 1, "phase-packed layers are stride-1 only"
        return phasepack.conv2d_phase_packed(x, params, compute_dtype)
    if "weights_fq" in params:
        from hand3d_tpu.ops import quant

        s_in = params.get("act_scale_fq")
        if s_in is not None:  # QAT-STATIC twin of the int8_static path
            params = {"weights": quant.fake_quant_weights_static(
                          params["weights_fq"], s_in),
                      "biases": params["biases"]}
            x = quant.fake_quant_act_static(x, s_in)
        else:
            params = {"weights": quant.fake_quant_weights(
                          params["weights_fq"]),
                      "biases": params["biases"]}
            x = quant.fake_quant_act(x)
    w, b = params["weights"], params["biases"]
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(y.dtype)


def conv2d_relu(x, params, stride=1, compute_dtype=None):
    return leaky_relu(conv2d(x, params, stride, compute_dtype))


def conv2d_transpose(x, params, stride=2, compute_dtype=None):
    """SAME-padded transposed conv + bias (general.py:67-84, ``upconv``).

    True tf.nn.conv2d_transpose semantics — the gradient of conv2d wrt its
    input — with the reference's filter layout [kh, kw, out_chan, in_chan]
    (get_deconv_filter, general.py:92-110): ``transpose_kernel=True`` makes
    lax.conv_transpose interpret the kernel exactly that way (flipped
    spatial taps + swapped channel dims). Verified against
    torch.nn.functional.conv_transpose2d on asymmetric kernels; the
    bilinear init is symmetric and diagonal, so it is unaffected.
    """
    if "weights_q" in params:
        from hand3d_tpu.ops import quant

        params = {"weights": quant.dequantize_weights(params),
                  "biases": params["biases"]}
    elif "weights_fq" in params:
        from hand3d_tpu.ops import quant

        params = {"weights": quant.fake_quant_weights(params["weights_fq"]),
                  "biases": params["biases"]}
    w, b = params["weights"], params["biases"]
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    y = jax.lax.conv_transpose(
        x, w, (stride, stride), "SAME", dimension_numbers=_DN,
        transpose_kernel=True, preferred_element_type=jnp.float32,
    )
    return y + b.astype(y.dtype)


def conv2d_transpose_relu(x, params, stride=2, compute_dtype=None):
    """upconv_relu (general.py:87-90)."""
    return leaky_relu(conv2d_transpose(x, params, stride, compute_dtype))


def max_pool_2x2(x):
    """2x2 stride-2 VALID max pool — general.py:61-65."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def avg_pool(x, size, stride=None, padding="SAME"):
    """Average pool (used for the 8x scoremap pooling, PosePriorNetwork.py:61)."""
    stride = stride or size
    # SAME with evenly tiling windows is VALID; skip the per-position count
    # normalization (whose reduce_window-over-ones constant-folds for
    # seconds at compile time)
    if padding == "SAME" and x.shape[1] % stride == 0 and x.shape[2] % stride == 0 \
            and size == stride:
        padding = "VALID"
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size, 1), (1, stride, stride, 1), padding
    )
    if padding == "VALID":
        return summed / (size * size)
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add,
        (1, size, size, 1), (1, stride, stride, 1), padding,
    )
    return summed / counts


def dense(x, params, compute_dtype=None):
    """matmul + bias. params: {"weights": [in,out], "biases": [out]} — general.py:112-130."""
    if _act_observer is not None:
        _act_observer(x, params)
    if "weights_q" in params:
        from hand3d_tpu.ops import quant

        return quant.dense_int8(x, params)
    if "weights_fq" in params:
        from hand3d_tpu.ops import quant

        s_in = params.get("act_scale_fq")
        if s_in is not None:  # QAT-STATIC twin of the int8_static path
            params = {"weights": quant.fake_quant_weights_static(
                          params["weights_fq"], s_in),
                      "biases": params["biases"]}
            x = quant.fake_quant_act_static(x, s_in)
        else:
            params = {"weights": quant.fake_quant_weights(
                          params["weights_fq"]),
                      "biases": params["biases"]}
            x = quant.fake_quant_act(x)
    w, b = params["weights"], params["biases"]
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


def dense_relu(x, params, compute_dtype=None):
    return leaky_relu(dense(x, params, compute_dtype))


def dropout(key, x, keep_prob, train):
    """Inverted dropout gated on ``train`` (general.py:138-148).

    The reference gates on an ``evaluation`` placeholder with tf.cond; here
    train is a trace-time Python bool — training and eval are separate jitted
    programs, which is the XLA-friendly formulation.
    """
    if not train or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def spatial_dropout(key, x, keep_prob, train):
    """Channel-wise dropout, noise shape [B,1,1,C] (general.py:150-160)."""
    if not train or keep_prob >= 1.0:
        return x
    b, _, _, c = x.shape
    mask = jax.random.bernoulli(key, keep_prob, (b, 1, 1, c))
    return jnp.where(mask, x / keep_prob, 0.0)


# --- Initializers ------------------------------------------------------------


def xavier_conv_init(key, kh, kw, in_chan, out_chan, dtype=jnp.float32):
    """Glorot-uniform for conv kernels (tf.contrib.layers.xavier_initializer_conv2d)."""
    fan_in = kh * kw * in_chan
    fan_out = kh * kw * out_chan
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, (kh, kw, in_chan, out_chan), dtype, -limit, limit
    )


def xavier_fc_init(key, in_chan, out_chan, dtype=jnp.float32):
    """Glorot-uniform for dense kernels (tf.contrib.layers.xavier_initializer)."""
    limit = math.sqrt(6.0 / (in_chan + out_chan))
    return jax.random.uniform(key, (in_chan, out_chan), dtype, -limit, limit)


def conv_init(key, kh, kw, in_chan, out_chan, dtype=jnp.float32):
    return {
        "weights": xavier_conv_init(key, kh, kw, in_chan, out_chan, dtype),
        "biases": jnp.full((out_chan,), CONV_BIAS_INIT, dtype),
    }


def dense_init(key, in_chan, out_chan, dtype=jnp.float32):
    return {
        "weights": xavier_fc_init(key, in_chan, out_chan, dtype),
        "biases": jnp.full((out_chan,), FC_BIAS_INIT, dtype),
    }


def bilinear_upconv_init(size, channels, dtype=jnp.float32):
    """Fixed bilinear-interpolation kernel for transposed convs.

    Mirrors NetworkOps.get_deconv_filter (general.py:92-110): identical
    per-channel bilinear tap pattern, zero cross-channel terms, zero
    biases. Layout [kh, kw, out_chan, in_chan] like the reference's deconv
    filters (diagonal + symmetric, so layout/flip have no effect here).
    """
    f = math.ceil(size / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    coords = np.arange(size)
    vals = (1 - np.abs(coords / f - c))
    bilinear = np.outer(vals, vals)
    weights = np.zeros((size, size, channels, channels), dtype=np.float32)
    for i in range(channels):
        weights[:, :, i, i] = bilinear
    return {
        "weights": jnp.asarray(weights, dtype),
        "biases": jnp.zeros((channels,), dtype),
    }
