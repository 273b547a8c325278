"""Output-phase-packed convolution for narrow (64-channel) layers.

Why: a 3x3 conv with 64 output channels fills only half of the v5e MXU's
128 output lanes (docs/DESIGN.md measured these layers as the cascade's
efficiency laggards — e.g. conv1_2 in HandSegNet/PoseNet, the reference's
widest full-resolution layers, ColorHandPose3DNetwork.py:137/176). Packing
the two horizontal output phases into the channel dimension fills every
lane: the even and odd output columns become a single stride-(1,2) conv
with kernel width 4 and 2x the output channels, whose taps are the original
kernel at offsets {0..2} (even phase) and {1..3} (odd phase) with the
remaining tap exactly zero. Cost: 4/3x the MACs (the zero taps), at ~2x the
MXU utilization — measured 1.47x faster end-to-end per layer on v5e, and
unlike the input-side space-to-depth rewrite (2.25x MACs, break-even — see
DESIGN.md) it is a clear net win.

Numerics: the packed layer computes the exact same multiply-adds plus
additions of exact zeros; only the contraction order changes, so outputs
match the plain conv to float-reassociation noise (~1e-6), NOT bitwise.
Like int8 PTQ it is therefore an opt-in param-tree transform
(``phase_pack_params``) — same model code, the packed layout
({"weights_p2", "biases"}) is recognized by ops.nn.conv2d.

Constraints (checked by the transform / the op):
  - stride-1 SAME 3x3 float conv layers with out_chan <= 64 (packed out
    2*oc <= 128 lanes);
  - even input width at apply time (all cascade resolutions: 320/256/160).
"""

import jax
import jax.numpy as jnp

from hand3d_tpu.ops import nn as _nn  # safe: nn only imports us lazily

_DN = ("NHWC", "HWIO", "NHWC")


def pack_kernel(w):
    """[3, 3, ic, oc] -> [3, 4, ic, 2*oc] phase-packed kernel.

    Output channel block [0:oc] is the even-column phase (taps 0..2 of the
    width-4 window anchored at column 2k-1), block [oc:2oc] the odd phase
    (taps 1..3). Zeros elsewhere contribute exactly 0 to the contraction.
    """
    kh, kw, ic, oc = w.shape
    assert (kh, kw) == (3, 3), f"phase packing expects 3x3 kernels, got {kh}x{kw}"
    wp = jnp.zeros((kh, 4, ic, 2 * oc), w.dtype)
    wp = wp.at[:, 0:3, :, :oc].set(w)
    wp = wp.at[:, 1:4, :, oc:].set(w)
    return wp


def conv2d_phase_packed(x, params, compute_dtype=None, interleave=True):
    """Apply a packed layer: params {"weights_p2": [3,4,ic,2oc], "biases": [oc]}.

    Equivalent to conv2d(x, unpacked, stride=1) + bias up to float
    reassociation. Requires even input width. With ``interleave=False`` the
    result stays in the packed layout [B, H, W/2, 2oc] (phase blocks along
    channels) for a fused consumer — materializing the interleave costs a
    full extra pass over the largest activation in the net, which measured
    away the entire MXU win at cascade level.
    """
    w, b = params["weights_p2"], params["biases"]
    assert x.shape[2] % 2 == 0, f"phase-packed conv needs even width, got {x.shape}"
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=_DN, preferred_element_type=jnp.float32,
    )  # [B, H, W/2, 2*oc]
    oc = y.shape[-1] // 2
    y = y + jnp.concatenate([b, b]).astype(y.dtype)
    if not interleave:
        return y
    bb, hh, wh, _ = y.shape
    # interleave the phases back: [..., W/2, 2, oc] -> [..., W, oc]
    return y.reshape(bb, hh, wh, 2, oc).reshape(bb, hh, wh * 2, oc)


def conv_relu_pool_packed(x, params, compute_dtype=None):
    """Fused packed conv + leaky-relu + 2x2/2 VALID max pool.

    Identical math to max_pool_2x2(leaky_relu(conv2d(x, unpacked))) — the
    pool's horizontal max over columns (2j, 2j+1) is exactly the max of the
    two phase blocks of the packed layout (no interleave materialized), the
    vertical max is a strided row reduce, and leaky-relu commutes with max
    (monotone), so it runs last on the 4x-smaller pooled map.
    """
    y = conv2d_phase_packed(x, params, compute_dtype, interleave=False)
    oc = y.shape[-1] // 2
    h = jnp.maximum(y[..., :oc], y[..., oc:])  # horizontal 2:1 pool
    v = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )  # vertical 2:1 pool
    return _nn.leaky_relu(v)


def maybe_fused_conv_pool(x, layer_params, next_is_pool, compute_dtype=None):
    """The encoder-walk fusion rule, in one place for every model: if this
    conv layer is phase-packed AND the next encoder entry is a 2x2 pool,
    run the fused conv+relu+pool and return it (the caller must then skip
    the pool entry); otherwise return None and the caller proceeds with the
    plain conv2d path."""
    if "weights_p2" in layer_params and next_is_pool:
        return conv_relu_pool_packed(x, layer_params, compute_dtype)
    return None


def _default_packable(name):
    """conv1_2 of HandSegNet/PoseNet: the 64-channel full-resolution stride-1
    layer DESIGN.md measured as the MXU-utilization laggard, AND the only
    narrow layer directly feeding a 2x2 pool — which lets the models fuse
    conv+relu+pool on the packed layout (conv_relu_pool_packed) so the
    interleave never touches HBM. conv1_1 measured as a net loss when packed
    (cin=3 contraction is the bottleneck there, and its consumer is another
    conv, forcing the interleave). The PosePrior/ViewpointNet towers also
    have narrow 3x3 convs, but half are stride 2 (inexpressible as phase
    packing) and they run on 32x32 maps where the win is noise."""
    return name == "conv1_2"


def phase_pack_params(params, packable=_default_packable):
    """Param-tree transform: rewrite selected stride-1 3x3 conv layers with
    out_chan <= 64 to the phase-packed layout. Leaves everything else (wide
    convs, 1x1 heads, dense layers, already-quantized layers) untouched.

    ``packable(name) -> bool`` selects layers by their reference name;
    shape guards (3x3 kernel, <= 64 out channels, float layout) still apply
    on top. Strides are not recorded in the tree, so callers must only
    select stride-1 layers — the default selects HandSegNet/PoseNet's
    conv1 block, which is stride 1 (SURVEY.md §2.1). Composes with int8 PTQ:
    quantize FIRST (quantized layers are skipped here); they target
    disjoint layers anyway (int8 pays off at cin >= 128, packing at
    out <= 64).
    """

    def visit(name, layer):
        if isinstance(layer, dict) and "weights" in layer:
            w = layer["weights"]
            if (
                packable(name)
                and getattr(w, "ndim", 0) == 4
                and w.shape[:2] == (3, 3)
                and w.shape[3] <= 64
            ):
                return {
                    "weights_p2": pack_kernel(w),
                    "biases": layer["biases"],
                }
            return layer
        if isinstance(layer, dict):
            return {k: visit(k, v) for k, v in layer.items()}
        return layer

    return visit("", params)
