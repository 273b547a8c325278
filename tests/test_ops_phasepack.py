"""Output-phase-packed conv (ops/phasepack.py): exactness and tree transform."""

import jax
import jax.numpy as jnp
import numpy as np

from hand3d_tpu.ops import nn
from hand3d_tpu.ops.phasepack import (
    conv2d_phase_packed,
    pack_kernel,
    phase_pack_params,
)


def _layer(key, ic, oc, k=3):
    return nn.conv_init(key, k, k, ic, oc)


def test_packed_conv_matches_plain():
    """Same multiply-adds + exact zeros: equal to float-reassociation noise,
    including non-square inputs and odd heights."""
    for b, h, w, ic, oc, seed in [(2, 24, 32, 64, 64, 0), (1, 15, 20, 3, 64, 1),
                                  (3, 8, 8, 21, 32, 2)]:
        p = _layer(jax.random.PRNGKey(seed), ic, oc)
        x = jax.random.normal(jax.random.PRNGKey(seed + 10), (b, h, w, ic))
        ref = nn.conv2d(x, p)
        packed = {"weights_p2": pack_kernel(p["weights"]), "biases": p["biases"]}
        got = conv2d_phase_packed(x, packed)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
        )


def test_conv2d_dispatches_packed_layout():
    p = _layer(jax.random.PRNGKey(0), 64, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64))
    packed = {"weights_p2": pack_kernel(p["weights"]), "biases": p["biases"]}
    np.testing.assert_allclose(
        np.asarray(nn.conv2d_relu(x, packed)),
        np.asarray(nn.conv2d_relu(x, p)),
        atol=2e-5, rtol=1e-5,
    )


def test_phase_pack_params_selects_conv1_2_only():
    """Only conv1_2 (narrow layer feeding a pool) is rewritten by default;
    conv1_1 (measured net loss), stride-2 tower layers (PosePrior names),
    1x1 heads, wide layers, and quantized layers stay untouched."""
    from hand3d_tpu.ops.quant import quantize_params_int8

    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    params = {
        "HandSegNet": {
            "conv1_1": _layer(keys[0], 3, 64),  # cin-bound: untouched
            "conv1_2": _layer(keys[1], 64, 64),
            "conv2_1": _layer(keys[2], 64, 128),  # wide: untouched
            "conv6_2": _layer(keys[3], 512, 2, k=1),  # 1x1 head: untouched
        },
        "PosePrior": {
            "conv_pose_1_2": _layer(keys[4], 32, 32),  # stride-2 name: untouched
        },
    }
    quant = {"q": quantize_params_int8({"q": _layer(keys[5], 128, 64)},
                                       min_in_chan=0)["q"]}
    packed = phase_pack_params({**params, **quant})
    seg = packed["HandSegNet"]
    assert "weights_p2" in seg["conv1_2"]
    assert seg["conv1_2"]["weights_p2"].shape == (3, 4, 64, 128)
    assert "weights" in seg["conv1_1"]
    assert "weights" in seg["conv2_1"] and "weights" in seg["conv6_2"]
    assert "weights" in packed["PosePrior"]["conv_pose_1_2"]
    assert "weights_q" in packed["q"]  # int8 layer untouched


def test_fused_conv_relu_pool_matches_plain():
    """conv_relu_pool_packed == max_pool_2x2(leaky_relu(conv2d(x)))."""
    from hand3d_tpu.ops.phasepack import conv_relu_pool_packed

    for h in (16, 15):  # even + odd heights (VALID pool floors)
        p = _layer(jax.random.PRNGKey(0), 64, 64)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, 20, 64))
        ref = nn.max_pool_2x2(nn.leaky_relu(nn.conv2d(x, p)))
        packed = {"weights_p2": pack_kernel(p["weights"]), "biases": p["biases"]}
        got = conv_relu_pool_packed(x, packed)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_handsegnet_packed_equivalence():
    """Full HandSegNet forward with packed conv1 block equals the plain one."""
    from hand3d_tpu.models import handsegnet

    params = handsegnet.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.1
    ref = handsegnet.apply(params, x)[-1]
    got = handsegnet.apply(phase_pack_params(params), x)[-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_cascade_packed_equivalence():
    """Full cascade inference with the default phase_pack transform equals
    the plain cascade (keypoints + scoremap) within reassociation tolerance."""
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) - 0.5
    hs = jnp.tile(jnp.asarray([[1.0, 0.0]]), (2, 1))
    ref = net.inference(params, img, hs)
    got = net.inference(phase_pack_params(params), img, hs)
    np.testing.assert_allclose(
        np.asarray(got.keypoint_coord3d),
        np.asarray(ref.keypoint_coord3d),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got.hand_scoremap), np.asarray(ref.hand_scoremap), atol=1e-3
    )
