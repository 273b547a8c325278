"""Cross-framework parity: our JAX nets vs an independent PyTorch build.

Constructs the same networks in torch (CPU) from the same parameter trees
and compares outputs on random inputs. This validates layer wiring, TF-SAME
padding (including the asymmetric stride-2 case), pooling, flatten order and
activation choices against an implementation that shares no code with
hand3d_tpu — the closest available stand-in for bitwise checks against the
TF1 reference (TF itself is not installed in this environment).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from hand3d_tpu.models import handsegnet, posenet, poseprior  # noqa: E402


def tf_same_pad(x, k, s):
    """TF-SAME padding for NCHW torch tensors (asymmetric: extra at end)."""
    _, _, h, w = x.shape
    def pad_amount(size):
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        return total // 2, total - total // 2
    pt, pb = pad_amount(h)
    pl, pr = pad_amount(w)
    return F.pad(x, (pl, pr, pt, pb))


def t_conv(x, p, stride=1, relu=True):
    w = torch.from_numpy(np.asarray(p["weights"])).permute(3, 2, 0, 1)  # HWIO->OIHW
    b = torch.from_numpy(np.asarray(p["biases"]))
    k = w.shape[-1]
    x = tf_same_pad(x, k, stride)
    x = F.conv2d(x, w, b, stride=stride)
    if relu:
        x = torch.maximum(x, 0.01 * x)
    return x


def t_dense(x, p, relu=False):
    w = torch.from_numpy(np.asarray(p["weights"]))
    b = torch.from_numpy(np.asarray(p["biases"]))
    x = x @ w + b
    if relu:
        x = torch.maximum(x, 0.01 * x)
    return x


def to_torch(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def to_np(x_nchw):
    return x_nchw.permute(0, 2, 3, 1).numpy()


def test_handsegnet_matches_torch(rng):
    params = handsegnet.init(jax.random.PRNGKey(0))
    x = rng.rand(2, 48, 64, 3).astype(np.float32) - 0.5
    ours = np.asarray(handsegnet.apply(params, jnp.asarray(x))[0])

    with torch.no_grad():
        t = to_torch(x)
        for block, n in (("conv1", 2), ("conv2", 2), ("conv3", 4), ("conv4", 4)):
            for i in range(1, n + 1):
                t = t_conv(t, params[f"{block}_{i}"])
            if block != "conv4":
                t = F.max_pool2d(t, 2, 2)
        t = t_conv(t, params["conv5_1"])
        t = t_conv(t, params["conv5_2"])
        t = t_conv(t, params["conv6_1"])
        t = t_conv(t, params["conv6_2"], relu=False)
        # upsample with the TF1 asymmetric grid == align_corners=False?
        # torch's bilinear uses half-pixel centers, so compare pre-resize
    # compare the raw head at 1/8 resolution against ours re-computed pre-resize
    # by downsampling is lossy; instead compare our pre-resize map directly:
    from hand3d_tpu.ops import nn as jnn

    xx = jnp.asarray(x)
    for block, n in (("conv1", 2), ("conv2", 2), ("conv3", 4), ("conv4", 4)):
        for i in range(1, n + 1):
            xx = jnn.conv2d_relu(xx, params[f"{block}_{i}"])
        if block != "conv4":
            xx = jnn.max_pool_2x2(xx)
    xx = jnn.conv2d_relu(xx, params["conv5_1"])
    xx = jnn.conv2d_relu(xx, params["conv5_2"])
    xx = jnn.conv2d_relu(xx, params["conv6_1"])
    xx = jnn.conv2d(xx, params["conv6_2"])
    np.testing.assert_allclose(np.asarray(xx), to_np(t), atol=2e-4)
    assert ours.shape == (2, 48, 64, 2)


def test_posenet_matches_torch(rng):
    params = posenet.init(jax.random.PRNGKey(1))
    x = rng.rand(1, 32, 32, 3).astype(np.float32) - 0.5
    ours = [np.asarray(s) for s in posenet.apply(params, jnp.asarray(x))]

    with torch.no_grad():
        t = to_torch(x)
        for block, n in (("conv1", 2), ("conv2", 2), ("conv3", 4), ("conv4", 2)):
            for i in range(1, n + 1):
                t = t_conv(t, params[f"{block}_{i}"])
            if block != "conv4":
                t = F.max_pool2d(t, 2, 2)
        for i in range(3, 8):
            t = t_conv(t, params[f"conv4_{i}"])
        encoding = t
        t = t_conv(encoding, params["conv5_1"])
        sm = t_conv(t, params["conv5_2"], relu=False)
        score_list = [sm]
        for unit in (6, 7):
            t = torch.cat([score_list[-1], encoding], dim=1)
            for i in range(1, 6):
                t = t_conv(t, params[f"conv{unit}_{i}"])
            t = t_conv(t, params[f"conv{unit}_6"])
            score_list.append(t_conv(t, params[f"conv{unit}_7"], relu=False))

    for a, b in zip(ours, score_list):
        np.testing.assert_allclose(a, to_np(b), atol=2e-4)


def test_poseprior_matches_torch(rng):
    params = poseprior.init_poseprior(jax.random.PRNGKey(2))
    sm = rng.rand(2, 32, 32, 21).astype(np.float32)
    hand_side = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    ours = np.asarray(
        poseprior.apply_poseprior(params, jnp.asarray(sm), jnp.asarray(hand_side))
    )

    with torch.no_grad():
        t = to_torch(sm)
        for i in range(3):
            t = t_conv(t, params[f"conv_pose_{i}_1"], stride=1)
            t = t_conv(t, params[f"conv_pose_{i}_2"], stride=2)
        # NHWC flatten order (matches tf.reshape and our jnp.reshape)
        flat = torch.from_numpy(
            to_np(t).reshape(2, -1)
        )
        flat = torch.cat([flat, torch.from_numpy(hand_side)], dim=1)
        flat = t_dense(flat, params["fc_rel0"], relu=True)
        flat = t_dense(flat, params["fc_rel1"], relu=True)
        out = t_dense(flat, params["fc_xyz"]).numpy().reshape(2, 21, 3)

    np.testing.assert_allclose(ours, out, atol=2e-4)


def test_conv2d_transpose_matches_torch_asymmetric_kernel(rng):
    """tf.nn.conv2d_transpose semantics (gradient-of-conv, filter layout
    [kh, kw, out, in], general.py:77-78) on a spatially-asymmetric,
    non-diagonal kernel — the bilinear init is symmetric and would hide a
    kernel-flip/layout bug."""
    import jax.numpy as jnp
    from hand3d_tpu.ops import nn

    kh = kw = 4
    cin, cout, stride = 3, 5, 2
    w_tf = rng.randn(kh, kw, cout, cin).astype(np.float32)  # TF deconv layout
    b = rng.randn(cout).astype(np.float32)
    x = rng.randn(2, 6, 7, cin).astype(np.float32)

    got = np.asarray(
        nn.conv2d_transpose(
            jnp.asarray(x), {"weights": jnp.asarray(w_tf), "biases": jnp.asarray(b)},
            stride=stride,
        )
    )

    # torch conv_transpose2d: weight [in, out, kh, kw]; TF SAME with
    # stride=2, k=4 equals torch padding=1 (out = H*stride)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(np.transpose(w_tf, (3, 2, 0, 1)))
    ref = F.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=stride, padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert got.shape == ref.shape == (2, 12, 14, cout)
    np.testing.assert_allclose(got, ref, atol=1e-4)
