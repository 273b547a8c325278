"""NN primitive tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hand3d_tpu.ops import nn


def test_leaky_relu():
    x = jnp.asarray([-2.0, -0.5, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(nn.leaky_relu(x)), [-0.02, -0.005, 0.0, 3.0], atol=1e-7
    )


def test_conv2d_same_identity():
    # 1x1 identity kernel passes input through plus bias
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    params = {
        "weights": jnp.eye(3).reshape(1, 1, 3, 3),
        "biases": jnp.full((3,), 0.5),
    }
    y = np.asarray(nn.conv2d(x, params))
    np.testing.assert_allclose(y, np.asarray(x) + 0.5, atol=1e-6)


def test_conv2d_matches_numpy_golden(rng):
    x = rng.rand(1, 5, 5, 2).astype(np.float32)
    w = rng.rand(3, 3, 2, 4).astype(np.float32)
    b = rng.rand(4).astype(np.float32)
    y = np.asarray(nn.conv2d(jnp.asarray(x), {"weights": jnp.asarray(w), "biases": jnp.asarray(b)}))
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((1, 5, 5, 4), np.float32)
    for i in range(5):
        for j in range(5):
            patch = xp[0, i : i + 3, j : j + 3, :]
            want[0, i, j] = np.tensordot(patch, w, axes=3) + b
    np.testing.assert_allclose(y, want, atol=1e-4)


def test_max_pool_2x2(rng):
    x = rng.rand(1, 4, 6, 1).astype(np.float32)
    y = np.asarray(nn.max_pool_2x2(jnp.asarray(x)))
    assert y.shape == (1, 2, 3, 1)
    assert y[0, 0, 0, 0] == x[0, 0:2, 0:2, 0].max()


def test_avg_pool_8x8_same():
    x = jnp.ones((1, 256, 256, 21))
    y = nn.avg_pool(x, 8)
    assert y.shape == (1, 32, 32, 21)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)


def test_dropout_train_and_eval(rng):
    x = jnp.ones((1000, 64))
    key = jax.random.PRNGKey(0)
    out_eval = nn.dropout(key, x, 0.8, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = np.asarray(nn.dropout(key, x, 0.8, train=True))
    kept = out_train > 0
    assert abs(kept.mean() - 0.8) < 0.02
    np.testing.assert_allclose(out_train[kept], 1.0 / 0.8, atol=1e-6)


def test_spatial_dropout_whole_channels():
    x = jnp.ones((4, 8, 8, 64))
    out = np.asarray(nn.spatial_dropout(jax.random.PRNGKey(1), x, 0.5, train=True))
    per_channel = out.reshape(4, 64, -1).max(-1) if False else out.transpose(0, 3, 1, 2).reshape(4, 64, -1)
    # each (sample, channel) plane is either fully zero or fully 1/keep
    mins = per_channel.min(-1)
    maxs = per_channel.max(-1)
    assert np.all((mins == maxs))


def test_initializer_shapes_and_bias_values():
    key = jax.random.PRNGKey(0)
    p = nn.conv_init(key, 3, 3, 16, 32)
    assert p["weights"].shape == (3, 3, 16, 32)
    np.testing.assert_allclose(np.asarray(p["biases"]), 1e-4)
    limit = np.sqrt(6.0 / (3 * 3 * 16 + 3 * 3 * 32))
    assert np.abs(np.asarray(p["weights"])).max() <= limit

    p = nn.dense_init(key, 100, 50)
    assert p["weights"].shape == (100, 50)


def test_bilinear_upconv_init_kernel():
    p = nn.bilinear_upconv_init(4, 2)
    w = np.asarray(p["weights"])
    assert w.shape == (4, 4, 2, 2)
    # cross-channel terms zero, diagonal is the bilinear stencil
    np.testing.assert_allclose(w[:, :, 0, 1], 0.0)
    np.testing.assert_allclose(w[:, :, 0, 0], w[:, :, 1, 1])
    assert abs(w[:, :, 0, 0].sum() - 4.0) < 1e-5  # bilinear kernel sums to (size/2)^2


def test_conv2d_transpose_bilinear_upsamples():
    """Transposed conv with the bilinear-init kernel performs 2x upsampling:
    a constant input stays constant in the interior."""
    params = nn.bilinear_upconv_init(4, 1)
    x = jnp.ones((1, 6, 6, 1))
    y = np.asarray(nn.conv2d_transpose(x, params, stride=2))
    assert y.shape == (1, 12, 12, 1)
    np.testing.assert_allclose(y[0, 3:-3, 3:-3, 0], 1.0, atol=1e-5)

    y_relu = np.asarray(nn.conv2d_transpose_relu(x, params, stride=2))
    np.testing.assert_allclose(y_relu, np.maximum(y, 0.01 * y), atol=1e-6)
