"""Mesh/sharding helpers (parallel/mesh.py), incl. the multi-slice layout."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from hand3d_tpu.ops import nn
from hand3d_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_multislice_mesh,
    param_sharding,
    shard_params,
)


def test_make_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2,
    }
    assert batch_sharding(mesh).spec == P("data")


def test_multislice_mesh_layout():
    """("slice", "data", "model"): batch shards over slice+data, TP never
    crosses a slice, and "model"-adjacent devices are contiguous (stand-in
    for co-located / ICI-connected on real hardware)."""
    mesh = make_multislice_mesh(2, 2, 2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "slice": 2, "data": 2, "model": 2,
    }
    assert batch_sharding(mesh).spec == P(("slice", "data"))
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    # device order groups model (last axis) most tightly, slices least
    assert ids[0, 0, 1] - ids[0, 0, 0] == 1
    assert ids[1, 0, 0] - ids[0, 0, 0] == 4


def test_param_sharding_covers_quantized_layout():
    """int8 layers must get the same TP layout as float ones: kernel +
    per-channel scale + biases all shard over "model" together."""
    from hand3d_tpu.ops.quant import quantize_params_int8

    params = {
        "wide": nn.conv_init(jax.random.PRNGKey(0), 3, 3, 256, 256),
        "narrow": nn.conv_init(jax.random.PRNGKey(1), 3, 3, 256, 64),
    }
    q = quantize_params_int8(params, min_in_chan=0)
    sh = param_sharding(make_mesh(4, 2), q)
    assert sh["wide"]["weights_q"].spec == P(None, None, None, "model")
    assert sh["wide"]["weight_scale"].spec == P("model")
    assert sh["wide"]["biases"].spec == P("model")
    # small out_dim stays fully replicated — consistently across all leaves
    assert sh["narrow"]["weights_q"].spec == P()
    assert sh["narrow"]["weight_scale"].spec == P()
    assert sh["narrow"]["biases"].spec == P()


def test_batch_shard_count_multislice():
    from hand3d_tpu.parallel.mesh import batch_shard_count

    assert batch_shard_count(make_mesh(4, 2)) == 4
    assert batch_shard_count(make_multislice_mesh(2, 2, 2)) == 4


def test_multislice_grad_matches_single_device():
    """A grad step on the multislice mesh equals the single-device grad."""
    params = {"fc": nn.dense_init(jax.random.PRNGKey(0), 256, 128)}
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256))

    def loss(p, x):
        return jnp.mean(nn.dense_relu(x, p["fc"]) ** 2)

    g_ref = jax.grad(loss)(params, x)
    mesh = make_multislice_mesh(2, 2, 2)
    with mesh:
        p_sh = shard_params(mesh, params)
        x_sh = jax.device_put(x, batch_sharding(mesh))
        g_ms = jax.jit(jax.grad(loss))(p_sh, x_sh)
    np.testing.assert_allclose(
        np.asarray(g_ms["fc"]["weights"]),
        np.asarray(g_ref["fc"]["weights"]),
        atol=1e-6,
    )
    # TP actually sharded the 128-wide output channel over "model"
    spec = param_sharding(mesh, params)["fc"]["weights"].spec
    assert spec == P(None, "model")
