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


def test_tp4_grad_matches_single_device():
    """n_model=4 (VERDICT round-1, next-round #8): a ("data", "model")=(2, 4)
    mesh — TP over FOUR devices — reproduces the single-device gradient, and
    the 4-way channel shard actually happens."""
    params = {
        "conv": nn.conv_init(jax.random.PRNGKey(0), 3, 3, 8, 256),
        "fc": nn.dense_init(jax.random.PRNGKey(1), 256, 128),
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 16, 8))

    def loss(p, x):
        h = nn.conv2d_relu(x, p["conv"])
        h = jnp.mean(h, axis=(1, 2))
        return jnp.mean(nn.dense_relu(h, p["fc"]) ** 2)

    g_ref = jax.grad(loss)(params, x)
    mesh = make_mesh(2, 4)
    with mesh:
        p_sh = shard_params(mesh, params)
        x_sh = jax.device_put(x, batch_sharding(mesh))
        g_tp = jax.jit(jax.grad(loss))(p_sh, x_sh)
    for name in ("conv", "fc"):
        np.testing.assert_allclose(
            np.asarray(g_tp[name]["weights"]),
            np.asarray(g_ref[name]["weights"]),
            atol=1e-6,
        )
    spec = param_sharding(mesh, params)["conv"]["weights"].spec
    assert spec == P(None, None, None, "model")


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


class TestPipelineParallel:
    """GPipe PP over PoseNet's refinement units (parallel/pipeline.py)."""

    def _data(self, batch=16):
        from hand3d_tpu.models import posenet

        params = posenet.init(jax.random.PRNGKey(0))
        img = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3)) * 0.1
        gt = jax.random.uniform(jax.random.PRNGKey(2), (batch, 32, 32, 21))
        vis = (jax.random.uniform(jax.random.PRNGKey(3), (batch, 21)) > 0.3)
        return params, img, gt, vis.astype(jnp.float32)

    def test_stack_roundtrip(self):
        from hand3d_tpu.parallel import pipeline as pp

        params, _, _, _ = self._data()
        trunk, stacked = pp.stack_refinement_params(params)
        assert stacked["conv_1"]["weights"].shape[0] == pp.N_STAGES
        rebuilt = pp.unstack_refinement_params(trunk, stacked)
        assert set(rebuilt) == set(params)
        for k in params:
            np.testing.assert_array_equal(
                np.asarray(rebuilt[k]["weights"]), np.asarray(params[k]["weights"])
            )

    def test_loss_and_grads_match_sequential(self):
        """The GPipe schedule is mathematically identical to sequential
        execution: loss AND gradients equal the plain deep-supervision loss."""
        from hand3d_tpu.models import posenet
        from hand3d_tpu.parallel import pipeline as pp
        from hand3d_tpu.train.losses import posenet_scoremap_loss

        params, img, gt, vis = self._data()
        mesh = pp.make_pipeline_mesh(4, 2)
        trunk, stacked = pp.stack_refinement_params(params)
        # shard for real: stage-stacked params live on their stage's devices
        stacked = jax.device_put(stacked, pp.refine_param_sharding(mesh, stacked))
        loss_fn = pp.posenet_pipeline_loss(mesh, n_micro=2)

        ref = posenet_scoremap_loss(posenet.apply(params, img), gt, vis)
        got = jax.jit(loss_fn)(trunk, stacked, img, gt, vis)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

        g_ref = jax.grad(
            lambda p: posenet_scoremap_loss(posenet.apply(p, img), gt, vis)
        )(params)
        g_tr, g_st = jax.jit(
            jax.grad(lambda t, s: loss_fn(t, s, img, gt, vis), argnums=(0, 1))
        )(trunk, stacked)
        g_pp = pp.unstack_refinement_params(g_tr, g_st)
        for name in ("conv1_1", "conv4_7", "conv5_2", "conv6_1", "conv6_7",
                     "conv7_1", "conv7_7"):
            a = np.asarray(g_ref[name]["weights"])
            b = np.asarray(g_pp[name]["weights"])
            np.testing.assert_allclose(b, a, atol=1e-4 * max(1.0, np.abs(a).max()))

    def test_microbatch_counts_agree(self):
        """Different microbatch counts give the same loss (schedule-invariant)."""
        from hand3d_tpu.parallel import pipeline as pp

        params, img, gt, vis = self._data()
        mesh = pp.make_pipeline_mesh(4, 2)
        trunk, stacked = pp.stack_refinement_params(params)
        l1 = jax.jit(pp.posenet_pipeline_loss(mesh, n_micro=1))(
            trunk, stacked, img, gt, vis
        )
        l2 = jax.jit(pp.posenet_pipeline_loss(mesh, n_micro=2))(
            trunk, stacked, img, gt, vis
        )
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        # n_micro=4 (VERDICT round-1, next-round #8): a deeper microbatch
        # schedule (4 micro-batches of 4 through 2 stages) stays invariant
        l4 = jax.jit(pp.posenet_pipeline_loss(mesh, n_micro=4))(
            trunk, stacked, img, gt, vis
        )
        np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)


class TestExpertParallel:
    """Switch-style EP MoE dense layer (parallel/expert.py)."""

    def _setup(self, cf=4.0):
        from hand3d_tpu.parallel import expert as ep

        params = ep.moe_dense_init(jax.random.PRNGKey(0), 4, 64, 32)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 64))
        mesh = ep.make_expert_mesh(2, 4)
        p_sh = jax.device_put(params, ep.expert_param_sharding(mesh, params))
        return ep, params, p_sh, x, mesh, cf

    def test_matches_single_device_reference(self):
        """With ample capacity (no drops) the expert-parallel layer equals
        the unsharded reference exactly."""
        ep, params, p_sh, x, mesh, cf = self._setup()
        ref_out, _ = ep.moe_dense_reference(params, x, capacity_factor=cf)
        out, aux = jax.jit(
            lambda p, x: ep.moe_dense_apply(mesh, p, x, capacity_factor=cf)
        )(p_sh, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), atol=1e-5
        )
        assert np.isfinite(float(aux)) and float(aux) > 0

    def test_capacity_drops_zero_output(self):
        """Tokens beyond expert capacity produce exactly zero output rows
        (bounded-shape drop semantics), never garbage."""
        ep, params, _, x, _, _ = self._setup()
        # tiny capacity: many drops
        out, _ = ep.moe_dense_reference(params, x, capacity_factor=0.1)
        out = np.asarray(out)
        row_norm = np.abs(out).sum(axis=1)
        assert (row_norm == 0).sum() > 0  # some dropped
        assert (row_norm > 0).sum() > 0  # some processed

    def test_over_capacity_sharded_matches_per_shard_reference(self):
        """Over-capacity routing THROUGH THE SHARDED PATH (VERDICT round-1,
        next-round #8). Capacity is a PER-DEVICE-SHARD budget (routing is
        local — expert.py moe_dense_apply docstring), so the oracle is the
        unsharded reference applied per token slice: with 64 tokens on a
        (2, 4) mesh each device routes its 8 tokens into capacity
        ceil(8 * 0.25 / 4) = 1 slot per expert. The all_to_all
        dispatch/combine must reproduce that slice-wise result exactly —
        slots must not scramble across expert shards."""
        ep, params, p_sh, x, mesh, _ = self._setup(cf=0.25)
        out, aux = jax.jit(
            lambda p, x: ep.moe_dense_apply(mesh, p, x, capacity_factor=0.25)
        )(p_sh, x)
        out = np.asarray(out)
        n_shards = mesh.devices.size  # batch shards over ("data", "expert")
        t_local = x.shape[0] // n_shards
        expected = np.concatenate([
            np.asarray(ep.moe_dense_reference(
                params, x[i * t_local:(i + 1) * t_local],
                capacity_factor=0.25)[0])
            for i in range(n_shards)
        ])
        np.testing.assert_allclose(out, expected, atol=1e-5)
        row = np.abs(out).sum(axis=1)
        assert (row == 0).sum() > 0 and (row > 0).sum() > 0  # real drops
        # and the drop set is genuinely per-shard: the global-capacity
        # reference keeps a DIFFERENT token set at this pressure
        ref_global = np.asarray(
            ep.moe_dense_reference(params, x, capacity_factor=0.25)[0])
        assert ((np.abs(ref_global).sum(axis=1) == 0) != (row == 0)).any()
        assert np.isfinite(float(aux))

    def test_grads_flow_to_gate_and_experts(self):
        ep, params, p_sh, x, mesh, cf = self._setup()

        def loss(p):
            o, a = ep.moe_dense_apply(mesh, p, x, capacity_factor=cf)
            return jnp.mean(o**2) + 0.01 * a

        g = jax.jit(jax.grad(loss))(p_sh)
        assert np.abs(np.asarray(g["gate"]["weights"])).max() > 0
        assert np.abs(np.asarray(g["experts"]["weights"])).max() > 0
        # expert weights stay sharded over "expert" through the grad
        assert "expert" in str(g["experts"]["weights"].sharding.spec)

    def test_bf16_tokens_do_not_collide_capacity_slots(self):
        """Routing bookkeeping must run in f32: a bf16 cumsum rounds counts
        above 256, double-booking slots. Force 400 bf16 tokens onto one
        expert and check every capacity slot holds at most one token."""
        from hand3d_tpu.parallel import expert as ep

        params = ep.moe_dense_init(jax.random.PRNGKey(0), 4, 16, 8)
        # bias the gate so every token routes to expert 0
        params["gate"]["biases"] = jnp.asarray([100.0, 0.0, 0.0, 0.0])
        x = jax.random.normal(jax.random.PRNGKey(1), (400, 16)).astype(jnp.bfloat16)
        capacity = int(np.ceil(400 * 1.25 / 4))
        dispatch, _, _ = ep._route(params, x, capacity)
        per_slot = np.asarray(jnp.sum(dispatch.astype(jnp.float32), axis=0))
        assert per_slot.max() <= 1.0 + 1e-6
        # all capacity slots of expert 0 filled, none elsewhere
        assert per_slot[0].sum() == capacity
        assert per_slot[1:].sum() == 0
