"""Expert parallelism (EP): Switch-style top-1 MoE dense layer.

The reference model family has no mixture-of-experts layers anywhere
(SURVEY.md §2), so — like PP in parallel/pipeline.py — this is a framework
capability, not a port: it completes the DP/TP/SP/PP/EP axis set with the
TPU-idiomatic EP formulation and is exercised by
__graft_entry__.dryrun_multichip as an expert-parallel train step.

Design (the standard TPU recipe, cf. Switch Transformer / GShard):
  - Tokens shard over ("data", "expert") jointly — every device holds a
    distinct token slice; experts shard over "expert" — each device owns
    n_experts / n_expert_devices experts.
  - Routing is static-shape: top-1 gating, per-expert capacity
    C = ceil(tokens_per_device * capacity_factor / n_experts); tokens beyond
    an expert's capacity are dropped (their combine weight is zero), the
    standard bounded-shape trade.
  - Dispatch/combine are one-hot einsums (MXU work, no dynamic gathers —
    same trick as ops/image.py's crop), and the only communication is a pair
    of ragged-free all_to_alls over the "expert" axis.
  - The gate's softmax probability scales the expert output, so routing
    receives gradients; an auxiliary load-balancing loss (Switch eq. 4)
    keeps experts utilized.

Correctness is pinned by tests/test_parallel.py: the sharded layer equals
the single-device reference (moe_dense_reference) bit-for-bit in fp32, and
grads flow to gate + experts.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hand3d_tpu.ops import nn
from hand3d_tpu.parallel.mesh import DATA_AXIS

EXPERT_AXIS = "expert"


def make_expert_mesh(n_data=None, n_expert=2, devices=None):
    """("data", "expert") mesh: DP rows x expert-parallel columns."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_expert
    assert n_data * n_expert == len(devices), (
        f"expert mesh {n_data}x{n_expert} != {len(devices)} devices"
    )
    grid = np.asarray(devices).reshape(n_data, n_expert)
    return Mesh(grid, (DATA_AXIS, EXPERT_AXIS))


def moe_dense_init(key, n_experts, in_dim, out_dim):
    """Gate + stacked expert weights. Experts use the op library's xavier/1e-4
    init (ops/nn.py) so a 1-expert MoE initializes like a plain dense layer."""
    kg, ke = jax.random.split(key)
    expert_keys = jax.random.split(ke, n_experts)
    experts = [nn.dense_init(k, in_dim, out_dim) for k in expert_keys]
    return {
        "gate": nn.dense_init(kg, in_dim, n_experts),
        "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *experts),
    }


def _route(params, x, capacity):
    """Shared routing math: returns (dispatch [T, E, C], combine [T, E, C],
    aux_loss). T = tokens, E = experts, C = per-expert capacity.

    Bookkeeping (gate softmax, slot cumsum) runs in float32 regardless of
    the token dtype — a bf16 cumsum rounds integer counts above 256, which
    would silently double-book capacity slots."""
    n_experts = params["gate"]["weights"].shape[-1]
    w32 = params["gate"]["weights"].astype(jnp.float32)
    b32 = params["gate"]["biases"].astype(jnp.float32)
    logits = x.astype(jnp.float32) @ w32 + b32
    probs = jax.nn.softmax(logits, axis=-1)  # [T, E] f32
    choice = jnp.argmax(probs, axis=-1)  # [T]
    onehot = jax.nn.one_hot(choice, n_experts, dtype=jnp.float32)  # [T, E]
    # position of each token within its expert's queue
    position = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # [T, E], -1 if unrouted
    kept = (position >= 0) & (position < capacity)
    # slot index of the (single) chosen expert if kept, else 0 — harmless,
    # because dispatch is zeroed by the kept mask for dropped tokens
    pos = jnp.sum(jnp.where(kept, position, 0.0), axis=-1).astype(jnp.int32)
    pos_onehot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # [T, C]
    dispatch = (onehot * kept.astype(jnp.float32))[:, :, None] * pos_onehot[:, None, :]
    gate_val = jnp.sum(probs * onehot, axis=-1)  # [T]
    combine = dispatch * gate_val[:, None, None]
    # Switch load-balancing loss: E * sum_e fraction_e * mean_prob_e
    fraction = jnp.mean(onehot, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = n_experts * jnp.sum(fraction * mean_prob)
    return dispatch.astype(x.dtype), combine.astype(x.dtype), aux


def _expert_ffn(expert_params, xs):
    """xs [E_local, C', in] -> [E_local, C', out] through each local expert."""
    w, b = expert_params["weights"], expert_params["biases"]
    return jax.nn.relu(jnp.einsum("eci,eio->eco", xs, w) + b[:, None, :])


def moe_dense_reference(params, x, capacity_factor=1.25):
    """Single-device reference: identical routing/capacity math, no sharding.
    x [T, in] -> ([T, out], aux_loss)."""
    n_experts = params["gate"]["weights"].shape[-1]
    capacity = int(np.ceil(x.shape[0] * capacity_factor / n_experts))
    dispatch, combine, aux = _route(params, x, capacity)
    expert_in = jnp.einsum("tec,ti->eci", dispatch, x)
    expert_out = _expert_ffn(params["experts"], expert_in)
    return jnp.einsum("tec,eco->to", combine, expert_out), aux


def moe_dense_apply(mesh, params, x, capacity_factor=1.25):
    """Expert-parallel MoE dense layer over ``mesh`` (("data", "expert")).

    params: moe_dense_init output; expert weights should be device_put with
    expert_param_sharding (leading expert dim over "expert"). x [T, in]
    sharded over both axes. Returns ([T, out], aux_loss); numerics identical
    to moe_dense_reference on the same global batch IF routing is local —
    capacity applies per device shard, so exact equality holds when
    T_global/shards tokens route within capacity (tested); the dropped-token
    set differs from the unsharded layer otherwise, as in every production
    EP implementation.
    """
    n_expert_dev = mesh.shape[EXPERT_AXIS]
    n_experts = params["gate"]["weights"].shape[-1]
    assert n_experts % n_expert_dev == 0

    def local_fn(params, x):
        # x: this device's token slice [t, in]; params["experts"] leaves are
        # this device's expert slab [E_local, ...] (sharded by in_specs)
        capacity = int(np.ceil(x.shape[0] * capacity_factor / n_experts))
        gate_full = {"gate": params["gate"]}
        dispatch, combine, aux = _route(gate_full, x, capacity)
        expert_in = jnp.einsum("tec,ti->eci", dispatch, x)  # [E, C, in]
        # EP hand-off: split the expert dim across "expert" devices, gather
        # every device's slab for the experts we own along the capacity dim
        expert_in = lax.all_to_all(
            expert_in, EXPERT_AXIS, split_axis=0, concat_axis=1, tiled=True
        )  # [E_local, C * n_expert_dev, in]
        expert_out = _expert_ffn(params["experts"], expert_in)
        # return the processed slabs to their source devices
        expert_out = lax.all_to_all(
            expert_out, EXPERT_AXIS, split_axis=1, concat_axis=0, tiled=True
        )  # [E, C, out]
        out = jnp.einsum("tec,eco->to", combine, expert_out)
        # aux loss averaged over shards (each shard routed independently)
        aux = lax.pmean(aux, (DATA_AXIS, EXPERT_AXIS))
        return out, aux

    batch_spec = P((DATA_AXIS, EXPERT_AXIS))
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=({"gate": P(), "experts": P(EXPERT_AXIS)}, batch_spec),
        out_specs=(batch_spec, P()),
    )(params, x)


def expert_param_sharding(mesh, params):
    """Experts shard over "expert" (leading stacked dim); gate replicates."""
    rep = NamedSharding(mesh, P())
    exp = NamedSharding(mesh, P(EXPERT_AXIS))
    return {
        "gate": jax.tree.map(lambda _: rep, params["gate"]),
        "experts": jax.tree.map(lambda _: exp, params["experts"]),
    }
