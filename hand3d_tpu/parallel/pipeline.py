"""GPipe-style pipeline parallelism (PP) over PoseNet's refinement stack.

The reference is strictly single-device (SURVEY.md §2.6), so PP — like DP,
TP and SP in parallel/mesh.py — is a framework capability, not a port. The
natural pipeline unit in this model family is PoseNet's recurrent
refinement stack (nets/ColorHandPose3DNetwork.py:200-217): the two units
are structurally identical (concat(scoremap, encoding) -> 5x 7x7x128 ->
1x1x128 -> 1x1x21), so their parameters stack along a leading "stage"
dimension and shard over a ("data", "stage") mesh — each stage's weights
live only on its own devices, the TPU-idiomatic equivalent of per-stage
weight placement in GPU pipeline runtimes.

Schedule (per data-parallel row of the mesh):
  1. The heterogeneous prologue (encoder + initial 1x1 head,
     posenet.apply_trunk) runs batch-sharded over BOTH mesh axes — no
     redundant compute during the pipeline fill.
  2. Activations re-layout once: an all-gather over "stage" gives stage 0
     its microbatch queue (and every stage the ground truth it needs for
     its deep-supervision loss term).
  3. A lax.scan runs the GPipe schedule: at tick t, stage s processes
     microbatch (t - s) and ppermutes its output scoremap (plus the
     pass-through encoding) to stage s+1. n_micro + n_stages - 1 ticks
     drain the pipe; bubble fraction = (S-1)/(M+S-1).
  4. Each stage accumulates its own loss numerator; two psums at the end
     produce the replicated scalar loss.

The schedule is mathematically identical to sequential execution — the
equivalence (loss AND gradients vs the plain posenet_scoremap_loss) is
tested in tests/test_parallel.py. The backward pass needs no hand-written
schedule: jax differentiates through scan + ppermute + all_gather, yielding
the reverse pipeline (grads ppermute stage s -> s-1, all_gather transposes
to reduce-scatter) automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hand3d_tpu.models import posenet
from hand3d_tpu.ops.image import resize_bilinear
from hand3d_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"
N_STAGES = posenet.NUM_REFINEMENT_UNITS
_N_REFINE_LAYERS = 7


def make_pipeline_mesh(n_data=None, n_stage=N_STAGES, devices=None):
    """("data", "stage") mesh: DP rows x PP stages.

    Stages exchange one 32x32x(128+21) activation per microbatch per tick —
    point-to-point ppermute traffic that rides a single ICI hop when the
    stage axis maps to physically adjacent chips (device order from
    jax.devices() makes the innermost axis neighbor-contiguous).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_stage
    assert n_data * n_stage == len(devices), (
        f"pipeline mesh {n_data}x{n_stage} != {len(devices)} devices"
    )
    grid = np.asarray(devices).reshape(n_data, n_stage)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def _unit_layer_names(unit):
    """Reference-layout names of refinement unit ``unit`` (conv6_*/conv7_*)."""
    return [f"conv{unit + 6}_{i}" for i in range(1, _N_REFINE_LAYERS + 1)]


def stack_refinement_params(params):
    """Split flat PoseNet params into (trunk, stage-stacked refinement).

    trunk: encoder + initial head, unchanged. stacked: {"conv_i": leaves of
    shape [n_stages, ...]} — the leading axis shards over "stage". Inverse:
    unstack_refinement_params.
    """
    refine_names = {n for u in range(N_STAGES) for n in _unit_layer_names(u)}
    trunk = {k: v for k, v in params.items() if k not in refine_names}
    stacked = {}
    for i in range(1, _N_REFINE_LAYERS + 1):
        units = [params[f"conv{u + 6}_{i}"] for u in range(N_STAGES)]
        stacked[f"conv_{i}"] = jax.tree.map(lambda *xs: jnp.stack(xs), *units)
    return trunk, stacked


def unstack_refinement_params(trunk, stacked):
    """Rebuild the flat reference-layout PoseNet param dict."""
    params = dict(trunk)
    for u in range(N_STAGES):
        for i in range(1, _N_REFINE_LAYERS + 1):
            params[f"conv{u + 6}_{i}"] = jax.tree.map(
                lambda x: x[u], stacked[f"conv_{i}"]
            )
    return params


def refine_param_sharding(mesh, stacked):
    """NamedSharding tree for the stage-stacked refinement params."""
    sh = NamedSharding(mesh, P(STAGE_AXIS))
    return jax.tree.map(lambda _: sh, stacked)


def _ordered_layers(stacked_local):
    return [stacked_local[f"conv_{i}"] for i in range(1, _N_REFINE_LAYERS + 1)]


def _loss_numerator(pred, gt, vis):
    """Numerator of one head's term of posenet_scoremap_loss (train/losses.py):
    sum over (samples, keypoints) of vis * sqrt(mean_px((pred - gt)^2)).
    Split from the full-batch denominator so microbatch contributions add up
    to exactly the sequential loss."""
    pred = resize_bilinear(pred, gt.shape[1:3])
    per_kp = jnp.sqrt(jnp.mean(jnp.square(pred - gt), axis=(1, 2)))
    return jnp.sum(vis.astype(jnp.float32) * per_kp)


def posenet_pipeline_loss(mesh, n_micro, compute_dtype=None):
    """Build the pipelined PoseNet training loss over ``mesh``.

    Returns loss_fn(trunk, stacked, image_crop, scoremap_gt, keypoint_vis)
    -> scalar, equal to posenet_scoremap_loss(posenet.apply(...), ...) of
    train/losses.py (deep supervision over all three heads), but executed
    with the refinement units pipeline-parallel over the "stage" axis.
    Differentiable. Batch sizing: the global batch must be divisible by
    n_data * n_stage (the prologue shards over both axes), and the resulting
    per-data-row batch (global / n_data) by n_micro.
    """
    n_stage = mesh.shape[STAGE_AXIS]
    assert n_stage == N_STAGES, (
        f"mesh stage axis {n_stage} != {N_STAGES} refinement units"
    )
    perm = [(i, i + 1) for i in range(n_stage - 1)]

    def local_fn(trunk, stacked_local, image, gt, vis):
        # stacked_local leaves are [1, ...] (this device's stage); drop the
        # stage dim to get one unit's params
        rparams = _ordered_layers(jax.tree.map(lambda x: x[0], stacked_local))
        s = lax.axis_index(STAGE_AXIS)

        # -- prologue: batch sharded over (data, stage), full utilization
        encoding, sm0 = posenet.apply_trunk(
            trunk, image, compute_dtype=compute_dtype
        )
        num0 = _loss_numerator(sm0, gt, vis)
        denom = (
            lax.psum(jnp.sum(vis.astype(jnp.float32)), (DATA_AXIS, STAGE_AXIS))
            + 0.001
        )

        # -- re-layout: every stage needs gt/vis for its own loss term;
        # stage 0 consumes the encoding/scoremap queues
        enc_q, sm_q, gt_q, vis_q = (
            lax.all_gather(x, STAGE_AXIS, axis=0, tiled=True)
            for x in (encoding, sm0, gt, vis)
        )
        b_row = enc_q.shape[0]  # per-data-row batch
        assert b_row % n_micro == 0, (
            f"per-row batch {b_row} not divisible by n_micro={n_micro}"
        )
        mb = b_row // n_micro

        def to_queue(x):
            return x.reshape((n_micro, mb) + x.shape[1:])

        enc_q, sm_q, gt_q, vis_q = map(to_queue, (enc_q, sm_q, gt_q, vis_q))

        def tick(carry, t):
            buf_enc, buf_sm, num_acc = carry
            m = jnp.clip(t - s, 0, n_micro - 1)
            active = jnp.logical_and(t - s >= 0, t - s < n_micro)
            first = s == 0
            # stage 0 pulls from its queue; later stages use the buffer
            # ppermuted in by the previous tick
            in_enc = jnp.where(
                first, lax.dynamic_index_in_dim(enc_q, m, keepdims=False), buf_enc
            )
            in_sm = jnp.where(
                first, lax.dynamic_index_in_dim(sm_q, m, keepdims=False), buf_sm
            )
            sm_new = posenet.apply_refinement_unit(
                rparams, in_sm, in_enc, compute_dtype=compute_dtype
            )
            num = _loss_numerator(
                sm_new,
                lax.dynamic_index_in_dim(gt_q, m, keepdims=False),
                lax.dynamic_index_in_dim(vis_q, m, keepdims=False),
            )
            num_acc = num_acc + jnp.where(active, num, 0.0)
            # hand off to the next stage (the last stage's send drops; the
            # first stage receives zeros it never reads)
            out_enc = lax.ppermute(in_enc, STAGE_AXIS, perm)
            out_sm = lax.ppermute(sm_new, STAGE_AXIS, perm)
            return (out_enc, out_sm, num_acc), ()

        # the loss accumulator becomes varying over the mesh (per-stage math),
        # so mark the constant initial value varying for scan's type check;
        # the buffers are already varying (derived from sharded data)
        init = (
            jnp.zeros_like(enc_q[0]),
            jnp.zeros_like(sm_q[0]),
            lax.pcast(jnp.float32(0.0), (DATA_AXIS, STAGE_AXIS), to="varying"),
        )
        n_ticks = n_micro + n_stage - 1
        (_, _, num_acc), _ = lax.scan(tick, init, jnp.arange(n_ticks))

        total = lax.psum(num0 + num_acc, (DATA_AXIS, STAGE_AXIS))
        return total / denom

    batch_spec = P((DATA_AXIS, STAGE_AXIS))
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(STAGE_AXIS), batch_spec, batch_spec, batch_spec),
        out_specs=P(),
    )
