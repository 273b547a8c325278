"""Device-mesh + sharding helpers (the framework's scale-out layer).

The reference is strictly single-device (SURVEY.md §2.6: one tf.Session, no
collectives). Here scale-out is expressed the TPU way: a 2D
("data", "model") jax.sharding.Mesh; the batch axis shards over "data"
(pure DP — gradients all-reduce over ICI automatically via GSPMD) and the
wide conv/FC output channels optionally shard over "model" (tensor
parallelism; XLA inserts the all-gathers/psums). These CNNs are small enough
that DP is the right production strategy, but the TP rules keep the whole
param tree shardable so the same train step runs on any mesh shape — this is
what __graft_entry__.dryrun_multichip exercises.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"

# output-channel dims smaller than this stay replicated (sharding tiny layers
# costs more in collectives than it saves)
_MIN_SHARD_DIM = 128


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, auto=False):
    """Multi-host bring-up: call ONCE at program start on every host of a
    multi-host pod/slice before any other jax use, then build meshes over
    the global `jax.devices()` as usual.

    Thin wrapper over jax.distributed.initialize. Two ways in:
      * ``init_distributed(auto=True)`` — cluster auto-detection (Cloud
        TPU metadata, SLURM/OMPI env). Explicit because auto-detection on
        a plain single machine raises.
      * explicit ``coordinator_address``/``num_processes``/``process_id``.

    With neither (all defaults) it is a no-op single-process bring-up.
    Returns (process_index, process_count); the data pipeline picks the
    same values up automatically for per-process dataset sharding.
    """
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    if auto or explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a ("data", "model") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(n_slices, n_data=None, n_model=1, devices=None):
    """("slice", "data", "model") mesh for multi-slice (DCN-connected) pods.

    Slices of a multi-slice TPU deployment are joined by DCN, which is an
    order of magnitude slower than the ICI inside a slice — so the axis
    layout keeps everything bandwidth-hungry inside a slice: the batch
    shards over ("slice", "data") (pure DP across slices; the only
    cross-slice traffic is the per-step gradient all-reduce) and tensor
    parallelism ("model") never crosses a slice boundary. Device order from
    jax.devices() groups co-located devices first, so reshaping
    (n_slices, n_data, n_model) maps "model"/"data" to nearby devices.

    In this repo the topology is validated structurally (virtual CPU
    devices have no DCN); the sharding/collective layout is what transfers
    to a real multi-slice deployment.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_slices * n_model)
    assert n_slices * n_data * n_model == len(devices), (
        f"mesh {n_slices}x{n_data}x{n_model} != {len(devices)} devices"
    )
    grid = np.asarray(devices).reshape(n_slices, n_data, n_model)
    return Mesh(grid, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over "data" (and "slice" if present)."""
    if SLICE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((SLICE_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shard_count(mesh):
    """How many ways batch_sharding(mesh) splits the leading axis."""
    n = mesh.shape[DATA_AXIS]
    if SLICE_AXIS in mesh.axis_names:
        n *= mesh.shape[SLICE_AXIS]
    return n


def replicate(mesh):
    return NamedSharding(mesh, P())


def _spec_for_param(path, value, model_size):
    """Tensor-parallel PartitionSpec for one parameter.

    Conv kernels [kh, kw, in, out] and dense kernels [in, out] shard their
    output channel over "model" when it is large and divisible; biases and
    per-channel quantization scales follow their kernel. Covers both the
    float layout ({"weights", "biases"}) and the int8 layout
    ({"weights_q", "weight_scale", "biases"}, ops.quant). Everything else
    is replicated.
    """
    if model_size <= 1:
        return P()
    leaf = path[-1]
    out_dim = value.shape[-1]
    if out_dim < _MIN_SHARD_DIM or out_dim % model_size != 0:
        return P()
    if leaf in ("weights", "weights_q") and value.ndim == 4:
        return P(None, None, None, MODEL_AXIS)
    if leaf in ("weights", "weights_q") and value.ndim == 2:
        return P(None, MODEL_AXIS)
    if leaf in ("biases", "weight_scale") and value.ndim == 1:
        return P(MODEL_AXIS)
    return P()


def param_sharding(mesh, params):
    """NamedSharding tree matching ``params`` (TP over "model" where useful)."""
    model_size = mesh.shape[MODEL_AXIS]

    def to_sharding(path, value):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(mesh, _spec_for_param(keys, value, model_size))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh, params):
    """device_put the tree with its TP sharding."""
    return jax.device_put(params, param_sharding(mesh, params))


def spatial_constrainer(mesh):
    """Spatial partitioning (SP): constrain [B, H, W, C] activations to shard
    H over "model" (and batch over "data"). GSPMD inserts the halo exchanges
    SAME-padded convs need at shard boundaries. Pass the returned callable as
    ``constrain=`` to handsegnet/posenet.apply; useful when a single sample's
    activations exceed one chip (large inputs) — for the reference's 256²
    shapes DP alone is faster, so this is opt-in."""
    sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain
