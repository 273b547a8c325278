"""Training checkpoints (save / resume / export).

The reference had two mechanisms (SURVEY.md §5): TF Saver snapshots every
5000 iters (training_posenet.py:92-95) whose optimizer state gets discarded
on load, and pickled name->ndarray dicts for distribution. Here:

  * full-state snapshots (params + optimizer moments + step) serialize the
    whole TrainState via flax.serialization msgpack, so training resumes
    exactly — including Adam moments, which the reference threw away;
  * ``export_params`` writes a params-only .npz interchangeable with
    hand3d_tpu.weights (the distribution format).
"""

import os
import re

from flax import serialization

from hand3d_tpu.train.trainer import TrainState
from hand3d_tpu.weights.convert import load_npz, save_npz

_SNAP_RE = re.compile(r"snapshot-(\d+)\.msgpack$")


def save_snapshot(directory, state, step=None, keep=1):
    """Write snapshot-<step>.msgpack into ``directory``; prune old ones.

    The write is atomic (tmp file + rename, fsynced): the training loop can
    be hard-killed mid-save (step watchdog, OOM-killer, preemption), and a
    truncated snapshot-<step>.msgpack would otherwise be what
    latest_snapshot() hands to --resume. Serialization (which fetches
    device arrays — the very operation a wedged device hangs in) happens
    before the final file ever exists.
    """
    assert keep >= 1, (
        f"keep={keep}: the snapshot being written must survive its own prune"
    )
    os.makedirs(directory, exist_ok=True)
    step = int(step if step is not None else state.step)
    path = os.path.join(directory, f"snapshot-{step}.msgpack")
    payload = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    # prune by step, but NEVER the snapshot just written — a stale
    # higher-step file from a longer prior run must not outlive it (it
    # would both delete this save and hijack the next --resume)
    others = [p for _, p in sorted_snapshots(directory) if p != path]
    for old_path in others[: max(0, len(others) - (keep - 1))]:
        os.remove(old_path)
    # sweep orphaned .tmp files left by hard kills mid-save (the prune
    # regex never matches them); safe under the loop's single-writer use
    for name in os.listdir(directory):
        if name.endswith(".msgpack.tmp"):
            try:
                os.remove(os.path.join(directory, name))
            except OSError:
                pass
    return path


def sorted_snapshots(directory):
    out = []
    if not os.path.isdir(directory):
        return out
    for name in os.listdir(directory):
        m = _SNAP_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, name)))
    return sorted(out)


def latest_snapshot(directory):
    snaps = sorted_snapshots(directory)
    return snaps[-1][1] if snaps else None


def restore_snapshot(path, template_state):
    """Restore a TrainState from ``path`` given a same-structure template."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template_state, f.read())


def load_snapshot_params(path):
    """Params-only read of a snapshot-<step>.msgpack, no template needed.

    The native analog of the reference's load_weights_from_snapshot
    (utils/general.py:614-651), which reads a TRAINING snapshot while
    discarding optimizer state ('Adam', 'global_step', 'beta' —
    eval2d.py:70-75): the raw msgpack tree is deserialized and only the
    params subtree returned, so a training snapshot can seed fine-tuning
    or eval without reconstructing the optimizer that produced it.
    """
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    return tree["params"]


def export_params(path, params):
    """Params-only export (.npz), loadable via hand3d_tpu.weights.load_npz."""
    save_npz(path, params)


def import_params(path):
    return load_npz(path)


def save_orbax(directory, state, step=None):
    """Ecosystem-interop checkpoint: write the TrainState as an Orbax
    (tensorstore/OCDBT) checkpoint at ``directory/<step>``.

    Use when other JAX tooling must read the training state, or on
    multi-host pods (Orbax coordinates a distributed save; the msgpack
    snapshots serialize through one host). For single-host training the
    msgpack path stays the default — smaller dependency surface, one file.
    """
    import orbax.checkpoint as ocp

    step = int(step if step is not None else state.step)
    path = os.path.abspath(os.path.join(directory, str(step)))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)
    return path


def restore_orbax(path, template_state):
    """Restore a save_orbax checkpoint into ``template_state``'s structure
    (shapes/dtypes validated by Orbax). Pass the directory of one step."""
    import jax
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            ocp.args.PyTreeRestore(
                jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                       template_state)
            ),
        )
    return TrainState(*restored)
