"""Training-loop integration: fit() on synthetic data, snapshots, resume."""

import os

import numpy as np
import jax

from hand3d_tpu.data.config import PreprocessConfig
from hand3d_tpu.data.pipeline import InputPipeline
from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.models import posenet
from hand3d_tpu.models.poseprior import PosePriorNetwork
from hand3d_tpu.train import lifting_loss, make_optimizer, posenet_scoremap_loss
from hand3d_tpu.train.checkpoints import (
    export_params,
    import_params,
    latest_snapshot,
    restore_snapshot,
    save_snapshot,
    sorted_snapshots,
)
from hand3d_tpu.train.loop import fit
from hand3d_tpu.train.trainer import init_state

from fixtures import make_rhd_bin


def _dataset(tmp_path):
    path = tmp_path / "rhd.bin"
    make_rhd_bin(path, num_records=4)
    return RHDDataset("training", path=str(path))


def test_fit_posenet_snapshots_and_resume(tmp_path):
    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False)
    pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=0)

    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    optimizer = make_optimizer([1e-4], [])

    def loss_fn(params, batch, key):
        preds = posenet.apply(params[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"], batch["keypoint_vis21"])

    snap_dir = str(tmp_path / "snaps")
    state = fit(
        loss_fn, params, optimizer, pipeline, max_iter=3,
        snapshot_dir=snap_dir, snapshot_freq=2, show_loss_freq=0,
        log=lambda *a: None,
    )
    assert int(state.step) == 3
    snaps = sorted_snapshots(snap_dir)
    assert [s for s, _ in snaps] == [3]  # keep=1 pruning kept only the final

    # resume continues from the stored step
    state2 = fit(
        loss_fn, params, optimizer, pipeline, max_iter=5,
        snapshot_dir=snap_dir, snapshot_freq=100, resume=True,
        show_loss_freq=0, log=lambda *a: None,
    )
    assert int(state2.step) == 5

    # full state round trip preserves optimizer moments
    template = init_state(params, optimizer)
    restored = restore_snapshot(latest_snapshot(snap_dir), template)
    assert int(restored.step) == 5
    mu = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.any(np.asarray(m) != 0) for m in mu if hasattr(m, "shape"))


def test_fit_lifting_proposed_runs(tmp_path):
    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(
        hand_crop=True, use_wrist_coord=False,
        coord_uv_noise=True, crop_center_noise=True,
        crop_offset_noise=True, crop_scale_noise=True,
    )
    pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=0)
    net = PosePriorNetwork("proposed")
    params = net.init(jax.random.PRNGKey(0))

    def loss_fn(params, batch, key):
        out = net.apply(params, batch["scoremap"], batch["hand_side"],
                        train=True, key=key)
        return lifting_loss("proposed", out, batch)

    state = fit(
        loss_fn, params, make_optimizer([1e-5], []), pipeline, max_iter=2,
        show_loss_freq=0, log=lambda *a: None,
    )
    assert int(state.step) == 2


def test_step_watchdog_aborts_on_hang(tmp_path):
    """A hang (wedged device RPC / stuck collective) must abort the process
    with the watchdog's exit code so a supervisor can restart + --resume."""
    import subprocess
    import sys

    script = tmp_path / "hang.py"
    script.write_text(
        """
import time
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import optax
from hand3d_tpu.train.loop import fit

class HangingPipeline:
    def iterate(self, epochs=None):
        yield {"x": jnp.zeros((1,))}
        time.sleep(3600)  # simulates a wedged fetch/collective

def loss_fn(params, batch, key):
    return jnp.sum(params["w"] * batch["x"])

fit(loss_fn, {"w": jnp.ones((1,))}, optax.sgd(0.1), HangingPipeline(),
    max_iter=5, show_loss_freq=0, snapshot_freq=0, step_timeout=2.0)
"""
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=120, cwd=repo_root, env=env,
    )
    assert proc.returncode == 17, (proc.returncode, proc.stderr[-500:])
    assert "step watchdog" in proc.stdout + proc.stderr


def test_step_watchdog_disarms_after_fit(tmp_path):
    """After fit() returns, the watchdog must not kill the process — eval,
    export, or a second fit commonly run next."""
    import subprocess
    import sys

    script = tmp_path / "disarm.py"
    script.write_text(
        """
import time
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import optax
from hand3d_tpu.train.loop import fit

class Pipeline:
    def iterate(self, epochs=None):
        while True:
            yield {"x": jnp.ones((1,))}

def loss_fn(params, batch, key):
    return jnp.sum(params["w"] * batch["x"]) ** 2

fit(loss_fn, {"w": jnp.ones((1,))}, optax.sgd(0.1), Pipeline(),
    max_iter=3, show_loss_freq=0, snapshot_freq=0, step_timeout=2.0)
time.sleep(4.0)  # longer than step_timeout: a live watchdog would fire
print("ALIVE")
"""
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=120, cwd=repo_root, env=dict(os.environ, PYTHONPATH=repo_root),
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-500:])
    assert "ALIVE" in proc.stdout


def test_snapshot_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-serialization must not leave a truncated latest snapshot."""
    import optax
    from flax import serialization
    from hand3d_tpu.train import checkpoints
    from hand3d_tpu.train.trainer import init_state

    params = {"w": np.ones((4,), np.float32)}
    state = init_state(params, optax.sgd(0.1))
    good = checkpoints.save_snapshot(str(tmp_path), state, step=1)

    def boom(_):
        raise RuntimeError("simulated hang/kill during serialization")

    monkeypatch.setattr(serialization, "to_bytes", boom)
    try:
        checkpoints.save_snapshot(str(tmp_path), state, step=2)
    except RuntimeError:
        pass
    # the failed save must not have produced snapshot-2; latest is intact
    assert checkpoints.latest_snapshot(str(tmp_path)) == good
    restored = checkpoints.restore_snapshot(good, init_state(params, optax.sgd(0.1)))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), params["w"])


def test_export_import_params(tmp_path):
    params = {"PoseNet2D": posenet.init(jax.random.PRNGKey(0))}
    path = str(tmp_path / "params.npz")
    export_params(path, params)
    back = import_params(path)
    np.testing.assert_array_equal(
        np.asarray(params["PoseNet2D"]["conv1_1"]["weights"]),
        back["PoseNet2D"]["conv1_1"]["weights"],
    )


def test_snapshot_loads_as_weights_for_warm_start(tmp_path):
    """A training snapshot feeds --weights directly: params come back with
    optimizer state dropped (the reference's load_weights_from_snapshot
    semantics, utils/general.py:614-651), merged by scope so the overfit
    gate's joint warm-start (tools/overfit_check.py) works."""
    import optax
    from hand3d_tpu.cli._common import load_weight_trees
    from hand3d_tpu.train import checkpoints
    from hand3d_tpu.train.trainer import init_state

    params = {"PoseNet2D": posenet.init(jax.random.PRNGKey(0))}
    state = init_state(params, optax.adam(1e-4))
    path = checkpoints.save_snapshot(str(tmp_path), state, step=7)
    tree = load_weight_trees([path])
    assert set(tree) == {"PoseNet2D"}
    np.testing.assert_array_equal(
        np.asarray(params["PoseNet2D"]["conv1_1"]["weights"]),
        tree["PoseNet2D"]["conv1_1"]["weights"],
    )


def test_fused_train_step_matches_unfused_losslessly(tmp_path):
    """fuse_preprocess(loss) over raw records == loss over preprocessed
    features when the preprocessing is deterministic (no aug)."""
    import jax.numpy as jnp
    from hand3d_tpu.data.preprocess import preprocess_rhd
    from hand3d_tpu.train.trainer import fuse_preprocess

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           crop_size=32)

    def loss_fn(params, batch, key):
        preds = posenet.apply(params[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"],
                                     batch["keypoint_vis21"])

    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    raw = {k: jnp.asarray(v) for k, v in dataset.raw_batch([0, 1]).items()}
    batch = preprocess_rhd(cfg, raw)
    key = jax.random.PRNGKey(5)

    plain = float(loss_fn(params, batch, key))
    fused = float(fuse_preprocess(loss_fn, preprocess_rhd, cfg)(params, raw, key))
    np.testing.assert_allclose(plain, fused, rtol=1e-6)


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 must equal the unaccumulated step exactly for a loss
    that is a mean over samples (grad-average == full-batch grad)."""
    import jax.numpy as jnp
    import optax
    from hand3d_tpu.train.trainer import make_train_step

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(2, 3), jnp.float32)}
    batch = {
        "x": jnp.asarray(rng.randn(8, 3), jnp.float32),
        "y": jnp.asarray(rng.randn(8, 2), jnp.float32),
    }

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"].T
        return jnp.mean((pred - batch["y"]) ** 2)

    opt = optax.adam(1e-2)
    key = jax.random.PRNGKey(3)

    def run(**kw):
        state = init_state(params, opt)
        step = make_train_step(loss_fn, opt, donate=False, **kw)
        new_state, metrics = step(state, batch, key)
        return np.asarray(new_state.params["w"]), float(metrics["loss"])

    w_full, loss_full = run()
    w_acc, loss_acc = run(accum_steps=4)
    np.testing.assert_allclose(loss_acc, loss_full, rtol=1e-6)
    np.testing.assert_allclose(w_acc, w_full, atol=1e-6)

    # composes with remat
    w_remat, _ = run(accum_steps=2, remat=True)
    np.testing.assert_allclose(w_remat, w_full, atol=1e-6)

    # indivisible batch must fail loudly at trace time
    import pytest

    with pytest.raises(AssertionError, match="divisible"):
        run(accum_steps=3)


def test_joint_finetune_grads_reach_both_stages(tmp_path):
    """train_joint's loss must backprop through the lifting nets INTO
    PoseNet (the point of joint fine-tuning: lifting sees predicted, not
    GT, scoremaps)."""
    import jax.numpy as jnp
    from hand3d_tpu.cli.train_joint import make_joint_loss
    from hand3d_tpu.data.config import PreprocessConfig
    from hand3d_tpu.data.preprocess import preprocess_rhd

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           crop_size=32)
    raw = {k: jnp.asarray(v) for k, v in dataset.raw_batch([0, 1]).items()}
    batch = preprocess_rhd(cfg, raw)

    loss_fn, prior = make_joint_loss("proposed", 1.0, 1.0)
    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    params.update(prior.init(jax.random.PRNGKey(1)))

    key = jax.random.PRNGKey(2)
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
    assert np.isfinite(float(loss))
    for scope in ("PoseNet2D", "PosePrior", "ViewpointNet"):
        total = sum(
            float(np.abs(np.asarray(g)).sum())
            for g in jax.tree_util.tree_leaves(grads[scope])
        )
        assert total > 0.0, f"no gradient reached {scope}"

    # w3d=0 must cut the lifting gradient into PoseNet down to the pure-2d
    # loss, and leave the lifting nets without any gradient at all
    loss_fn_2d, _ = make_joint_loss("proposed", 1.0, 0.0)
    g2d = jax.grad(loss_fn_2d)(params, batch, key)
    assert sum(
        float(np.abs(np.asarray(g)).sum())
        for g in jax.tree_util.tree_leaves(g2d["PosePrior"])
    ) == 0.0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Ecosystem interop: TrainState survives an Orbax save/restore
    (params + Adam moments + step)."""
    import jax.numpy as jnp
    import optax
    from hand3d_tpu.train import checkpoints as C

    params = {"lin": {"w": jnp.arange(6.0).reshape(2, 3),
                      "b": jnp.ones((2,))}}
    opt = optax.adam(1e-3)
    state = init_state(params, opt)
    # one update so the moments are nonzero
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    up, os_ = opt.update(g, state.opt_state, state.params)
    state = state._replace(params=optax.apply_updates(state.params, up),
                           opt_state=os_, step=state.step + 1)

    path = C.save_orbax(str(tmp_path / "orbax"), state)
    back = C.restore_orbax(path, init_state(params, opt))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_watchdog_suspended_during_eval(tmp_path):
    """An in-training eval longer than step_timeout must NOT trip the hang
    watchdog (it is suspended for the eval and re-armed after)."""
    import subprocess
    import sys

    script = tmp_path / "slow_eval.py"
    script.write_text(
        """
import time
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import optax
from hand3d_tpu.train.loop import fit

class Pipeline:
    def iterate(self, epochs=None):
        while True:
            yield {"x": jnp.ones((1,))}

def loss_fn(params, batch, key):
    return jnp.sum(params["w"] * batch["x"]) * 1e-3

def eval_fn(state, step):
    time.sleep(3.0)  # longer than step_timeout
    return {"metric": 1.0}

fit(loss_fn, {"w": jnp.ones((1,))}, optax.sgd(0.1), Pipeline(),
    max_iter=4, show_loss_freq=0, snapshot_freq=0, step_timeout=1.5,
    eval_fn=eval_fn, eval_freq=2)
print("COMPLETED-OK")
"""
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=120, cwd=repo_root, env=env,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-500:])
    assert "COMPLETED-OK" in proc.stdout


def test_sigterm_snapshots_and_stops(tmp_path):
    """Preemption safety: SIGTERM mid-training saves a snapshot and exits
    cleanly; --resume picks up from it."""
    import signal
    import subprocess
    import sys
    import time as time_mod

    snap_dir = tmp_path / "snaps"
    script = tmp_path / "train.py"
    script.write_text(
        f"""
import jax
import jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import optax
from hand3d_tpu.train.loop import fit

class Pipeline:
    def iterate(self, epochs=None):
        import time
        while True:
            time.sleep(0.05)
            yield {{"x": jnp.ones((1,))}}

def loss_fn(params, batch, key):
    return jnp.sum(params["w"] * batch["x"]) * 1e-3

print("READY", flush=True)
state = fit(loss_fn, {{"w": jnp.ones((1,))}}, optax.sgd(0.1), Pipeline(),
            max_iter=100000, show_loss_freq=0, snapshot_freq=0,
            snapshot_dir={str(snap_dir)!r})
print("RETURNED-STEP", int(state.step), flush=True)
"""
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.Popen(
        [sys.executable, str(script)], stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, cwd=repo_root, env=env,
    )
    assert "READY" in proc.stdout.readline()
    time_mod.sleep(3.0)  # let a few steps run
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, (proc.returncode, out[-500:])
    assert "saving snapshot" in out and "RETURNED-STEP" in out
    snaps = sorted_snapshots(str(snap_dir))
    assert snaps, out[-500:]


def test_training_is_deterministic(tmp_path):
    """Same seed + data -> bitwise-identical params after fit() (explicit
    keyed RNG everywhere; no hidden stateful randomness)."""
    import jax.numpy as jnp

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           crop_size=32, coord_uv_noise=True)

    def run():
        pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=5)
        params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(5))}

        def loss_fn(p, batch, key):
            preds = posenet.apply(p[posenet.SCOPE], batch["image_crop"])
            return posenet_scoremap_loss(preds, batch["scoremap"],
                                         batch["keypoint_vis21"])

        state = fit(loss_fn, params, make_optimizer([1e-4, 1e-5], [10]),
                    pipeline, max_iter=3, seed=5, show_loss_freq=0,
                    snapshot_freq=0)
        return state.params

    p1, p2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_policy_matches_plain_step():
    """remat='dots_saveable' (keep MXU outputs, recompute elementwise) must
    produce the same update as no remat; unknown policy names fail loudly."""
    import jax.numpy as jnp
    import optax
    import pytest
    from hand3d_tpu.train.trainer import make_train_step

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32)}
    batch = {"x": jnp.asarray(rng.randn(6, 3), jnp.float32),
             "y": jnp.asarray(rng.randn(6, 4), jnp.float32)}

    def loss_fn(p, b, key):
        return jnp.mean((jnp.tanh(b["x"] @ p["w"].T) - b["y"]) ** 2)

    opt = optax.adam(1e-2)
    key = jax.random.PRNGKey(0)

    def run(**kw):
        state = init_state(params, opt)
        new, _ = make_train_step(loss_fn, opt, donate=False, **kw)(
            state, batch, key)
        return np.asarray(new.params["w"])

    np.testing.assert_allclose(run(remat="dots_saveable"), run(), atol=1e-6)
    with pytest.raises(AssertionError, match="unknown remat policy"):
        run(remat="not_a_policy")


def test_resume_matches_uninterrupted_run(tmp_path):
    """Exact resume: stop at step 3, resume to 6 — final params must be
    BITWISE identical to a straight 6-step run (same data order, same
    augmentation keys, same per-step train keys after the restart)."""
    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           coord_uv_noise=True)

    def loss_fn(params, batch, key):
        preds = posenet.apply(params[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(
            preds, batch["scoremap"], batch["keypoint_vis21"])

    def fresh():
        return ({posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))},
                make_optimizer([1e-4], []),
                InputPipeline(dataset, cfg, batch_size=2, seed=0))

    params, optimizer, pipeline = fresh()
    straight = fit(
        loss_fn, params, optimizer, pipeline, max_iter=6,
        snapshot_dir=str(tmp_path / "a"), snapshot_freq=0,
        show_loss_freq=0, log=lambda *a: None,
    )

    params, optimizer, pipeline = fresh()
    snap_dir = str(tmp_path / "b")
    fit(loss_fn, params, optimizer, pipeline, max_iter=3,
        snapshot_dir=snap_dir, snapshot_freq=0, show_loss_freq=0,
        log=lambda *a: None)
    params, optimizer, pipeline = fresh()
    resumed = fit(
        loss_fn, params, optimizer, pipeline, max_iter=6,
        snapshot_dir=snap_dir, snapshot_freq=0, resume=True,
        show_loss_freq=0, log=lambda *a: None,
    )

    assert int(straight.step) == int(resumed.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(straight.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_label_matches_contained_step(tmp_path):
    """snapshot-<N> must contain state.step == N (periodic saves happen
    after the step's update, so the label is i+1, not i)."""
    from hand3d_tpu.train.checkpoints import restore_snapshot

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False)
    pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=0)
    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    optimizer = make_optimizer([1e-4], [])

    def loss_fn(params, batch, key):
        preds = posenet.apply(params[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(
            preds, batch["scoremap"], batch["keypoint_vis21"])

    snap_dir = str(tmp_path / "snaps")
    fit(loss_fn, params, optimizer, pipeline, max_iter=3,
        snapshot_dir=snap_dir, snapshot_freq=2, show_loss_freq=0,
        log=lambda *a: None)
    template = init_state(params, optimizer)
    for step, path in sorted_snapshots(snap_dir):
        restored = restore_snapshot(path, template)
        assert int(restored.step) == step, (step, path)


def test_snapshot_prune_never_removes_the_new_snapshot(tmp_path):
    """A stale higher-step snapshot from a longer prior run must not
    survive the prune while the just-written snapshot gets deleted."""
    import pytest

    from hand3d_tpu.train.checkpoints import save_snapshot

    params = {"w": np.zeros(3, np.float32)}
    optimizer = make_optimizer([1e-4], [])
    state = init_state(params, optimizer)

    stale = save_snapshot(str(tmp_path), state, step=5000)
    assert os.path.exists(stale)
    new = save_snapshot(str(tmp_path), state, step=100, keep=1)
    assert os.path.exists(new)  # the snapshot we just wrote survives
    assert not os.path.exists(stale)  # the stale one does not
    assert latest_snapshot(str(tmp_path)) == new

    # keep must retain at least the new snapshot
    with pytest.raises(AssertionError, match="keep=0"):
        save_snapshot(str(tmp_path), state, step=101, keep=0)

    # orphaned .tmp files from hard kills get swept on the next save
    orphan = os.path.join(str(tmp_path), "snapshot-77.msgpack.tmp")
    with open(orphan, "w") as f:
        f.write("partial")
    save_snapshot(str(tmp_path), state, step=102)
    assert not os.path.exists(orphan)


def test_resident_multistep_matches_per_step(tmp_path):
    """fit(steps_per_call=K) is trajectory-identical to the per-step path:
    same epoch shuffle, same per-step fold_in keys, same update math. The
    scan body and the standalone step compile to differently-fused XLA
    programs, so equality is up to float reassociation compounded by Adam
    (measured <=2e-5 after 7 steps; a wrong batch or key diverges at 1e-2+),
    not bitwise. max_iter=7 with K=3 also exercises the ragged
    tail window (3+3+1) and an epoch rollover (spe=2)."""
    from hand3d_tpu.data.preprocess import preprocess_rhd
    from hand3d_tpu.train.trainer import fuse_preprocess

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           crop_size=32, coord_uv_noise=True,
                           crop_center_noise=True)

    def loss_fn(p, batch, key):
        preds = posenet.apply(p[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"],
                                     batch["keypoint_vis21"])

    fused = fuse_preprocess(loss_fn, preprocess_rhd, cfg)

    def run(steps_per_call):
        pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=5,
                                 yield_raw=True)
        params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(5))}
        state = fit(fused, params, make_optimizer([1e-4], []), pipeline,
                    max_iter=7, seed=5, show_loss_freq=0, snapshot_freq=0,
                    steps_per_call=steps_per_call, log=lambda *a: None)
        assert int(state.step) == 7
        return state.params

    per_step, resident = run(1), run(3)
    for a, b in zip(jax.tree_util.tree_leaves(per_step),
                    jax.tree_util.tree_leaves(resident)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=0)


def test_resident_multistep_requires_fused_pipeline(tmp_path):
    import pytest

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False, crop_size=32)
    pipeline = InputPipeline(dataset, cfg, batch_size=2)  # not yield_raw

    def loss_fn(p, batch, key):
        preds = posenet.apply(p[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"],
                                     batch["keypoint_vis21"])

    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    with pytest.raises(ValueError, match="yield_raw"):
        fit(loss_fn, params, make_optimizer([1e-4], []), pipeline,
            max_iter=2, steps_per_call=2, show_loss_freq=0, snapshot_freq=0,
            log=lambda *a: None)


def test_resident_multistep_resume(tmp_path):
    """Resume of a resident run continues the absolute step/key/index stream:
    interrupted-then-resumed == straight-through, bitwise."""
    from hand3d_tpu.data.preprocess import preprocess_rhd
    from hand3d_tpu.train.trainer import fuse_preprocess

    dataset = _dataset(tmp_path)
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           crop_size=32, coord_uv_noise=True)

    def loss_fn(p, batch, key):
        preds = posenet.apply(p[posenet.SCOPE], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"],
                                     batch["keypoint_vis21"])

    fused = fuse_preprocess(loss_fn, preprocess_rhd, cfg)

    def fresh():
        pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=5,
                                 yield_raw=True)
        params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(5))}
        return pipeline, params

    pipeline, params = fresh()
    snap = str(tmp_path / "res_snaps")
    fit(fused, params, make_optimizer([1e-4], []), pipeline, max_iter=4,
        seed=5, show_loss_freq=0, snapshot_freq=100, snapshot_dir=snap,
        steps_per_call=2, log=lambda *a: None)
    pipeline, params = fresh()
    resumed = fit(fused, params, make_optimizer([1e-4], []), pipeline,
                  max_iter=6, seed=5, show_loss_freq=0, snapshot_freq=100,
                  snapshot_dir=snap, resume=True, steps_per_call=2,
                  log=lambda *a: None)
    pipeline, params = fresh()
    straight = fit(fused, params, make_optimizer([1e-4], []), pipeline,
                   max_iter=6, seed=5, show_loss_freq=0, snapshot_freq=0,
                   steps_per_call=2, log=lambda *a: None)
    for a, b in zip(jax.tree_util.tree_leaves(resumed.params),
                    jax.tree_util.tree_leaves(straight.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
