"""REAL multi-host validation: two jax processes (gloo-connected CPU
backends, 2 virtual devices each) run synchronized DP training through the
full stack — init_distributed bring-up, global mesh, per-process dataset
shards, make_array_from_process_local_data batch assembly, GSPMD gradient
all-reduce — and must stay bitwise in lock step.

This is the closest this environment can get to a TPU pod: process_count
is actually 2, so every multi-host code path (not just the single-process
approximations) executes for real.
"""

import os
import subprocess
import sys

import numpy as np


from fixtures import make_rhd_bin

_WORKER = """
import os, sys
pid, nprocs, port, data_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from hand3d_tpu.parallel import init_distributed, make_mesh, batch_sharding

idx, count = init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=nprocs,
    process_id=pid,
)
assert (idx, count) == (pid, nprocs), (idx, count)

import jax.numpy as jnp
from hand3d_tpu.data.config import PreprocessConfig
from hand3d_tpu.data.pipeline import InputPipeline
from hand3d_tpu.data.preprocess import preprocess_rhd
from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.models import posenet
from hand3d_tpu.train import make_optimizer, posenet_scoremap_loss
from hand3d_tpu.train.trainer import (
    fuse_preprocess, init_state, make_train_step, shard_state,
)

dataset = RHDDataset("training", path=data_path)
cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False, crop_size=32)
mesh = make_mesh()  # 4 global devices x 1 model
pipeline = InputPipeline(dataset, cfg, batch_size=2, seed=0,
                         sharding=batch_sharding(mesh), yield_raw=True)
assert pipeline.process_shard == (pid, nprocs), pipeline.process_shard
assert pipeline.steps_per_epoch() == 2  # 8 records -> 4/process / batch 2

def loss_fn(params, batch, key):
    preds = posenet.apply(params[posenet.SCOPE], batch["image_crop"])
    return posenet_scoremap_loss(preds, batch["scoremap"],
                                 batch["keypoint_vis21"])

fused = fuse_preprocess(loss_fn, preprocess_rhd, cfg)
opt = make_optimizer([1e-4, 1e-5], [10])
params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
state = shard_state(mesh, init_state(params, opt))
step_fn = make_train_step(fused, opt, mesh=mesh)

it = pipeline.iterate(epochs=None)
key = jax.random.PRNGKey(0)
for i in range(2):
    batch = next(it)
    state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))

loss = float(metrics["loss"])
w = state.params[posenet.SCOPE]["conv1_1"]["weights"]
wsum = float(jnp.sum(jnp.abs(w)))
print(f"RESULT pid={pid} loss={loss:.10f} wsum={wsum:.10f} "
      f"step={int(state.step)}", flush=True)

# multi-host EVAL: the harness feeds each process's addressable batch rows
# and all-gathers the metric outputs — metrics must match a single-process
# run exactly (checked by the test harness against a local reference)
from hand3d_tpu.eval.harnesses import eval2d_gt_cropped

m = eval2d_gt_cropped(posenet.init(jax.random.PRNGKey(0)),
                      RHDDataset("evaluation", path=data_path),
                      batch_size=4, mesh=mesh)
print(f"EVAL pid={pid} mean={m['epe_mean_px']:.8f} "
      f"auc={m['auc_0_30px']:.8f}", flush=True)
"""


def test_two_process_dp_training_stays_in_lockstep(tmp_path):
    data = str(tmp_path / "rhd8.bin")
    make_rhd_bin(data, num_records=8)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    env.pop("JAX_PLATFORMS", None)
    # ephemeral port so concurrent runs on one machine can't collide on
    # the coordinator address (the OS rarely reissues a just-released port)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port, data],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo_root, env=env,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=540)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:  # don't leak hung workers past the test
            p.kill()
        raise
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    results, evals = {}, {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        kv = dict(part.split("=") for part in line.split()[1:])
        results[int(kv["pid"])] = kv
        eline = [l for l in out.splitlines() if l.startswith("EVAL")][0]
        ev = dict(part.split("=") for part in eline.split()[1:])
        evals[int(ev["pid"])] = ev
    assert set(results) == {0, 1}
    # synchronized DP: both processes see the SAME replicated loss, params
    # and step counter after two global steps
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["wsum"] == results[1]["wsum"]
    assert results[0]["step"] == results[1]["step"] == "2"

    # multi-host eval: identical across hosts AND equal to a local
    # single-process run of the same harness on the same weights/data
    assert (evals[0]["mean"], evals[0]["auc"]) == (
        evals[1]["mean"], evals[1]["auc"])
    import jax

    from hand3d_tpu.data.rhd import RHDDataset
    from hand3d_tpu.eval.harnesses import eval2d_gt_cropped
    from hand3d_tpu.models import posenet

    ref = eval2d_gt_cropped(
        posenet.init(jax.random.PRNGKey(0)),
        RHDDataset("evaluation", path=data), batch_size=4,
    )
    np.testing.assert_allclose(
        float(evals[0]["mean"]), ref["epe_mean_px"], rtol=1e-5)
    np.testing.assert_allclose(
        float(evals[0]["auc"]), ref["auc_0_30px"], rtol=1e-5)
