"""Generalization gate: training must IMPROVE HELD-OUT data, not just memorize.

The overfit gate (tools/overfit_check.py) proves the trainers optimize a
16-record fixed set; this gate (VERDICT r4 #4) upgrades the training
evidence to the reference's actual regime (training_posenet.py:29-95):

  * a ~2k-record synthetic RHD-layout TRAIN set and a disjoint VAL set,
    rendered so the pixels encode the pose (tests/fixtures.py
    make_rhd_bin_rendered) — learnable, not just memorizable;
  * train_posenet warm-started THE REFERENCE'S WAY: from a CPM-MPII-shaped
    TF checkpoint through the discard/rename rules of
    training_posenet.py:74-76 (synthetic random weights — the real
    cpm-model-mpii artifact doesn't ship in this environment);
  * the run crosses an LR boundary (train/schedule.piecewise_constant),
    with the crossing evidenced by the lr column of the metrics JSONL;
  * VAL GT-cropped EPE (eval/harnesses.eval2d_gt_cropped) must drop vs the
    warm-start params' EPE;
  * a second run is SIGTERM-killed mid-training and resumed with --resume;
    its final parameters must equal the uninterrupted run's BITWISE (the
    exact-resume contract: identical shuffle order, augmentation keys and
    optimizer state across the restart).

Usage:
  python tools/generalization_check.py                      # chip scale
  python tools/generalization_check.py --smoke              # CPU plumbing
  python tools/generalization_check.py --write-doc docs/GENERALIZATION.md
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _log(msg):
    print(f"[generalization_check] {msg}", flush=True)


def make_synthetic_cpm_checkpoint(path, seed=123):
    """Write a CPM-MPII-shaped TF V2 checkpoint (random weights).

    Variable names mirror the real cpm-model-mpii layout the reference's
    warm-start rules expect (weights/convert.py CPM_POSENET_*): trunk
    layers under CPM/PoseNet/<name>_CPM plus decoys that the discard rules
    (PersonNet, PoseNet/Mconv, conv5_2_CPM — training_posenet.py:74-76)
    must drop. Requires tensorflow (tools/tf_reference_oracle)."""
    import numpy as np

    from hand3d_tpu.models import posenet
    from hand3d_tpu.weights.convert import tree_to_flat
    from tools.tf_reference_oracle import save_tf_checkpoint

    import jax

    params = posenet.init(jax.random.PRNGKey(seed))
    flat = tree_to_flat(params)  # "conv1_1/weights", ...
    # the reference warm start covers the trunk and conv5_1, discarding the
    # refiners (Mconv) and the last trunk head conv5_2
    ckpt = {}
    for name, value in flat.items():
        layer = name.split("/")[0]
        if layer.startswith("conv6") or layer.startswith("conv7"):
            continue  # refiners: the real CPM has Mconv names instead
        if layer == "conv5_2":
            ckpt[f"CPM/PoseNet/conv5_2_CPM/{name.split('/')[1]}"] = (
                np.asarray(value))  # present in the artifact, discarded
            continue
        ckpt[f"CPM/PoseNet/{layer}_CPM/{name.split('/')[1]}"] = (
            np.asarray(value))
    # discard decoys
    rng = np.random.RandomState(seed)
    ckpt["CPM/PersonNet/conv1_1/weights"] = rng.randn(3, 3, 3, 8).astype(
        "float32")
    ckpt["CPM/PoseNet/Mconv1_stage2/weights"] = rng.randn(7, 7, 32, 32).astype(
        "float32")
    return save_tf_checkpoint(path, ckpt), params


def _val_epe(weights_path_or_params, val_bin, batch_size, max_batches,
             scope_params=None):
    """GT-cropped 2D EPE of a posenet param set on the val .bin."""
    from hand3d_tpu.data.rhd import RHDDataset
    from hand3d_tpu.eval.harnesses import eval2d_gt_cropped

    ds = RHDDataset("evaluation", path=val_bin)
    m = eval2d_gt_cropped(scope_params, ds, batch_size=batch_size,
                          max_batches=max_batches)
    return float(m["epe_mean_px"])


def _trainer_argv(args, data_dir, log_dir, run, max_iter, resume=False):
    train_bin = os.path.join(data_dir, "rhd_training.bin")
    val_bin = os.path.join(data_dir, "rhd_evaluation.bin")
    return [
        sys.executable, "-m", "hand3d_tpu.cli.train_posenet",
        "--data", train_bin, "--batch-size", str(args.batch_size),
        "--max-iter", str(max_iter),
        "--lr", str(args.lr0), str(args.lr1),
        "--lr-iter", str(args.lr_boundary),
        "--show-loss-freq", str(max(1, args.steps // 20)),
        "--snapshot-dir", os.path.join(log_dir, f"snap_{run}"),
        "--snapshot-freq", str(10 * max_iter),  # final (+ preemption) only
        "--steps-per-call", str(args.steps_per_call),
        "--crop-size", str(args.crop_size),
        "--eval-data", val_bin,
        "--eval-freq", str(max(1, args.steps // args.evals)),
        *(["--eval-batches", str(args.eval_batches)]
          if args.eval_batches else []),
        "--metrics-log", os.path.join(log_dir, f"{run}.jsonl"),
        "--weights", os.path.join(log_dir, "cpm_synth", "cpm-model-mpii"),
        *(["--resume"] if resume else []),
    ]


def _read_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _final_params(log_dir, run, step):
    from hand3d_tpu.train.checkpoints import load_snapshot_params

    path = os.path.join(log_dir, f"snap_{run}", f"snapshot-{step}.msgpack")
    return load_snapshot_params(path)


def _bitwise_equal(tree_a, tree_b):
    import numpy as np

    diffs = []
    flat_a, flat_b = {}, {}

    def flatten(t, out, prefix=""):
        for k, v in t.items():
            p = f"{prefix}/{k}"
            if isinstance(v, dict):
                flatten(v, out, p)
            else:
                out[p] = np.asarray(v)

    flatten(tree_a, flat_a)
    flatten(tree_b, flat_b)
    if set(flat_a) != set(flat_b):
        return False, [f"key sets differ: {set(flat_a) ^ set(flat_b)}"]
    for k in flat_a:
        if not np.array_equal(flat_a[k], flat_b[k]):
            diffs.append(
                f"{k}: max|d|={np.max(np.abs(flat_a[k] - flat_b[k])):.3e}")
    return not diffs, diffs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr-boundary", type=int, default=2000,
                    help="LR steps from lr0 to lr1 here (must be < --steps "
                         "so the run crosses it)")
    ap.add_argument("--lr0", type=float, default=1e-4)
    ap.add_argument("--lr1", type=float, default=1e-5)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--crop-size", type=int, default=256)
    ap.add_argument("--train-records", type=int, default=2048)
    ap.add_argument("--val-records", type=int, default=256)
    ap.add_argument("--evals", type=int, default=4,
                    help="In-training val evals across the run")
    ap.add_argument("--eval-batches", type=int, default=None)
    ap.add_argument("--steps-per-call", type=int, default=50)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="Per-run wall timeout (cold fwd+bwd compile runs "
                         "~1100s on the chip host; see overfit_check)")
    ap.add_argument("--improve-ratio", type=float, default=0.6,
                    help="Final val EPE must be <= ratio * warm-start EPE")
    ap.add_argument("--smoke", action="store_true",
                    help="Tiny CPU plumbing run: skips the learning assert, "
                         "keeps the warm-start, lr-crossing and "
                         "kill+resume-bitwise asserts")
    ap.add_argument("--keep", default=None)
    ap.add_argument("--write-doc", default=None)
    args = ap.parse_args()

    if args.smoke:
        args.steps = min(args.steps, 6)
        args.lr_boundary = min(args.lr_boundary, 3)
        args.train_records = min(args.train_records, 24)
        args.val_records = min(args.val_records, 8)
        args.crop_size = min(args.crop_size, 64)
        args.steps_per_call = min(args.steps_per_call, 3)
        args.eval_batches = 1
        args.evals = 2
    assert args.lr_boundary < args.steps, "run must cross the LR boundary"

    from fixtures import make_rhd_bin_rendered

    t_start = time.time()
    checks = {}
    with tempfile.TemporaryDirectory() as tmp:
        work = args.keep or tmp
        os.makedirs(work, exist_ok=True)
        data_dir = os.path.join(work, "data")
        os.makedirs(data_dir, exist_ok=True)
        _log(f"rendering {args.train_records} train / {args.val_records} "
             f"val records ...")
        make_rhd_bin_rendered(os.path.join(data_dir, "rhd_training.bin"),
                              num_records=args.train_records, seed=0)
        make_rhd_bin_rendered(os.path.join(data_dir, "rhd_evaluation.bin"),
                              num_records=args.val_records, seed=10_000)

        cpm_dir = os.path.join(work, "cpm_synth")
        os.makedirs(cpm_dir, exist_ok=True)
        _log("writing synthetic CPM-MPII checkpoint (TF Saver) ...")
        _, init_params = make_synthetic_cpm_checkpoint(
            os.path.join(cpm_dir, "cpm-model-mpii"))

        # warm-start baseline EPE on val: what the reference's staged
        # warm start gives you before this stage trains
        _log("warm-start val EPE ...")
        from hand3d_tpu.cli._common import load_weight_trees
        from hand3d_tpu.models import posenet

        warm_tree = load_weight_trees(
            [os.path.join(cpm_dir, "cpm-model-mpii")])
        warm_params = posenet.init(__import__("jax").random.PRNGKey(0))
        warm_params.update(warm_tree.get(posenet.SCOPE, {}))
        epe_initial = _val_epe(
            None, os.path.join(data_dir, "rhd_evaluation.bin"),
            args.batch_size, args.eval_batches, scope_params=warm_params)
        checks["epe_initial_px"] = round(epe_initial, 3)
        _log(f"warm-start val EPE {epe_initial:.2f} px")

        def run(name, max_iter, resume=False, kill_at_frac=None):
            argv = _trainer_argv(args, data_dir, work, name, max_iter,
                                 resume=resume)
            log_path = os.path.join(work, f"{name}.jsonl")
            if not resume and os.path.exists(log_path):
                os.unlink(log_path)
            # runs A, B and B-resume compile the same programs: share a
            # persistent compile cache so only run A pays the big compile
            # (an inherited cache dir, e.g. the test suite's, wins)
            env = dict(os.environ)
            env.setdefault("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(work, "xcache"))
            env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
            proc = subprocess.Popen(argv, cwd=REPO, env=env,
                                    stdout=subprocess.DEVNULL,
                                    stderr=subprocess.PIPE, text=True)
            killed = False
            deadline = time.time() + args.timeout
            if kill_at_frac is not None:
                target = int(max_iter * kill_at_frac)
                while time.time() < deadline and proc.poll() is None:
                    try:
                        rows = _read_jsonl(log_path)
                    except OSError:
                        rows = []
                    if any(r.get("step", -1) >= target and "loss" in r
                           for r in rows):
                        _log(f"{name}: step {target} reached -> SIGTERM")
                        proc.send_signal(signal.SIGTERM)
                        killed = True
                        break
                    time.sleep(0.1)
            try:
                _, err = proc.communicate(
                    timeout=max(10.0, deadline - time.time()))
            except subprocess.TimeoutExpired:
                proc.kill()
                raise SystemExit(f"{name}: TIMEOUT after {args.timeout}s")
            if proc.returncode != 0:
                raise SystemExit(
                    f"{name}: rc={proc.returncode}: {(err or '')[-600:]}")
            return killed

        # run A: straight through
        _log(f"run A: {args.steps} steps straight ...")
        run("a", args.steps)
        rows_a = _read_jsonl(os.path.join(work, "a.jsonl"))

        # learning: last logged val EPE must beat the warm-start EPE
        evals_a = [(r["step"], r["eval_epe_mean_px"]) for r in rows_a
                   if "eval_epe_mean_px" in r]
        checks["val_epe_curve"] = [(s, round(v, 2)) for s, v in evals_a]
        epe_final = evals_a[-1][1] if evals_a else float("inf")
        checks["epe_final_px"] = round(epe_final, 3)
        checks["improve_ratio_measured"] = round(
            epe_final / max(epe_initial, 1e-9), 3)
        checks["learned"] = bool(
            epe_final <= args.improve_ratio * epe_initial)
        if args.smoke:
            checks["learned"] = None  # not judged at smoke scale

        # LR boundary crossing, evidenced by the log's lr column
        lrs = sorted({r["lr"] for r in rows_a if "lr" in r})
        steps_hi = [r["step"] for r in rows_a
                    if r.get("lr") == args.lr0 and "loss" in r]
        steps_lo = [r["step"] for r in rows_a
                    if r.get("lr") == args.lr1 and "loss" in r]
        checks["lr_values_seen"] = lrs
        checks["lr_crossed"] = bool(
            steps_hi and steps_lo
            and max(steps_hi) < args.lr_boundary <= min(steps_lo))

        # run B: interrupted mid-run, then --resume; final params must equal
        # run A's bitwise. At full scale the interruption is a live SIGTERM
        # (log-polled kill target with dozens of step windows left); at
        # smoke scale the runs are seconds long and the poll-kill is a
        # race (observed flake: run B finished its handful of windows
        # before the signal could land on a warm compile cache), so smoke
        # splits run B deterministically: train to steps/2, stop, then
        # --resume to the end. The SIGTERM preemption path itself is
        # unit-tested (tests/test_train_loop.py) and exercised by the
        # chip-scale gate run.
        if args.smoke:
            _log("run B: split at half + --resume (smoke) ...")
            run("b", args.steps // 2)
            checks["b_killed_midrun"] = None  # judged at full scale only
            checks["b_split_resume"] = True
        else:
            _log("run B: kill mid-run + --resume ...")
            killed = run("b", args.steps, kill_at_frac=0.5)
            checks["b_killed_midrun"] = bool(killed)
        run("b", args.steps, resume=True)
        params_a = _final_params(work, "a", args.steps)
        params_b = _final_params(work, "b", args.steps)
        equal, diffs = _bitwise_equal(params_a, params_b)
        checks["resume_bitwise_equal"] = bool(equal)
        if not equal:
            checks["resume_diffs"] = diffs[:8]

    wall = time.time() - t_start
    judged = [v for k, v in checks.items()
              if k in ("learned", "lr_crossed", "b_killed_midrun",
                       "resume_bitwise_equal") and v is not None]
    ok = all(judged)
    summary = {"gate": "generalization_check", "ok": ok, "smoke": args.smoke,
               "steps": args.steps, "lr_boundary": args.lr_boundary,
               "train_records": args.train_records,
               "val_records": args.val_records,
               "wall_s": round(wall, 1), **checks}
    print(json.dumps(summary), flush=True)
    if args.write_doc:
        with open(args.write_doc, "a") as f:
            f.write(_markdown(summary))
    raise SystemExit(0 if ok else 1)


def _git_rev():
    try:
        out = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, cwd=REPO,
                             timeout=10)
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _markdown(s):
    curve = " ".join(f"{step}:{v}px" for step, v in s["val_epe_curve"])
    return (
        f"\n## Generalization run ({s['train_records']} train / "
        f"{s['val_records']} val rendered records, {s['steps']} steps, "
        f"LR boundary @{s['lr_boundary']}"
        f"{', SMOKE' if s['smoke'] else ''}) — commit {_git_rev()}\n\n"
        f"| check | result |\n|---|---|\n"
        f"| warm-start val EPE | {s['epe_initial_px']} px |\n"
        f"| final val EPE | {s['epe_final_px']} px "
        f"(ratio {s['improve_ratio_measured']}) |\n"
        f"| val EPE curve | {curve} |\n"
        f"| learned (held-out) | {s['learned']} |\n"
        f"| LR boundary crossed | {s['lr_crossed']} "
        f"(lr seen: {s['lr_values_seen']}) |\n"
        f"| killed mid-run | {s['b_killed_midrun']} |\n"
        f"| resume bitwise-equal | {s['resume_bitwise_equal']} |\n"
        f"| wall | {s['wall_s']}s |\n"
    )


if __name__ == "__main__":
    main()
