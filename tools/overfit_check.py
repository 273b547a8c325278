"""Synthetic-overfit gate: prove all four trainers OPTIMIZE, not just step.

Round-1 evidence for training was "the step runs and the loss is finite";
this gate (VERDICT round-1, next-round #5) runs each training CLI end-to-end
— real argument parsing, real InputPipeline, real fused preprocess+train
step, real snapshots — on a tiny fixed synthetic RHD set (tests/fixtures)
and asserts the loss collapses by a stated factor. Reference loop semantics:
/root/reference/training_posenet.py:57-61, :85-95.

A fixed 16-record set at batch 8 is memorizable by every stage; the posenet/
joint configs keep the reference's coord/crop augmentation noise ON (the
CLIs hardwire it, as the reference does), so their loss floor is the noise
floor, not zero — the gate asserts a drop RATIO, not an absolute.
The posenet run also drives the in-training eval hook on the same records
(eval2d_gt_cropped) so a memorization EPE lands in the log.

Usage:
  python tools/overfit_check.py                 # all four trainers
  python tools/overfit_check.py --only posenet  # one
  python tools/overfit_check.py --steps 600 --write-doc docs/OVERFIT.md
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# A trainer attempt with less wall than this can't even finish a warm run
# (warm trainers measure 250-400s); don't start attempts that must time out.
_MIN_ATTEMPT = 600


def _latest_snapshot(snap_dir):
    """Newest snapshot-*.msgpack in a prior run's snapshot dir."""
    from hand3d_tpu.train.checkpoints import latest_snapshot

    path = latest_snapshot(snap_dir)
    if path is None:
        raise SystemExit(f"--warm-from: no snapshot under {snap_dir}")
    return path


def _trainers(steps, data_dir, log_dir, steps_per_call, qat=False,
              warm_from=None, only=None):
    # Trainer CLIs take the .bin FILE (cli/train_*.py "--data: Path to
    # rhd_training.bin" -> RHDDataset -> np.memmap), never a directory.
    train_bin = os.path.join(data_dir, "rhd_training.bin")
    eval_bin = os.path.join(data_dir, "rhd_evaluation.bin")

    def common(n_steps):
        return [
            "--data", train_bin, "--batch-size", "8",
            "--max-iter", str(n_steps),
            "--show-loss-freq", str(max(1, n_steps // 12)),
            "--snapshot-freq", str(10 * n_steps),  # final snapshot only
            "--steps-per-call", str(steps_per_call),
            "--lr", "1e-4", "1e-4", "--lr-iter", "1000000",
            *(["--qat"] if qat else []),
        ]

    def warm(trainer, snap_name):
        # fine-tune from a prior run's float snapshots (make_rhd_bin is
        # seed-deterministic, so the prior run memorized the SAME records).
        # Resolved only for trainers that will actually run, so --only does
        # not demand snapshots for the others.
        if warm_from is None or (only is not None and trainer != only):
            return []
        return ["--weights", _latest_snapshot(os.path.join(warm_from,
                                                           snap_name))]

    def log(name):
        return os.path.join(log_dir, f"{name}.jsonl")

    # Per-trainer step budgets and bars, calibrated against real chip runs
    # (docs/OVERFIT.md): handsegnet collapses 7.5-7.7x inside ``steps``;
    # lifting needs ~2x the steps for a stable 6-10x drop (its batch-8
    # curve is noisy); posenet/joint train a 17M-param CPM FROM SCRATCH —
    # the reference never does that (it warm-starts from CPM-MPII,
    # training_posenet.py:74-76) — with the reference's augmentation noise
    # ON, so their scoremap-loss floor is the NOISE floor and the ratio is
    # a bad statistic (measured 1.12x and 1.4x across two runs in which the
    # net demonstrably localized at ~6.4 px memorization EPE). For those
    # two the assertion is the memorization EPE of the end-of-run eval
    # hook; the ratio bar is 0.9, a pure divergence backstop (a blown-up
    # or NaN run fails it, noise cannot). All runs use the highest
    # reference LR tier held constant and the device-resident multi-step
    # path (cheap: ~9-77 it/s vs ~1 it/s per-step through the device
    # tunnel).
    return {
        "handsegnet": (
            ["-m", "hand3d_tpu.cli.train_handsegnet", *common(steps),
             *warm("handsegnet", "snap_seg"),
             "--snapshot-dir", os.path.join(log_dir, "snap_seg"),
             "--metrics-log", log("handsegnet")],
            5.0, None,  # measured 7.5x / 7.7x at 600
        ),
        "posenet": (
            ["-m", "hand3d_tpu.cli.train_posenet", *common(5 * steps),
             *warm("posenet", "snap_pose"),
             "--snapshot-dir", os.path.join(log_dir, "snap_pose"),
             "--eval-data", eval_bin, "--eval-freq", str(5 * steps),
             "--metrics-log", log("posenet")],
            # GT-cropped 2D eval on the training records: the net must
            # LOCALIZE (measured 6.41 px mean / 2.99 px median / 0.84
            # AUC at 3000 steps, twice)
            0.9, ("eval_epe_mean_px", 15.0),
        ),
        "lifting": (
            ["-m", "hand3d_tpu.cli.train_lifting", *common(2 * steps),
             "--variant", "proposed", *warm("lifting", "snap_lift"),
             "--snapshot-dir", os.path.join(log_dir, "snap_lift"),
             "--metrics-log", log("lifting")],
            4.0, None,  # measured 6.3x / ~10x at 1200
        ),
        "joint": (
            # fine-tuning, not from-scratch: warm-started from THIS run's
            # posenet + lifting snapshots (the reference's staged practice
            # — its shipped finetuned pickle was produced from pretrained
            # stages; a from-scratch joint run measured 75 mm EPE at 3000
            # steps, docs/OVERFIT.md). Runs after both stages in dict
            # order; --only joint therefore needs a prior full run's
            # --keep dir as log_dir.
            ["-m", "hand3d_tpu.cli.train_joint", *common(2 * steps),
             "--weights",
             os.path.join(log_dir, "snap_pose",
                          f"snapshot-{5 * steps}.msgpack"),
             os.path.join(log_dir, "snap_lift",
                          f"snapshot-{2 * steps}.msgpack"),
             "--snapshot-dir", os.path.join(log_dir, "snap_joint"),
             "--eval-data", eval_bin, "--eval-freq", str(2 * steps),
             "--metrics-log", log("joint")],
            # end-to-end 3D eval (PoseNet scoremaps -> lifting -> mm via
            # keypoint_scale) on the training records; bound calibrated
            # against the measured memorization value (docs/OVERFIT.md)
            0.9, ("eval_epe_mean_mm", 40.0),
        ),
    }


def _read_curve(path):
    rows = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                rows.append((int(rec["step"]), float(rec["loss"])))
            rows.extend(
                (int(rec["step"]), rec[k], k) for k in rec if k.startswith("eval_")
            )
    losses = [(s, v) for row in rows if len(row) == 2 for s, v in [row]]
    evals = {row[2]: row[1] for row in rows if len(row) == 3}
    return losses, evals


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=600,
                    help="Base step budget; lifting runs 2x, posenet/joint "
                         "5x this (see _trainers)")
    ap.add_argument("--steps-per-call", type=int, default=50,
                    help="Device-resident multi-step window (trainer CLIs' "
                         "--steps-per-call)")
    ap.add_argument("--records", type=int, default=16)
    ap.add_argument("--only", default=None,
                    choices=["handsegnet", "posenet", "lifting", "joint"])
    ap.add_argument("--timeout", type=int, default=1500,
                    help="Per-trainer wall timeout (compile included). A "
                         "COLD compile of the big fwd+bwd programs runs "
                         "~1100s on this host (chip_smoke's measured "
                         "train_step phase), so 900s only ever passed on "
                         "warm caches — the round-4 re-run after a trainer "
                         "program change timed out exactly there.")
    ap.add_argument("--budget", type=int, default=6600,
                    help="Total wall budget (s). Per-trainer attempts are "
                         "clamped to the remainder and the retry-once-on-"
                         "timeout (tunnel-wedge cure, half-warm cache) is "
                         "skipped when the remainder can't cover one, so "
                         "the gate exits WITH evidence instead of being "
                         "killed as one opaque step TIMEOUT.")
    ap.add_argument("--write-doc", default=None,
                    help="Append a markdown results section to this file")
    ap.add_argument("--keep", default=None,
                    help="Persist the work dir (synthetic data + final "
                         "snapshots) here — e.g. to feed "
                         "tools/preset_accuracy.py the overfit weights")
    ap.add_argument("--warm-from", default=None,
                    help="A prior run's --keep dir: warm-start handsegnet/"
                         "posenet/lifting from its newest snapshots "
                         "(fine-tuning; e.g. QAT fine-tune from the float "
                         "overfit weights). Joint always warm-starts from "
                         "THIS run's stage snapshots.")
    ap.add_argument("--qat", action="store_true",
                    help="Train all four stages under the int8 "
                         "quantization-aware view (trainer CLIs' --qat), "
                         "producing weights for a preset_accuracy int8 "
                         "drift-bound comparison against PTQ")
    args = ap.parse_args()

    from fixtures import make_rhd_bin

    t_start = time.time()
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        work = args.keep or tmp
        os.makedirs(work, exist_ok=True)
        data_dir = os.path.join(work, "data")
        os.makedirs(data_dir, exist_ok=True)
        make_rhd_bin(os.path.join(data_dir, "rhd_training.bin"),
                     num_records=args.records)
        # same records under the eval name: memorization EPE
        make_rhd_bin(os.path.join(data_dir, "rhd_evaluation.bin"),
                     num_records=args.records)

        trainers = _trainers(args.steps, data_dir, work, args.steps_per_call,
                             qat=args.qat, warm_from=args.warm_from,
                             only=args.only)
        for name, (argv, min_ratio, eval_bound) in trainers.items():
            if args.warm_from is not None:
                # fine-tuning starts CONVERGED: a big drop ratio is
                # impossible, so the ratio becomes the divergence backstop
                # and the judgement rests on the eval bounds (posenet/joint)
                min_ratio = min(min_ratio, 0.9)
            if args.only and name != args.only:
                continue
            # a reused --keep dir must not concatenate curves across runs:
            # _read_curve takes loss_first from line 1, so a stale log would
            # judge this run against a prior run's first loss (round-3
            # verdict, weak #2). The trainer CLIs also truncate fresh logs
            # themselves (MetricsLogger fresh=True); this is belt-and-braces
            # for trainer versions that crash before opening the log.
            stale_log = os.path.join(work, f"{name}.jsonl")
            if os.path.exists(stale_log):
                os.unlink(stale_log)

            def _attempt(timeout_s):
                try:
                    proc = subprocess.run(
                        [sys.executable, *argv], capture_output=True,
                        text=True, timeout=timeout_s, cwd=REPO,
                    )
                    return (None if proc.returncode == 0 else
                            f"rc={proc.returncode}: "
                            f"{(proc.stderr or '')[-400:]}")
                except subprocess.TimeoutExpired:
                    return f"TIMEOUT after {timeout_s}s"

            remaining = args.budget - (time.time() - t_start)
            t0 = time.time()
            if remaining < _MIN_ATTEMPT:
                err = "not run: wall budget exhausted"
            else:
                err = _attempt(min(args.timeout, int(remaining)))
                remaining = args.budget - (time.time() - t_start)
                if err and err.startswith("TIMEOUT") \
                        and remaining >= _MIN_ATTEMPT:
                    # the axon tunnel occasionally wedges a process forever;
                    # the documented cure is kill-and-retry-once in a fresh
                    # process, which also benefits from any compile-cache
                    # warming the first attempt managed (same policy as
                    # chip_smoke)
                    print(f"[overfit_check] {name} timed out; retrying once",
                          flush=True)
                    if os.path.exists(stale_log):
                        os.unlink(stale_log)
                    err = _attempt(min(args.timeout, int(remaining)))
            dt = time.time() - t0

            n_steps = int(argv[argv.index("--max-iter") + 1])
            entry = {"seconds": round(dt, 1), "steps": n_steps}
            if err is None:
                losses, evals = _read_curve(os.path.join(work, f"{name}.jsonl"))
                # median of the last 3 reports: the per-step loss at batch 8
                # is noisy (augmentation resampled every step), and a single
                # endpoint flaked the lifting gate in the round-3 calibration
                # run (docs/OVERFIT.md) while the trend was clearly down
                first = losses[0][1]
                last = sorted(v for _, v in losses[-3:])[len(losses[-3:]) // 2]
                ratio = first / max(last, 1e-12)
                ok = ratio >= min_ratio
                if eval_bound is not None:
                    key, bound = eval_bound
                    measured = evals.get(key)
                    entry.update(bound_key=key, bound_value=bound)
                    ok = ok and measured is not None and measured <= bound
                entry.update(
                    loss_first=first, loss_last=last,
                    drop_ratio=round(ratio, 2),
                    curve=[(s, round(v, 5)) for s, v in losses],
                    ok=ok, min_ratio=min_ratio, **evals,
                )
            else:
                entry.update(ok=False, error=err)
            results[name] = entry
            flag = "PASS" if entry["ok"] else "FAIL"
            detail = (
                f"loss {entry['loss_first']:.4g} -> {entry['loss_last']:.4g} "
                f"({entry['drop_ratio']}x, need {min_ratio}x)"
                if err is None else err
            )
            if err is None and eval_bound is not None:
                key, bound = eval_bound
                v = entry.get(key)
                detail += (
                    f"  {key} {v:.3g} (need <= {bound})" if v is not None
                    else f"  {key} MISSING (need <= {bound})"
                )
            print(f"{name:<11} {flag}  {dt:6.1f}s  {detail}", flush=True)

    gate_ok = all(r["ok"] for r in results.values())
    summary = {"gate": "overfit_check", "ok": gate_ok, "steps": args.steps,
               "records": args.records, "qat": args.qat,
               "warm_from": args.warm_from, "trainers": results}
    print(json.dumps(summary), flush=True)

    if args.write_doc:
        with open(args.write_doc, "a") as f:
            f.write(_markdown(summary))
    raise SystemExit(0 if gate_ok else 1)


def _git_rev():
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=REPO, timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _markdown(summary):
    lines = [
        "",
        f"## Synthetic-overfit run ({summary['records']} records, "
        f"{summary['steps']} steps, batch 8"
        f"{', QAT int8 view' if summary.get('qat') else ''}"
        f"{', warm-started' if summary.get('warm_from') else ''}) "
        f"— commit {_git_rev()}",
        "",
        "| Trainer | loss first → last | drop | memorization eval | wall |",
        "|---|---|---|---|---|",
    ]
    for name, r in summary["trainers"].items():
        if "loss_first" not in r:
            lines.append(f"| {name} | FAILED: {r.get('error')} | | | |")
            continue
        ev = "  ".join(
            f"{k[5:]} {v:.3g}" for k, v in r.items() if k.startswith("eval_")
        ) or "—"
        if "bound_key" in r:
            ev += f" (gate: {r['bound_key'][5:]} ≤ {r['bound_value']:g})"
        lines.append(
            f"| {name} | {r['loss_first']:.4g} → {r['loss_last']:.4g} "
            f"| {r['drop_ratio']}x | {ev} | {r['seconds']}s |"
        )
    curves = "; ".join(
        f"{n}: " + " ".join(f"{s}:{v:.3g}" for s, v in r.get("curve", []))
        for n, r in summary["trainers"].items()
    )
    lines += ["", f"Loss curves (step:loss) — {curves}", ""]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
