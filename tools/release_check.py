"""Round-gate orchestrator: run every end-of-round check, commit the record.

Round 2's lesson (VERDICT round-2, missing #3): gates that run only in chat
are evidence of nothing. This tool runs the full end-of-round ladder —

  chip_smoke   every program shape compiles + runs on the real chip
  bench        the headline throughput measurement (bench.py ladder)
  overfit      all four trainers optimize on the chip (tools/overfit_check)
  preset       speed-preset accuracy bounds vs the f32 cascade
  multihost    REAL 2-process gloo DP training in lock step (pytest)
  multichip    8-virtual-device mesh dry run (__graft_entry__.dryrun_multichip)

— each in a subprocess with a hard timeout, and writes ``RESULTS_r{N}.json``
plus an appended section in ``docs/RESULTS.md``, both stamped with the commit
they measured. The JSON is the round's machine-checkable record; a step that
fails is recorded as failed, never silently dropped.

The record is written incrementally after every step (atomic rename), so a
wall-clock kill mid-ladder still leaves the completed steps on disk. With
``--merge``, an existing RESULTS_r{N}.json is folded in instead of being
overwritten — this lets the CPU-only steps (multihost, multichip) run in a
separate concurrent invocation while the chip ladder holds the TPU.

Usage:
  python tools/release_check.py --round 3                # everything
  python tools/release_check.py --round 3 --skip overfit # compose
  python tools/release_check.py --round 3 --steps chip_smoke bench
  # concurrent split (chip + CPU):
  python tools/release_check.py --round 3 --merge --steps chip_smoke bench overfit preset &
  python tools/release_check.py --round 3 --merge --steps multihost multichip &
"""

import argparse
import contextlib
import fcntl
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _log(msg):
    print(f"[release_check] {msg}", file=sys.stderr, flush=True)


def _git_rev():
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=REPO, timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _last_json_line(text):
    for line in reversed(text.splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _steps(args, work):
    """Ordered step table: name -> (argv, timeout_s, env_overrides)."""
    overfit_dir = args.overfit_dir or os.path.join(work, "overfit")
    py = sys.executable
    # the multichip dry run and the multihost test pin themselves to CPU;
    # everything else runs on the session's default platform (the real chip)
    cpu_env = {"JAX_PLATFORMS": "cpu",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    return {
        # chip_smoke self-bounds to --budget (it clamps attempt timeouts to
        # the remainder and skips retries it can't afford), so the step
        # timeout only needs headroom for interpreter startup + the final
        # JSON — an external kill here would discard per-phase evidence
        # (the round-3 failure mode: one opaque step TIMEOUT, no detail)
        "chip_smoke": ([py, "tools/chip_smoke.py", "--budget", "9000"],
                       9300, {}),
        "bench": ([py, "bench.py"], 1500, {}),
        # overfit self-bounds to --budget like chip_smoke (per-trainer
        # attempts clamped to the remainder, retry-once skipped when it
        # can't fit), so the step timeout only needs startup headroom
        "overfit": (
            [py, "tools/overfit_check.py", "--steps", str(args.overfit_steps),
             "--keep", overfit_dir, "--budget", "6600"],
            6900, {},
        ),
        "preset": (
            [py, "tools/preset_accuracy.py", "--overfit-dir", overfit_dir],
            # the r5 int8_static calibration pass runs the float cascade
            # EAGERLY (per-op dispatches through the tunnel) before the
            # variant sweeps — measured ~35 min total on a contended host
            3000, {},
        ),
        # held-out learning + LR-boundary crossing + kill/resume bitwise
        # equality at training scale (VERDICT r4 #4); self-bounds each of
        # its three trainer runs to --timeout and shares a compile cache,
        # so only run A pays the big compile
        "generalization": (
            [py, "tools/generalization_check.py", "--timeout", "1500",
             "--write-doc", os.path.join(REPO, "docs", "GENERALIZATION.md")],
            5100, {},
        ),
        "multihost": (
            [py, "-m", "pytest", "tests/test_multiprocess.py", "-x", "-q"],
            1500, {},
        ),
        "multichip": (
            [py, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            1500, cpu_env,
        ),
    }


def _load_record(path):
    try:
        with open(path) as f:
            rec = json.load(f)
        return rec if isinstance(rec.get("steps"), dict) else None
    except Exception:
        return None


@contextlib.contextmanager
def _record_lock(out):
    """Exclusive advisory lock serializing concurrent --merge checkpoints.

    Two concurrent invocations (the documented chip/CPU split) both do a
    read-merge-write of RESULTS_r{N}.json; without the lock, checkpoints
    that race drop one invocation's steps from the record (round-3
    advisor, medium).
    """
    lock_path = out + ".lock"
    with open(lock_path, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def _write_record(args, results, out):
    """Merge + atomically write the round record; returns it.

    GREEN means the FULL ladder passed: ``ok`` is true only when every step
    in the table has a real (non-placeholder) passing result. A record with
    unrun steps carries ``partial: true`` and ``ok: false`` so a subset
    invocation can never stamp the round green (round-3 advisor, medium).
    Each step entry is stamped with the commit/utc it actually ran at; the
    top level summarizes the set so mixed-commit records are visible.
    """
    with _record_lock(out):
        steps = dict(results)
        if args.merge:
            existing = _load_record(out)
            if existing:
                # adopt real results (from a prior or concurrent invocation)
                # for any step this invocation did not run itself
                for name, entry in existing["steps"].items():
                    mine = steps.get(name)
                    if entry.get("ok") is not None and (
                            mine is None or mine.get("skipped")):
                        steps[name] = entry
        ran = {k: v for k, v in steps.items() if not v.get("skipped")}
        partial = len(ran) < len(steps)
        commits = sorted({v["commit"] for v in ran.values() if "commit" in v})
        record = {
            "round": args.round,
            "commit": _git_rev(),
            "utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
            "ok": bool(ran) and not partial
                  and all(v["ok"] for v in ran.values()),
            "partial": partial,
            "step_commits": commits,
            "mixed_commits": len(commits) > 1,
            "steps": steps,
        }
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        os.replace(tmp, out)
    return record


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--merge", action="store_true",
                    help="fold results into an existing RESULTS_r{N}.json "
                         "instead of overwriting it (enables concurrent "
                         "chip/CPU invocations)")
    ap.add_argument("--steps", nargs="*", default=None,
                    help="run only these steps (default: all)")
    ap.add_argument("--overfit-steps", type=int, default=600)
    ap.add_argument("--overfit-dir", default=None,
                    help="reuse an existing overfit_check --keep dir for the "
                         "preset step (and skip re-training if 'overfit' is "
                         "also in --skip)")
    ap.add_argument("--work", default="/tmp/release_check",
                    help="scratch dir for intermediate artifacts")
    ap.add_argument("--out-dir", default=REPO,
                    help="where RESULTS_r{N}.json + docs/RESULTS.md land "
                         "(default: the repo; tests point this elsewhere)")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    table = _steps(args, args.work)
    selected = args.steps or list(table)
    unknown = [s for s in selected + args.skip if s not in table]
    if unknown:
        ap.error(f"unknown step(s): {unknown}; available: {list(table)}")

    out = os.path.join(args.out_dir, f"RESULTS_r{args.round:02d}.json")
    results = {name: {"ok": None, "skipped": True} for name in table}
    ran_here = {}
    for name in table:
        if name not in selected or name in args.skip:
            _log(f"{name}: SKIPPED")
            continue
        argv, timeout, env_over = table[name]
        _log(f"{name}: {' '.join(argv)} (timeout {timeout}s)")
        t0 = time.time()
        stamp = {"commit": _git_rev(),
                 "utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())}
        try:
            proc = subprocess.run(
                argv, capture_output=True, text=True, timeout=timeout,
                cwd=REPO, env=dict(os.environ, **env_over),
            )
            ok = proc.returncode == 0
            entry = {"ok": ok, "seconds": round(time.time() - t0, 1),
                     "returncode": proc.returncode, **stamp}
            summary = _last_json_line(proc.stdout)
            if summary is not None:
                entry["summary"] = summary
                # bench.py's contract is exit 0 whenever it printed a
                # machine-readable record — including the honest
                # device-unreachable / partial records. The LADDER's bar is
                # a real full measurement: judge the record's content.
                if name == "bench" and (summary.get("error")
                                        or summary.get("partial")
                                        or summary.get("value") is None):
                    entry["ok"] = ok = False
            if not ok:
                entry["stderr_tail"] = (proc.stderr or "")[-1500:]
                entry["stdout_tail"] = (proc.stdout or "")[-800:]
                phases = _phase_lines(proc.stdout)
                if phases:
                    entry["phases"] = phases
        except subprocess.TimeoutExpired as e:
            entry = {"ok": False, "seconds": round(time.time() - t0, 1),
                     "error": f"TIMEOUT after {timeout}s", **stamp}
            for stream in ("stdout", "stderr"):
                data = getattr(e, stream, None)
                if data:
                    if isinstance(data, bytes):
                        data = data.decode("utf-8", "replace")
                    entry[f"{stream}_tail"] = data[-1500:]
            # chip_smoke emits one JSON line per completed phase; recover
            # them so even a killed step leaves per-phase evidence (the
            # round-3 record had NO phase detail for its chip_smoke TIMEOUT)
            phases = _phase_lines(entry.get("stdout_tail", ""))
            if phases:
                entry["phases"] = phases
        results[name] = entry
        ran_here[name] = entry["ok"]
        # checkpoint the record (and its doc rendering — they must never
        # diverge, round-3 advisor high) after every step so a mid-ladder
        # kill still leaves the completed steps on disk
        record = _write_record(args, results, out)
        _write_doc(record, args.out_dir)
        _log(f"{name}: {'PASS' if entry['ok'] else 'FAIL'} "
             f"({entry['seconds']}s)")

    record = _write_record(args, results, out)
    _write_doc(record, args.out_dir)
    print(json.dumps({"gate": "release_check", "ok": record["ok"],
                      "partial": record["partial"],
                      "ran_here": ran_here, "out": out,
                      "steps": {k: v.get("ok")
                                for k, v in record["steps"].items()}}),
          flush=True)
    # exit status answers "did THIS invocation verify its steps": 0 iff it
    # ran at least one step and all of them passed. Round green-ness is the
    # record's ok field, which requires the FULL ladder (see _write_record).
    raise SystemExit(0 if ran_here and all(ran_here.values()) else 1)


def _phase_lines(text):
    """Collect chip_smoke's per-phase JSON progress lines from stdout."""
    phases = {}
    for line in (text or "").splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "phase" in rec:
                phases[rec.pop("phase")] = rec
    return phases


def _one_line(name, entry):
    if entry.get("skipped"):
        return f"| {name} | not run | | |"
    flag = "PASS" if entry["ok"] else "FAIL"
    if entry.get("commit"):
        flag += f" @{entry['commit']}"
    s = entry.get("summary") or {}
    if name == "bench" and "value" in s:
        detail = f"{s['value']} {s.get('unit', '')} (batch {s.get('batch')})"
    elif name == "chip_smoke" and "phases" in s:
        n = len(s["phases"])
        good = sum(1 for p in s["phases"].values() if p.get("ok"))
        detail = f"{good}/{n} phases"
    elif name == "overfit" and "trainers" in s:
        detail = "; ".join(
            f"{t} {r.get('drop_ratio', '?')}x" for t, r in s["trainers"].items()
        )
    elif name == "preset" and "presets" in s:
        detail = "; ".join(
            f"{p} uv {d['uv21_epe_px']['p95']:.2f}px p95"
            for p, d in s["presets"].items()
        )
    else:
        detail = entry.get("error", "")
    return f"| {name} | {flag} | {entry.get('seconds', '')}s | {detail} |"


def _write_doc(record, out_dir):
    """Regenerate this round's section in docs/RESULTS.md (idempotent)."""
    docs = os.path.join(out_dir, "docs")
    os.makedirs(docs, exist_ok=True)
    path = os.path.join(docs, "RESULTS.md")
    header = (
        "# Round-gate records\n\n"
        "Written by tools/release_check.py; the machine-readable record is "
        "RESULTS_r{N}.json at the repo root.\n"
    )
    marker = f"## Round {record['round']} —"
    ran = [v for v in record["steps"].values() if not v.get("skipped")]
    if record["ok"]:
        verdict = "GREEN"
    elif record.get("partial") and all(v["ok"] for v in ran):
        # no failures yet, but unrun steps remain: never stamp GREEN from a
        # subset (round-3 advisor high — doc said GREEN while JSON said RED)
        verdict = "PARTIAL (steps still unrun)"
    else:
        verdict = "RED"
    commit_note = (f"step commits {'/'.join(record['step_commits'])}"
                   if record.get("mixed_commits")
                   else f"commit {record['commit']}")
    section = "\n".join([
        "",
        f"## Round {record['round']} — {commit_note} "
        f"({record['utc']} UTC) — {verdict}",
        "",
        "| Step | Status | Wall | Detail |",
        "|---|---|---|---|",
        *[_one_line(k, v) for k, v in record["steps"].items()],
        "",
    ])
    text = header
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
        start = text.find(marker)
        if start != -1:
            # replace the existing section for this round (up to next round
            # header or EOF) so concurrent/merged invocations don't duplicate
            nxt = text.find("\n## Round ", start)
            pre = text[:start].rstrip("\n")
            post = text[nxt:] if nxt != -1 else ""
            text = pre + post
    with open(path, "w") as f:
        f.write(text.rstrip("\n") + "\n" + section)


if __name__ == "__main__":
    main()
