"""Smoke tests for the round-gate tools themselves.

Round 2 committed a gate (tools/overfit_check.py) that crashed on its first
subprocess call — a directory passed where every trainer CLI takes a .bin
file — and nothing in the suite would have caught it (VERDICT round-2,
weak #1/#3). These tests execute the gate tools end-to-end with tiny
budgets so a crash-on-line-one can never be committed again. They assert
the tools RUN and report; the real thresholds are asserted by the actual
chip runs recorded in docs/OVERFIT.md / docs/PRESETS.md.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(argv, timeout):
    # subprocesses don't see conftest's in-process jax.config: force CPU via
    # the package-level HAND3D_PLATFORM hook and share the compile cache
    env = dict(
        os.environ, HAND3D_PLATFORM="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/hand3d_tpu_test_cache",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1.0",
    )
    return subprocess.run(
        [sys.executable, *argv], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env,
    )


@pytest.mark.slow
def test_overfit_gate_runs_end_to_end(tmp_path):
    # 2 steps cannot pass the drop-ratio bar — the assertion here is that
    # the harness itself works: fixtures written, trainer subprocess runs,
    # metrics log parsed, JSON summary emitted, doc section written.
    doc = tmp_path / "OVERFIT.md"
    proc = _run_tool(
        ["tools/overfit_check.py", "--steps", "2", "--only", "lifting",
         "--records", "8", "--write-doc", str(doc)],
        timeout=600,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON summary in stdout:\n{proc.stdout}\n{proc.stderr}"
    summary = json.loads(lines[-1])
    entry = summary["trainers"]["lifting"]
    assert "error" not in entry, entry
    assert entry["loss_first"] > 0 and len(entry["curve"]) >= 2
    assert "drop" in doc.read_text()


@pytest.mark.slow
def test_overfit_gate_warm_from_runs(tmp_path):
    # --warm-from: fine-tune from a prior run's snapshots (the QAT
    # fine-tune path). Two tiny runs: one to produce snapshots, one warmed.
    prior = tmp_path / "prior"
    proc = _run_tool(
        ["tools/overfit_check.py", "--steps", "2", "--only", "lifting",
         "--records", "8", "--keep", str(prior)],
        timeout=600,
    )
    assert (prior / "snap_lift").is_dir(), proc.stderr[-500:]
    proc = _run_tool(
        ["tools/overfit_check.py", "--steps", "2", "--only", "lifting",
         "--records", "8", "--warm-from", str(prior), "--qat"],
        timeout=600,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON summary:\n{proc.stdout}\n{proc.stderr}"
    summary = json.loads(lines[-1])
    assert summary["warm_from"] == str(prior) and summary["qat"]
    entry = summary["trainers"]["lifting"]
    assert "error" not in entry, entry
    # warm start -> ratio bar drops to the divergence backstop (0.9)
    assert entry["min_ratio"] == 0.9


def test_release_check_records_round(tmp_path):
    # plumbing-only: all steps skipped, so this exercises argument handling,
    # record writing and the markdown append without any heavy subprocess.
    # The real per-round run is committed as RESULTS_r{N}.json.
    proc = _run_tool(
        ["tools/release_check.py", "--round", "97", "--out-dir", str(tmp_path),
         "--skip", "chip_smoke", "bench", "overfit", "preset", "generalization",
         "multihost", "multichip"],
        timeout=120,
    )
    record = json.loads((tmp_path / "RESULTS_r97.json").read_text())
    assert record["round"] == 97 and record["commit"]
    assert all(v["skipped"] for v in record["steps"].values())
    # nothing ran -> the gate must NOT claim green
    assert record["ok"] is False and proc.returncode == 1
    assert record["partial"] is True
    doc = (tmp_path / "docs" / "RESULTS.md").read_text()
    assert "Round 97" in doc and "GREEN" not in doc


def test_release_check_merge_adopts_prior_steps(tmp_path):
    # --merge folds an existing record in: steps recorded by a prior (or
    # concurrent) invocation survive. GREEN requires the FULL ladder — a
    # subset of passing steps yields partial:true / ok:false (round-3
    # advisor: the merge path let 2 of 6 gates stamp the round green).
    out = tmp_path / "RESULTS_r97.json"
    out.write_text(json.dumps({
        "round": 97, "commit": "prior", "utc": "", "ok": True,
        "steps": {"multihost": {"ok": True, "seconds": 3.0},
                  "multichip": {"ok": True, "seconds": 4.0}},
    }))
    proc = _run_tool(
        ["tools/release_check.py", "--round", "97", "--merge",
         "--out-dir", str(tmp_path),
         "--skip", "chip_smoke", "bench", "overfit", "preset", "generalization",
         "multihost", "multichip"],
        timeout=120,
    )
    record = json.loads(out.read_text())
    # adopted results kept verbatim; unrun steps stay skipped placeholders
    assert record["steps"]["multihost"] == {"ok": True, "seconds": 3.0}
    assert record["steps"]["multichip"]["ok"] is True
    assert record["steps"]["bench"]["skipped"]
    # only 2 of 6 gates have real results -> partial, NOT green; and this
    # invocation ran nothing itself, so its exit status is non-zero
    assert record["ok"] is False and record["partial"] is True
    assert proc.returncode == 1
    # the doc must render the no-failures-but-incomplete state as PARTIAL
    doc = (tmp_path / "docs" / "RESULTS.md").read_text()
    assert doc.count("## Round 97") == 1
    assert "PARTIAL" in doc and "GREEN" not in doc and "RED" not in doc
    # re-running must stay idempotent in the doc
    _run_tool(
        ["tools/release_check.py", "--round", "97", "--merge",
         "--out-dir", str(tmp_path),
         "--skip", "chip_smoke", "bench", "overfit", "preset", "generalization",
         "multihost", "multichip"],
        timeout=120,
    )
    doc = (tmp_path / "docs" / "RESULTS.md").read_text()
    assert doc.count("## Round 97") == 1


@pytest.mark.slow
def test_release_check_full_ladder_goes_green(tmp_path):
    # when every step in the table has a real passing result, the merged
    # record is GREEN — and per-step commit stamps are recorded, so adopted
    # steps keep the commit they measured (round-3 advisor, low)
    out = tmp_path / "RESULTS_r97.json"
    steps = ["chip_smoke", "bench", "overfit", "preset", "generalization",
             "multihost", "multichip"]
    out.write_text(json.dumps({
        "round": 97, "commit": "prior", "utc": "", "ok": False,
        "steps": {s: {"ok": True, "seconds": 1.0, "commit": "aaaa111"}
                  for s in steps if s != "multichip"},
    }))
    # run the one cheap real step (multichip dry run) to complete the set
    proc = _run_tool(
        ["tools/release_check.py", "--round", "97", "--merge",
         "--out-dir", str(tmp_path), "--steps", "multichip"],
        timeout=900,
    )
    record = json.loads(out.read_text())
    assert record["steps"]["multichip"]["ok"] is True, record["steps"]
    assert record["ok"] is True and record["partial"] is False
    assert proc.returncode == 0
    # the freshly-run step is stamped with the real commit; the adopted
    # steps keep theirs -> mixed commits are surfaced, not papered over
    assert record["steps"]["multichip"]["commit"] != "aaaa111"
    assert record["mixed_commits"] is True
    assert "aaaa111" in record["step_commits"]
    doc = (tmp_path / "docs" / "RESULTS.md").read_text()
    assert "GREEN" in doc and "step commits" in doc


def test_release_check_doc_tracks_record(tmp_path):
    # _write_doc renders exactly the record's state — RED on any failure,
    # PARTIAL when incomplete-but-unfailed, per-step commit stamps — and
    # main() calls it at every checkpoint so docs/RESULTS.md can never
    # contradict RESULTS_r{N}.json (round-3 advisor, high)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import release_check as rc

    base = {"round": 95, "commit": "bbbb222", "utc": "now",
            "step_commits": ["aaaa111"], "mixed_commits": False}
    # failure -> RED even when other steps are still unrun
    rec = dict(base, ok=False, partial=True, steps={
        "bench": {"ok": False, "seconds": 1.0, "commit": "aaaa111"},
        "chip_smoke": {"ok": None, "skipped": True}})
    rc._write_doc(rec, str(tmp_path))
    doc = (tmp_path / "docs" / "RESULTS.md").read_text()
    assert "RED" in doc and "FAIL @aaaa111" in doc
    # the checkpoint loop itself calls _write_doc after _write_record
    src = open(os.path.join(REPO, "tools", "release_check.py")).read()
    loop = src[src.index("for name in table:"):src.index("def _phase_lines")]
    assert loop.count("_write_doc") >= 1, "doc not refreshed per checkpoint"


def test_chip_smoke_budget_exhaustion_leaves_evidence(tmp_path):
    # with a wall budget too small for any attempt, chip_smoke must not
    # hang or overrun: every phase is recorded as not-run, one JSON line
    # per phase is emitted (the per-phase evidence release_check recovers
    # from a killed step), and the gate reports RED
    proc = _run_tool(["tools/chip_smoke.py", "--budget", "1"], timeout=120)
    assert proc.returncode == 1
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    phase_lines = [l for l in lines if "phase" in l]
    assert len(phase_lines) == 7, proc.stdout
    assert all("budget exhausted" in l["error"] for l in phase_lines)
    summary = [l for l in lines if l.get("gate") == "chip_smoke"][-1]
    assert summary["ok"] is False and summary["budget"] == 1


@pytest.mark.slow
def test_overfit_rerun_into_same_keep_dir_has_fresh_curves(tmp_path):
    # rerunning the gate into the same --keep dir must NOT concatenate
    # metrics logs: the parsed curve must reflect one run's reports only
    # (round-3 verdict weak #2: RESULTS_r03.json carried the handsegnet
    # curve twice, so loss_first came from a stale run)
    keep = tmp_path / "keep"
    for _ in range(2):
        proc = _run_tool(
            ["tools/overfit_check.py", "--steps", "2", "--only", "lifting",
             "--records", "8", "--keep", str(keep)],
            timeout=600,
        )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON summary:\n{proc.stdout}\n{proc.stderr}"
    summary = json.loads(lines[-1])
    curve = summary["trainers"]["lifting"]["curve"]
    # 4 steps at show-loss-freq 1 -> one run reports at most 4+1 points;
    # a concatenated double run would show ~2x that
    log_lines = (keep / "lifting.jsonl").read_text().splitlines()
    losses = [l for l in log_lines if "loss" in json.loads(l)]
    assert len(curve) == len(losses) <= 6, (curve, log_lines)


@pytest.mark.slow
def test_preset_accuracy_runs_end_to_end(tmp_path):
    doc = tmp_path / "PRESETS.md"
    # budget: the r5 int8_static variant adds an EAGER calibration pass of
    # the float cascade (slow on XLA:CPU) plus two variant sweeps
    proc = _run_tool(
        ["tools/preset_accuracy.py", "--random-init", "--images", "8",
         "--batch", "8", "--write-doc", str(doc)],
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    summary = json.loads(lines[-1])
    assert set(summary["presets"]) == {
        "seg_scale=0.5", "bf16", "int8", "int8_static", "int8_seg",
        "int8_seg_refiners", "int8_seg_pp", "phase_pack"}
    for name, deltas in summary["presets"].items():
        assert "uv21_epe_px" in deltas and "coord3d_drift" in deltas, name
    assert "Preset accuracy bounds" in doc.read_text()


@pytest.mark.slow
def test_generalization_gate_smoke(tmp_path):
    """tools/generalization_check.py --smoke end-to-end on CPU: rendered
    fixtures + synthetic CPM warm start + trainer subprocess runs.
    Asserts the gate MACHINERY (VERDICT r4 #4): lr column crosses the
    boundary, run B stops at half and --resume reproduces run A's final
    parameters BITWISE. The learning assert and the live-SIGTERM
    interruption are chip-scale only (the latter also unit-tested in
    tests/test_train_loop.py)."""
    doc = tmp_path / "GENERALIZATION.md"
    # inner per-run timeout sized for a CONTENDED host: the gate measured
    # 992 s wall solo, but a concurrent chip gate starves the 1-core host
    # and a 900 s inner budget flaked exactly once that way
    proc = _run_tool(
        ["tools/generalization_check.py", "--smoke", "--timeout", "1800",
         "--write-doc", str(doc)],
        timeout=4200,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON summary:\n{proc.stdout[-800:]}\n{proc.stderr[-800:]}"
    summary = json.loads(lines[-1])
    assert summary["ok"] is True, summary
    assert summary["lr_crossed"] is True
    assert summary["b_killed_midrun"] is None  # judged at full scale only
    assert summary["b_split_resume"] is True
    assert summary["resume_bitwise_equal"] is True
    assert summary["learned"] is None  # not judged at smoke scale
    assert sorted(summary["lr_values_seen"]) == [1e-5, 1e-4]
    assert "resume bitwise-equal" in doc.read_text()
