"""bench.py ladder-logic tests: the driver deliverable must be un-droppable.

Rounds 1 and 4 both shipped no driver perf number because the measurement
ladder burned one-shot rung timeouts against a wedged TPU tunnel
(BENCH_r01/BENCH_r04, VERDICT r4 #1). These tests pin the round-5 contract:
bench.py ALWAYS prints exactly one machine-readable JSON line — a full
result, a "partial": true lower bound, or a device-unreachable record —
and exits 0 whenever that line was printed.

The device interactions (_run_probe / _run_attempt) are mocked so every
branch of main() is exercised deterministically; test_bench_cpu_end_to_end
in test_gates.py covers the real subprocess path.
"""

import io
import json
import sys
import time

import pytest

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import bench  # noqa: E402


def _record(value, batch=128):
    return {"metric": "cascade_fps_per_chip", "value": value,
            "unit": "frames/sec", "vs_baseline": round(value / 20.0, 3),
            "batch": batch}


class _FakeTime:
    """Deterministic stand-in for bench's `time` module.

    main()'s wall-budget arithmetic is all perf_counter deltas; a fake
    clock advanced by the mocked probes/attempts/sleeps makes every budget
    branch (backoff, rung skipping, final emission) testable in
    milliseconds of real time.
    """

    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def perf_counter(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


@pytest.fixture
def run_main(monkeypatch, capsys):
    """Run bench.main() with mocked device IO; returns the parsed JSON line."""

    def go(probe_results, attempt_results, wall_budget=600.0,
           expect_attempt_tags=None):
        clock = _FakeTime()
        monkeypatch.setattr(bench, "time", clock)
        monkeypatch.setattr(bench, "_T0", 0.0)
        monkeypatch.setenv("HAND3D_BENCH_WALL_BUDGET", str(wall_budget))
        monkeypatch.setenv("HAND3D_BENCH_PROBE_TIMEOUT", "30")

        probes = iter(probe_results)
        attempts_seen = []

        def fake_probe(timeout):
            try:
                ok, dt = next(probes)
            except StopIteration:  # out of scripted probes: wedged forever
                ok, dt = False, min(timeout, 30.0)
            clock.t += dt
            return ok, dt

        def fake_attempt(tag, batch, timeout, env_over):
            attempts_seen.append((tag, batch, timeout))
            res = attempt_results.get(tag, (None, None))
            record, partial = res[0], res[1]
            status = (res[2] if len(res) > 2 else
                      "ok" if record is not None else "failed")
            # a successful rung finishes early; a failed/stalled one is
            # killed by the watchdog — the full-budget burn only happens
            # for slow-but-alive children, covered separately
            clock.t += 60.0 if record is not None else min(155.0, timeout)
            return record, partial, status

        monkeypatch.setattr(bench, "_run_probe", fake_probe)
        monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
        bench.main()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1, f"expected exactly one JSON line, got {out}"
        if expect_attempt_tags is not None:
            assert [t for t, _, _ in attempts_seen] == expect_attempt_tags
        return json.loads(out[0]), attempts_seen, clock.sleeps

    return go


def test_wedged_tunnel_emits_unreachable_record(run_main):
    """No probe ever succeeds -> no rung budget burned, honest record out."""
    rec, attempts, sleeps = run_main(
        probe_results=[(False, 30.0)] * 50, attempt_results={})
    assert rec["error"] == "device_unreachable"
    assert rec["value"] is None
    assert rec["probes"], "probe history must be in the record"
    assert attempts == [], "a wedged tunnel must not burn rung timeouts"
    # exponential backoff between failed probes
    assert sleeps and sleeps[0] <= sleeps[-1]


def test_bank_then_improve_emits_best(run_main):
    """Banker lands 1100 fps, improver lands 1180 -> best is emitted."""
    rec, attempts, _ = run_main(
        probe_results=[(True, 10.0)] * 4,
        attempt_results={
            "bf16+xla-floodfill+pychain": (_record(1100.0), None),
            "bf16+pallas+pychain": (_record(1180.0), None),
        },
        expect_attempt_tags=["bf16+xla-floodfill+pychain",
                             "bf16+pallas+pychain"])
    assert rec["value"] == 1180.0
    assert "partial" not in rec and "error" not in rec


def test_improver_failure_keeps_banked(run_main):
    rec, attempts, _ = run_main(
        probe_results=[(True, 10.0)] * 4,
        attempt_results={
            "bf16+xla-floodfill+pychain": (_record(1100.0), None),
        })
    assert rec["value"] == 1100.0
    assert [t for t, _, _ in attempts] == [
        "bf16+xla-floodfill+pychain", "bf16+pallas+pychain"]


def test_improver_slower_keeps_banked(run_main):
    rec, _, _ = run_main(
        probe_results=[(True, 10.0)] * 4,
        attempt_results={
            "bf16+xla-floodfill+pychain": (_record(1100.0), None),
            "bf16+pallas+pychain": (_record(900.0), None),
        })
    assert rec["value"] == 1100.0


def test_partial_milestone_survives_dead_children(run_main):
    """Every rung times out but one checkpointed a milestone -> lower bound."""
    partial = {"phase": "chain_warm", "per_batch_s": 0.25, "batch": 128,
               "tag": "bf16+xla-floodfill+pychain"}
    rec, _, _ = run_main(
        probe_results=[(True, 10.0)] * 10,
        attempt_results={"bf16+xla-floodfill+pychain": (None, partial)})
    assert rec["partial"] is True
    assert rec["value"] == pytest.approx(128 / 0.25)
    assert rec["partial_phase"] == "chain_warm"
    assert rec["vs_baseline"] == pytest.approx(128 / 0.25 / 20.0, rel=1e-3)


def test_reachable_but_all_rungs_fail_is_not_unreachable(run_main):
    """Healthy probes + failing rungs must NOT claim device_unreachable."""
    rec, attempts, _ = run_main(
        probe_results=[(True, 10.0)] * 10, attempt_results={},
        wall_budget=2000.0)
    assert rec["error"] == "bench_failed"
    # all four fallback rungs were actually tried
    assert len(attempts) == len(bench._ATTEMPTS)


def test_banker_gets_remaining_budget_minus_reserve(run_main):
    """Rung budgets are the remaining wall minus the fallback reserve —
    a cold 800 s compile must fit inside the banker's budget (the round-4
    constant-timeout ladder killed it mid-compile)."""
    _, attempts, _ = run_main(
        probe_results=[(True, 45.0)] * 2,
        attempt_results={
            "bf16+xla-floodfill+pychain": (_record(1000.0), None),
        }, wall_budget=3000.0)
    tag, _, timeout = attempts[0]
    # probe consumed 45 s; banker gets (3000 - 45) - reserve
    assert timeout == pytest.approx(3000.0 - 45.0 - bench._RUNG_RESERVE)
    assert timeout > 800.0


def test_wedge_then_recovery_banks_a_number(run_main):
    """Probes fail for a while, tunnel recovers, number still lands."""
    rec, attempts, _ = run_main(
        probe_results=[(False, 30.0)] * 3 + [(True, 12.0)] * 3,
        attempt_results={
            "bf16+xla-floodfill+pychain": (_record(1050.0), None),
        }, wall_budget=2000.0)
    assert rec["value"] == 1050.0
    assert attempts[0][0] == "bf16+xla-floodfill+pychain"


def test_banked_then_degraded_ships_banked(run_main):
    """Device wedges after the banker rung -> ship banked, skip improver."""
    rec, attempts, _ = run_main(
        probe_results=[(True, 10.0)] + [(False, 30.0)] * 5,
        attempt_results={
            "bf16+xla-floodfill+pychain": (_record(1070.0), None),
        })
    assert rec["value"] == 1070.0
    assert len(attempts) == 1, "no rung may run without a fresh healthy probe"


@pytest.mark.slow
def test_bench_cpu_end_to_end():
    """`python bench.py` end-to-end on CPU: probe gates, banker rung lands.

    Tiny forced batch + short chain keep XLA:CPU times bounded; the wall
    budget is set low enough that the Pallas improver rung is skipped after
    the banker succeeds, so the run exercises probe -> bank -> emit.
    """
    import os
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py")],
        env=dict(os.environ, HAND3D_BENCH_PLATFORM="cpu",
                 HAND3D_BENCH_FORCE_BATCH="4", HAND3D_BENCH_CHAIN="2",
                 # banker budget = wall - probe - _RUNG_RESERVE (250):
                 # 600 leaves it ~330 s, and after it succeeds (~150 s)
                 # the improver is skipped (< _IMPROVER_MIN_BUDGET left)
                 HAND3D_BENCH_WALL_BUDGET="600",
                 HAND3D_BENCH_PROBE_TIMEOUT="60"),
        capture_output=True, text=True, timeout=650)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "cascade_fps_per_chip"
    # a full banker measurement on a healthy (CPU) backend — not partial
    assert rec.get("error") is None
    assert rec["value"] > 0
    assert rec["batch"] == 4


def test_stalled_rung_retried_once(run_main):
    """A stall-kill may be a slow server-side compile — the rung gets one
    fresh child before the ladder falls through to the next compile path."""
    calls = []

    def results(tag):
        calls.append(tag)
        if tag == "bf16+xla-floodfill+pychain" and calls.count(tag) == 2:
            return (_record(1090.0), None, "ok")
        return (None, None, "stalled")

    rec, attempts, _ = run_main(
        probe_results=[(True, 10.0)] * 6,
        attempt_results=_DynamicResults(results),
        wall_budget=2000.0)
    tags = [t for t, _, _ in attempts]
    assert tags[:2] == ["bf16+xla-floodfill+pychain"] * 2
    assert rec["value"] == 1090.0


class _DynamicResults(dict):
    """attempt_results stand-in that computes results per call."""

    def __init__(self, fn):
        super().__init__()
        self._fn = fn

    def get(self, tag, default=None):
        return self._fn(tag)

    def __contains__(self, tag):
        return True


def test_probe_subprocess_cpu_real():
    """The actual --probe subprocess on the CPU platform: ok + fast."""
    import os
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py"), "--probe"],
        env=dict(os.environ, HAND3D_BENCH_PLATFORM="cpu"),
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["probe_ok"] is True
