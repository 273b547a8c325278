"""Benchmark: full-cascade RGB -> 3D-pose throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "cascade_fps_per_chip", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 20.0}

Baseline normalization: the reference publishes no throughput numbers
(SURVEY.md §6); BASELINE.json's north star is ">= 10x the TF1-CPU fps" for
the full pipeline. We take 2.0 fps as a generous estimate of the TF1-CPU
single-image rate for this 121.8 GFLOP/frame cascade (measured layer walk,
tools/roofline.py), so vs_baseline = 1.0 at the 10x target (20 fps) and
scales linearly beyond it.

The benchmarked program is the complete pipeline of run.py/eval_full.py —
HandSegNet on a 240x320 frame, blob extraction + bbox + 256x256 crop,
PoseNet, PosePrior+ViewpointNet, keypoint decode — as one jitted batched
program (weights are randomly initialized; FLOPs and memory traffic are
identical to converted weights).

Timing methodology: on this platform block_until_ready can return before
execution finishes (remote-device semantics), so naive loops measure
dispatch, not compute. We chain N data-dependent cascade iterations — the
output scalar of iteration i feeds iteration i+1, serializing execution on
device — force completion by fetching the final scalar, and take the
differential (t_N - t_1) / (N - 1) as device time per batch. Two chaining
methods exist:

  * "pychain" (default): one plain-jit step dispatched N times from Python,
    each call consuming the previous call's scalar. Async dispatch overlaps
    host dispatch with device compute, so the differential is pure device
    time as long as dispatch latency < per-batch device time (true for
    batch >= 8). Compiles the same single-step program as serving — no
    separate scan compile.
  * "scan": N iterations inside one jitted lax.scan (round-1's method).
    Kept as a cross-check; round 1 showed bf16+scan+Pallas-floodfill can
    wedge the compiler (VERDICT.md), which is why it is no longer the only
    path.

ROBUSTNESS (the round-1 lesson): every attempt in the fallback ladder must
exercise a DIFFERENT compile path, and each child logs per-phase progress
to stderr so a timeout shows where it died. See _ATTEMPTS below.

WEDGE ROBUSTNESS (the round-4 lesson): rung diversity does not help when the
TPU tunnel itself is wedged — in that state every child hangs at ~0% CPU
before its first device interaction and each rung just burns its one-shot
timeout (BENCH_r01/BENCH_r04 both died this way). The ladder is therefore
driven by a cheap DEVICE-HEALTH PROBE (tiny matmul in a killable subprocess):

  * no rung budget is spent unless a probe has just succeeded; failed
    probes back off exponentially and re-probe, so a wedged window costs
    one probe timeout per try instead of 240-420 s per rung;
  * each rung gets the REMAINING wall budget (minus a fallback reserve)
    rather than a constant: its child is supervised by a CPU-time stall
    watchdog that distinguishes WEDGED (~0% CPU -> killed in ~155 s) from
    legitimately SLOW (a cold cascade compile burns CPU for hundreds of
    seconds — 816 s observed — and is left to finish);
  * children checkpoint PARTIAL timings (post-compile chain-1 latency, warm
    chain-run latency) to a side file, so a child killed mid-measurement
    still contributes a conservative lower-bound fps, emitted with
    "partial": true if nothing better lands;
  * the whole run fits a wall budget (default 1380 s, inside the driver's
    1500 s) and ALWAYS prints one machine-readable JSON line: a full result,
    a partial result, or a device-unreachable record carrying the probe
    history — and exits 0 whenever that line was printed, so the driver
    records evidence instead of a bare rc=1.

Strategy: bank-then-improve. The first healthy probe triggers the proven-
fast rung (bf16 + XLA floodfill, ~60-150 s) to BANK a number; only with a
banked result and budget to spare is the ~5%-faster Pallas rung attempted.
The best successful measurement is emitted at the end.
"""

import json
import os
import sys
import time

_T0 = time.perf_counter()


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _write_partial(phase, per_batch_s, batch):
    """Checkpoint a conservative timing milestone to the parent's side file.

    Written after each measurement phase inside the child so that a child
    killed on timeout still leaves a usable lower-bound throughput. Each
    line is a full JSON record; the parent uses the LAST line (latest =
    tightest bound). ``per_batch_s`` must be an UPPER bound on true device
    time per batch (so batch/per_batch_s is a defensible fps lower bound).
    """
    path = os.environ.get("HAND3D_BENCH_PARTIAL_FILE")
    if not path:
        return
    try:
        with open(path, "a") as f:
            f.write(json.dumps({"phase": phase, "per_batch_s": per_batch_s,
                                "batch": batch}) + "\n")
            f.flush()
            os.fsync(f.fileno())
    except OSError as e:
        _log(f"partial write failed: {e}")


# --- chaining methods -------------------------------------------------------


def _chained_scan(net, n):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def fn(params, image, hand_side):
        def body(carry, _):
            out = net.inference(params, image + carry * 0.0, hand_side)
            return jnp.sum(out.keypoint_coord3d) * 1e-9, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
        return s

    return lambda p, i, h: float(fn(p, i, h))


# round-1 compatibility alias (tools/repro_pallas_scan.py case 4)
def _chained(net, n):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def fn(params, image, hand_side):
        def body(carry, _):
            out = net.inference(params, image + carry * 0.0, hand_side)
            return jnp.sum(out.keypoint_coord3d) * 1e-9, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
        return s

    return fn


def _make_runners(net, method, chain):
    """Return (run_1, run_chain): callables (params, image, hand_side) -> float
    that execute 1 / ``chain`` data-dependent cascade iterations and block."""
    import jax
    import jax.numpy as jnp

    if method == "scan":
        return _chained_scan(net, 1), _chained_scan(net, chain)

    assert method == "pychain", method

    @jax.jit
    def step(params, image, hand_side, carry):
        out = net.inference(params, image + carry * 0.0, hand_side)
        return jnp.sum(out.keypoint_coord3d) * 1e-9

    def run_n(n):
        def go(params, image, hand_side):
            c = jnp.float32(0.0)
            for _ in range(n):
                c = step(params, image, hand_side, c)
            return float(c)

        return go

    return run_n(1), run_n(chain)


# --- measurement ------------------------------------------------------------


def bench_cascade(batch=32, chain=16, trials=3, compute_dtype=None,
                  seg_scale=1.0, quantize=None, phase_pack=False,
                  method="pychain", quantize_scope=None):
    import jax
    import jax.numpy as jnp

    from hand3d_tpu.models.cascade import ColorHandPose3D

    _log(f"building net: batch={batch} chain={chain} dtype={compute_dtype} "
         f"seg_scale={seg_scale} quant={quantize} "
         f"quant_scope={quantize_scope} phase_pack={phase_pack} "
         f"method={method} floodfill={os.environ.get('HAND3D_FLOODFILL', 'auto')} "
         f"pallas={os.environ.get('HAND3D_PALLAS', '1')}")
    net = ColorHandPose3D(compute_dtype=compute_dtype, seg_scale=seg_scale)
    params = net.init(jax.random.PRNGKey(0))
    if quantize in ("int8", "int8_static"):
        from hand3d_tpu.ops.quant import (quantize_params_int8,
                                          unit_act_scales)

        min_ch = int(os.environ.get("HAND3D_BENCH_QUANT_MINCH", "128"))
        # int8_static: the calibrated-scale deployment graph (elementwise
        # input quantize, NO per-sample reduction). Unit scales give the
        # exact deployed compute for SPEED runs; accuracy bounds come from
        # tools/preset_accuracy.py with real calibration.
        act = (unit_act_scales(params, min_in_chan=min_ch)
               if quantize == "int8_static" else None)
        params = quantize_params_int8(
            params, min_in_chan=min_ch,
            scopes=set(quantize_scope) if quantize_scope else None,
            act_scales=act)
    if phase_pack:
        from hand3d_tpu.ops.phasepack import phase_pack_params

        params = phase_pack_params(params)
    image = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, 240, 320, 3)) - 0.5
    )
    hand_side = jax.device_put(jnp.tile(jnp.asarray([[1.0, 0.0]]), (batch, 1)))

    run1, runn = _make_runners(net, method, chain)
    _log("compile + first run (chain=1) ...")
    run1(params, image, hand_side)
    # milestone 1: a warm chain-1 run is dispatch + one full cascade — an
    # upper bound on device time per batch, checkpointed in case the chain
    # run below never completes (degraded-host insurance).
    t0 = time.perf_counter()
    run1(params, image, hand_side)
    t_one = time.perf_counter() - t0
    _write_partial("chain1_warm", t_one, batch)
    _log(f"chain=1 done ({t_one:.3f}s); warm run (chain={chain}) ...")
    t0 = time.perf_counter()
    runn(params, image, hand_side)
    t_warm = time.perf_counter() - t0
    # milestone 2: warm chain run / chain — still an upper bound (includes
    # one dispatch + compile-cache lookups amortized over the chain).
    _write_partial("chain_warm", t_warm / chain, batch)
    _log(f"warm done ({t_warm:.3f}s); timing ...")

    def best(fn, tag):
        times = []
        for t in range(trials):
            t0 = time.perf_counter()
            fn(params, image, hand_side)  # fetch forces completion
            times.append(time.perf_counter() - t0)
            _log(f"  {tag} trial {t}: {times[-1]:.3f}s")
        return min(times)

    best_n = best(runn, f"chain={chain}")
    # milestone 3: trial-min chain time / chain — tightest upper bound short
    # of the dispatch-subtracting differential below.
    _write_partial("chain_trials", best_n / chain, batch)
    per_batch = (best_n - best(run1, "chain=1")) / (chain - 1)
    _log(f"per-batch {per_batch * 1e3:.2f} ms -> {batch / per_batch:.1f} fps")
    return batch / per_batch


def _emit(fps, batch, extra=None):
    rec = {
        "metric": "cascade_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 20.0, 3),
        # measurement condition, so runs at different batch sizes
        # (incl. the smaller-batch fallback attempts) stay comparable
        "batch": batch,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def _child(batch):
    _set_platform()
    import jax
    import jax.numpy as jnp

    # persistent compile cache: fallback attempts re-compile mostly-shared
    # programs; cache hits keep later ladder rungs well inside their timeout
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/hand3d_chip_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        _log(f"compile cache unavailable: {e}")

    dtype = None
    if os.environ.get("HAND3D_BENCH_DTYPE", "bf16") == "bf16":
        dtype = jnp.bfloat16
    # HAND3D_BENCH_SEG_SCALE < 1 benchmarks the low-res-localization speed
    # preset (models/cascade.py seg_scale); the headline stays at parity 1.0.
    seg_scale = float(os.environ.get("HAND3D_BENCH_SEG_SCALE", "1.0"))
    # HAND3D_BENCH_QUANT=int8 benchmarks the post-training-quantized path;
    # int8_static uses calibrated-static activation scales (see above).
    quantize = os.environ.get("HAND3D_BENCH_QUANT") or None
    assert quantize in (None, "int8", "int8_static"), (
        f"HAND3D_BENCH_QUANT={quantize!r} — only 'int8'/'int8_static' are "
        "supported; refusing to silently benchmark fp32"
    )
    # HAND3D_BENCH_PHASEPACK=1 packs the 64-channel conv1 blocks (same MACs,
    # full MXU lanes; float-reassociation-level numeric delta only).
    phase_pack = os.environ.get("HAND3D_BENCH_PHASEPACK", "0") == "1"
    # HAND3D_BENCH_QUANT_SCOPE=handsegnet (comma-separated stages)
    # restricts int8 to those scopes — the drift-free scoped preset.
    scope_env = os.environ.get("HAND3D_BENCH_QUANT_SCOPE", "")
    quantize_scope = [s for s in scope_env.split(",") if s] or None
    method = os.environ.get("HAND3D_BENCH_METHOD", "pychain")
    chain = int(os.environ.get("HAND3D_BENCH_CHAIN", "16"))
    _emit(bench_cascade(batch=batch, chain=chain, compute_dtype=dtype,
                        seg_scale=seg_scale, quantize=quantize,
                        phase_pack=phase_pack, method=method,
                        quantize_scope=quantize_scope), batch)


# Fallback rungs, reliable-first ("bank"): each differs in at least one
# compile-path dimension (floodfill kernel, dtype, chaining method, batch) so
# no single compiler pathology can take out the whole ladder — the round-1
# failure mode (VERDICT.md weak #1). There are no per-rung timeout
# constants: each attempt gets the remaining wall budget minus a reserve
# (the stall watchdog in _run_attempt kills wedged children after ~155 s,
# so a generous absolute budget no longer risks burning the wall on a
# wedge — the round-4 failure mode).
_ATTEMPTS = [
    # (tag, batch, env overrides)
    # banker rung: measured ~60 s warm / <150 s cold compile on a healthy
    # exclusive host (816 s cold on a loaded one, chip_smoke), and only
    # ~5% below the Pallas-floodfill number (1113 vs 1178 fps b128, r2)
    ("bf16+xla-floodfill+pychain", 128, {"HAND3D_PALLAS": "0"}),
    ("bf16+xla+pychain-b32", 32, {"HAND3D_PALLAS": "0"}),
    ("fp32+xla+pychain-b32", 32,
     {"HAND3D_PALLAS": "0", "HAND3D_BENCH_DTYPE": "fp32"}),
    ("fp32+xla+scan-b8", 8,
     {"HAND3D_PALLAS": "0", "HAND3D_BENCH_DTYPE": "fp32",
      "HAND3D_BENCH_METHOD": "scan", "HAND3D_BENCH_CHAIN": "8"}),
]

# improver rung: Pallas floodfill is the headline-best path (~+5% at b128)
# but its cold compile has been seen past 250 s on a loaded host — it is
# only attempted AFTER a banked success, with >= _IMPROVER_MIN_BUDGET left.
_IMPROVER = ("bf16+pallas+pychain", 128, {})
_IMPROVER_MIN_BUDGET = 500.0

# wall-budget reserve kept back from a rung attempt while further fallback
# rungs (plus their gating probe) could still run after it
_RUNG_RESERVE = 250.0

# Healthy-host probe latency (import jax + device init + tiny matmul over
# the tunnel). Used as the denominator for adaptive budget scaling.
_PROBE_NOMINAL_S = 15.0


def _set_platform():
    """Apply HAND3D_BENCH_PLATFORM (e.g. "cpu") via the config API.

    The axon TPU plugin in this environment ignores the JAX_PLATFORMS env
    var (tests/conftest.py), so CI/self-tests of the ladder need the config
    route to keep probe + rung children off the tunnel.
    """
    plat = os.environ.get("HAND3D_BENCH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _probe_main():
    """Child body for --probe: one tiny device matmul, then a JSON line."""
    t0 = time.perf_counter()
    _set_platform()
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.float32)
    v = float(jnp.asarray(x @ x)[0, 0])
    print(json.dumps({"probe_ok": v == 256.0,
                      "seconds": round(time.perf_counter() - t0, 2)}),
          flush=True)


def _run_probe(timeout):
    """Run the device-health probe in a killable subprocess.

    Returns (ok, elapsed_s). A wedged tunnel hangs the child at ~0% CPU;
    the timeout-kill costs `timeout` seconds instead of a full rung budget.
    """
    import subprocess

    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            capture_output=True, timeout=timeout, text=True,
        )
        ok = r.returncode == 0 and '"probe_ok": true' in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    return ok, time.perf_counter() - t0


def _child_cpu_seconds(pid):
    """utime+stime of a process in seconds, or None once it's gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def _run_attempt(tag, batch, timeout, env_over, stall_window=420.0,
                 stall_cpu_frac=0.05):
    """Run one ladder rung as a subprocess.

    Returns (record|None, partial|None, status) with status in
    {"ok", "failed", "timed out", "stalled"}. ``record`` is the parsed
    full-measurement JSON on success. ``partial`` is the child's last
    checkpointed milestone (see _write_partial) when the child died after
    producing at least one timing.

    Child supervision distinguishes the two documented failure modes
    (BENCH_r04 postmortem) instead of conflating them under one absolute
    timeout:
      * WEDGED — the tunnel hangs the client at ~0% CPU: detected as
        < ``stall_cpu_frac`` of a core used over the last ``stall_window``
        seconds, killed early (no point waiting out the budget);
      * SLOW — tolerated up to ``timeout``, which main() sizes from the
        remaining wall budget.
    CAVEAT that sizes the window: on the axon tunnel XLA compiles
    SERVER-side, so a child waiting out a legitimate cold compile also
    sits near 0% CPU (measured: a healthy b128 cascade compile was
    stall-killed by a 150 s window). 420 s covers every exclusive-host
    compile observed (~60 warm / <300 cold) while still cutting a true
    wedge well before it eats the rung budget; main() additionally
    retries a stalled rung once, since "stalled" may mean "compile was
    slower than the window".
    """
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    pf = tempfile.NamedTemporaryFile(
        mode="w", prefix="bench_partial_", suffix=".jsonl", delete=False)
    pf.close()
    env = dict(os.environ, **env_over,
               HAND3D_BENCH_PARTIAL_FILE=pf.name)
    _log(f"attempt '{tag}' batch={batch} budget={timeout:.0f}s "
         f"(stall kill: <{stall_cpu_frac:.0%} CPU over {stall_window:.0f}s)")
    try:
        with tempfile.TemporaryFile(mode="w+") as out_f, \
                tempfile.TemporaryFile(mode="w+") as err_f:
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--child", str(batch)],
                stdout=out_f, stderr=err_f, cwd=here, env=env, text=True,
            )
            t_start = time.perf_counter()
            timed_out = stalled = False
            # (t, cpu_seconds) samples over the stall window
            samples = [(t_start, 0.0)]
            while True:
                if proc.poll() is not None:
                    break
                now = time.perf_counter()
                if now - t_start > timeout:
                    timed_out = True
                    break
                cpu = _child_cpu_seconds(proc.pid)
                if cpu is not None:
                    samples.append((now, cpu))
                    while samples[0][0] < now - stall_window:
                        samples.pop(0)
                    window = now - samples[0][0]
                    if window >= stall_window * 0.95:
                        used = samples[-1][1] - samples[0][1]
                        if used < stall_cpu_frac * window:
                            stalled = True
                            break
                time.sleep(5.0)
            if timed_out or stalled:
                proc.kill()
                proc.wait()
            out_f.seek(0)
            err_f.seek(0)
            stdout, stderr = out_f.read(), err_f.read()
        for line in stdout.splitlines():
            if line.startswith("{"):
                _log(f"attempt '{tag}' SUCCEEDED")
                return json.loads(line), None, "ok"
        status = ("stalled" if stalled else
                  "timed out" if timed_out else "failed")
        _log(f"attempt '{tag}' {status}; child progress tail:\n"
             + "\n".join(stderr.splitlines()[-12:]))
        partial = None
        try:
            with open(pf.name) as f:
                lines = [ln for ln in f.read().splitlines() if ln.strip()]
            if lines:
                partial = json.loads(lines[-1])
                partial["tag"] = tag
                _log(f"attempt '{tag}' left partial milestone: {partial}")
        except (OSError, ValueError) as e:
            _log(f"partial read failed: {e}")
        return None, partial, status
    finally:
        try:
            os.unlink(pf.name)
        except OSError:
            pass


def main():
    """Probe-gated, budget-aware measurement ladder (see module docstring).

    Guarantees one JSON line on stdout before exit:
      * full result            — rung completed its differential timing
      * "partial": true        — only a mid-measurement milestone survived
                                 (value is a conservative fps LOWER bound)
      * "error": "device_unreachable" — no probe ever succeeded; the record
                                 carries the probe history as evidence
    Exit code is 0 whenever that line was printed: producing the
    machine-readable record IS this script's contract with the driver.
    """
    wall_budget = float(os.environ.get("HAND3D_BENCH_WALL_BUDGET", "1380"))
    deadline = _T0 + wall_budget
    # measured on this host: an exclusive probe on a DEGRADED-but-alive
    # tunnel took 137 s end to end (cold import + axon init + one tiny
    # matmul), so 90 s would misread "slow" as "wedged"; 165 s keeps the
    # wedge cost bounded while accepting the slowest observed live tunnel
    probe_timeout = float(os.environ.get("HAND3D_BENCH_PROBE_TIMEOUT", "165"))

    def remaining():
        return deadline - time.perf_counter()

    banked = None          # best full-measurement record
    partial_best = None    # best (fps, record) from dead children
    probes = []            # (ok, elapsed) history for the unreachable record
    backoff = 15.0
    rung = 0               # next _ATTEMPTS index to try
    improver_done = False
    stall_retried = set()  # rung tags already retried after a stall-kill

    while remaining() > probe_timeout + 10:
        if banked is not None and improver_done:
            # past a banked result we only ever try the improver once;
            # anything else is budget risk for no evidence gain
            break
        ok, dt = _run_probe(min(probe_timeout, remaining() - 5))
        probes.append({"ok": ok, "seconds": round(dt, 1)})
        _log(f"probe #{len(probes)}: ok={ok} {dt:.1f}s "
             f"(remaining {remaining():.0f}s)")
        if not ok:
            if banked is not None:
                break  # device degraded again — ship what we have
            sleep_s = min(backoff, max(0.0, remaining() - probe_timeout - 10))
            if sleep_s > 0:
                _log(f"device unhealthy; backing off {sleep_s:.0f}s")
                time.sleep(sleep_s)
            backoff = min(backoff * 2, 300.0)
            continue
        backoff = 15.0
        if banked is None:
            if rung >= len(_ATTEMPTS):
                break  # every compile-path rung failed on a healthy device
            tag, batch, env_over = _ATTEMPTS[rung]
            rung += 1
            reserve = _RUNG_RESERVE if rung < len(_ATTEMPTS) else 60.0
        else:
            tag, batch, env_over = _IMPROVER
            improver_done = True
            if remaining() < _IMPROVER_MIN_BUDGET:
                _log("skipping improver rung: not enough budget left")
                break
            reserve = 60.0
        # self-test hook: lets the CI ladder test run tiny batches on CPU
        force_batch = os.environ.get("HAND3D_BENCH_FORCE_BATCH")
        if force_batch:
            batch = int(force_batch)
        timeout = remaining() - reserve
        if timeout < 120:
            _log(f"rung '{tag}' skipped: only {timeout:.0f}s left")
            break
        record, partial, status = _run_attempt(tag, batch, timeout, env_over)
        if record is not None:
            if banked is None or record["value"] > banked["value"]:
                banked = record
        else:
            if partial is not None and partial.get("per_batch_s", 0) > 0:
                fps = partial["batch"] / partial["per_batch_s"]
                if partial_best is None or fps > partial_best[0]:
                    partial_best = (fps, partial)
            if (status == "stalled" and tag not in stall_retried
                    and banked is None and rung > 0):
                # a "stall" can be a server-side compile slower than the
                # window (see _run_attempt caveat) — give the same rung one
                # fresh child before falling through the ladder
                stall_retried.add(tag)
                rung -= 1
                _log(f"rung '{tag}' stalled; will retry it once")

    if banked is not None:
        print(json.dumps(banked), flush=True)
        return
    if partial_best is not None:
        fps, partial = partial_best
        _log("no rung completed; emitting partial lower bound")
        _emit(fps, partial["batch"],
              extra={"partial": True, "partial_phase": partial["phase"],
                     "partial_tag": partial["tag"],
                     "note": "child killed mid-measurement; value is a "
                             "conservative fps lower bound"})
        return
    any_probe_ok = any(p["ok"] for p in probes)
    error = "bench_failed" if any_probe_ok else "device_unreachable"
    note = (
        "device answered health probes but every measurement rung failed — "
        "see the per-rung stderr tails above"
        if any_probe_ok else
        "no health probe (tiny device matmul, killable subprocess) "
        "succeeded within the wall budget; the TPU tunnel is wedged "
        "(see VERDICT r4 / BENCH_r01+r04 postmortems)"
    )
    _log(f"no measurement landed; emitting '{error}' record")
    print(json.dumps({
        "metric": "cascade_fps_per_chip",
        "value": None,
        "unit": "frames/sec",
        "vs_baseline": None,
        "error": error,
        "probes": probes,
        "wall_s": round(time.perf_counter() - _T0, 1),
        "note": note,
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _probe_main()
    else:
        main()
