"""Generic training loop: pipeline -> jitted step -> snapshots/metrics.

Replaces the reference's per-script sess.run loops (training_*.py:85-95)
with one driver that any stage reuses. Differences by design:
  * input batches prefetch on a host thread and preprocess on device;
  * the LR schedule actually advances (the reference never incremented
    global_step, see hand3d_tpu.train.schedule);
  * snapshots keep optimizer state and support exact resume.
"""

import contextlib
import os
import sys
import threading
import time

import jax

from hand3d_tpu.train import checkpoints
from hand3d_tpu.train.trainer import (
    init_state,
    make_resident_train_step,
    make_train_step,
)

WATCHDOG_EXIT_CODE = 17


class _Watchdog:
    """Abort the process if no training step completes within ``timeout``.

    A wedged device RPC or hung collective blocks the main thread inside
    native code where no Python exception can be raised, so the only sound
    recovery is process-level: log, flush, and exit with a distinctive code
    for a supervisor to restart (training resumes from the latest snapshot
    via --resume). ``beat()`` marks progress; ``stop()`` disarms it when the
    loop returns — otherwise eval/export/a second fit() running after
    training would be killed ``timeout`` seconds later.
    """

    def __init__(self, timeout, progress, log):
        self.timeout = timeout
        self.progress = progress
        self.log = log
        self._last = time.monotonic()
        self._stopped = False
        threading.Thread(
            target=self._watch, daemon=True, name="step-watchdog"
        ).start()

    def beat(self):
        self._last = time.monotonic()

    def stop(self):
        self._stopped = True

    @contextlib.contextmanager
    def suspended(self):
        """Pause hang detection for a legitimately long operation (e.g. an
        in-training eval pass, which can exceed any sane step timeout);
        the clock restarts from the moment the operation finishes."""
        self._suspended = True
        try:
            yield
        finally:
            self.beat()
            self._suspended = False

    def _watch(self):
        while not self._stopped:
            time.sleep(min(self.timeout / 4.0, 5.0))
            if getattr(self, "_suspended", False):
                continue
            stale = time.monotonic() - self._last
            if not self._stopped and stale > self.timeout:
                self.log(
                    f"step watchdog: no progress for {stale:.0f}s at "
                    f"iteration {self.progress['iter']} — device or "
                    f"collective hang; exiting {WATCHDOG_EXIT_CODE} so a "
                    "supervisor can restart and --resume from the latest "
                    "snapshot"
                )
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(WATCHDOG_EXIT_CODE)


def fit(
    loss_fn,
    params,
    optimizer,
    pipeline,
    max_iter,
    *,
    mesh=None,
    seed=0,
    show_loss_freq=1000,
    snapshot_freq=5000,
    snapshot_dir=None,
    resume=False,
    step_timeout=None,
    log=print,
    metrics_logger=None,
    remat=False,
    accum_steps=1,
    eval_fn=None,
    eval_freq=0,
    snapshot_on_sigterm=True,
    steps_per_call=1,
):
    """Train ``params`` with ``loss_fn(params, batch, key)``.

    Returns the final TrainState. Mirrors the reference loop shape
    (loss print every 1k, snapshot every 5k, final snapshot at the end).
    ``step_timeout``: seconds without a completed step before the watchdog
    aborts the process (hang detection; None = disabled). Set it well above
    the first step's compile time.
    ``eval_fn``: optional ``eval_fn(state, step) -> dict`` run every
    ``eval_freq`` steps (and after the final step); its metrics go to
    ``log`` and the metrics logger (step + eval_* keys). The reference had
    no in-training validation at all — separate eval scripts only.
    ``snapshot_on_sigterm``: preemption safety — on SIGTERM/SIGINT (spot
    VM reclaim, TPU maintenance, ^C) finish nothing further, save the
    current state into ``snapshot_dir``, and return, so a restart with
    ``--resume`` loses at most the in-flight step. Only active when
    fit() runs on the main thread (signal API restriction).
    ``steps_per_call > 1``: device-resident training — upload the WHOLE
    dataset to the device once and run ``steps_per_call`` full steps per
    device call (trainer.make_resident_train_step), amortizing per-step
    dispatch latency. Requires a fused (yield_raw) single-process unsharded
    pipeline and a dataset that fits device memory; trajectory-identical to
    the per-step path with the same seed. Snapshots/evals land on call
    boundaries (the first boundary at/after each configured step), loss
    reporting stays exact (every step's loss is returned).
    """
    state = init_state(params, optimizer)
    start_step = 0
    if resume and snapshot_dir:
        latest = checkpoints.latest_snapshot(snapshot_dir)
        if latest:
            state = checkpoints.restore_snapshot(latest, state)
            start_step = int(state.step)
            log(f"Resumed from {latest} at step {start_step}")

    if mesh is not None:
        from hand3d_tpu.train.trainer import shard_state

        state = shard_state(mesh, state)

    if steps_per_call > 1:
        if mesh is not None:
            raise ValueError(
                "steps_per_call > 1 does not compose with a mesh yet: the "
                "resident dataset would need per-shard index streams; run "
                "multi-step training single-device"
            )
        if not getattr(pipeline, "yield_raw", False):
            raise ValueError(
                "steps_per_call > 1 requires a fused pipeline "
                "(InputPipeline(..., yield_raw=True)): preprocessing must "
                "run inside the scanned step"
            )
        if pipeline.process_shard != (0, 1):
            raise ValueError(
                "steps_per_call > 1 is single-process: the resident index "
                "stream does not implement per-host epoch shards"
            )
        step_fn = make_resident_train_step(
            loss_fn, optimizer, remat=remat, accum_steps=accum_steps
        )
    else:
        step_fn = make_train_step(loss_fn, optimizer, mesh=mesh, remat=remat,
                                  accum_steps=accum_steps)
    base_key = jax.random.PRNGKey(seed)

    preempt = {"signal": None}
    old_handlers = {}
    if snapshot_on_sigterm and snapshot_dir and (
        threading.current_thread() is threading.main_thread()
    ):
        import signal as signal_mod

        def _on_signal(signum, frame):
            preempt["signal"] = signum
            # restore the previous handler so a SECOND signal acts
            # immediately (e.g. ^C ^C force-kills a hung save)
            signal_mod.signal(signum, old_handlers[signum])

        for sig in (signal_mod.SIGTERM, signal_mod.SIGINT):
            old_handlers[sig] = signal_mod.signal(sig, _on_signal)

    progress = {"iter": start_step}
    watchdog = (
        _Watchdog(step_timeout, progress, log) if step_timeout else None
    )
    t0 = time.perf_counter()
    try:
        if steps_per_call > 1:
            state = _run_loop_resident(
                state, step_fn, pipeline, base_key, start_step, max_iter,
                steps_per_call, progress, watchdog, show_loss_freq,
                snapshot_freq, snapshot_dir, metrics_logger, log, t0,
                eval_fn, eval_freq, preempt,
            )
        else:
            # resume restarts the data stream WHERE the interrupted run left
            # off: same epoch shuffle order and same per-step augmentation
            # keys as an uninterrupted run (replaying from epoch 0 would
            # oversample early epochs and break resumed-vs-straight-through
            # determinism)
            if start_step:
                spe = pipeline.steps_per_epoch()
                it = pipeline.iterate(
                    epochs=None, start_epoch=start_step // spe,
                    skip_steps=start_step % spe,
                )
            else:
                it = pipeline.iterate(epochs=None)
            state = _run_loop(
                state, step_fn, it, base_key, start_step, max_iter, progress,
                watchdog, show_loss_freq, snapshot_freq, snapshot_dir,
                metrics_logger, log, t0, eval_fn, eval_freq, preempt,
            )
    finally:
        # disarm even on exceptions a caller may catch — otherwise whatever
        # runs after fit() (eval, export, another fit) is killed later
        if watchdog is not None:
            watchdog.stop()
        if old_handlers:
            import signal as signal_mod

            for sig, handler in old_handlers.items():
                signal_mod.signal(sig, handler)
    return state


def _run_loop_resident(state, multi_fn, pipeline, base_key, start_step,
                       max_iter, steps_per_call, progress, watchdog,
                       show_loss_freq, snapshot_freq, snapshot_dir,
                       metrics_logger, log, t0, eval_fn=None, eval_freq=0,
                       preempt=None):
    """Window loop for steps_per_call > 1: the whole dataset is device-
    resident and each device call advances up to ``steps_per_call`` steps
    (trainer.make_resident_train_step). Batch index rows reproduce
    data.pipeline's epoch shuffle exactly (same epoch_indices, same
    seed+epoch), and per-step keys are folded in-program from the same
    base key, so the trajectory matches the per-step path (same batches,
    same keys; numerics equal up to XLA fusion-order float reassociation,
    measured ~1e-6 over a few steps)."""
    import numpy as np

    from hand3d_tpu.data.pipeline import epoch_indices

    spe = pipeline.steps_per_epoch()
    n = len(pipeline.dataset)
    data = pipeline.dataset.raw_batch(np.arange(n))
    nbytes = sum(np.asarray(v).nbytes for v in data.values())
    log(f"resident dataset: {n} records, {nbytes / 1e6:.1f} MB on device, "
        f"{steps_per_call} steps/call")
    data = jax.device_put(data)

    epoch_cache = {}

    def row(i):
        epoch = i // spe
        if epoch not in epoch_cache:
            epoch_cache.clear()  # windows advance monotonically
            epoch_cache[epoch] = epoch_indices(
                n, pipeline.batch_size, pipeline.shuffle,
                pipeline.seed + epoch,
            )
        return epoch_cache[epoch][i % spe]

    def run_eval(state, step):
        ctx = watchdog.suspended() if watchdog is not None else (
            contextlib.nullcontext()
        )
        with ctx:
            results = {k: float(v) for k, v in eval_fn(state, step).items()}
        line = "  ".join(f"{k} {v:.4g}" for k, v in results.items())
        log(f"Eval @ {step}\t {line}")
        if metrics_logger is not None:
            metrics_logger.log(
                step=step, **{f"eval_{k}": v for k, v in results.items()}
            )

    i = start_step
    while i < max_iter:
        if preempt is not None and preempt["signal"] is not None:
            log(f"signal {preempt['signal']}: saving snapshot at "
                f"iteration {i} and stopping")
            if snapshot_dir:
                checkpoints.save_snapshot(snapshot_dir, state, step=i)
            return state
        progress["iter"] = i
        k = min(steps_per_call, max_iter - i)
        idx = np.stack([row(j) for j in range(i, i + k)]).astype(np.int32)
        state, losses = multi_fn(state, data, idx, base_key, np.int32(i))
        # the window is the unit of progress: fetching the loss vector
        # blocks until every step in it has really executed
        losses = np.asarray(losses)
        if watchdog is not None:
            watchdog.beat()
        end = i + k
        if not np.all(np.isfinite(losses)):
            bad = i + int(np.argmin(np.isfinite(losses)))
            if snapshot_dir:
                checkpoints.save_snapshot(snapshot_dir, state, step=end)
            raise FloatingPointError(f"non-finite loss at iteration {bad}")
        if show_loss_freq:
            for j in range(i, end):
                if j % show_loss_freq == 0:
                    rate = (j - start_step + 1) / (time.perf_counter() - t0)
                    log(f"Iteration {j}\t Loss {losses[j - i]:.1e}\t "
                        f"{rate:.1f} it/s")
                    sys.stdout.flush()
                    if metrics_logger is not None:
                        metrics_logger.log(step=j, loss=float(losses[j - i]),
                                           steps_per_s=rate)
        # snapshots/evals land on the first call boundary at/after each
        # configured step (the per-step path hits them exactly; a mid-window
        # state no longer exists here). The final step's snapshot/eval below
        # covers end == max_iter.
        inside = [j for j in range(i, end) if j > 0]
        if end < max_iter:
            if snapshot_dir and snapshot_freq and any(
                    j % snapshot_freq == 0 for j in inside):
                checkpoints.save_snapshot(snapshot_dir, state, step=end)
                log("Saved a snapshot.")
            if eval_fn is not None and eval_freq and any(
                    j % eval_freq == 0 for j in inside):
                run_eval(state, end)
        i = end
    if eval_fn is not None:
        run_eval(state, max_iter)
    if snapshot_dir:
        checkpoints.save_snapshot(snapshot_dir, state, step=max_iter)
    return state


def _run_loop(state, step_fn, it, base_key, start_step, max_iter, progress,
              watchdog, show_loss_freq, snapshot_freq, snapshot_dir,
              metrics_logger, log, t0, eval_fn=None, eval_freq=0,
              preempt=None):
    def run_eval(state, step):
        # an eval pass (compile + a bounded dataset sweep) legitimately
        # exceeds step-scale timeouts — keep the hang watchdog out of it
        ctx = watchdog.suspended() if watchdog is not None else (
            contextlib.nullcontext()
        )
        with ctx:
            results = {
                k: float(v) for k, v in eval_fn(state, step).items()
            }
        line = "  ".join(f"{k} {v:.4g}" for k, v in results.items())
        log(f"Eval @ {step}\t {line}")
        if metrics_logger is not None:
            metrics_logger.log(
                step=step, **{f"eval_{k}": v for k, v in results.items()}
            )

    pending_loss = None  # previous step's loss, fetched one step behind
    for i in range(start_step, max_iter):
        if preempt is not None and preempt["signal"] is not None:
            # preemption (SIGTERM/SIGINT): persist and stop — a restart
            # with --resume continues from here
            log(f"signal {preempt['signal']}: saving snapshot at "
                f"iteration {i} and stopping")
            if snapshot_dir:
                checkpoints.save_snapshot(snapshot_dir, state, step=i)
            return state
        progress["iter"] = i
        batch = next(it)
        key = jax.random.fold_in(base_key, i)
        state, metrics = step_fn(state, batch, key)
        if watchdog is not None:
            # dispatch is async: a step only counts once its loss value is
            # real. Fetch the PREVIOUS step's loss so one step stays in
            # flight and the heartbeat doesn't serialize host and device.
            if pending_loss is not None:
                float(pending_loss)
                watchdog.beat()
            pending_loss = metrics["loss"]

        if show_loss_freq and (i % show_loss_freq) == 0:
            loss_v = float(metrics["loss"])
            if not (loss_v == loss_v and abs(loss_v) != float("inf")):
                # failure detection: save state for post-mortem, then stop
                # (label i+1: the state already contains iteration i's
                # update, and state.step == i + 1)
                if snapshot_dir:
                    checkpoints.save_snapshot(snapshot_dir, state, step=i + 1)
                raise FloatingPointError(
                    f"non-finite loss {loss_v} at iteration {i}"
                )
            rate = (i - start_step + 1) / (time.perf_counter() - t0)
            log(f"Iteration {i}\t Loss {loss_v:.1e}\t {rate:.1f} it/s")
            sys.stdout.flush()
            if metrics_logger is not None:
                metrics_logger.log(step=i, loss=loss_v, steps_per_s=rate)

        if snapshot_dir and snapshot_freq and (i % snapshot_freq) == 0 and i > 0:
            # label i+1 == state.step: the filename step must match the
            # step counter inside (resume logs / checkpoint tooling
            # select by it)
            checkpoints.save_snapshot(snapshot_dir, state, step=i + 1)
            log("Saved a snapshot.")

        if eval_fn is not None and eval_freq and (i % eval_freq) == 0 and i > 0:
            run_eval(state, i)

    if watchdog is not None and pending_loss is not None:
        # the last in-flight step must also complete under the watchdog
        float(pending_loss)
        watchdog.beat()
    if eval_fn is not None:
        run_eval(state, max_iter)
    if snapshot_dir:
        # the final save fetches device state — keep it under the watchdog
        checkpoints.save_snapshot(snapshot_dir, state, step=max_iter)
    return state
