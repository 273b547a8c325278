"""Benchmark: full-cascade RGB -> 3D-pose throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "cascade_fps_per_chip", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 20.0}

Baseline normalization: the reference publishes no throughput numbers
(SURVEY.md §6); BASELINE.json's north star is ">= 10x the TF1-CPU fps" for
the full pipeline. We take 2.0 fps as a generous estimate of the TF1-CPU
single-image rate for this ~45 GFLOP/frame cascade, so vs_baseline = 1.0 at
the 10x target (20 fps) and scales linearly beyond it.

The benchmarked program is the complete pipeline of run.py/eval_full.py —
HandSegNet on a 240x320 frame, blob extraction + bbox + 256x256 crop,
PoseNet, PosePrior+ViewpointNet, keypoint decode — as one jitted batched
program (weights are randomly initialized; FLOPs and memory traffic are
identical to converted weights).

Timing methodology: on this platform block_until_ready can return before
execution finishes (remote-device semantics), so naive loops measure
dispatch, not compute. We therefore chain N data-dependent cascade
iterations inside one jitted lax.scan, force completion by fetching the
scalar result, and take the differential (t_N - t_1) / (N - 1) as device
time per batch.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
from jax import lax


def _chained(net, n):
    @jax.jit
    def fn(params, image, hand_side):
        def body(carry, _):
            out = net.inference(params, image + carry * 0.0, hand_side)
            return jnp.sum(out.keypoint_coord3d) * 1e-9, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
        return s

    return fn


def bench_cascade(batch=32, chain=16, trials=3, compute_dtype=None,
                  seg_scale=1.0, quantize=None, phase_pack=False):
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D(compute_dtype=compute_dtype, seg_scale=seg_scale)
    params = net.init(jax.random.PRNGKey(0))
    if quantize == "int8":
        from hand3d_tpu.ops.quant import quantize_params_int8

        min_ch = int(os.environ.get("HAND3D_BENCH_QUANT_MINCH", "128"))
        params = quantize_params_int8(params, min_in_chan=min_ch)
    if phase_pack:
        from hand3d_tpu.ops.phasepack import phase_pack_params

        params = phase_pack_params(params)
    image = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, 240, 320, 3)) - 0.5
    )
    hand_side = jax.device_put(jnp.tile(jnp.asarray([[1.0, 0.0]]), (batch, 1)))

    c1, cn = _chained(net, 1), _chained(net, chain)
    float(c1(params, image, hand_side))  # compile + run
    float(cn(params, image, hand_side))

    def best(fn):
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(fn(params, image, hand_side))  # fetch forces completion
            times.append(time.perf_counter() - t0)
        return min(times)

    per_batch = (best(cn) - best(c1)) / (chain - 1)
    return batch / per_batch


def _emit(fps, batch):
    print(
        json.dumps(
            {
                "metric": "cascade_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 20.0, 3),
                # measurement condition, so runs at different batch sizes
                # (incl. the smaller-batch fallback attempts) stay comparable
                "batch": batch,
            }
        ),
        flush=True,
    )


def _child(batch):
    dtype = None
    if os.environ.get("HAND3D_BENCH_DTYPE", "bf16") == "bf16":
        dtype = jnp.bfloat16
    # HAND3D_BENCH_SEG_SCALE < 1 benchmarks the low-res-localization speed
    # preset (models/cascade.py seg_scale); the headline stays at parity 1.0.
    seg_scale = float(os.environ.get("HAND3D_BENCH_SEG_SCALE", "1.0"))
    # HAND3D_BENCH_QUANT=int8 benchmarks the post-training-quantized path.
    quantize = os.environ.get("HAND3D_BENCH_QUANT") or None
    assert quantize in (None, "int8"), (
        f"HAND3D_BENCH_QUANT={quantize!r} — only 'int8' is supported; "
        "refusing to silently benchmark fp32"
    )
    # HAND3D_BENCH_PHASEPACK=1 packs the 64-channel conv1 blocks (same MACs,
    # full MXU lanes; float-reassociation-level numeric delta only).
    phase_pack = os.environ.get("HAND3D_BENCH_PHASEPACK", "0") == "1"
    _emit(bench_cascade(batch=batch, compute_dtype=dtype, seg_scale=seg_scale,
                        quantize=quantize, phase_pack=phase_pack), batch)


def main():
    """Run each measurement attempt in a subprocess with a hard timeout.

    The TPU tunnel in this environment occasionally wedges a client process
    indefinitely (near-zero CPU, blocked in an RPC); an in-process attempt
    would turn that into a bench failure. A killed subprocess just falls
    through to the next attempt.
    """
    import subprocess
    import sys

    # batch 128 measures ~20% above batch 32 on v5e (deeper pipelining of the
    # glue stages between conv bursts); fall back to smaller batches if the
    # tunnel wedges or memory is tight on the day's hardware.
    attempts = [(128, 420), (32, 420), (8, 300), (1, 240)]
    for batch, timeout in attempts:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(batch)],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            print(f"bench attempt batch={batch} timed out", file=sys.stderr)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                return
        print(
            f"bench attempt batch={batch} failed:\n{proc.stderr[-2000:]}",
            file=sys.stderr,
        )
    raise SystemExit("bench failed at all attempts")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
    else:
        main()
