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
identical to converted weights). Timing blocks on every iteration's results
(successive calls are data-independent, so blocking only on the final result
would not serialize the device work).
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def bench_cascade(batch=32, iters=20, warmup=3, compute_dtype=None):
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D(compute_dtype=compute_dtype)
    params = net.init(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(params, image, hand_side):
        out = net.inference(params, image, hand_side)
        return out.keypoint_coord3d, out.keypoint_uv21

    image = jax.random.uniform(jax.random.PRNGKey(1), (batch, 240, 320, 3)) - 0.5
    hand_side = jnp.tile(jnp.asarray([[1.0, 0.0]]), (batch, 1))
    image, hand_side = jax.device_put((image, hand_side))

    for _ in range(warmup):
        jax.block_until_ready(fwd(params, image, hand_side))

    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fwd(params, image, hand_side))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    dtype = None
    if os.environ.get("HAND3D_BENCH_DTYPE", "bf16") == "bf16":
        dtype = jnp.bfloat16
    fps = None
    for batch in (32, 16, 8, 4, 1):
        try:
            fps = bench_cascade(batch=batch, compute_dtype=dtype)
            break
        except Exception:
            continue
    if fps is None:
        raise SystemExit("bench failed at all batch sizes")
    print(
        json.dumps(
            {
                "metric": "cascade_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
