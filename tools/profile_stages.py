"""Per-stage device-time profile of the cascade (chained-scan differential).

On platforms where block_until_ready can return before device execution
finishes (e.g. remote/tunneled TPUs), naive timing measures dispatch, not
compute. This tool times each pipeline stage the robust way: N data-dependent
iterations of the stage inside one jitted lax.scan, fetch a scalar, and use
(t_N - t_1) / (N - 1).

Usage:
  python tools/profile_stages.py [--batch 32] [--hw 240 320] [--chain 12]
      [--quantize int8] [--seg-scale 1.0] [--dtype bf16|f32]

Prints ms/batch per stage plus the full-cascade total.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


def _chain_time(fn, args, chain, trials=3):
    """Median-free min-of-trials differential seconds per fn application."""

    def chained(n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                out = fn(*a, carry=carry)
                return out, ()

            s, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return s

        return run

    c1, cn = chained(1), chained(chain)
    float(c1(*args))  # compile
    float(cn(*args))

    def best(f):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(cn) - best(c1)) / (chain - 1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    p.add_argument("--chain", type=int, default=12)
    p.add_argument("--quantize", choices=["int8"], default=None)
    p.add_argument("--seg-scale", type=float, default=1.0)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    args = p.parse_args()

    from hand3d_tpu.models import handsegnet, posenet
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.ops.image import resize_bilinear
    from hand3d_tpu.ops.keypoints import decode_upsampled
    from hand3d_tpu.ops.segmentation import calc_center_bb, single_obj_scoremap

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    net = ColorHandPose3D(compute_dtype=dtype, seg_scale=args.seg_scale)
    params = net.init(jax.random.PRNGKey(0))
    if args.quantize == "int8":
        from hand3d_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params)

    b, (h, w) = args.batch, args.hw
    image = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3)) - 0.5
    )
    hand_side = jax.device_put(jnp.tile(jnp.asarray([[1.0, 0.0]]), (b, 1)))
    sh = max(1, round(h * args.seg_scale))
    sw = max(1, round(w * args.seg_scale))
    seg_in = resize_bilinear(image, (sh, sw)) if (sh, sw) != (h, w) else image
    seg_map = net.inference_detection(params, seg_in)[-1]
    crop = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(2), (b, 256, 256, 3)) - 0.5
    )
    scoremap = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(3), (b, 32, 32, 21))
    )

    # each stage as fn(*data, carry) with a data dependence on the carry and
    # a scalar-ish reduction back into the carry
    stages = {
        "handsegnet": (
            lambda im, carry: jnp.sum(
                net.inference_detection(params, im + carry * 0.0)[-1]
            )
            * 1e-9,
            (seg_in,),
        ),
        "single_obj_scoremap": (
            lambda sm, carry: jnp.sum(single_obj_scoremap(sm + carry * 0.0))
            * 1e-9,
            (seg_map,),
        ),
        "calc_center_bb": (
            lambda sm, carry: jnp.sum(
                calc_center_bb(single_obj_scoremap(sm + carry * 0.0))[0]
            )
            * 1e-9,
            (seg_map,),
        ),
        "crop_from_scoremap": (
            lambda im, sm, carry: jnp.sum(
                net._crop_from_scoremap(im, sm + carry * 0.0)[0]
            )
            * 1e-9,
            (image, seg_map),
        ),
        "posenet": (
            lambda cr, carry: jnp.sum(
                net.inference_pose2d(params, cr + carry * 0.0)[-1]
            )
            * 1e-9,
            (crop,),
        ),
        "poseprior+viewpoint": (
            lambda sm, carry: jnp.sum(
                net.inference_pose3d(params, sm + carry * 0.0, hand_side)
            )
            * 1e-9,
            (scoremap,),
        ),
        "decode_upsampled": (
            lambda sm, carry: jnp.sum(decode_upsampled(sm + carry * 0.0, 8))
            * 1e-9,
            (scoremap,),
        ),
        "FULL cascade": (
            lambda im, hs, carry: jnp.sum(
                net.inference(params, im + carry * 0.0, hs).keypoint_coord3d
            )
            * 1e-9,
            (image, hand_side),
        ),
    }

    label = (
        f"batch={b} hw={h}x{w} dtype={args.dtype} "
        f"seg_scale={args.seg_scale} quantize={args.quantize}"
    )
    print(f"# per-stage device time, {label}", flush=True)
    for name, (fn, data) in stages.items():
        secs = _chain_time(fn, data, args.chain)
        note = f"  ({b / secs:7.0f} img/s)" if name == "FULL cascade" else ""
        print(f"{name:22s} {secs * 1e3:8.3f} ms/batch{note}", flush=True)


if __name__ == "__main__":
    main()
