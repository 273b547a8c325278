"""Static HBM report for the main compiled programs (XLA memory analysis).

Prints, per configuration, what the compiled executable will actually
reserve on the chip: argument/output buffers, the transient activation
("temp") allocation, and generated code size. Uses
``jax.jit(...).lower(...).compile().memory_analysis()`` — no execution, so
it is exact for the compiled program and fast enough to sweep configs.

Usage:
  python tools/memory_report.py [--batches 1 32 128] [--accum 1 2 4]
      [--hw 240 320] [--train-batch 8]

Useful for sizing serving buckets and for verifying that the gradient
accumulation / remat levers actually cut activation memory before
committing to a long run.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _fmt(n):
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:8.1f} {unit}"
        n /= 1024
    return f"{n} B"


def _report(tag, compiled):
    m = compiled.memory_analysis()
    print(f"{tag:44s} args {_fmt(m.argument_size_in_bytes)}  "
          f"out {_fmt(m.output_size_in_bytes)}  "
          f"temp {_fmt(m.temp_size_in_bytes)}  "
          f"code {_fmt(m.generated_code_size_in_bytes)}")


def inference_reports(batches, hw):
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))

    for b in batches:
        spec = jax.ShapeDtypeStruct((b, *hw, 3), jnp.float32)
        hs = jax.ShapeDtypeStruct((b, 2), jnp.float32)
        compiled = (
            jax.jit(lambda p, im, h: net.inference(p, im, h).keypoint_coord3d)
            .lower(params, spec, hs)
            .compile()
        )
        _report(f"cascade inference batch {b} {hw[0]}x{hw[1]}", compiled)


def train_reports(batch, accums, crop=256):
    import optax

    from hand3d_tpu.models import posenet
    from hand3d_tpu.train import posenet_scoremap_loss
    from hand3d_tpu.train.trainer import init_state, make_train_step

    def loss_fn(params, data, key):
        preds = posenet.apply(params[posenet.SCOPE], data["image_crop"])
        return posenet_scoremap_loss(preds, data["scoremap"],
                                     data["keypoint_vis21"])

    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    opt = optax.adam(1e-4)
    state = init_state(params, opt)
    data = {
        "image_crop": jax.ShapeDtypeStruct((batch, crop, crop, 3), jnp.float32),
        "scoremap": jax.ShapeDtypeStruct((batch, crop, crop, 21), jnp.float32),
        "keypoint_vis21": jax.ShapeDtypeStruct((batch, 21), jnp.float32),
    }
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    for acc in accums:
        for remat in ((False, True) if acc == max(accums) else (False,)):
            step = make_train_step(loss_fn, opt, donate=False,
                                   accum_steps=acc, remat=remat)
            compiled = jax.jit(step).lower(state, data, key).compile()
            tag = f"posenet train step batch {batch} accum={acc}" + (
                " remat" if remat else "")
            _report(tag, compiled)


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batches", type=int, nargs="+", default=[1, 32])
    p.add_argument("--hw", type=int, nargs=2, default=[240, 320])
    p.add_argument("--train-batch", type=int, default=8)
    p.add_argument("--accum", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--skip-train", action="store_true")
    args = p.parse_args()

    print(f"backend: {jax.default_backend()}")
    inference_reports(args.batches, tuple(args.hw))
    if not args.skip_train:
        train_reports(args.train_batch, args.accum)


if __name__ == "__main__":
    main()
