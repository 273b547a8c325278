"""Export the cascade as a self-contained AOT serving artifact.

Example:
    python tools/export_model.py --weights weights.npz --out cascade.h3dx \
        --batch-size 32 --input-hw 240x320 --platforms tpu,cpu

The artifact bakes the weights into a StableHLO program (jax.export); a
serving host loads it with hand3d_tpu.export.ExportedEstimator.load (or any
jax.export-compatible runtime) — no model code or weight files needed.
"""

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights", required=True, help="npz param tree")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--input-hw", default="240x320", help="HxW, e.g. 240x320")
    p.add_argument("--right-hand", action="store_true",
                   help="bake right-hand side (default: left)")
    p.add_argument("--compute-dtype", default=None,
                   choices=[None, "bfloat16"], help="conv compute dtype")
    p.add_argument("--seg-scale", type=float, default=1.0,
                   help="fast localization preset (see docs/DESIGN.md)")
    p.add_argument("--quantize", default=None, choices=[None, "int8"])
    p.add_argument("--phase-pack", action="store_true")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    args = p.parse_args(argv)

    from hand3d_tpu.export import export_estimator
    from hand3d_tpu.weights import load_npz

    h, w = (int(x) for x in args.input_hw.lower().split("x"))
    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_estimator(
        load_npz(args.weights),
        args.out,
        batch_size=args.batch_size,
        input_hw=(h, w),
        left_hand=not args.right_hand,
        compute_dtype=args.compute_dtype,
        seg_scale=args.seg_scale,
        quantize=args.quantize,
        phase_pack=args.phase_pack,
        platforms=platforms,
    )
    print(f"wrote {args.out}: {len(blob)} bytes, "
          f"batch={args.batch_size}, input={h}x{w}, "
          f"platforms={platforms or [jax.default_backend()]}")


if __name__ == "__main__":
    main()
