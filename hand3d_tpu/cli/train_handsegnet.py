"""Train HandSegNet on RHD full frames (<- training_handsegnet.py).

Reference hyperparameters (training_handsegnet.py:29-39): batch 8, Adam, LR
[1e-5, 1e-6, 1e-7] stepping at [20k, 30k], 40k iterations, hue augmentation
+ random 256x256 crops, softmax cross-entropy against the 2-class hand mask.
"""

import jax

from hand3d_tpu.cli._common import (  # noqa: F401
    add_show_loss_arg,
    add_steps_per_call_arg,
    _metrics_logger,
    add_qat_arg,
    maybe_qat,
    add_mesh_arg,
    add_memory_args,
    add_weights_arg,
    base_parser,
    build_mesh,
    load_weight_trees,
)
from hand3d_tpu.data.config import PreprocessConfig
from hand3d_tpu.data.pipeline import InputPipeline
from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.models import handsegnet
from hand3d_tpu.train import handsegnet_loss, make_optimizer
from hand3d_tpu.train.loop import fit


def loss_fn(params, batch, key):
    logits = handsegnet.apply(params[handsegnet.SCOPE], batch["image"])
    return handsegnet_loss(logits, batch["hand_mask"])


def main():
    p = base_parser(__doc__)
    p.set_defaults(batch_size=8)
    add_weights_arg(p)
    p.add_argument("--data", default=None, help="Path to rhd_training.bin")
    p.add_argument("--max-iter", type=int, default=40000)
    p.add_argument("--lr", type=float, nargs="+", default=[1e-5, 1e-6, 1e-7])
    p.add_argument("--lr-iter", type=int, nargs="+", default=[20000, 30000])
    p.add_argument("--snapshot-dir", default="snapshots_handsegnet")
    p.add_argument("--snapshot-freq", type=int, default=5000)
    p.add_argument("--resume", action="store_true")
    add_qat_arg(p)
    add_show_loss_arg(p)
    add_steps_per_call_arg(p)
    p.add_argument("--metrics-log", default=None,
                   help="Append one JSON line per loss report here (JSONL).")
    p.add_argument("--step-timeout", type=float, default=None,
                   help="Watchdog: abort (exit 17) if no step completes "
                        "within this many seconds (hang detection); set "
                        "well above the first step's compile time.")
    p.add_argument("--no-fused", dest="fused", action="store_false",
                   default=True,
                   help="Run preprocessing as a separate program instead "
                        "of fusing it into the jitted train step")
    add_mesh_arg(p)
    add_memory_args(p)
    args = p.parse_args()

    dataset = RHDDataset("training", path=args.data)
    cfg = PreprocessConfig(hue_aug=True, random_crop_to_size=True)
    mesh = build_mesh(args.mesh)
    sharding = None
    if mesh is not None:
        from hand3d_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)
    pipeline = InputPipeline(dataset, cfg, args.batch_size, seed=args.seed,
                             sharding=sharding, yield_raw=args.fused)

    params = {handsegnet.SCOPE: handsegnet.init(jax.random.PRNGKey(args.seed))}
    if args.weights:
        loaded = load_weight_trees(args.weights)
        if handsegnet.SCOPE in loaded:
            params[handsegnet.SCOPE].update(loaded[handsegnet.SCOPE])

    base_loss = maybe_qat(loss_fn, args)
    train_loss = base_loss
    if args.fused:
        from hand3d_tpu.data.preprocess import preprocess_rhd
        from hand3d_tpu.train.trainer import fuse_preprocess

        train_loss = fuse_preprocess(base_loss, preprocess_rhd, cfg)

    optimizer = make_optimizer(args.lr, args.lr_iter)
    fit(
        train_loss, params, optimizer, pipeline, args.max_iter,
        mesh=mesh, seed=args.seed, show_loss_freq=args.show_loss_freq, snapshot_dir=args.snapshot_dir,
        snapshot_freq=args.snapshot_freq, resume=args.resume,
        step_timeout=args.step_timeout,
        remat=args.remat, accum_steps=args.accum_steps,
        metrics_logger=_metrics_logger(args),
        steps_per_call=args.steps_per_call,
    )


if __name__ == "__main__":
    main()
