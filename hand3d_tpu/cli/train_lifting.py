"""Train a PosePriorNetwork lifting variant on RHD (<- training_lifting.py).

Reference hyperparameters (training_lifting.py:36-51): batch 8, Adam, LR
[1e-5, 1e-6] stepping at [60k], 80k iterations; inputs are GT scoremaps of
noisy GT crops (coord-uv, crop-center, crop-offset, crop-scale noise); loss
depends on the variant (see hand3d_tpu.train.losses.lifting_loss).
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
from hand3d_tpu.models.poseprior import VARIANTS, PosePriorNetwork
from hand3d_tpu.train import lifting_loss, make_optimizer
from hand3d_tpu.train.loop import fit


def main():
    p = base_parser(__doc__)
    p.set_defaults(batch_size=8)
    add_weights_arg(p)
    p.add_argument("--variant", choices=VARIANTS, default="proposed")
    p.add_argument("--dropout", action="store_true",
                   help="Enable the FC towers' dropout during training. OFF "
                        "by default because the reference's executed "
                        "training graph never activates it (the evaluation "
                        "placeholder defaults True and training_lifting.py "
                        "never feeds it).")
    p.add_argument("--data", default=None, help="Path to rhd_training.bin")
    p.add_argument("--max-iter", type=int, default=80000)
    p.add_argument("--lr", type=float, nargs="+", default=[1e-5, 1e-6])
    p.add_argument("--lr-iter", type=int, nargs="+", default=[60000])
    p.add_argument("--snapshot-dir", default=None)
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
    p.add_argument("--eval-data", default=None,
                   help="Path to rhd_evaluation.bin: run the GT-scoremap "
                        "3D EPE eval periodically during training")
    p.add_argument("--eval-freq", type=int, default=5000,
                   help="Steps between in-training evals (with --eval-data)")
    p.add_argument("--eval-batches", type=int, default=None,
                   help="Bound each in-training eval to this many batches")
    add_mesh_arg(p)
    add_memory_args(p)
    args = p.parse_args()
    snapshot_dir = args.snapshot_dir or f"snapshots_lifting_{args.variant}"

    dataset = RHDDataset("training", path=args.data)
    cfg = PreprocessConfig(
        use_wrist_coord=False, hand_crop=True,
        coord_uv_noise=True, crop_center_noise=True,
        crop_offset_noise=True, crop_scale_noise=True,
    )
    mesh = build_mesh(args.mesh)
    sharding = None
    if mesh is not None:
        from hand3d_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)
    pipeline = InputPipeline(dataset, cfg, args.batch_size, seed=args.seed,
                             sharding=sharding, yield_raw=args.fused)

    net = PosePriorNetwork(args.variant)
    params = net.init(jax.random.PRNGKey(args.seed))
    if args.weights:
        loaded = load_weight_trees(args.weights)
        for scope in params:
            if scope in loaded:
                params[scope].update(loaded[scope])

    def loss_fn(params, batch, key):
        # Default train=False: the reference trains lifting with dropout
        # DISABLED — training_lifting.py builds
        # `evaluation = placeholder_with_default(True)` and its sess.run
        # loop never feeds it (:54-56, :89-95), so ops.dropout
        # (general.py:139-148) always takes the keep-everything branch.
        # --dropout opts back into the layers' stated keep-probs.
        out = net.apply(
            params, batch["scoremap"], batch["hand_side"],
            train=args.dropout, key=key
        )
        return lifting_loss(args.variant, out, batch)

    base_loss = maybe_qat(loss_fn, args)
    train_loss = base_loss
    if args.fused:
        from hand3d_tpu.data.preprocess import preprocess_rhd
        from hand3d_tpu.train.trainer import fuse_preprocess

        train_loss = fuse_preprocess(base_loss, preprocess_rhd, cfg)

    eval_fn = None
    if args.eval_data:
        from hand3d_tpu.eval.harnesses import eval3d_lifting

        eval_dataset = RHDDataset("evaluation", path=args.eval_data)

        def eval_fn(state, step):
            m = eval3d_lifting(
                args.variant, jax.device_get(state.params), eval_dataset,
                batch_size=args.batch_size, max_batches=args.eval_batches,
            )
            return {k: m[k] for k in
                    ("epe_mean_mm", "epe_median_mm", "auc_0_50mm")}

    optimizer = make_optimizer(args.lr, args.lr_iter)
    fit(
        train_loss, params, optimizer, pipeline, args.max_iter,
        mesh=mesh, seed=args.seed, show_loss_freq=args.show_loss_freq, snapshot_dir=snapshot_dir,
        snapshot_freq=args.snapshot_freq, resume=args.resume,
        step_timeout=args.step_timeout,
        remat=args.remat, accum_steps=args.accum_steps,
        metrics_logger=_metrics_logger(args),
        steps_per_call=args.steps_per_call,
        eval_fn=eval_fn, eval_freq=args.eval_freq,
    )


if __name__ == "__main__":
    main()
