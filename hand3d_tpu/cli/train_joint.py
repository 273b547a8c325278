"""Joint fine-tuning of PoseNet + the 3D lifting nets, end to end.

The reference distributes `posenet3d-rhd-stb-slr-finetuned.pickle`
(ColorHandPose3DNetwork.py:48) — 2D and 3D stages fine-tuned together — but
never released the script that produced it; each released trainer freezes
the other stages (training_lifting.py even feeds GT scoremaps, not PoseNet
output). This CLI closes that gap: one differentiable program runs
PoseNet on GT crops, feeds its PREDICTED final scoremap into
PosePrior(+ViewpointNet), and descends a weighted sum of the two stage
losses, so the lifting nets learn on the scoremap distribution they will
actually see at inference and PoseNet learns what the 3D stage needs.

    total = w2d * posenet_scoremap_loss + w3d * lifting_loss(variant)

Defaults mirror the stage trainers (batch 8, Adam, lifting-style noise
augmentations); warm-start both stages from converted weights with
--weights before fine-tuning.
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
from hand3d_tpu.models import posenet
from hand3d_tpu.models.poseprior import VARIANTS, PosePriorNetwork
from hand3d_tpu.ops.image import resize_bilinear
from hand3d_tpu.train import lifting_loss, make_optimizer, posenet_scoremap_loss
from hand3d_tpu.train.loop import fit

SCOREMAP_SIZE = 32  # PosePrior's expected input resolution (PosePriorNetwork.py:61)


def make_joint_loss(variant, w2d, w3d, dropout=False):
    prior = PosePriorNetwork(variant)

    def loss_fn(params, batch, key):
        k2d, k3d = jax.random.split(key)
        del k2d  # PoseNet has no dropout; split kept for stable key layout
        preds = posenet.apply(params[posenet.SCOPE], batch["image_crop"])
        l2d = posenet_scoremap_loss(
            preds, batch["scoremap"], batch["keypoint_vis21"]
        )
        scoremap = preds[-1]
        if scoremap.shape[1] != SCOREMAP_SIZE:
            # parity resolution is already 32 (crop 256 / 8); smaller smoke
            # crops are resized so the FC tower shapes stay valid
            scoremap = resize_bilinear(scoremap, (SCOREMAP_SIZE, SCOREMAP_SIZE))
        # dropout defaults OFF: the reference's executed lifting training
        # never activates it (training_lifting.py:54-56 leaves the
        # evaluation placeholder at its default True; general.py:139-148)
        lift = prior.apply(
            params, scoremap, batch["hand_side"], train=dropout, key=k3d
        )
        l3d = lifting_loss(variant, lift, batch)
        return w2d * l2d + w3d * l3d

    return loss_fn, prior


def main():
    p = base_parser(__doc__)
    p.set_defaults(batch_size=8)
    add_weights_arg(p)
    p.add_argument("--variant", choices=VARIANTS, default="proposed")
    p.add_argument("--dropout", action="store_true",
                   help="Enable the lifting FC towers' dropout during "
                        "training. OFF by default because the reference's "
                        "executed training graph never activates it "
                        "(training_lifting.py:54-56 leaves the evaluation "
                        "placeholder at its default True).")
    p.add_argument("--data", default=None, help="Path to rhd_training.bin")
    p.add_argument("--max-iter", type=int, default=40000)
    p.add_argument("--lr", type=float, nargs="+", default=[1e-5, 1e-6])
    p.add_argument("--lr-iter", type=int, nargs="+", default=[30000])
    p.add_argument("--w2d", type=float, default=1.0,
                   help="weight of the PoseNet scoremap loss")
    p.add_argument("--w3d", type=float, default=1.0,
                   help="weight of the lifting loss")
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
    p.add_argument("--crop-size", type=int, default=256,
                   help="GT crop resolution (reference: 256); smaller "
                        "values are useful for smoke tests")
    p.add_argument("--no-fused", dest="fused", action="store_false",
                   default=True,
                   help="Run preprocessing as a separate program instead "
                        "of fusing it into the jitted train step")
    p.add_argument("--eval-data", default=None,
                   help="Path to rhd_evaluation.bin: periodically eval 3D "
                        "EPE of lifting from PREDICTED scoremaps on GT "
                        "crops (the hand-off this stage fine-tunes)")
    p.add_argument("--eval-freq", type=int, default=5000,
                   help="Steps between in-training evals (with --eval-data)")
    p.add_argument("--eval-batches", type=int, default=None,
                   help="Bound each in-training eval to this many batches")
    add_mesh_arg(p)
    add_memory_args(p)
    args = p.parse_args()
    snapshot_dir = args.snapshot_dir or f"snapshots_joint_{args.variant}"

    dataset = RHDDataset("training", path=args.data)
    cfg = PreprocessConfig(
        use_wrist_coord=False, hand_crop=True,
        coord_uv_noise=True, crop_center_noise=True,
        crop_offset_noise=True, crop_scale_noise=True,
        crop_size=args.crop_size,
    )
    mesh = build_mesh(args.mesh)
    sharding = None
    if mesh is not None:
        from hand3d_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)
    pipeline = InputPipeline(dataset, cfg, args.batch_size, seed=args.seed,
                             sharding=sharding, yield_raw=args.fused)

    loss_fn, prior = make_joint_loss(args.variant, args.w2d, args.w3d,
                                     dropout=args.dropout)

    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    params = {posenet.SCOPE: posenet.init(k1)}
    params.update(prior.init(k2))
    if args.weights:
        loaded = load_weight_trees(args.weights)
        for scope in params:
            if scope in loaded:
                params[scope].update(loaded[scope])

    base_loss = maybe_qat(loss_fn, args)
    train_loss = base_loss
    if args.fused:
        from hand3d_tpu.data.preprocess import preprocess_rhd
        from hand3d_tpu.train.trainer import fuse_preprocess

        train_loss = fuse_preprocess(base_loss, preprocess_rhd, cfg)

    eval_fn = None
    if args.eval_data:
        from hand3d_tpu.eval.harnesses import eval3d_from_posenet

        eval_dataset = RHDDataset("evaluation", path=args.eval_data)

        def eval_fn(state, step):
            m = eval3d_from_posenet(
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
