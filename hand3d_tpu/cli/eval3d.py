"""3D lifting-variant evaluation from GT scoremaps (<- eval3d.py).

Expected median EPE with the reference's shipped weights (BASELINE.md rows
7-11): direct 20.848 mm, bottleneck 21.907 mm, local 39.121 mm,
local_w_xyz_loss 21.950 mm, proposed 18.840 mm.
"""

from hand3d_tpu.cli._common import (
    add_mesh_arg,
    add_quantize_arg,
    add_weights_arg,
    build_mesh,
    base_parser,
    init_or_load,
    maybe_quantize,
    progress_printer,
)
from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.eval.harnesses import eval3d_from_posenet, eval3d_lifting
from hand3d_tpu.models.poseprior import VARIANTS, PosePriorNetwork


def main():
    p = base_parser(__doc__)
    add_weights_arg(p)
    p.add_argument("--variant", choices=VARIANTS, default="proposed")
    p.add_argument("--data", default=None, help="Path to rhd_evaluation.bin")
    p.add_argument("--from-posenet", action="store_true",
                   help="lift from PoseNet's PREDICTED scoremaps on GT "
                        "crops instead of GT scoremaps (no reference "
                        "analog; evaluates the 2D->3D hand-off that "
                        "train_joint fine-tunes — weights must include "
                        "the PoseNet2D scope)")
    add_mesh_arg(p)
    add_quantize_arg(p)
    args = p.parse_args()

    dataset = RHDDataset("evaluation", path=args.data)
    net = PosePriorNetwork(args.variant)
    if args.from_posenet:
        import jax

        from hand3d_tpu.cli._common import load_weight_trees
        from hand3d_tpu.models import posenet

        params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(args.seed))}
        params.update(net.init(jax.random.PRNGKey(args.seed + 1)))
        if args.weights:
            loaded = load_weight_trees(args.weights)
            for scope in params:
                if scope in loaded:
                    params[scope].update(loaded[scope])
        params = maybe_quantize(params, args)
        metrics = eval3d_from_posenet(
            args.variant, params, dataset, args.batch_size,
            mesh=build_mesh(args.mesh),
            progress=progress_printer(len(dataset), args.batch_size),
        )
    else:
        params = maybe_quantize(
            init_or_load(net, args.seed, args.weights), args
        )
        metrics = eval3d_lifting(
            args.variant, params, dataset, args.batch_size,
            mesh=build_mesh(args.mesh),
            progress=progress_printer(len(dataset), args.batch_size),
        )
    print("Evaluation results for %s:" % args.variant)
    print("Average mean EPE: %.3f mm" % metrics["epe_mean_mm"])
    print("Average median EPE: %.3f mm" % metrics["epe_median_mm"])
    print("Area under curve: %.3f" % metrics["auc_0_50mm"])


if __name__ == "__main__":
    main()
