"""HandSegNet + PoseNet full-image 2D evaluation (<- eval2d.py).

Expected with the reference's shipped weights (BASELINE.md rows 3-5):
paper setting (--wrist --scale-to-size): 17.041 / 5.833 / 0.663;
corrected (--no-wrist --scale-to-size): 16.561 / 5.275 / 0.679;
corrected, 320x320 frame (--no-wrist, no scaling): 18.741 / 6.745 / 0.635.
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
from hand3d_tpu.eval.harnesses import eval2d_full_image
from hand3d_tpu.models.cascade import ColorHandPose3D


def main():
    p = base_parser(__doc__)
    add_weights_arg(p)
    p.add_argument("--data", default=None, help="Path to rhd_evaluation.bin")
    p.add_argument("--wrist", dest="wrist", action="store_true", default=True)
    p.add_argument("--no-wrist", dest="wrist", action="store_false")
    p.add_argument(
        "--scale-to-size", dest="scale_to_size", action="store_true", default=True
    )
    p.add_argument("--no-scale-to-size", dest="scale_to_size", action="store_false")
    add_mesh_arg(p)
    add_quantize_arg(p)
    args = p.parse_args()

    dataset = RHDDataset("evaluation", path=args.data)
    net = ColorHandPose3D()
    params = maybe_quantize(init_or_load(
        net, args.seed, args.weights,
        exclude_var_list=["PosePrior", "ViewpointNet"],
    ), args)
    metrics = eval2d_full_image(
        params, dataset, args.batch_size, mesh=build_mesh(args.mesh),
        use_wrist_coord=args.wrist, scale_to_size=args.scale_to_size,
        progress=progress_printer(len(dataset), args.batch_size),
    )
    print("Evaluation results:")
    print("Average mean EPE: %.3f pixels" % metrics["epe_mean_px"])
    print("Average median EPE: %.3f pixels" % metrics["epe_median_px"])
    print("Area under curve: %.3f" % metrics["auc_0_30px"])


if __name__ == "__main__":
    main()
