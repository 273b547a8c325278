"""PoseNet-only 2D evaluation on ground-truth crops (<- eval2d_gt_cropped.py).

Expected with the reference's shipped weights (BASELINE.md row 1):
mean EPE 9.135 px / median 5.001 px / AUC(0-30px) 0.724; retrained (row 2):
7.630 / 3.939 / 0.771.
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
from hand3d_tpu.eval.harnesses import eval2d_gt_cropped


def main():
    p = base_parser(__doc__)
    add_weights_arg(p)
    p.add_argument("--data", default=None, help="Path to rhd_evaluation.bin")
    add_mesh_arg(p)
    add_quantize_arg(p)
    args = p.parse_args()

    dataset = RHDDataset("evaluation", path=args.data)

    class _PoseNetOnly:
        def init(self, key):
            from hand3d_tpu.models import posenet

            return {posenet.SCOPE: posenet.init(key)}

    params = maybe_quantize(init_or_load(
        _PoseNetOnly(), args.seed, args.weights,
        exclude_var_list=["PosePrior", "ViewpointNet", "HandSegNet"],
    ), args)
    metrics = eval2d_gt_cropped(
        params["PoseNet2D"], dataset, args.batch_size, mesh=build_mesh(args.mesh),
        progress=progress_printer(len(dataset), args.batch_size),
    )
    print("Evaluation results:")
    print("Average mean EPE: %.3f pixels" % metrics["epe_mean_px"])
    print("Average median EPE: %.3f pixels" % metrics["epe_median_px"])
    print("Area under curve: %.3f" % metrics["auc_0_30px"])


if __name__ == "__main__":
    main()
