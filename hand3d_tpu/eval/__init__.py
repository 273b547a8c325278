from hand3d_tpu.eval.metrics import EvalUtil, calc_auc, get_stb_ref_curves
from hand3d_tpu.eval.harnesses import (
    eval2d_gt_cropped,
    eval2d_full_image,
    eval3d_from_posenet,
    eval3d_lifting,
    eval_full_pipeline,
)

__all__ = [
    "EvalUtil",
    "calc_auc",
    "get_stb_ref_curves",
    "eval2d_gt_cropped",
    "eval2d_full_image",
    "eval3d_from_posenet",
    "eval3d_lifting",
    "eval_full_pipeline",
]
