"""Batched, shape-static op library (the reference's L2/L3 layers, TPU-native).

Every op here is vmapped/batched over the leading batch axis and contains no
data-dependent Python control flow, so it can live inside a single jitted
program. Reference citations are given per-function.
"""

from hand3d_tpu.ops.numerics import atan2_safe
from hand3d_tpu.ops.rotations import (
    rot_mat_x,
    rot_mat_y,
    rot_mat_z,
    rodrigues_rot_mat,
)
from hand3d_tpu.ops.canonical import canonical_trafo, flip_right_hand
from hand3d_tpu.ops.kinematics import (
    bone_rel_trafo,
    bone_rel_trafo_inv,
    KINEMATIC_CHAIN_LIST,
    KINEMATIC_CHAIN_DICT,
)
from hand3d_tpu.ops.image import (
    resize_bilinear,
    crop_and_resize,
    crop_image_from_xy,
    create_gaussian_maps,
)
from hand3d_tpu.ops.segmentation import (
    find_max_location,
    single_obj_scoremap,
    calc_center_bb,
)
from hand3d_tpu.ops.keypoints import detect_keypoints_2d, trafo_coords, soft_argmax_2d
from hand3d_tpu.ops import nn
from hand3d_tpu.ops.quant import quantize_params_int8

__all__ = [
    "atan2_safe",
    "rot_mat_x",
    "rot_mat_y",
    "rot_mat_z",
    "rodrigues_rot_mat",
    "canonical_trafo",
    "flip_right_hand",
    "bone_rel_trafo",
    "bone_rel_trafo_inv",
    "KINEMATIC_CHAIN_LIST",
    "KINEMATIC_CHAIN_DICT",
    "resize_bilinear",
    "crop_and_resize",
    "crop_image_from_xy",
    "create_gaussian_maps",
    "find_max_location",
    "single_obj_scoremap",
    "calc_center_bb",
    "detect_keypoints_2d",
    "trafo_coords",
    "soft_argmax_2d",
    "nn",
    "quantize_params_int8",
]
