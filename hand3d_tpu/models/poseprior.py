"""PosePrior + ViewpointNet: canonical 3D lifting from 2D scoremaps.

PosePrior (nets/ColorHandPose3DNetwork.py:249-272): 3 conv pairs
(stride 1 + stride 2) with [32, 64, 128] channels taking the 32x32x21
scoremap to 4x4x128, flatten, concat the 2-dim hand_side one-hot, two
FC(512) + dropout(keep 0.8), FC head to 21*3 canonical coords.

ViewpointNet (:274-334): same conv pattern with [64, 128, 256] channels,
FC 256 -> 128 with dropout(keep 0.75), three scalar heads (ux, uy, uz)
converted to a rotation matrix via the Rodrigues formula.

The standalone PosePriorNetwork with its five lifting variants
(nets/PosePriorNetwork.py:30-234) is composed from the same pieces.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hand3d_tpu.ops import nn
from hand3d_tpu.ops.canonical import flip_right_hand
from hand3d_tpu.ops.kinematics import bone_rel_trafo_inv
from hand3d_tpu.ops.rotations import rodrigues_rot_mat

NUM_KP = 21
SCOREMAP_SIZE = 32  # spatial size the lifting nets were built for
POSEPRIOR_SCOPE = "PosePrior"
VIEWPOINT_SCOPE = "ViewpointNet"

VARIANTS = ("direct", "bottleneck", "local", "local_w_xyz_loss", "proposed")


def _conv_tower_init(keys, in_chan, chans):
    params = {}
    for i, out_chan in enumerate(chans):
        params[f"{_tower_prefix(chans)}_{i}_1"] = nn.conv_init(
            next(keys), 3, 3, in_chan, out_chan
        )
        params[f"{_tower_prefix(chans)}_{i}_2"] = nn.conv_init(
            next(keys), 3, 3, out_chan, out_chan
        )
        in_chan = out_chan
    return params, in_chan


def _tower_prefix(chans):
    return "conv_pose" if chans[0] == 32 else "conv_vp"


def _conv_tower_apply(params, x, chans, compute_dtype):
    for i in range(len(chans)):
        prefix = _tower_prefix(chans)
        x = nn.conv2d_relu(x, params[f"{prefix}_{i}_1"], compute_dtype=compute_dtype)
        x = nn.conv2d_relu(
            x, params[f"{prefix}_{i}_2"], stride=2, compute_dtype=compute_dtype
        )
    return x


_POSE_CHANS = (32, 64, 128)
_VP_CHANS = (64, 128, 256)


def init_poseprior(key, bottleneck=False):
    """Params for the PosePrior tower (TF scope 'PosePrior')."""
    keys = iter(jax.random.split(key, 16))
    params, _ = _conv_tower_init(keys, NUM_KP, _POSE_CHANS)
    flat = (SCOREMAP_SIZE // 8) ** 2 * _POSE_CHANS[-1]  # 4*4*128
    params["fc_rel0"] = nn.dense_init(next(keys), flat + 2, 512)
    params["fc_rel1"] = nn.dense_init(next(keys), 512, 512)
    if bottleneck:
        params["fc_bottleneck"] = nn.dense_init(next(keys), 512, 30)
        params["fc_xyz"] = nn.dense_init(next(keys), 30, NUM_KP * 3)
    else:
        params["fc_xyz"] = nn.dense_init(next(keys), 512, NUM_KP * 3)
    return params


def init_viewpoint(key):
    """Params for the ViewpointNet tower (TF scope 'ViewpointNet')."""
    keys = iter(jax.random.split(key, 16))
    params, _ = _conv_tower_init(keys, NUM_KP, _VP_CHANS)
    flat = (SCOREMAP_SIZE // 8) ** 2 * _VP_CHANS[-1]  # 4*4*256
    params["fc_vp0"] = nn.dense_init(next(keys), flat + 2, 256)
    params["fc_vp1"] = nn.dense_init(next(keys), 256, 128)
    for head in ("fc_vp_ux", "fc_vp_uy", "fc_vp_uz"):
        params[head] = nn.dense_init(next(keys), 128, 1)
    return params


def apply_poseprior(
    params, scoremap, hand_side, *, train=False, key=None, compute_dtype=None
):
    """32x32x21 scoremap + hand_side -> [B, 21, 3] canonical coords."""
    b = scoremap.shape[0]
    x = _conv_tower_apply(params, scoremap, _POSE_CHANS, compute_dtype)
    x = jnp.reshape(x, (b, -1))
    x = jnp.concatenate([x, hand_side.astype(x.dtype)], axis=1)
    k0, k1 = (jax.random.split(key) if key is not None else (None, None))
    x = nn.dense_relu(x, params["fc_rel0"], compute_dtype=compute_dtype)
    x = nn.dropout(k0, x, 0.8, train)
    x = nn.dense_relu(x, params["fc_rel1"], compute_dtype=compute_dtype)
    x = nn.dropout(k1, x, 0.8, train)
    if "fc_bottleneck" in params:
        x = nn.dense(x, params["fc_bottleneck"], compute_dtype=compute_dtype)
    coords = nn.dense(x, params["fc_xyz"], compute_dtype=compute_dtype)
    return jnp.reshape(coords, (b, NUM_KP, 3))


def apply_viewpoint(
    params, scoremap, hand_side, *, train=False, key=None, compute_dtype=None
):
    """32x32x21 scoremap + hand_side -> [B, 3, 3] viewpoint rotation matrix."""
    b = scoremap.shape[0]
    x = _conv_tower_apply(params, scoremap, _VP_CHANS, compute_dtype)
    x = jnp.reshape(x, (b, -1))
    x = jnp.concatenate([x, hand_side.astype(x.dtype)], axis=1)
    k0, k1 = (jax.random.split(key) if key is not None else (None, None))
    x = nn.dense_relu(x, params["fc_vp0"], compute_dtype=compute_dtype)
    x = nn.dropout(k0, x, 0.75, train)
    x = nn.dense_relu(x, params["fc_vp1"], compute_dtype=compute_dtype)
    x = nn.dropout(k1, x, 0.75, train)
    ux = nn.dense(x, params["fc_vp_ux"], compute_dtype=compute_dtype)
    uy = nn.dense(x, params["fc_vp_uy"], compute_dtype=compute_dtype)
    uz = nn.dense(x, params["fc_vp_uz"], compute_dtype=compute_dtype)
    return rodrigues_rot_mat(ux, uy, uz)


def lift_to_relative(coord_can, rot_mat, hand_side):
    """Flip right hands + rotate canonical coords back to the camera frame.

    Mirrors ColorHandPose3DNetwork._inference_pose3d (:239-245).
    """
    cond_right = jnp.argmax(hand_side, axis=1) == 1
    coord_flip = flip_right_hand(coord_can, cond_right[:, None, None])
    # exact f32 (the TPU default would round the 3x3 rotation through bf16)
    return jnp.matmul(coord_flip, rot_mat,
                      precision=jax.lax.Precision.HIGHEST)


class LiftingOutput(NamedTuple):
    coord_xyz_rel_normed: jnp.ndarray  # [B, 21, 3]
    coord3d: jnp.ndarray  # variant's native prediction space
    rot_mat: Optional[jnp.ndarray]  # [B, 3, 3] for 'proposed', else None


class PosePriorNetwork:
    """Standalone lifting network with the reference's five variants.

    Mirrors nets/PosePriorNetwork.py:30-122. The input scoremap is average
    pooled 8x8 (256 -> 32) before the towers (:61).
    """

    def __init__(self, variant="proposed"):
        assert variant in VARIANTS, f"Unknown variant: {variant}"
        self.variant = variant

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = {
            POSEPRIOR_SCOPE: init_poseprior(k1, bottleneck=self.variant == "bottleneck")
        }
        if self.variant == "proposed":
            params[VIEWPOINT_SCOPE] = init_viewpoint(k2)
        return params

    def apply(self, params, scoremap, hand_side, *, train=False, key=None,
              compute_dtype=None):
        """scoremap [B, 256, 256, 21] (or already-pooled [B, 32, 32, 21]).

        Returns a LiftingOutput; semantics per PosePriorNetwork.inference
        (:59-95).
        """
        if scoremap.shape[1] != SCOREMAP_SIZE:
            scoremap = nn.avg_pool(scoremap, 8)
        kp, kv = (jax.random.split(key) if key is not None else (None, None))
        pred = apply_poseprior(
            params[POSEPRIOR_SCOPE], scoremap, hand_side,
            train=train, key=kp, compute_dtype=compute_dtype,
        )

        if self.variant in ("direct", "bottleneck"):
            return LiftingOutput(pred, pred, None)
        if self.variant in ("local", "local_w_xyz_loss"):
            coord_xyz = bone_rel_trafo_inv(pred)
            return LiftingOutput(coord_xyz, pred, None)
        # 'proposed'
        rot_mat = apply_viewpoint(
            params[VIEWPOINT_SCOPE], scoremap, hand_side,
            train=train, key=kv, compute_dtype=compute_dtype,
        )
        coord_rel = lift_to_relative(pred, rot_mat, hand_side)
        return LiftingOutput(coord_rel, pred, rot_mat)
