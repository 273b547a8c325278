"""Canonical-frame transform for 21-keypoint hands (batched, jit-safe).

Reference: /root/reference/utils/canonical_trafo.py:94-163. The reference ran
this per-sample inside the TF graph; here it is a pure batched function of
[B, 21, 3] arrays (three batched 3x3 matmuls), usable both in the data
pipeline (ground-truth generation) and in model losses.
"""

import functools

import jax
import jax.numpy as jnp

from hand3d_tpu.ops.numerics import PI, atan2_safe
from hand3d_tpu.ops.rotations import rot_mat_x, rot_mat_y, rot_mat_z

# exact f32 for the batched 3x3/4x4 geometry algebra: the TPU default
# matmul precision rounds f32 operands through bf16 MXU passes (~1e-3
# relative), which would silently break the bit-parity these transforms
# promise; the matrices are tiny, so exact precision costs nothing.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


ROOT_NODE_ID = 0  # palm keypoint, placed at the origin
ALIGN_NODE_ID = 12  # beginning of middle finger, placed on the y axis
ROT_NODE_ID = 20  # beginning of pinky, placed at z=0, x>0


def canonical_trafo(coords_xyz):
    """Map real (root-relative, normalized) xyz coords into the canonical frame.

    Args:
      coords_xyz: [B, 21, 3].
    Returns:
      (coords_normed [B, 21, 3], total_rot_mat [B, 3, 3]) such that
      ``coords_normed = (coords_xyz - root) @ total_rot_mat``.
    """
    coords_xyz = jnp.reshape(coords_xyz, (-1, 21, 3))

    # 1. translate root to the origin
    trans = coords_xyz[:, ROOT_NODE_ID : ROOT_NODE_ID + 1, :]
    coords_t = coords_xyz - trans

    # 2a. rotate align-node into the yz-plane (rotation about z)
    p = coords_t[:, ALIGN_NODE_ID, :]
    alpha = atan2_safe(p[:, 0], p[:, 1])
    rot = rot_mat_z(alpha)
    coords_r1 = _mm(coords_t, rot)
    total = rot

    # 2b. rotate it within the yz-plane onto the (negative) y axis
    p = coords_r1[:, ALIGN_NODE_ID, :]
    beta = -atan2_safe(p[:, 2], p[:, 1])
    rot = rot_mat_x(beta + PI)
    coords_r2 = _mm(coords_r1, rot)
    total = _mm(total, rot)

    # 3. fix the remaining rotation about y using the rot-node
    p = coords_r2[:, ROT_NODE_ID, :]
    gamma = atan2_safe(p[:, 2], p[:, 0])
    rot = rot_mat_y(gamma)
    coords_normed = _mm(coords_r2, rot)
    total = _mm(total, rot)

    return coords_normed, total


def flip_right_hand(coords_xyz_canonical, cond_right):
    """Mirror canonical coords (z -> -z) where ``cond_right`` holds.

    Reference: canonical_trafo.py:139-163 (duplicated at
    ColorHandPose3DNetwork.py:336-361 and PosePriorNetwork.py:186-211 — one
    implementation here serves all three call sites).

    Args:
      coords_xyz_canonical: [B, N, 3] (or [N, 3], treated as B=1).
      cond_right: bool, broadcastable to [B, N, 3] (e.g. [B, 1, 1] or [B]).
    """
    squeeze = coords_xyz_canonical.ndim == 2
    if squeeze:
        coords_xyz_canonical = coords_xyz_canonical[None]
    cond_right = jnp.reshape(
        jnp.asarray(cond_right), (coords_xyz_canonical.shape[0],) + (1,) * 2
    ) if jnp.asarray(cond_right).ndim <= 1 else jnp.asarray(cond_right)

    mirrored = coords_xyz_canonical * jnp.array([1.0, 1.0, -1.0], coords_xyz_canonical.dtype)
    out = jnp.where(cond_right, mirrored, coords_xyz_canonical)
    return out[0] if squeeze else out
