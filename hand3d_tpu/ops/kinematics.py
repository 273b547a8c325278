"""21-joint kinematic-chain transforms (batched, inverse-free).

Reference: /root/reference/utils/relative_trafo.py:105-295. Two changes for
TPU:
  * The reference inverts the accumulated 4x4 transform with
    tf.matrix_inverse (relative_trafo.py:117). Every accumulated transform is
    a product of elementary rigid transforms, so we accumulate the inverse in
    closed form alongside the forward transform — no matrix inverse, exact
    same math.
  * All steps operate on [B, 4, 4] batches; the 21-step chain is unrolled at
    trace time (it is a static DAG), so XLA sees one straight-line program.
"""

import functools

import jax
import jax.numpy as jnp

from hand3d_tpu.ops.numerics import atan2_safe
from hand3d_tpu.ops.rotations import rot_mat_x_hom, rot_mat_y_hom, trans_mat_z_hom

# exact f32 for the batched 3x3/4x4 geometry algebra: the TPU default
# matmul precision rounds f32 operands through bf16 MXU passes (~1e-3
# relative), which would silently break the bit-parity these transforms
# promise; the matrices are tiny, so exact precision costs nothing.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_mv = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


# child -> parent map of the 21-joint hand (relative_trafo.py:148-173)
KINEMATIC_CHAIN_DICT = {
    0: "root",
    4: "root", 3: 4, 2: 3, 1: 2,
    8: "root", 7: 8, 6: 7, 5: 6,
    12: "root", 11: 12, 10: 11, 9: 10,
    16: "root", 15: 16, 14: 15, 13: 14,
    20: "root", 19: 20, 18: 19, 17: 18,
}

# evaluation order, parents before children (relative_trafo.py:176-181)
KINEMATIC_CHAIN_LIST = [
    0,
    4, 3, 2, 1,
    8, 7, 6, 5,
    12, 11, 10, 9,
    16, 15, 14, 13,
    20, 19, 18, 17,
]


def _articulation_from_delta(delta_xyz, T):
    """Extract (length, angle_x, angle_y) of a bone vector and chain T.

    Mirrors relative_trafo._backward (:121-145). ``delta_xyz`` is [B, 3] in
    the parent's local frame; ``T`` is the accumulated global->local [B,4,4].
    """
    length = jnp.sqrt(
        delta_xyz[:, 0] ** 2 + delta_xyz[:, 1] ** 2 + delta_xyz[:, 2] ** 2
    )
    angle_y = atan2_safe(delta_xyz[:, 0], delta_xyz[:, 2])

    # rotate the bone into the yz-plane; then x-angle from the remaining tilt
    delta_h = jnp.concatenate([delta_xyz, jnp.ones_like(delta_xyz[:, :1])], axis=-1)
    tmp = _mv("bij,bj->bi", rot_mat_y_hom(-angle_y), delta_h)
    angle_x = atan2_safe(-tmp[:, 1], tmp[:, 2])

    T_this = _mm(
        trans_mat_z_hom(-length),
        _mm(rot_mat_x_hom(-angle_x), rot_mat_y_hom(-angle_y)),
    )
    T = _mm(T_this, T)
    return length, angle_x, angle_y, T


def bone_rel_trafo(coords_xyz):
    """xyz -> per-bone local articulation [length, angle_x, angle_y].

    Walks the kinematic chain root->leaves exactly like
    relative_trafo.bone_rel_trafo (:184-240).

    Args:
      coords_xyz: [B, 21, 3].
    Returns:
      [B, 21, 3] of (length, angle_x, angle_y) per joint.
    """
    coords_xyz = jnp.reshape(coords_xyz, (-1, 21, 3))
    batch = coords_xyz.shape[0]

    trafos = [None] * 21
    rel = [None] * 21
    eye = jnp.broadcast_to(jnp.eye(4, dtype=coords_xyz.dtype), (batch, 4, 4))
    ones = jnp.ones((batch, 1), coords_xyz.dtype)

    for bone_id in KINEMATIC_CHAIN_LIST:
        parent_id = KINEMATIC_CHAIN_DICT[bone_id]
        if parent_id == "root":
            delta = coords_xyz[:, bone_id, :]
            T = eye
        else:
            T = trafos[parent_id]
            # bone vector expressed in the parent's local frame
            parent_h = jnp.concatenate([coords_xyz[:, parent_id, :], ones], -1)
            child_h = jnp.concatenate([coords_xyz[:, bone_id, :], ones], -1)
            x_p = _mv("bij,bj->bi", T, parent_h)
            x_c = _mv("bij,bj->bi", T, child_h)
            delta = (x_c - x_p)[:, :3]

        length, ax, ay, T = _articulation_from_delta(delta, T)
        rel[bone_id] = jnp.stack([length, ax, ay], axis=-1)
        trafos[bone_id] = T

    return jnp.stack(rel, axis=1)


def bone_rel_trafo_inv(coords_rel):
    """Forward kinematics: [length, angle_x, angle_y] -> xyz.

    Inverse of :func:`bone_rel_trafo`; mirrors relative_trafo.bone_rel_trafo_inv
    (:243-295) but replaces tf.matrix_inverse of the accumulated transform
    with a closed-form accumulated inverse (see module docstring).

    Args:
      coords_rel: [B, 21, 3] (or [21, 3], treated as B=1).
    Returns:
      [B, 21, 3] xyz coordinates.
    """
    coords_rel = jnp.reshape(coords_rel, (-1, 21, 3))
    batch = coords_rel.shape[0]

    trafos = [None] * 21  # global -> local
    inv_trafos = [None] * 21  # local -> global
    xyz = [None] * 21
    eye = jnp.broadcast_to(jnp.eye(4, dtype=coords_rel.dtype), (batch, 4, 4))

    for bone_id in KINEMATIC_CHAIN_LIST:
        parent_id = KINEMATIC_CHAIN_DICT[bone_id]
        T = eye if parent_id == "root" else trafos[parent_id]
        Tinv = eye if parent_id == "root" else inv_trafos[parent_id]

        length = coords_rel[:, bone_id, 0]
        ax = coords_rel[:, bone_id, 1]
        ay = coords_rel[:, bone_id, 2]

        # T_this = Trans(-l) Rx(-ax) Ry(-ay)  (relative_trafo.py:108)
        T_this = _mm(
            trans_mat_z_hom(-length),
            _mm(rot_mat_x_hom(-ax), rot_mat_y_hom(-ay)),
        )
        # closed-form inverse: Ry(ay) Rx(ax) Trans(l)
        T_this_inv = _mm(
            rot_mat_y_hom(ay), _mm(rot_mat_x_hom(ax), trans_mat_z_hom(length))
        )
        T = _mm(T_this, T)
        Tinv = _mm(Tinv, T_this_inv)

        # joint position = Tinv @ [0,0,0,1]^T = translation column of Tinv
        xyz[bone_id] = Tinv[:, :3, 3]
        trafos[bone_id] = T
        inv_trafos[bone_id] = Tinv

    return jnp.stack(xyz, axis=1)
