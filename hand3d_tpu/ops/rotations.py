"""Batched 3x3 / homogeneous 4x4 rotation-matrix constructors.

The reference assembled these element-by-element with tf.dynamic_stitch
(/root/reference/utils/canonical_trafo.py:41-91, relative_trafo.py:4-78,
nets/ColorHandPose3DNetwork.py:311-334,363-384). On TPU a plain stack is a
single fused VPU op, so these are jnp.stack expressions; element layout is
identical to the reference (row-major, matrices are applied as
``coords @ R`` just like the reference's ``tf.matmul(coords, rot_mat)``).

All constructors take an angle of shape [B] and return [B, 3, 3] (or
[B, 4, 4] for the ``_hom`` variants used by the kinematic chain).
"""

import jax.numpy as jnp


def _stack_rows(rows):
    """rows: N lists of N [B] arrays -> [B, N, N]."""
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


_stack33 = _stack44 = _stack_rows


def rot_mat_x(angle):
    """[B] -> [B,3,3]; layout per canonical_trafo.py:64-71."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stack33([[one, zero, zero], [zero, c, s], [zero, -s, c]])


def rot_mat_y(angle):
    """[B] -> [B,3,3]; layout per canonical_trafo.py:74-81."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stack33([[c, zero, -s], [zero, one, zero], [s, zero, c]])


def rot_mat_z(angle):
    """[B] -> [B,3,3]; layout per canonical_trafo.py:84-91."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stack33([[c, s, zero], [-s, c, zero], [zero, zero, one]])


def rodrigues_rot_mat(ux, uy, uz):
    """Axis-angle (encoded as an unnormalized 3-vector whose norm is the
    angle) -> [B,3,3] rotation matrix.

    Matches ColorHandPose3DNetwork._get_rot_mat
    (/root/reference/nets/ColorHandPose3DNetwork.py:311-334) including the
    +1e-8 inside the norm sqrt (which slightly biases theta, but is what the
    shipped ViewpointNet weights were trained against).

    Inputs are [B] (or [B,1]; they are flattened).
    """
    ux = jnp.reshape(ux, (-1,))
    uy = jnp.reshape(uy, (-1,))
    uz = jnp.reshape(uz, (-1,))
    theta = jnp.sqrt(ux * ux + uy * uy + uz * uz + 1e-8)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    one_ct = 1.0 - ct
    inv = 1.0 / theta
    x, y, z = ux * inv, uy * inv, uz * inv
    return _stack33(
        [
            [ct + x * x * one_ct, x * y * one_ct - z * st, x * z * one_ct + y * st],
            [y * x * one_ct + z * st, ct + y * y * one_ct, y * z * one_ct - x * st],
            [z * x * one_ct - y * st, z * y * one_ct + x * st, ct + z * z * one_ct],
        ]
    )


# --- Homogeneous 4x4 variants used by the kinematic chain --------------------
# NOTE: the reference's hom rotation matrices (relative_trafo.py:48-78) use the
# *opposite* sign convention from the 3x3 ones above (they act on column
# vectors: x' = T @ x). We reproduce that exactly.


def rot_mat_x_hom(angle):
    """[B] -> [B,4,4]; layout per relative_trafo.py:48-56."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stack44(
        [
            [one, zero, zero, zero],
            [zero, c, -s, zero],
            [zero, s, c, zero],
            [zero, zero, zero, one],
        ]
    )


def rot_mat_y_hom(angle):
    """[B] -> [B,4,4]; layout per relative_trafo.py:59-67."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    return _stack44(
        [
            [c, zero, s, zero],
            [zero, one, zero, zero],
            [-s, zero, c, zero],
            [zero, zero, zero, one],
        ]
    )


def trans_mat_z_hom(trans):
    """[B] -> [B,4,4]; translation along z per relative_trafo.py:81-89."""
    one, zero = jnp.ones_like(trans), jnp.zeros_like(trans)
    return _stack44(
        [
            [one, zero, zero, zero],
            [zero, one, zero, zero],
            [zero, zero, one, trans],
            [zero, zero, zero, one],
        ]
    )
