"""Geometry op tests: atan2 parity, rotation constructors, canonical trafo,
kinematic chain round trip. Golden values are independent numpy
implementations of the documented reference semantics."""

import numpy as np
import jax.numpy as jnp

from hand3d_tpu.ops import (
    atan2_safe,
    rot_mat_x,
    rot_mat_y,
    rot_mat_z,
    rodrigues_rot_mat,
    canonical_trafo,
    flip_right_hand,
    bone_rel_trafo,
    bone_rel_trafo_inv,
)


def test_atan2_matches_numpy_generic(rng):
    y = rng.randn(1000).astype(np.float32) * 3
    x = rng.randn(1000).astype(np.float32) * 3
    # keep away from the eps-perturbed singular region
    x = np.where(np.abs(x) < 1e-3, np.sign(x) * 0.1, x)
    got = np.asarray(atan2_safe(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_atan2_reference_eps_behavior():
    # at x == 0 the reference formulation uses x+1e-8 (positive) so the
    # result is atan(y/1e-8), not +/-pi/2 exactly; verify the construction.
    got = float(atan2_safe(jnp.float32(1.0), jnp.float32(0.0)))
    want = np.arctan(1.0 / 1e-8)
    assert abs(got - want) < 1e-5


def _np_rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)


def test_rot_mats_orthogonal_and_layout(rng):
    angles = rng.randn(5).astype(np.float32)
    for fn in (rot_mat_x, rot_mat_y, rot_mat_z):
        mats = np.asarray(fn(jnp.asarray(angles)))
        assert mats.shape == (5, 3, 3)
        for m in mats:
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rot_mat_z(jnp.asarray(angles)))[0], _np_rot_z(angles[0]), atol=1e-6
    )


def test_rodrigues_small_angle_and_composition(rng):
    # theta -> 0: approx identity (exact identity unreachable due to the
    # reference's +1e-8 inside the norm, which we reproduce)
    m = np.asarray(rodrigues_rot_mat(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1)))[0]
    np.testing.assert_allclose(m, np.eye(3), atol=1e-3)

    # rotation about z by angle a == rot_mat_z(-a) layout-wise (row-vector
    # convention of rot_mat_z vs rodrigues' standard column convention)
    a = 0.7
    rod = np.asarray(rodrigues_rot_mat(jnp.zeros(1), jnp.zeros(1), jnp.full(1, a)))[0]
    ref = _np_rot_z(-a)
    np.testing.assert_allclose(rod, ref, atol=1e-5)
    np.testing.assert_allclose(rod @ rod.T, np.eye(3), atol=1e-5)


def test_canonical_trafo_geometry(rng):
    coords = rng.randn(4, 21, 3).astype(np.float32)
    normed, rot = canonical_trafo(jnp.asarray(coords))
    normed, rot = np.asarray(normed), np.asarray(rot)

    # root at origin
    np.testing.assert_allclose(normed[:, 0], 0.0, atol=1e-5)
    # align node (12) on the y axis
    np.testing.assert_allclose(normed[:, 12, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(normed[:, 12, 2], 0.0, atol=1e-4)
    # rot node (20) in the xz==0 plane
    np.testing.assert_allclose(normed[:, 20, 2], 0.0, atol=1e-4)
    # total_rot reproduces the transform and is orthogonal
    rel = coords - coords[:, :1]
    np.testing.assert_allclose(rel @ rot, normed, atol=1e-4)
    for r in rot:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_flip_right_hand(rng):
    coords = rng.randn(3, 21, 3).astype(np.float32)
    cond = np.array([True, False, True])
    out = np.asarray(flip_right_hand(jnp.asarray(coords), jnp.asarray(cond)))
    np.testing.assert_allclose(out[1], coords[1])
    np.testing.assert_allclose(out[0, :, 2], -coords[0, :, 2])
    np.testing.assert_allclose(out[0, :, :2], coords[0, :, :2])


def test_bone_rel_round_trip(rng):
    # a plausible hand: random but root-relative, normalized
    coords = rng.randn(4, 21, 3).astype(np.float32)
    coords -= coords[:, :1]
    rel = bone_rel_trafo(jnp.asarray(coords))
    back = np.asarray(bone_rel_trafo_inv(rel))
    np.testing.assert_allclose(back, coords, atol=1e-3)

    rel = np.asarray(rel)
    # channel 0 is bone length: root entry equals |coords[0]| = 0
    np.testing.assert_allclose(rel[:, 0, 0], 0.0, atol=1e-5)
    # length of bone 12 (root->12) equals euclidean norm
    np.testing.assert_allclose(
        rel[:, 12, 0], np.linalg.norm(coords[:, 12], axis=-1), atol=1e-4
    )


def test_bone_rel_trafo_inv_unbatched_shape(rng):
    rel = rng.rand(21, 3).astype(np.float32)
    out = bone_rel_trafo_inv(jnp.asarray(rel))
    assert out.shape == (1, 21, 3)
