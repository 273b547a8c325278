"""Property-based tests (hypothesis) for the geometry core.

These cover input regions the fixed-seed unit tests can't enumerate:
arbitrary hand configurations through the kinematic chain and canonical
frame, and arbitrary boxes through the crop sampler.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from hand3d_tpu.ops import (
    bone_rel_trafo,
    bone_rel_trafo_inv,
    canonical_trafo,
    crop_and_resize,
)
from test_ops_image import np_crop_and_resize_tf

_SETTINGS = dict(max_examples=20, deadline=None)

finite_coords = hnp.arrays(
    np.float32, (1, 21, 3),
    elements=st.floats(-2.0, 2.0, width=32),
)


@given(coords=finite_coords)
@settings(**_SETTINGS)
def test_kinematic_chain_round_trip_property(coords):
    coords = coords - coords[:, :1]  # root-relative
    # avoid degenerate zero-length bones where angles are undefined
    if np.min(np.linalg.norm(coords[:, 1:], axis=-1)) < 1e-2:
        return
    rel = bone_rel_trafo(jnp.asarray(coords))
    back = np.asarray(bone_rel_trafo_inv(rel))
    np.testing.assert_allclose(back, coords, atol=5e-3)


@given(coords=finite_coords)
@settings(**_SETTINGS)
def test_canonical_trafo_properties(coords):
    # alignment keypoints must not be degenerate
    if (np.linalg.norm(coords[:, 12] - coords[:, 0]) < 1e-2
            or np.linalg.norm(coords[:, 20] - coords[:, 0]) < 1e-2):
        return
    normed, rot = canonical_trafo(jnp.asarray(coords))
    normed, rot = np.asarray(normed), np.asarray(rot)
    # rigid: pairwise distances preserved
    def pdist(x):
        return np.linalg.norm(x[:, :, None] - x[:, None, :], axis=-1)
    rel = coords - coords[:, :1]
    np.testing.assert_allclose(pdist(rel), pdist(normed), atol=1e-3)
    # rotation orthogonal, det +1
    np.testing.assert_allclose(rot[0] @ rot[0].T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(rot[0]), 1.0, atol=1e-4)


@given(
    # Subnormal coords (e.g. -1e-45) are excluded: XLA flushes them to zero
    # (so the sample lands in-image at 0.0) while the float32 numpy golden
    # keeps them negative (out-of-image -> extrapolate). FTZ hardware can't
    # match the golden on that measure-zero knife edge.
    box=hnp.arrays(
        np.float32, (4,),
        elements=st.floats(-0.5, 1.5, width=32, allow_subnormal=False),
    ),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_crop_and_resize_matches_golden_property(box, data):
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    img = rng.rand(9, 11, 2).astype(np.float32)
    y1, x1 = sorted(box[:2])[0], sorted(box[2:])[0]
    y2, x2 = sorted(box[:2])[1], sorted(box[2:])[1]
    b = np.array([[y1, x1, y2, x2]], np.float32)
    got = np.asarray(crop_and_resize(jnp.asarray(img[None]), jnp.asarray(b), (5, 6)))
    want = np_crop_and_resize_tf(img, b[0], (5, 6))
    np.testing.assert_allclose(got[0], want, atol=1e-4)
