"""Segmentation glue-op tests: argmax location, blob selection, bbox."""

import numpy as np
import jax.numpy as jnp

from hand3d_tpu.ops import (
    find_max_location,
    single_obj_scoremap,
    calc_center_bb,
    detect_keypoints_2d,
    trafo_coords,
)


def test_find_max_location(rng):
    sm = rng.rand(3, 16, 20).astype(np.float32)
    got = np.asarray(find_max_location(jnp.asarray(sm)))
    for b in range(3):
        r, c = np.unravel_index(np.argmax(sm[b]), sm[b].shape)
        np.testing.assert_array_equal(got[b], [r, c])


def _two_blob_logits(h=64, w=64):
    """fg logits with two blobs; blob A contains the global max."""
    logits = np.zeros((1, h, w, 2), np.float32)
    logits[..., 0] = 5.0  # background wins by default
    logits[0, 8:16, 8:16, 1] = 10.0  # blob A
    logits[0, 10, 10, 1] = 12.0  # global max inside blob A
    logits[0, 40:50, 40:50, 1] = 10.0  # blob B (disconnected, >21px away)
    return logits


def test_single_obj_scoremap_keeps_max_blob():
    logits = _two_blob_logits()
    out = np.asarray(single_obj_scoremap(jnp.asarray(logits)))[0, :, :, 0]
    assert out[10, 10] == 1.0
    assert out[8:16, 8:16].min() == 1.0  # blob A fully kept
    assert out[40:50, 40:50].max() == 0.0  # blob B erased
    assert out.sum() == 64.0


def test_single_obj_scoremap_spreads_across_bridge():
    # blobs connected by a thin bridge are one object
    logits = _two_blob_logits()
    logits[0, 12, 16:40, 1] = 10.0  # bridge from A toward B
    logits[0, 12:40, 39:41, 1] = 10.0  # down to B
    out = np.asarray(single_obj_scoremap(jnp.asarray(logits)))[0, :, :, 0]
    assert out[45, 45] == 1.0  # blob B now reached


def test_calc_center_bb_basic():
    mask = np.zeros((2, 32, 32), np.float32)
    mask[0, 4:11, 6:21] = 1.0  # rows 4..10, cols 6..20
    # sample 1 left empty -> fallback path
    center, bb, size = (np.asarray(t) for t in calc_center_bb(jnp.asarray(mask)))
    np.testing.assert_allclose(center[0], [7.0, 13.0])
    np.testing.assert_allclose(bb[0, :, 0], [4.0, 6.0])  # min corner
    np.testing.assert_allclose(bb[0, :, 1], [10.0, 20.0])  # max corner
    np.testing.assert_allclose(size[0], [14.0])  # max(6, 14)
    # empty-mask fallbacks (general.py:311-320)
    np.testing.assert_allclose(center[1], [160.0, 160.0])
    np.testing.assert_allclose(size[1], [100.0])


def test_calc_center_bb_accepts_4d():
    mask = np.zeros((1, 16, 16, 1), np.float32)
    mask[0, 2:5, 3:9, 0] = 1.0
    center, _, _ = calc_center_bb(jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(center)[0], [3.0, 5.5])


def test_detect_keypoints_2d(rng):
    sm = rng.rand(2, 32, 32, 21).astype(np.float32)
    got = np.asarray(detect_keypoints_2d(jnp.asarray(sm)))
    assert got.shape == (2, 21, 2)
    for b in range(2):
        for k in range(21):
            r, c = np.unravel_index(np.argmax(sm[b, :, :, k]), (32, 32))
            np.testing.assert_array_equal(got[b, k], [r, c])


def test_trafo_coords():
    coords = jnp.asarray([[[128.0, 128.0], [0.0, 256.0]]])
    centers = jnp.asarray([[100.0, 50.0]])
    out = np.asarray(trafo_coords(coords, centers, 2.0, 256))
    np.testing.assert_allclose(out[0, 0], [100.0, 50.0])
    np.testing.assert_allclose(out[0, 1], [100.0 - 64.0, 50.0 + 64.0])


def test_single_obj_scoremap_pallas_matches_xla(rng):
    """The Pallas flood-fill kernel (interpreter mode on CPU) must agree
    with the XLA reduce_window formulation on random multi-blob masks."""
    logits = _two_blob_logits()
    logits[0, 12, 16:40, 1] = 10.0  # bridge
    for lg in (logits, _two_blob_logits()):
        a = np.asarray(single_obj_scoremap(jnp.asarray(lg), method="xla"))
        b = np.asarray(single_obj_scoremap(jnp.asarray(lg), method="pallas"))
        np.testing.assert_array_equal(a, b)


def test_flood_fill_pallas_early_exit_same_result():
    from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

    det = np.zeros((1, 64, 64), np.float32)
    det[0, 10:20, 10:20] = 1.0
    seed = np.array([[12, 12]], np.int32)
    # far more passes than needed -> converged result, not over-grown
    out = np.asarray(flood_fill_pallas(jnp.asarray(det), jnp.asarray(seed), 50))
    np.testing.assert_array_equal(out, det)


def test_decode_keypoints_upsampled_pallas_matches_xla(rng):
    """Fused upsample+argmax kernel must be bit-equal to the XLA path
    (resize_bilinear then detect_keypoints_2d), including tie-breaks."""
    from hand3d_tpu.ops.image import resize_bilinear
    from hand3d_tpu.ops.pallas.decode import decode_keypoints_upsampled_pallas

    sm = rng.randn(3, 32, 32, 21).astype(np.float32)
    # inject exact ties to exercise first-occurrence tie-breaking
    sm[0, :, :, 0] = 0.0
    sm[1, 5, 5, 3] = sm[1].max() + 1.0
    sm[1, 20, 20, 3] = sm[1, 5, 5, 3]
    want = np.asarray(
        detect_keypoints_2d(resize_bilinear(jnp.asarray(sm), (256, 256)))
    )
    got = np.asarray(decode_keypoints_upsampled_pallas(jnp.asarray(sm), 8))
    np.testing.assert_array_equal(got, want)


def test_decode_keypoints_upsampled_pallas_edge_peak(rng):
    """Peaks on the last row/col exercise the clamped-edge interpolation."""
    from hand3d_tpu.ops.image import resize_bilinear
    from hand3d_tpu.ops.pallas.decode import decode_keypoints_upsampled_pallas

    sm = rng.rand(1, 16, 16, 4).astype(np.float32)
    sm[0, 15, 15, 0] = 10.0
    sm[0, 0, 15, 1] = 10.0
    sm[0, 15, 0, 2] = 10.0
    want = np.asarray(
        detect_keypoints_2d(resize_bilinear(jnp.asarray(sm), (64, 64)))
    )
    got = np.asarray(decode_keypoints_upsampled_pallas(jnp.asarray(sm), 4))
    np.testing.assert_array_equal(got, want)


def test_xla_flood_fill_early_exit_matches_fixed_trip(rng):
    """At batch <= 4 the XLA flood fill early-exits at the fixed point
    (while_loop); the result must be bit-identical to the fixed-trip
    fori_loop path (exercised by tiling the same maps past the batch
    threshold)."""
    lg2 = np.stack([_two_blob_logits()[0], _two_blob_logits()[0]])
    lg2[1, 12, 16:40, 1] = 10.0  # one bridged, one separated sample
    small = np.asarray(single_obj_scoremap(jnp.asarray(lg2), method="xla"))
    big = np.asarray(
        single_obj_scoremap(jnp.asarray(np.tile(lg2, (4, 1, 1, 1))),
                            method="xla"))
    np.testing.assert_array_equal(small, big[:2])
    np.testing.assert_array_equal(small, big[2:4])

    # empty foreground: first pass zeroes the seed, second detects the
    # fixed point; must equal the full-trip result (all zeros)
    empty = np.full((1, 48, 64, 2), 0.0, np.float32)
    empty[..., 0] = 9.0  # background wins everywhere
    out = np.asarray(single_obj_scoremap(jnp.asarray(empty), method="xla"))
    np.testing.assert_array_equal(out, np.zeros((1, 48, 64, 1), np.float32))
