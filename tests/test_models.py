"""Model tests: shapes, layer inventory vs the reference, jit-ability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hand3d_tpu.models import handsegnet, posenet, poseprior
from hand3d_tpu.models.cascade import ColorHandPose3D
from hand3d_tpu.models.poseprior import PosePriorNetwork


KEY = jax.random.PRNGKey(0)


def test_handsegnet_layer_inventory_and_shapes():
    params = handsegnet.init(KEY)
    # 16 convs per ColorHandPose3DNetwork.py:131-168
    assert len(params) == 16
    for name in ["conv1_1", "conv3_4", "conv4_4", "conv5_2", "conv6_2"]:
        assert name in params
    assert params["conv5_2"]["weights"].shape == (3, 3, 512, 128)
    assert params["conv6_2"]["weights"].shape == (1, 1, 512, 2)

    out = handsegnet.apply(params, jnp.zeros((2, 64, 48, 3)))
    assert isinstance(out, list) and len(out) == 1
    assert out[0].shape == (2, 64, 48, 2)


def test_posenet_layer_inventory_and_shapes():
    params = posenet.init(KEY)
    # 10 encoder + conv4_3..7 + conv5_1/2 + 2x7 refinement = 31 convs
    assert len(params) == 31
    assert params["conv4_7"]["weights"].shape == (3, 3, 256, 128)
    assert params["conv6_1"]["weights"].shape == (7, 7, 21 + 128, 128)
    assert params["conv7_7"]["weights"].shape == (1, 1, 128, 21)

    out = posenet.apply(params, jnp.zeros((1, 32, 32, 3)))
    assert len(out) == 3
    for sm in out:
        assert sm.shape == (1, 4, 4, 21)


def test_poseprior_and_viewpoint_shapes(rng):
    pp = poseprior.init_poseprior(KEY)
    vp = poseprior.init_viewpoint(KEY)
    assert pp["fc_rel0"]["weights"].shape == (4 * 4 * 128 + 2, 512)
    assert vp["fc_vp0"]["weights"].shape == (4 * 4 * 256 + 2, 256)

    sm = jnp.asarray(rng.rand(2, 32, 32, 21).astype(np.float32))
    hand_side = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    coords = poseprior.apply_poseprior(pp, sm, hand_side)
    assert coords.shape == (2, 21, 3)

    rot = np.asarray(poseprior.apply_viewpoint(vp, sm, hand_side))
    assert rot.shape == (2, 3, 3)
    for r in rot:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


@pytest.mark.parametrize("variant", poseprior.VARIANTS)
def test_poseprior_network_variants(variant, rng):
    net = PosePriorNetwork(variant)
    params = net.init(KEY)
    if variant == "bottleneck":
        assert "fc_bottleneck" in params["PosePrior"]
        assert params["PosePrior"]["fc_xyz"]["weights"].shape == (30, 63)
    sm = jnp.asarray(rng.rand(2, 256, 256, 21).astype(np.float32))
    hand_side = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = net.apply(params, sm, hand_side)
    assert out.coord_xyz_rel_normed.shape == (2, 21, 3)
    assert out.coord3d.shape == (2, 21, 3)
    if variant == "proposed":
        assert out.rot_mat.shape == (2, 3, 3)
    else:
        assert out.rot_mat is None


def test_poseprior_dropout_changes_train_output(rng):
    net = PosePriorNetwork("direct")
    params = net.init(KEY)
    sm = jnp.asarray(rng.rand(1, 32, 32, 21).astype(np.float32))
    hs = jnp.asarray([[1.0, 0.0]])
    eval_out = net.apply(params, sm, hs)
    train_out = net.apply(params, sm, hs, train=True, key=jax.random.PRNGKey(3))
    assert not np.allclose(
        np.asarray(eval_out.coord3d), np.asarray(train_out.coord3d)
    )
    # eval path is deterministic
    eval_out2 = net.apply(params, sm, hs)
    np.testing.assert_array_equal(
        np.asarray(eval_out.coord3d), np.asarray(eval_out2.coord3d)
    )


def test_cascade_full_inference_jitted(rng):
    """End-to-end smoke test: jit the whole pipeline at reduced input size."""
    net = ColorHandPose3D()
    params = net.init(KEY)
    image = jnp.asarray(rng.rand(1, 120, 160, 3).astype(np.float32) - 0.5)
    hand_side = jnp.asarray([[1.0, 0.0]])

    fwd = jax.jit(lambda p, im, hs: net.inference(p, im, hs))
    out = fwd(params, image, hand_side)
    assert out.hand_scoremap.shape == (1, 120, 160, 2)
    assert out.image_crop.shape == (1, 256, 256, 3)
    assert out.scale_crop.shape == (1, 1)
    assert out.center.shape == (1, 2)
    assert out.keypoints_scoremap.shape == (1, 256, 256, 21)
    assert out.keypoint_coord3d.shape == (1, 21, 3)
    assert out.keypoint_uv21.shape == (1, 21, 2)
    assert np.all(np.isfinite(np.asarray(out.keypoint_coord3d)))
    # scale_crop respects the clamp at ColorHandPose3DNetwork.py:85
    assert 0.25 <= float(out.scale_crop[0, 0]) <= 5.0


def test_cascade_inference2d(rng):
    net = ColorHandPose3D()
    params = net.init(KEY)
    image = jnp.asarray(rng.rand(1, 120, 160, 3).astype(np.float32) - 0.5)
    out = net.inference2d(params, image)
    assert out.keypoints_scoremap.shape == (1, 256, 256, 21)
    assert out.keypoint_uv21.shape == (1, 21, 2)


def test_cascade_soft_argmax_decode(rng):
    net = ColorHandPose3D(decode="soft_argmax")
    params = net.init(KEY)
    image = jnp.asarray(rng.rand(1, 120, 160, 3).astype(np.float32) - 0.5)
    out = net.inference2d(params, image)
    assert out.keypoint_uv21.shape == (1, 21, 2)
    assert np.all(np.isfinite(np.asarray(out.keypoint_uv21)))


def test_cascade_seg_scale_fast_mode(rng):
    """seg_scale<1 keeps the full output contract (shapes, clamps, finite)."""
    net = ColorHandPose3D(seg_scale=0.5)
    params = net.init(KEY)
    image = jnp.asarray(rng.rand(2, 120, 160, 3).astype(np.float32) - 0.5)
    hand_side = jnp.tile(jnp.asarray([[1.0, 0.0]]), (2, 1))
    out = jax.jit(lambda p, im, hs: net.inference(p, im, hs))(
        params, image, hand_side
    )
    assert out.hand_scoremap.shape == (2, 120, 160, 2)
    assert out.image_crop.shape == (2, 256, 256, 3)
    assert out.keypoints_scoremap.shape == (2, 256, 256, 21)
    assert out.keypoint_coord3d.shape == (2, 21, 3)
    assert np.all(np.isfinite(np.asarray(out.keypoint_coord3d)))
    assert np.all(np.asarray(out.scale_crop) >= 0.25)
    assert np.all(np.asarray(out.scale_crop) <= 5.0)


def test_crop_from_scoremap_lowres_box_matches_fullres():
    """A half-res scoremap must localize the same crop box as the full-res
    one: center within a pixel-ish, scale within the resampling tolerance."""
    h, w = 64, 80
    bg = np.stack([np.full((h, w), 5.0), np.full((h, w), -5.0)], -1)

    def blob_map(hh, ww, r0, r1, c0, c1):
        sm = np.stack([np.full((hh, ww), 5.0), np.full((hh, ww), -5.0)], -1)
        sm[r0:r1, c0:c1, 0] = -5.0
        sm[r0:r1, c0:c1, 1] = 5.0
        return jnp.asarray(sm[None].astype(np.float32))

    del bg
    net = ColorHandPose3D()
    image = jnp.zeros((1, h, w, 3), jnp.float32)
    full = blob_map(h, w, 20, 40, 30, 50)
    half = blob_map(h // 2, w // 2, 10, 20, 15, 25)
    _, scale_f, center_f = net._crop_from_scoremap(image, full)
    _, scale_h, center_h = net._crop_from_scoremap(image, half)
    np.testing.assert_allclose(
        np.asarray(center_h), np.asarray(center_f), atol=1.5
    )
    np.testing.assert_allclose(
        np.asarray(scale_h), np.asarray(scale_f), rtol=0.15
    )


def test_cascade_odd_input_dims(rng):
    """Non-multiple-of-8 frames must work (VALID pools drop edge rows, the
    final upsample restores the exact input size, like the reference)."""
    net = ColorHandPose3D()
    params = net.init(KEY)
    image = jnp.asarray(rng.rand(1, 101, 131, 3).astype(np.float32) - 0.5)
    out = net.inference(params, image, jnp.asarray([[1.0, 0.0]]))
    assert out.hand_scoremap.shape == (1, 101, 131, 2)
    assert out.keypoint_coord3d.shape == (1, 21, 3)


def test_seg_scale_empty_mask_fallback_matches_full_res():
    """With no detectable hand, the downscaled-localization preset must
    fall back to the same full-image crop as seg_scale=1.0 (the reference
    constants center (160,160) / size 100 are full-image pixels)."""
    from hand3d_tpu.models.cascade import ColorHandPose3D

    image = jnp.zeros((2, 240, 320, 3), jnp.float32)
    # all-background logits -> empty foreground mask at any resolution
    empty_full = jnp.concatenate(
        [jnp.full((2, 240, 320, 1), 10.0), jnp.full((2, 240, 320, 1), -10.0)],
        axis=-1)
    empty_half = empty_full[:, ::2, ::2]

    full = ColorHandPose3D(seg_scale=1.0)
    half = ColorHandPose3D(seg_scale=0.5)
    _, scale_f, center_f = full._crop_from_scoremap(image, empty_full)
    _, scale_h, center_h = half._crop_from_scoremap(image, empty_half)

    np.testing.assert_allclose(np.asarray(center_f),
                               np.full((2, 2), 160.0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(center_h), np.asarray(center_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale_h), np.asarray(scale_f),
                               atol=1e-5)
