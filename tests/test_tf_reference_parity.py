"""Parity against the REFERENCE ITSELF, executed via TF on CPU.

Until round 3 the cross-checks were numpy goldens plus an independent torch
build — a re-implementation judging a re-implementation. TF 2.21 is present
in this container, so these tests run the reference's own graphs
(tools/tf_reference_oracle.py) and diff hand3d_tpu against them:

  * the full cascade, same weights into both stacks
    (nets/ColorHandPose3DNetwork.py:61-129)
  * every glue op on random batches (utils/general.py:163-357,
    utils/canonical_trafo.py:94-162, utils/relative_trafo.py:184-295)
  * the reader's derived-feature graph on synthetic records
    (data/BinaryDbReader.py:126-368)
  * EvalUtil / calc_auc (utils/general.py:522-611, :654-675)
  * checkpoints written by tf1.train.Saver through the TF-free parser and
    the reference's load_weights_from_snapshot (general.py:614-651)
  * the TRAINING graphs: stage losses, LearningRateScheduler, and one full
    Adam train step per stage (training_{posenet,handsegnet,lifting}.py)
  * the pickle loader: ColorHandPose3DNetwork.init executed on a synthetic
    shipped-shaped weight set (ColorHandPose3DNetwork.py:34-59)
  * byte-level data compatibility: the reference's queue pipelines (RHD
    BinaryDbReader and STB BinaryDbReaderSTB, FixedLengthRecordReader +
    decode_raw) consume .bin files written by OUR tools and decode the
    exact arrays we encoded
  * the EVAL HARNESSES composed end-to-end: each reference eval script's
    complete .bin -> reader -> network -> host decode -> EvalUtil ->
    final-metric composition vs hand3d_tpu.eval.harnesses on the same
    file + weights (eval2d_gt_cropped.py, eval2d.py, eval3d.py,
    eval_full.py for both STB and RHD)
  * the augmentations' deterministic core (tf.image rgb/hsv round trip,
    fixed-delta adjust_hue) and the truncated-normal noise distribution

Slow (TF graph builds): deselect with -m 'not slow'. Skipped automatically
where tensorflow is not installed.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        importlib.util.find_spec("tensorflow") is None,
        reason="tensorflow not installed",
    ),
    pytest.mark.skipif(
        not os.path.isdir(os.environ.get("HAND3D_REFERENCE", "/root/reference")),
        reason="reference checkout not present",
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def oracle():
    import tf_reference_oracle as oracle

    return oracle


@pytest.fixture(scope="module")
def jnp_cpu():
    import jax

    return jax


@pytest.fixture(scope="module")
def ref_cascade(oracle):
    """Reference cascade outputs + its randomly-initialized weights."""
    rng = np.random.RandomState(7)
    image = rng.rand(2, 240, 320, 3).astype(np.float32) - 0.5
    hand_side = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    outs, flat = oracle.reference_cascade_outputs(image, hand_side)
    return image, hand_side, outs, flat


def test_cascade_end_to_end(oracle, jnp_cpu, ref_cascade):
    """Same weights into both stacks -> same six outputs.

    ColorHandPose3DNetwork.inference (:61-99) vs models/cascade.py.
    """
    import jax

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.weights.convert import flat_to_tree

    image, hand_side, ref_outs, flat = ref_cascade
    tree = flat_to_tree(flat)

    model = ColorHandPose3D()
    # the reference variable surface must exactly cover our init tree
    init = model.init(jax.random.PRNGKey(0))
    from hand3d_tpu.weights.convert import tree_to_flat

    ours, theirs = tree_to_flat(init), tree_to_flat(tree)
    assert set(ours) == set(theirs)
    for k in ours:
        assert np.shape(ours[k]) == np.shape(theirs[k]), k

    out = jax.jit(model.inference)(tree, image, hand_side)
    tol = {
        "hand_scoremap": 1e-5,
        "image_crop": 1e-3,  # tf.image.crop_and_resize rounding
        "scale_crop": 1e-5,
        "center": 1e-4,
        "keypoints_scoremap": 1e-5,
        "keypoint_coord3d": 1e-5,
    }
    for name, atol in tol.items():
        mine = np.asarray(getattr(out, name))
        np.testing.assert_allclose(mine, ref_outs[name], atol=atol, err_msg=name)


def test_inference2d(oracle, jnp_cpu):
    """2D half (ColorHandPose3DNetwork.inference2d :101-129)."""
    import jax

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.weights.convert import flat_to_tree

    rng = np.random.RandomState(3)
    image = rng.rand(2, 240, 320, 3).astype(np.float32) - 0.5
    ref_outs, flat = oracle.reference_inference2d_outputs(image)
    tree = flat_to_tree(flat)

    model = ColorHandPose3D()
    out = jax.jit(model.inference2d)(tree, image)
    np.testing.assert_allclose(
        np.asarray(out.keypoints_scoremap), ref_outs["keypoints_scoremap"],
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.image_crop), ref_outs["image_crop"], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.scale_crop), ref_outs["scale_crop"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.center), ref_outs["center"], atol=1e-4)


@pytest.mark.parametrize("variant", ["direct", "bottleneck", "local",
                                     "proposed"])
def test_posepriornet_variants(oracle, jnp_cpu, variant):
    """Standalone lifting variants (nets/PosePriorNetwork.py:59-95)."""
    import jax

    from hand3d_tpu.models.poseprior import PosePriorNetwork
    from hand3d_tpu.weights.convert import flat_to_tree

    rng = np.random.RandomState(11)
    scoremap = rng.rand(2, 256, 256, 21).astype(np.float32)
    hand_side = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    (ref_rel, ref_c3d), flat = oracle.reference_posepriornet_outputs(
        scoremap, hand_side, variant)

    net = PosePriorNetwork(variant)
    out = jax.jit(lambda p, s, h: net.apply(p, s, h))(
        flat_to_tree(flat), scoremap, hand_side)
    np.testing.assert_allclose(
        np.asarray(out.coord_xyz_rel_normed), ref_rel, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.coord3d), ref_c3d, atol=1e-5)


def test_glue_crop_image_from_xy(oracle, jnp_cpu):
    """utils/general.crop_image_from_xy (:163-196) on random batches."""
    from hand3d_tpu.ops.image import crop_image_from_xy

    rng = np.random.RandomState(0)
    image = rng.rand(3, 120, 160, 3).astype(np.float32)
    centers = np.stack([rng.uniform(10, 110, 3), rng.uniform(10, 150, 3)],
                       -1).astype(np.float32)
    scale = np.asarray([1.0, 2.3, 0.7], np.float32)

    ref = oracle.run_tf(
        lambda r, p: r.general.crop_image_from_xy(
            p["image"], p["centers"], 64, p["scale"]),
        {"image": image, "centers": centers, "scale": scale})
    mine = np.asarray(crop_image_from_xy(image, centers, 64, scale))
    np.testing.assert_allclose(mine, ref, atol=1e-4)

    # scalar-scale path (the cascade calls it with a python default)
    ref1 = oracle.run_tf(
        lambda r, p: r.general.crop_image_from_xy(p["image"], p["centers"], 32),
        {"image": image, "centers": centers})
    mine1 = np.asarray(crop_image_from_xy(image, centers, 32, 1.0))
    np.testing.assert_allclose(mine1, ref1, atol=1e-4)


def _blobby_scoremap(rng, b, h, w):
    """2-channel segmentation logits with a few smooth fg bumps per image."""
    yy, xx = np.mgrid[0:h, 0:w]
    fg = np.zeros((b, h, w), np.float32)
    for i in range(b):
        for _ in range(3):
            cy, cx = rng.uniform(5, h - 5), rng.uniform(5, w - 5)
            s = rng.uniform(3, 9)
            fg[i] += 6.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                  / (2 * s * s)).astype(np.float32)
    return np.stack([np.zeros_like(fg), fg - 2.0], -1)


def test_glue_segmentation_chain(oracle, jnp_cpu):
    """find_max_location + single_obj_scoremap + calc_center_bb
    (utils/general.py:199-328) on random blobby maps."""
    from hand3d_tpu.ops.segmentation import (
        calc_center_bb,
        find_max_location,
        single_obj_scoremap,
    )

    rng = np.random.RandomState(5)
    scoremap = _blobby_scoremap(rng, 3, 48, 64)

    fg = np.asarray(
        oracle.run_tf(
            lambda r, p: r.general.find_max_location(
                r.tf1.reduce_max(r.tf1.nn.softmax(p["sm"])[..., 1:], 3)),
            {"sm": scoremap}))
    sm_soft = np.exp(scoremap) / np.exp(scoremap).sum(-1, keepdims=True)
    mine_loc = np.asarray(find_max_location(sm_soft[..., 1:].max(-1)))
    np.testing.assert_array_equal(mine_loc, fg)

    ref_mask = np.asarray(
        oracle.run_tf(lambda r, p: r.general.single_obj_scoremap(p["sm"]),
                      {"sm": scoremap}))
    mine_mask = np.asarray(single_obj_scoremap(scoremap))
    np.testing.assert_array_equal(np.squeeze(mine_mask), np.squeeze(ref_mask))

    ref_c, ref_bb, ref_cs = oracle.run_tf(
        lambda r, p: r.general.calc_center_bb(p["m"]), {"m": ref_mask})
    mine_c, mine_bb, mine_cs = calc_center_bb(mine_mask)
    np.testing.assert_allclose(np.asarray(mine_c), ref_c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mine_cs), ref_cs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mine_bb), ref_bb, atol=1e-5)

    # empty-mask fallback constants (general.py:311-320)
    empty = np.zeros((2, 48, 64, 1), np.float32)
    ref_c, _, ref_cs = oracle.run_tf(
        lambda r, p: r.general.calc_center_bb(p["m"]), {"m": empty})
    mine_c, _, mine_cs = calc_center_bb(empty)
    np.testing.assert_allclose(np.asarray(mine_c), ref_c)
    np.testing.assert_allclose(np.asarray(mine_cs), ref_cs)


def test_glue_canonical_and_relative(oracle, jnp_cpu):
    """canonical_trafo + flip_right_hand (canonical_trafo.py:94-162) and
    bone_rel_trafo(+inv) (relative_trafo.py:184-295) on random coords."""
    from hand3d_tpu.ops.canonical import canonical_trafo, flip_right_hand
    from hand3d_tpu.ops.kinematics import bone_rel_trafo, bone_rel_trafo_inv

    rng = np.random.RandomState(9)
    coords = rng.randn(4, 21, 3).astype(np.float32)
    cond = np.asarray([True, False, True, False])

    ref_can, ref_rot = oracle.run_tf(
        lambda r, p: r.canonical.canonical_trafo(p["c"]), {"c": coords})
    mine_can, mine_rot = canonical_trafo(coords)
    np.testing.assert_allclose(np.asarray(mine_can), ref_can, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mine_rot), ref_rot, atol=1e-4)

    ref_flip = oracle.run_tf(
        lambda r, p: r.canonical.flip_right_hand(
            p["c"], r.tf1.constant(cond)), {"c": coords})
    mine_flip = flip_right_hand(coords, cond[:, None, None])
    np.testing.assert_allclose(np.asarray(mine_flip), ref_flip, atol=1e-6)

    ref_local = oracle.run_tf(
        lambda r, p: r.relative.bone_rel_trafo(p["c"]), {"c": coords})
    mine_local = bone_rel_trafo(coords)
    np.testing.assert_allclose(np.asarray(mine_local), np.asarray(ref_local),
                               atol=1e-4)

    rel = rng.randn(4, 21, 3).astype(np.float32) * 0.3
    ref_inv = oracle.run_tf(
        lambda r, p: r.relative.bone_rel_trafo_inv(p["c"]), {"c": rel})
    mine_inv = bone_rel_trafo_inv(rel)
    np.testing.assert_allclose(np.asarray(mine_inv), np.asarray(ref_inv),
                               atol=1e-4)


def test_host_decode_helpers(oracle):
    """detect_keypoints / trafo_coords (general.py:331-357, pure numpy)."""
    from hand3d_tpu.ops.keypoints import detect_keypoints_2d, trafo_coords

    ref = oracle.import_reference()
    rng = np.random.RandomState(2)
    sm = rng.rand(64, 48, 21).astype(np.float32)
    ref_kp = ref.general.detect_keypoints(sm)
    mine_kp = np.asarray(detect_keypoints_2d(sm[None]))[0]
    np.testing.assert_array_equal(mine_kp, ref_kp)

    centers = rng.uniform(20, 200, (1, 2)).astype(np.float32)
    scale = np.float32(1.7)
    ref_tc = ref.general.trafo_coords(ref_kp.copy(), centers, scale, 256)
    mine_tc = np.asarray(trafo_coords(mine_kp[None], centers, scale, 256))[0]
    np.testing.assert_allclose(mine_tc, ref_tc, atol=1e-4)


@pytest.mark.parametrize("dominant,use_wrist,hand_crop", [
    ("left", True, False),
    ("right", True, True),
    ("left", False, True),
])
def test_derived_features_vs_reference_reader(oracle, jnp_cpu, tmp_path,
                                              dominant, use_wrist, hand_crop):
    """preprocess_rhd vs the reference reader's derived-data graph
    (data/BinaryDbReader.py:126-368) on synthetic records."""
    import jax

    from fixtures import make_rhd_bin
    from hand3d_tpu.data.config import PreprocessConfig
    from hand3d_tpu.data.preprocess import preprocess_rhd
    from hand3d_tpu.data.rhd import RHDDataset

    path = make_rhd_bin(tmp_path / "rhd.bin", num_records=3, seed=4,
                        dominant=dominant)
    ds = RHDDataset("evaluation", path=str(path))
    raw = ds.raw_batch(np.arange(3))

    cfg = PreprocessConfig(use_wrist_coord=use_wrist, hand_crop=hand_crop)
    mine = jax.jit(lambda r: preprocess_rhd(cfg, r))(raw)
    mine = {k: np.asarray(v) for k, v in mine.items()}

    tol = {
        "image": 1e-6, "hand_mask": 0, "hand_parts": 0, "hand_side": 0,
        "keypoint_uv": 1e-5, "keypoint_vis": 0, "keypoint_xyz": 1e-6,
        "keypoint_xyz21": 1e-6, "keypoint_uv21": 1e-3, "keypoint_vis21": 0,
        "keypoint_scale": 1e-6, "keypoint_xyz21_normed": 1e-5,
        "keypoint_xyz21_local": 1e-4, "keypoint_xyz21_can": 1e-4,
        "rot_mat": 1e-4, "scoremap": 1e-4, "image_crop": 1e-3,
        "crop_scale": 1e-5, "cam_mat": 1e-2,
    }
    for i in range(3):
        sample = {k: np.asarray(v[i]) for k, v in raw.items()}
        ref = oracle.reference_derived_features(
            sample, use_wrist_coord=use_wrist, hand_crop=hand_crop)
        shared = set(ref) & set(mine)
        # everything the reference produces must exist on our side
        assert set(ref) <= set(mine), sorted(set(ref) - set(mine))
        for k in sorted(shared):
            a, b = np.squeeze(mine[k][i]), np.squeeze(ref[k])
            if k == "scoremap":
                _assert_scoremap_close(a, b, mine["keypoint_uv21"][i],
                                       ref["keypoint_uv21"], tol[k], i)
                continue
            np.testing.assert_allclose(
                a.astype(np.float64), b.astype(np.float64),
                atol=tol[k], err_msg=f"{k} sample {i}")


def _assert_scoremap_close(a, b, uv_mine, uv_ref, atol, i):
    """GT scoremaps match per channel, modulo truncation-boundary flips.

    The reference truncates crop-frame uv to int before rendering the
    Gaussian (BinaryDbReader.create_multiple_gaussian_map :415); when the
    float uv sits within one ulp of an integer ((uv-center)*scale computed
    in a different association order: observed 63.999996 vs TF's 64.0),
    both stacks are 'correct' but the truncated centers differ by 1 px.
    Accept exactly that case: float uv agree to 1e-2 and the rendered
    argmax differs by <= 1 px; everything else must match to atol.
    """
    for ch in range(a.shape[-1]):
        if np.allclose(a[..., ch], b[..., ch], atol=atol, rtol=0):
            continue
        np.testing.assert_allclose(uv_mine[ch], uv_ref[ch], atol=1e-2,
                                   err_msg=f"scoremap ch{ch} sample {i}")
        pa = np.unravel_index(np.argmax(a[..., ch]), a.shape[:2])
        pb = np.unravel_index(np.argmax(b[..., ch]), b.shape[:2])
        assert max(abs(pa[0] - pb[0]), abs(pa[1] - pb[1])) <= 1, (
            f"scoremap ch{ch} sample {i}: argmax {pa} vs {pb}, "
            "more than a truncation-boundary flip")


def test_evalutil_cross(oracle):
    """EvalUtil + calc_auc (general.py:522-611, :654-675)."""
    from hand3d_tpu.eval.metrics import EvalUtil, calc_auc

    ref = oracle.import_reference()
    rng = np.random.RandomState(13)
    ours, theirs = EvalUtil(), ref.general.EvalUtil()
    for _ in range(40):
        gt = rng.randn(21, 3) * 30
        pred = gt + rng.randn(21, 3) * rng.uniform(0.5, 15)
        vis = rng.rand(21) > 0.25
        ours.feed(gt, vis, pred)
        theirs.feed(gt, vis, pred)
    m_mine = ours.get_measures(0.0, 50.0, 20)
    m_ref = theirs.get_measures(0.0, 50.0, 20)
    for a, b in zip(m_mine[:3], m_ref[:3]):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    np.testing.assert_allclose(m_mine[3], m_ref[3], rtol=1e-12)

    x = np.linspace(0, 50, 30)
    y = rng.rand(30)
    np.testing.assert_allclose(calc_auc(x, y), ref.general.calc_auc(x, y),
                               rtol=1e-12)


def test_tf_written_checkpoint_roundtrip(oracle, tmp_path):
    """weights/tf_ckpt.py against a checkpoint ACTUALLY written by
    tf1.train.Saver, plus discard/rename semantics vs the reference's
    load_weights_from_snapshot (general.py:614-651,
    training_posenet.py:74-76)."""
    from hand3d_tpu.weights.convert import apply_discard_rename
    from hand3d_tpu.weights.tf_ckpt import load_tf_checkpoint

    rng = np.random.RandomState(21)
    flat = {
        "CPM/PersonNet/conv1_1/weights": rng.randn(3, 3, 3, 8).astype(np.float32),
        "CPM/PersonNet/conv1_1/biases": rng.randn(8).astype(np.float32),
        "CPM/PoseNet/conv1_1_CPM/weights": rng.randn(3, 3, 8, 16).astype(np.float32),
        "CPM/PoseNet/Mconv1_stage2/weights": rng.randn(7, 7, 16, 16).astype(np.float32),
        "CPM/PersonNet/conv1_1/weights/Adam": rng.randn(3, 3, 3, 8).astype(np.float32),
        "beta1_power": np.asarray(0.9, np.float32),
        "global_step_f": np.asarray(1234.0, np.float32),
    }
    ckpt = oracle.save_tf_checkpoint(str(tmp_path / "snap-1234"), flat)

    # (a) the TF-free parser reads a real Saver checkpoint bit-identically
    parsed = load_tf_checkpoint(ckpt)
    assert set(parsed) == set(flat)
    for k, v in flat.items():
        np.testing.assert_array_equal(parsed[k], v, err_msg=k)

    # (b) discard+rename matches the reference loader executed for real
    discard = ["Adam", "global_step", "beta"]
    rename = {"CPM/PersonNet": "HandSegNet", "CPM/PoseNet": "PoseNet2D"}
    mine = apply_discard_rename(parsed, discard, rename)
    ref_vals = oracle.reference_load_weights_from_snapshot(
        ckpt, {k: v.shape for k, v in mine.items()},
        discard_list=discard, rename_dict=rename)
    assert set(ref_vals) == set(mine)
    for k in mine:
        np.testing.assert_array_equal(mine[k], ref_vals[k], err_msg=k)


# --------------------------------------------------------------------------
# Training-graph parity: the reference's LOSSES, LR schedule and one full
# Adam step, executed via TF (training_posenet.py:46-69,
# training_handsegnet.py:44-60, training_lifting.py:49-77).
# --------------------------------------------------------------------------


def test_posenet_training_loss(oracle, jnp_cpu):
    """Visibility-weighted scoremap loss incl. the per-head resize_images
    upsample (training_posenet.py:57-61) vs train/losses.py. Exercises
    mixed-resolution heads and rows with zero visible keypoints."""
    import jax

    from hand3d_tpu.train.losses import posenet_scoremap_loss

    rng = np.random.RandomState(2)
    gt = rng.rand(3, 64, 64, 21).astype(np.float32)
    preds = [rng.rand(3, 8, 8, 21).astype(np.float32),
             rng.rand(3, 8, 8, 21).astype(np.float32),
             rng.rand(3, 64, 64, 21).astype(np.float32)]
    vis = (rng.rand(3, 21) > 0.3).astype(np.float32)
    vis[1] = 0.0  # a sample with nothing visible

    def build(ref, phs):
        tf1 = ref.tf1
        s = phs["scoremap"].get_shape().as_list()
        heads = [tf1.image.resize_images(phs[f"pred{i}"], (s[1], s[2]))
                 for i in range(3)]
        v = tf1.cast(tf1.reshape(phs["vis"], [s[0], s[3]]), tf1.float32)
        loss = 0.0
        for pred_item in heads:
            loss += tf1.reduce_sum(
                v * tf1.sqrt(tf1.reduce_mean(
                    tf1.square(pred_item - phs["scoremap"]), [1, 2]))
            ) / (tf1.reduce_sum(v) + 0.001)
        return loss

    ref_loss = oracle.run_tf(build, {
        "scoremap": gt, "vis": vis,
        "pred0": preds[0], "pred1": preds[1], "pred2": preds[2]})
    mine = jax.jit(posenet_scoremap_loss)(preds, gt, vis)
    np.testing.assert_allclose(float(mine), float(ref_loss), rtol=1e-5)


def test_handsegnet_training_loss(oracle, jnp_cpu):
    """Mean softmax CE (training_handsegnet.py:55-60) vs train/losses.py.

    The reference's loop body reshapes the WHOLE prediction list each
    iteration (`tf.reshape(hand_mask_pred, ...)`), which only type-checks
    because inference_detection returns a single head — for that executed
    length-1 surface the packed list equals the head itself, and that is
    the semantics handsegnet_loss mirrors."""
    import jax

    from hand3d_tpu.train.losses import handsegnet_loss

    rng = np.random.RandomState(4)
    logits = (rng.randn(2, 32, 32, 2) * 3).astype(np.float32)
    mask = np.eye(2, dtype=np.float32)[rng.randint(0, 2, (2, 32, 32))]

    def build(ref, phs):
        tf1 = ref.tf1
        pred_list = [phs["logits"]]
        s = phs["mask"].get_shape().as_list()
        loss = 0.0
        for _pred_item in pred_list:
            gt = tf1.reshape(phs["mask"], [s[0] * s[1] * s[2], -1])
            pred = tf1.reshape(pred_list, [s[0] * s[1] * s[2], -1])
            loss += tf1.reduce_mean(tf1.nn.softmax_cross_entropy_with_logits(
                logits=pred, labels=gt))
        return loss

    ref_loss = oracle.run_tf(build, {"logits": logits, "mask": mask})
    mine = jax.jit(handsegnet_loss)([logits], mask)
    np.testing.assert_allclose(float(mine), float(ref_loss), rtol=1e-6)


@pytest.mark.parametrize("variant", ["direct", "bottleneck", "local",
                                     "local_w_xyz_loss", "proposed"])
def test_lifting_training_loss(oracle, jnp_cpu, variant):
    """Per-variant lifting losses (training_lifting.py:63-77), including the
    bone_rel_trafo_inv round-trip inside local_w_xyz_loss, vs
    train/losses.lifting_loss on identical random predictions/targets."""
    import jax

    from hand3d_tpu.models.poseprior import LiftingOutput
    from hand3d_tpu.train.losses import lifting_loss

    rng = np.random.RandomState(6)
    coord3d = rng.randn(2, 21, 3).astype(np.float32)
    rot = rng.randn(2, 3, 3).astype(np.float32)
    batch = {
        "keypoint_xyz21_normed": rng.randn(2, 21, 3).astype(np.float32),
        "keypoint_xyz21_local": rng.randn(2, 21, 3).astype(np.float32),
        "keypoint_xyz21_can": rng.randn(2, 21, 3).astype(np.float32),
        "rot_mat": rng.randn(2, 3, 3).astype(np.float32),
    }

    def build(ref, phs):
        tf1 = ref.tf1
        c3d = phs["coord3d"]
        if variant in ("direct", "bottleneck"):
            return tf1.reduce_mean(tf1.square(c3d - phs["normed"]))
        if variant == "local":
            return tf1.reduce_mean(tf1.square(c3d - phs["local"]))
        if variant == "local_w_xyz_loss":
            xyz = ref.relative.bone_rel_trafo_inv(c3d)
            return tf1.reduce_mean(tf1.square(xyz - phs["normed"]))
        loss = tf1.reduce_mean(tf1.square(c3d - phs["can"]))
        return loss + tf1.reduce_mean(tf1.square(phs["rot"] - phs["rot_mat"]))

    ref_loss = oracle.run_tf(build, {
        "coord3d": coord3d, "rot": rot,
        "normed": batch["keypoint_xyz21_normed"],
        "local": batch["keypoint_xyz21_local"],
        "can": batch["keypoint_xyz21_can"],
        "rot_mat": batch["rot_mat"]})
    mine = jax.jit(lambda o, b: lifting_loss(variant, o, b))(
        LiftingOutput(coord3d, coord3d, rot), batch)
    np.testing.assert_allclose(float(mine), float(ref_loss), rtol=1e-5)


def test_lr_scheduler_vs_reference(oracle):
    """train/schedule.piecewise_constant vs LearningRateScheduler
    (general.py:480-519) executed at the boundaries.

    The reference's 1-value and n>=3-value branches use `>= step` semantics
    (the surface its training scripts execute: 3 values each) and ours
    matches them exactly. Its 2-value branch is internally INCONSISTENT with
    the others — `tf.greater` instead of `>=`, so at global_step == steps[0]
    it still returns values[0] one step longer; we pin that quirk here
    rather than copy it."""
    from hand3d_tpu.train.schedule import piecewise_constant

    # the executed surface: 3 values (training_posenet.py:29-31)
    values, steps = [1e-4, 1e-5, 1e-6], [10000, 20000]
    query = [0, 1, 9999, 10000, 10001, 15000, 19999, 20000, 20001, 50000]
    ref_lrs = oracle.reference_lr_schedule(values, steps, query)
    sched = piecewise_constant(steps, values)
    for q, r in zip(query, ref_lrs):
        np.testing.assert_allclose(float(sched(q)), r, rtol=1e-6,
                                   err_msg=f"step {q}")

    # 1 value: constant
    ref_lrs = oracle.reference_lr_schedule([3e-5], [], [0, 7, 99999])
    sched = piecewise_constant([], [3e-5])
    for q, r in zip([0, 7, 99999], ref_lrs):
        np.testing.assert_allclose(float(sched(q)), r, rtol=1e-6)

    # 2 values: the reference flips one step LATER (greater vs >=)
    ref_lrs = oracle.reference_lr_schedule([1e-4, 1e-5], [100],
                                           [99, 100, 101])
    sched = piecewise_constant([100], [1e-4, 1e-5])
    np.testing.assert_allclose(ref_lrs, [1e-4, 1e-4, 1e-5], rtol=1e-6)
    np.testing.assert_allclose(
        [float(sched(q)) for q in [99, 100, 101]],
        [1e-4, 1e-5, 1e-5], rtol=1e-6)


def _train_step_inputs(stage, variant):
    rng = np.random.RandomState(9)
    if stage == "posenet":
        return {
            "image_crop": (rng.rand(2, 64, 64, 3) - 0.5).astype(np.float32),
            "scoremap": rng.rand(2, 64, 64, 21).astype(np.float32),
            "keypoint_vis21": (rng.rand(2, 21) > 0.3).astype(np.float32),
        }
    if stage == "handsegnet":
        return {
            "image": (rng.rand(2, 64, 64, 3) - 0.5).astype(np.float32),
            "hand_mask": np.eye(2, dtype=np.float32)[
                rng.randint(0, 2, (2, 64, 64))],
        }
    inputs = {
        "scoremap": rng.rand(2, 256, 256, 21).astype(np.float32),
        "hand_side": np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32),
        "keypoint_xyz21_normed": rng.randn(2, 21, 3).astype(np.float32),
    }
    if variant == "proposed":
        inputs["keypoint_xyz21_can"] = rng.randn(2, 21, 3).astype(np.float32)
        inputs["rot_mat"] = rng.randn(2, 3, 3).astype(np.float32)
    return inputs


@pytest.mark.parametrize("stage,variant", [
    ("posenet", None),
    ("handsegnet", None),
    ("lifting", "proposed"),
    ("lifting", "local_w_xyz_loss"),
])
def test_train_step_vs_reference(oracle, jnp_cpu, stage, variant):
    """ONE full training step against the reference's executed graph: same
    weights and batch into both stacks, assert (a) loss, (b) every
    trainable-variable gradient, (c) the Adam-updated parameters.

    The reference trains lifting with dropout DISABLED — training_lifting.py
    builds `evaluation = placeholder_with_default(True)` and never feeds it
    (:54-56, :89-95), and ops.dropout keeps everything when evaluation is
    True (general.py:139-148) — so the JAX side runs train=False (dropout
    off) to match the reference's executed semantics.

    (c) carries an analytic tolerance: tf.train.AdamOptimizer folds the
    bias corrections into the step size (update = lr*sqrt(1-b2^t)/(1-b1^t)
    * m/(sqrt(v)+eps)), while optax.adam regularizes the bias-CORRECTED
    denominator (m_hat/(sqrt(v_hat)+eps)). At step 1 the two differ by at
    most lr * (eps/sqrt(1-b2) - eps) / (|g| + eps/sqrt(1-b2)) elementwise —
    only tiny-|g| entries feel it, and both updates vanish there."""
    import jax
    import optax

    from hand3d_tpu.weights.convert import flat_to_tree, tree_to_flat

    lr = 1e-4
    inputs = _train_step_inputs(stage, variant)
    ref = oracle.reference_train_step(stage, inputs, lr,
                                      variant=variant or "proposed")
    tree = flat_to_tree(ref["vars0"])

    if stage == "posenet":
        from hand3d_tpu.models import posenet
        from hand3d_tpu.train.losses import posenet_scoremap_loss

        def loss_fn(tree):
            preds = posenet.apply(tree[posenet.SCOPE], inputs["image_crop"])
            return posenet_scoremap_loss(
                preds, inputs["scoremap"], inputs["keypoint_vis21"])
    elif stage == "handsegnet":
        from hand3d_tpu.models import handsegnet
        from hand3d_tpu.train.losses import handsegnet_loss

        def loss_fn(tree):
            logits = handsegnet.apply(tree[handsegnet.SCOPE], inputs["image"])
            return handsegnet_loss(logits, inputs["hand_mask"])
    else:
        from hand3d_tpu.models.poseprior import PosePriorNetwork
        from hand3d_tpu.train.losses import lifting_loss

        net = PosePriorNetwork(variant)

        def loss_fn(tree):
            out = net.apply(tree, inputs["scoremap"], inputs["hand_side"],
                            train=False)
            return lifting_loss(variant, out, inputs)

    loss_j, grads = jax.jit(jax.value_and_grad(loss_fn))(tree)
    np.testing.assert_allclose(float(loss_j), ref["loss"], rtol=1e-5)

    flat_g = tree_to_flat(jax.device_get(grads))
    assert set(flat_g) == set(ref["grads"])
    # Absolute tolerance is relative to the NETWORK-WIDE gradient scale, and
    # its floor is set by leaky-relu MASK FLIPS, not accumulation rounding.
    # Probed (posenet, this exact seed): TF's grads are bit-identical across
    # threading configs and our jit-vs-eager self-noise is 2.7e-7 of scale,
    # yet at random init each refiner layer holds 250-600 pre-activations
    # within 1e-5 of zero — the two stacks' f32 conv forwards land those on
    # opposite sides of 0, flipping that element's backward factor between
    # 1.0 and 0.01 (tf.maximum(x, 0.01x) semantics in both). A flip shows
    # up as an ISOLATED absolute diff equal to that element's upstream
    # contribution (observed: 1 element of conv7_2/biases off by 7.4e-5
    # while its 127 neighbours agree to 1e-7), so the assertion caps the
    # count and magnitude of such outliers instead of loosening the
    # everywhere-else tolerance.
    g_scale = max(np.abs(g).max() for g in ref["grads"].values())
    grad_atol = 1e-3 * g_scale
    flip_outliers = 0
    for name, g_ref in sorted(ref["grads"].items()):
        diff = np.abs(flat_g[name] - g_ref)
        bad = diff > (grad_atol + 1e-3 * np.abs(g_ref))
        # Isolated flips move around between runs (TF's oneDNN primitives
        # reassociate differently run to run), so cap their COUNT and
        # MAGNITUDE instead of inflating the blanket tolerance: each flip's
        # contribution is one upstream element, observed ≤7.4e-5 (1.3e-3 of
        # scale) — 5e-3 of scale bounds it with margin.
        assert bad.sum() <= 4, (
            f"grad {name}: {bad.sum()} elements beyond tolerance "
            f"(max diff {diff.max():.3e}, scale {g_scale:.3e})")
        flip_outliers += int(bad.sum())
        if bad.any():
            assert diff[bad].max() <= 5e-3 * g_scale, (
                f"grad {name}: outlier {diff[bad].max():.3e} exceeds the "
                f"single-mask-flip bound {5e-3 * g_scale:.3e}")
    assert flip_outliers <= 12, f"{flip_outliers} flip outliers across tree"

    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    updates, _ = opt.update(grads, opt.init(tree), tree)
    flat_new = tree_to_flat(
        jax.device_get(optax.apply_updates(tree, updates)))
    eps_tf = 1e-8 / np.sqrt(1.0 - 0.999)  # TF's effective eps at step 1
    for name in sorted(ref["vars1"]):
        d_ref = ref["vars1"][name] - ref["vars0"][name]
        d_j = flat_new[name] - ref["vars0"][name]
        g = np.abs(ref["grads"][name])
        # At step 1 the Adam update is ~lr*sign(g); entries whose |grad| is
        # below the mask-flip floor (grad_atol above) can legitimately flip
        # SIGN between the stacks, moving the update by up to 2*lr — allow
        # that only for those entries, bound everything else analytically.
        bound = lr * (eps_tf - 1e-8) / (g + eps_tf) + 5e-3 * np.abs(d_ref) \
            + np.where(g < grad_atol, 2.2 * lr, 0.0) + 1e-11
        err = np.abs(d_j - d_ref)
        assert (err <= bound).all(), (
            f"{name}: max excess {(err - bound).max():.3e}")


def test_reference_pickle_init_path(oracle, jnp_cpu, ref_cascade, tmp_path):
    """The reference's OWN pickle loader executed vs convert_reference_pickles.

    Synthesizes a two-pickle weight set shaped exactly like the shipped
    handsegnet-rhd / posenet3d-* pair (keys = graph variable op names),
    including a cross-file name collision and an excluded-substring family,
    pushes it through ``ColorHandPose3DNetwork.init``
    (ColorHandPose3DNetwork.py:34-59) for real, and asserts (a) the loader
    semantics match — last file wins on collisions, excluded names keep
    their random init — and (b) the same pickles through
    weights/convert.convert_reference_pickles drive the JAX cascade to the
    reference's outputs."""
    import pickle

    import jax

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.weights.convert import (convert_reference_pickles,
                                            flat_to_tree, tree_to_flat)

    image, hand_side, _, flat0 = ref_cascade
    rng = np.random.RandomState(33)

    def fresh(shape):
        # glorot-scaled so activations stay in the regime the cascade
        # test's 1e-5 absolute tolerances were set for (flat-std weights
        # inflate deep activations ~80x and with them the f32 noise floor)
        if len(shape) == 4:
            fan_in, fan_out = (np.prod(shape[:3]),
                               shape[0] * shape[1] * shape[3])
        elif len(shape) == 2:
            fan_in, fan_out = shape
        else:
            fan_in = fan_out = max(int(shape[0]) if shape else 1, 1)
        std = np.sqrt(2.0 / (fan_in + fan_out))
        return (rng.randn(*shape) * std).astype(np.float32)

    seg = {k: fresh(v.shape) for k, v in flat0.items()
           if k.startswith("HandSegNet/")}
    rest = {k: fresh(v.shape) for k, v in flat0.items()
            if not k.startswith("HandSegNet/")}
    collide = "HandSegNet/conv1_1/weights"
    rest[collide] = fresh(flat0[collide].shape)  # later file must win
    exclude = ["fc_vp_u"]  # the three viewpoint heads stay at random init
    excluded_names = [k for k in flat0 if "fc_vp_u" in k]
    assert len(excluded_names) == 6  # ux/uy/uz weights+biases

    p1, p2 = str(tmp_path / "seg.pickle"), str(tmp_path / "pose.pickle")
    with open(p1, "wb") as f:
        pickle.dump(seg, f)
    with open(p2, "wb") as f:
        pickle.dump(rest, f)

    ref_outs, ref_vars = oracle.reference_cascade_from_pickles(
        image, hand_side, [p1, p2], exclude_var_list=exclude)

    # (a) loader semantics, from the executed reference
    np.testing.assert_array_equal(ref_vars[collide], rest[collide])
    for k in excluded_names:  # untouched by init => random, not our values
        assert not np.array_equal(ref_vars[k], rest[k]), k

    flat_mine = tree_to_flat(
        convert_reference_pickles([p1, p2], exclude_var_list=exclude))
    assert set(flat_mine) == set(ref_vars) - set(excluded_names)
    for k, v in flat_mine.items():
        np.testing.assert_array_equal(v, ref_vars[k], err_msg=k)

    # (b) run the SAME effective weights (excluded vars adopt the
    # reference's random init, as a user warm-starting would re-init them)
    for k in excluded_names:
        flat_mine[k] = ref_vars[k]
    model = ColorHandPose3D()
    out = jax.jit(model.inference)(flat_to_tree(flat_mine), image, hand_side)
    tol = {"hand_scoremap": 1e-5, "image_crop": 1e-3, "scale_crop": 1e-5,
           "center": 1e-4, "keypoints_scoremap": 1e-5,
           "keypoint_coord3d": 1e-5}
    for name, atol in tol.items():
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), ref_outs[name], atol=atol,
            err_msg=name)


def test_reference_reader_consumes_our_bin(oracle, tmp_path):
    """The reference's OWN queue pipeline reads a .bin WE wrote.

    tools/create_binary_db.py's byte layout (data/codec.py) was previously
    validated by round-tripping through our own reader; here the file is fed
    to the reference's FixedLengthRecordReader + decode_raw graph
    (data/BinaryDbReader.py:101-211) and every decoded field must equal the
    codec's view of the same records — byte-level cross-stack compatibility
    in the direction that matters for drop-in replacement (a reference user
    can consume databases produced by this repo's tools)."""
    from fixtures import make_rhd_bin

    from hand3d_tpu.data.codec import RHD_RECORD_DTYPE, FixedLenRecordFile

    bin_path = str(tmp_path / "ours.bin")
    make_rhd_bin(bin_path, num_records=5, seed=3)
    recs = FixedLenRecordFile(bin_path, RHD_RECORD_DTYPE)

    (batch,) = oracle.reference_read_bin(bin_path, batch_size=4,
                                         num_batches=1,
                                         use_wrist_coord=True,
                                         hand_crop=False)
    for i in range(4):
        rec = recs[i]
        np.testing.assert_array_equal(
            batch["keypoint_xyz"][i], rec["kp_xyz"], err_msg=f"xyz[{i}]")
        # the reference truncates uv through int32 on decode (:148-152)
        np.testing.assert_array_equal(
            batch["keypoint_uv"][i],
            rec["kp_uv"].astype(np.int32).astype(np.float32),
            err_msg=f"uv[{i}]")
        np.testing.assert_array_equal(
            batch["cam_mat"][i], rec["cam_mat"], err_msg=f"cam[{i}]")
        np.testing.assert_allclose(
            batch["image"][i], rec["image"].astype(np.float32) / 255.0 - 0.5,
            atol=1e-6, err_msg=f"image[{i}]")
        np.testing.assert_array_equal(
            batch["hand_parts"][i], rec["hand_parts"].astype(np.int32),
            err_msg=f"parts[{i}]")
        np.testing.assert_array_equal(
            batch["keypoint_vis"][i], rec["kp_vis"].astype(bool),
            err_msg=f"vis[{i}]")


def test_reference_stb_reader_consumes_our_bin(oracle, tmp_path):
    """Same byte-compatibility direction for STB: the reference's
    BinaryDbReaderSTB queue pipeline (data/BinaryDbReaderSTB.py:84-300)
    reads an stb_eval.bin written by our codec and decodes the permuted,
    meter-scaled keypoints and image exactly."""
    from fixtures import make_stb_bin

    from hand3d_tpu.data.codec import STB_RECORD_DTYPE, FixedLenRecordFile
    from hand3d_tpu.data.preprocess import STB_KP_PERM

    bin_path = str(tmp_path / "stb_ours.bin")
    make_stb_bin(bin_path, num_records=4, seed=9)
    recs = FixedLenRecordFile(bin_path, STB_RECORD_DTYPE)
    perm = np.asarray(STB_KP_PERM)

    # use_wrist_coord=False keeps the decoded palm keypoint (no wrist
    # extrapolation), isolating the byte path from derived features
    (batch,) = oracle.reference_read_bin(bin_path, batch_size=3,
                                         num_batches=1, dataset="stb",
                                         use_wrist_coord=False,
                                         hand_crop=False)
    for i in range(3):
        rec = recs[i]
        # xyz: /1000 to meters, then the reference's keypoint reordering
        # (BinaryDbReaderSTB.py:128-129, convert_kp :396-409)
        np.testing.assert_allclose(
            batch["keypoint_xyz21"][i],
            rec["kp_xyz"][perm] / 1000.0, rtol=1e-6, err_msg=f"xyz[{i}]")
        uv_vis = rec["kp_uv_vis"][perm]
        np.testing.assert_allclose(
            batch["keypoint_uv21"][i], uv_vis[:, :2], rtol=1e-6,
            err_msg=f"uv[{i}]")
        np.testing.assert_array_equal(
            batch["keypoint_vis21"][i], uv_vis[:, 2] == 1.0,
            err_msg=f"vis[{i}]")
        np.testing.assert_allclose(
            batch["image"][i], rec["image"].astype(np.float32) / 255.0 - 0.5,
            atol=1e-6, err_msg=f"image[{i}]")
        # the fixed BB-camera intrinsics constant (:202-208)
        np.testing.assert_allclose(
            batch["cam_mat"][i],
            [[822.79041, 0, 318.47345], [0, 822.79041, 250.31296], [0, 0, 1]],
            rtol=1e-6)


# ---------------------------------------------------------------------------
# Harness-level composed parity: .bin file -> final benchmark number.
#
# Each test runs a reference EVAL SCRIPT's complete composition (queue
# reader -> network -> per-sample host decode -> EvalUtil -> get_measures,
# tools/tf_reference_oracle.reference_eval_harness) and the corresponding
# hand3d_tpu harness (eval/harnesses.py) on the SAME synthetic .bin and the
# SAME weights, then diffs the final metrics. With these green, reproducing
# BASELINE.md rows 1-13 is purely a data/weights acquisition problem: every
# computational step between bytes on disk and the benchmark number is
# executed equal in both stacks.
# ---------------------------------------------------------------------------


def test_harness_eval2d_gt_cropped_vs_reference(oracle, jnp_cpu, tmp_path):
    """eval2d_gt_cropped.py end-to-end (BASELINE rows 1-2 composition)."""
    from fixtures import make_rhd_bin

    from hand3d_tpu.data.rhd import RHDDataset
    from hand3d_tpu.eval.harnesses import eval2d_gt_cropped
    from hand3d_tpu.weights.convert import flat_to_tree

    n = 6
    bin_path = str(tmp_path / "rhd_eval.bin")
    make_rhd_bin(bin_path, num_records=n, seed=21)
    ref_m, flat = oracle.reference_eval_harness(
        "eval2d_gt_cropped", bin_path, n)

    ours = eval2d_gt_cropped(
        flat_to_tree(flat)["PoseNet2D"],
        RHDDataset("evaluation", path=bin_path),
        batch_size=4,  # n=6 also exercises the padded last batch
    )
    # tolerance: a single argmax near-tie flip (scoremaps agree to ~1e-6;
    # ties resolve per-stack) moves one keypoint ~1 px -> mean shifts
    # ~1/(n*21) px. A composition bug (wrong scale/offset/frame) shifts
    # metrics by whole pixels, far above this.
    np.testing.assert_allclose(
        ours["epe_mean_px"], ref_m["mean"], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(
        ours["epe_median_px"], ref_m["median"], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(
        ours["auc_0_30px"], ref_m["auc"], rtol=1e-3, atol=2e-3)


def test_harness_eval2d_vs_reference(oracle, jnp_cpu, tmp_path):
    """eval2d.py end-to-end (BASELINE rows 3-4 composition): detection,
    crop, PoseNet, host argmax + trafo_coords crop->global mapping."""
    from fixtures import make_rhd_bin

    from hand3d_tpu.data.rhd import RHDDataset
    from hand3d_tpu.eval.harnesses import eval2d_full_image
    from hand3d_tpu.weights.convert import flat_to_tree

    n = 5
    bin_path = str(tmp_path / "rhd_eval.bin")
    make_rhd_bin(bin_path, num_records=n, seed=22)
    ref_m, flat = oracle.reference_eval_harness("eval2d", bin_path, n)

    ours = eval2d_full_image(
        flat_to_tree(flat),
        RHDDataset("evaluation", path=bin_path),
        batch_size=4, use_wrist_coord=True, scale_to_size=True,
    )
    # tolerance: a single argmax near-tie flip (scoremaps agree to ~1e-6;
    # ties resolve per-stack) moves one keypoint ~1 px -> mean shifts
    # ~1/(n*21) px. A composition bug (wrong scale/offset/frame) shifts
    # metrics by whole pixels, far above this.
    np.testing.assert_allclose(
        ours["epe_mean_px"], ref_m["mean"], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(
        ours["epe_median_px"], ref_m["median"], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(
        ours["auc_0_30px"], ref_m["auc"], rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("variant", ["direct", "proposed"])
def test_harness_eval3d_vs_reference(oracle, jnp_cpu, tmp_path, variant):
    """eval3d.py end-to-end (BASELINE rows 7-11 composition): GT scoremaps
    -> lifting variant -> meters via keypoint_scale vs root-centered GT."""
    from fixtures import make_rhd_bin

    from hand3d_tpu.data.rhd import RHDDataset
    from hand3d_tpu.eval.harnesses import eval3d_lifting
    from hand3d_tpu.weights.convert import flat_to_tree

    n = 5
    bin_path = str(tmp_path / "rhd_eval.bin")
    make_rhd_bin(bin_path, num_records=n, seed=23)
    ref_m, flat = oracle.reference_eval_harness(
        "eval3d", bin_path, n, variant=variant)

    ours = eval3d_lifting(
        variant, flat_to_tree(flat),
        RHDDataset("evaluation", path=bin_path), batch_size=4,
    )
    np.testing.assert_allclose(
        ours["epe_mean_mm"], ref_m["mean"] * 1000, rtol=1e-4, atol=0.02)
    np.testing.assert_allclose(
        ours["epe_median_mm"], ref_m["median"] * 1000, rtol=1e-4, atol=0.02)
    np.testing.assert_allclose(
        ours["auc_0_50mm"], ref_m["auc"], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dataset", ["stb", "rhd"])
def test_harness_eval_full_vs_reference(oracle, jnp_cpu, tmp_path, dataset):
    """eval_full.py end-to-end (BASELINE rows 12-13 composition): the full
    cascade from raw frames, meters via keypoint_scale, plus the curve[8:]
    20-50mm subset AUC (eval_full.py:92-101)."""
    from fixtures import make_rhd_bin, make_stb_bin

    from hand3d_tpu.data.rhd import RHDDataset
    from hand3d_tpu.data.stb import STBDataset
    from hand3d_tpu.eval.harnesses import eval_full_pipeline
    from hand3d_tpu.weights.convert import flat_to_tree

    n = 4
    bin_path = str(tmp_path / f"{dataset}_eval.bin")
    if dataset == "stb":
        make_stb_bin(bin_path, num_records=n, seed=24)
        ds = STBDataset(path=bin_path)
    else:
        make_rhd_bin(bin_path, num_records=n, seed=25)
        ds = RHDDataset("evaluation", path=bin_path)
    ref_m, flat = oracle.reference_eval_harness(
        "eval_full", bin_path, n, dataset=dataset)

    ours = eval_full_pipeline(flat_to_tree(flat), ds, batch_size=3)
    # tolerance: the crop box rides find_max_location's argmax, so one
    # near-tie flip can move the crop a pixel and perturb every distance
    # slightly; a composition bug changes metrics at the mm scale.
    np.testing.assert_allclose(
        ours["epe_mean_mm"], ref_m["mean"] * 1000, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(
        ours["epe_median_mm"], ref_m["median"] * 1000, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(
        ours["auc_0_50mm"], ref_m["auc"], rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        ours["auc_20_50mm"], ref_m["auc_subset"], rtol=1e-3, atol=2e-3)


def test_hsv_core_vs_tf(oracle, jnp_cpu):
    """The augmentation's deterministic core: rgb_to_hsv / hsv_to_rgb and a
    fixed-delta hue rotation match tf.image (rgb_to_hsv, hsv_to_rgb,
    adjust_hue) inside the op contract's [0, 1] domain. The stochastic
    delta-draw around it is keyed jax.random (statistical, not bitwise);
    the reference's out-of-contract mean-subtracted input is the documented
    intentional difference (PARITY.md, data/augment.py:54-59)."""
    from hand3d_tpu.data.augment import hsv_to_rgb, rgb_to_hsv

    rng = np.random.RandomState(5)
    rgb = rng.rand(2, 8, 8, 3).astype(np.float32)

    ref_hsv = oracle.run_tf(
        lambda ref, phs: ref.tf1.image.rgb_to_hsv(phs["rgb"]), {"rgb": rgb})
    ours_hsv = np.asarray(rgb_to_hsv(rgb))
    np.testing.assert_allclose(ours_hsv, ref_hsv, atol=1e-6)

    ref_rgb = oracle.run_tf(
        lambda ref, phs: ref.tf1.image.hsv_to_rgb(phs["hsv"]),
        {"hsv": ours_hsv})
    np.testing.assert_allclose(
        np.asarray(hsv_to_rgb(ours_hsv)), ref_rgb, atol=1e-6)

    for delta in (-0.1, 0.037, 0.099):
        ref_adj = oracle.run_tf(
            lambda ref, phs: ref.tf1.image.adjust_hue(phs["rgb"], delta),
            {"rgb": rgb})
        hsv = np.array(rgb_to_hsv(rgb))
        hsv[..., 0] = (hsv[..., 0] + delta) % 1.0
        np.testing.assert_allclose(
            np.asarray(hsv_to_rgb(hsv)), ref_adj, atol=1e-5,
            err_msg=f"delta={delta}")


def test_truncated_normal_distribution_vs_tf(oracle, jnp_cpu):
    """tf.truncated_normal resamples outside 2 sigma;
    jax.random.truncated_normal(-2, 2) draws from the same truncated
    density. Pin support bounds exactly and the distributions to each
    other by moments and deciles (200k samples, bounds sized >> sampling
    noise)."""
    import jax

    from hand3d_tpu.data.augment import truncated_normal

    n, sigma = 200_000, 2.5
    ref = np.asarray(oracle.run_tf(
        lambda ref, phs: ref.tf1.truncated_normal([n], stddev=sigma, seed=3),
        {}))
    ours = np.asarray(truncated_normal(jax.random.PRNGKey(3), (n,), sigma))

    for name, x in (("tf", ref), ("ours", ours)):
        assert np.abs(x).max() <= 2.0 * sigma + 1e-5, name
    # mean standard error ~ sigma_trunc/sqrt(n) ~ 0.0049; 4x margin
    assert abs(ref.mean() - ours.mean()) < 0.02
    # truncated-at-2-sigma std is ~0.880 * sigma for both
    np.testing.assert_allclose(ref.std(), ours.std(), rtol=0.02)
    q = np.linspace(0.1, 0.9, 9)
    np.testing.assert_allclose(
        np.quantile(ref, q), np.quantile(ours, q), atol=0.05 * sigma)


def test_train_trajectory_vs_reference(oracle, jnp_cpu):
    """MULTI-STEP Adam training trajectory against the reference, same
    full batch every step (deterministic: the executed stage graphs have no
    active dropout). Extends test_train_step_vs_reference from one step to
    the optimizer's trajectory — catches bias-correction, beta/eps
    bookkeeping, or state-threading bugs that a single step can't see.

    Calibrated on this seed (probe committed in this test's tolerances):
    lifting 'proposed' tracks the reference to <=2.6e-3 relative loss over
    40 steps while the loss drops ~2x — the step-0 gap is the analytic
    TF-vs-optax eps difference (~7e-6) and growth stays bounded.
    handsegnet tracks to <=2.2e-4 over 12 steps. posenet diverges
    chaotically after ~3 steps, and that divergence is PINNED to its
    mechanism (mask flips) rather than coarsely bounded: see the
    three-part flip-aware assertions below."""
    import jax
    import optax

    from hand3d_tpu.models import posenet
    from hand3d_tpu.models.poseprior import PosePriorNetwork
    from hand3d_tpu.train.losses import lifting_loss, posenet_scoremap_loss
    from hand3d_tpu.weights.convert import flat_to_tree

    lr = 1e-4

    def jax_trajectory(loss_fn, tree, steps):
        opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        state = opt.init(tree)
        vg = jax.jit(jax.value_and_grad(loss_fn))
        losses = []
        for _ in range(steps):
            loss, grads = vg(tree)
            losses.append(float(loss))
            updates, state = opt.update(grads, state, tree)
            tree = optax.apply_updates(tree, updates)
        return np.asarray(losses)

    # --- lifting 'proposed': tight trajectory pin -----------------------
    steps = 40
    inputs = _train_step_inputs("lifting", "proposed")
    ref = oracle.reference_train_step("lifting", inputs, lr,
                                      variant="proposed", num_steps=steps)
    net = PosePriorNetwork("proposed")

    def lift_loss(tree):
        out = net.apply(tree, inputs["scoremap"], inputs["hand_side"],
                        train=False)
        return lifting_loss("proposed", out, inputs)

    ours = jax_trajectory(lift_loss, flat_to_tree(ref["vars0"]), steps)
    theirs = np.asarray(ref["losses"])
    rel = np.abs(ours - theirs) / np.abs(theirs)
    # step 0 is pre-update (loss identity already pinned at 1e-5 by the
    # one-step test); step 1 sees only the eps-formulation difference
    assert rel[1] < 1e-4, rel[1]
    assert rel.max() < 1e-2, f"max rel {rel.max():.2e} at {rel.argmax()}"
    # both stacks must ride the same descent (probe: 1.364 -> 0.669)
    assert theirs[-1] < 0.75 * theirs[0]
    assert ours[-1] < 0.75 * ours[0]

    # --- handsegnet: tight trajectory pin -------------------------------
    # Probed (this seed, 12 steps): rel loss stays <= 2.2e-4 throughout —
    # the conv-stage chaos posenet shows does not materialize here.
    steps = 12
    inputs = _train_step_inputs("handsegnet", None)
    ref = oracle.reference_train_step("handsegnet", inputs, lr,
                                      num_steps=steps)
    from hand3d_tpu.models import handsegnet
    from hand3d_tpu.train.losses import handsegnet_loss

    def seg_loss(tree):
        logits = handsegnet.apply(tree[handsegnet.SCOPE], inputs["image"])
        return handsegnet_loss(logits, inputs["hand_mask"])

    ours = jax_trajectory(seg_loss, flat_to_tree(ref["vars0"]), steps)
    theirs = np.asarray(ref["losses"])
    rel = np.abs(ours - theirs) / np.abs(theirs)
    assert rel.max() < 1.5e-3, f"max rel {rel.max():.2e} at {rel.argmax()}"

    # --- posenet: mask-flip-aware trajectory pin (VERDICT r4 #6) --------
    # The divergence mechanism is MEASURED, not assumed, in three parts:
    #
    # (1) FORWARD PARITY ALONG THE REFERENCE'S OWN TRAJECTORY: our loss
    #     evaluated at the reference's post-step-t parameters must match
    #     the reference's step-(t+1) loss at kernel-parity tolerance. This
    #     proves ALL trajectory divergence is param drift, none of it
    #     kernel mismatch.
    # (2) THE DRIFT IS MASK FLIPS, AND THEY ARE SPARSE: cross-stack
    #     leaky-relu sign disagreements (our forward, ours-vs-ref params)
    #     measure ~1.0% of pre-activations after step 1, creeping to ~1.6%
    #     by step 12 (probe committed here). Their seed is the analytic
    #     TF-vs-optax Adam eps formulation: for |g| << eps_tf the two
    #     updates differ by O(lr/2), so the HUGE tiny-gradient population
    #     of a random-init conv net drifts immediately (median param delta
    #     0.44*lr after one step) and shifts near-zero pre-activations
    #     across 0. Bounds: nonzero (mechanism present) but < 5%.
    # (3) TRACK-UNTIL-FLIP, THEN CORRELATION: loss rel is tight while the
    #     flips are still benign (probed 6.9e-8 / 1.8e-4 / 1.2e-3 for the
    #     first three steps), first exceeds 5e-3 no earlier than step 3,
    #     stays < 0.2 (probed max 9.1e-2), and the two descent curves stay
    #     correlated (Pearson r probed 0.981) with both ending lower.
    steps = 12
    inputs = _train_step_inputs("posenet", None)
    ref = oracle.reference_train_step("posenet", inputs, lr, num_steps=steps,
                                      track_vars=True)

    def pose_loss(tree):
        preds = posenet.apply(tree[posenet.SCOPE], inputs["image_crop"])
        return posenet_scoremap_loss(
            preds, inputs["scoremap"], inputs["keypoint_vis21"])

    def pose_masks(tree):
        """Leaky-relu input signs of OUR forward, captured eagerly."""
        from hand3d_tpu.ops import nn as _nn

        signs, orig = [], _nn.leaky_relu

        def capturing(x):
            signs.append(np.asarray(x) > 0)
            return orig(x)

        _nn.leaky_relu = capturing
        try:
            posenet.apply(tree[posenet.SCOPE], inputs["image_crop"])
        finally:
            _nn.leaky_relu = orig
        return signs

    # our trajectory, keeping the post-step params
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    state = opt.init(flat_to_tree(ref["vars0"]))
    tree = flat_to_tree(ref["vars0"])
    vg = jax.jit(jax.value_and_grad(pose_loss))
    ours_losses, ours_trees = [], []
    for _ in range(steps):
        loss, grads = vg(tree)
        ours_losses.append(float(loss))
        updates, state = opt.update(grads, state, tree)
        tree = optax.apply_updates(tree, updates)
        ours_trees.append(jax.device_get(tree))
    ours = np.asarray(ours_losses)
    theirs = np.asarray(ref["losses"])
    rel = np.abs(ours - theirs) / np.abs(theirs)

    # (1) forward parity along the reference trajectory
    for t in (0, 3, 7, steps - 2):
        ref_tree = flat_to_tree(ref["vars_steps"][t])
        ours_at_ref = float(jax.jit(pose_loss)(ref_tree))
        cross_rel = abs(ours_at_ref - theirs[t + 1]) / abs(theirs[t + 1])
        assert cross_rel < 1e-4, (t, cross_rel)

    # (2) sparse cross-stack mask flips
    for t, lo, hi in ((0, 1e-4, 0.05), (steps - 1, 1e-4, 0.05)):
        m_ours = pose_masks(ours_trees[t])
        m_ref = pose_masks(flat_to_tree(ref["vars_steps"][t]))
        flips = sum(int((a != b).sum()) for a, b in zip(m_ours, m_ref))
        total = sum(a.size for a in m_ours)
        assert lo < flips / total < hi, (t, flips / total)

    # (3) track-until-flip, then correlation
    assert rel[0] < 1e-6 and rel[1] < 1e-3 and rel[2] < 5e-3, rel[:3]
    diverged = np.nonzero(rel > 5e-3)[0]
    assert diverged.size == 0 or diverged[0] >= 3, rel
    assert rel.max() < 0.2, f"max rel {rel.max():.2e} at {rel.argmax()}"
    assert np.corrcoef(ours, theirs)[0, 1] > 0.95
    assert theirs[-1] < theirs[0] and ours[-1] < ours[0]
