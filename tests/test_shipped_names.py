"""Shipped-weight NAME-SURFACE coverage (VERDICT round-2, next-round #5).

The reference distributes weights as pickled {tf_variable_name: ndarray}
dicts (handsegnet-rhd.pickle, posenet3d-rhd-stb*.pickle,
lifting-<variant>.pickle) and TF training snapshots. No real artifact
ships in this environment, so earlier converter tests used synthetic trees
that exercised the MECHANISM but not the full name surface of the real
files — a single mis-mapped variable name would convert to a tree that
silently misses one layer.

This file closes that: the exact variable-name inventory of all four nets
is re-derived HERE, independently of hand3d_tpu's own name map, from the
reference's variable-construction rules —

  * scope/layer/var scheme: utils/general.py:37-49 (conv 'weights' [k,k,
    cin,cout] + 'biases' [cout]), :114-127 (FC 'weights' [cin,cout] +
    'biases' [cout]);
  * HandSegNet layers: nets/ColorHandPose3DNetwork.py:142-161;
  * PoseNet2D layers + 2 refiner passes: :181-214;
  * PosePrior towers + FCs (incl. hand_side concat -> 4*4*128+2 FC input):
    :249-267, bottleneck variant nets/PosePriorNetwork.py:97-122;
  * ViewpointNet towers + FCs (4*4*256+2 FC input; the ':297 Bx2048'
    comment in the reference is stale — out_chan_list ends at 256): :286-308

— synthetic pickles/checkpoints are built under those names, and the test
fails if any shipped-weight name would not map onto the hand3d_tpu
parameter tree (or any tree slot would go unfilled).
"""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hand3d_tpu.models.cascade import ColorHandPose3D
from hand3d_tpu.models.poseprior import VARIANTS, PosePriorNetwork
from hand3d_tpu.weights.convert import (
    SNAPSHOT_DISCARD,
    apply_discard_rename,
    convert_reference_pickles,
    flat_to_tree,
    load_tf_checkpoint_flat,
    tree_to_flat,
)
from hand3d_tpu.weights.tf_ckpt import write_checkpoint


def _conv(name, k, cin, cout):
    return {f"{name}/weights": (k, k, cin, cout), f"{name}/biases": (cout,)}


def _fc(name, cin, cout):
    return {f"{name}/weights": (cin, cout), f"{name}/biases": (cout,)}


def handsegnet_names():
    """ColorHandPose3DNetwork.py:142-161."""
    v = {}
    cin = 3
    for block, (n, c) in enumerate(zip([2, 2, 4, 4], [64, 128, 256, 512]), 1):
        for i in range(1, n + 1):
            v.update(_conv(f"HandSegNet/conv{block}_{i}", 3, cin, c))
            cin = c
    v.update(_conv("HandSegNet/conv5_1", 3, 512, 512))
    v.update(_conv("HandSegNet/conv5_2", 3, 512, 128))
    v.update(_conv("HandSegNet/conv6_1", 1, 128, 512))
    v.update(_conv("HandSegNet/conv6_2", 1, 512, 2))
    return v


def posenet_names():
    """ColorHandPose3DNetwork.py:181-214 (21 kp, 2 refiner passes)."""
    v = {}
    cin = 3
    for block, (n, c) in enumerate(zip([2, 2, 4, 2], [64, 128, 256, 512]), 1):
        for i in range(1, n + 1):
            v.update(_conv(f"PoseNet2D/conv{block}_{i}", 3, cin, c))
            cin = c
    for i in range(3, 7):
        v.update(_conv(f"PoseNet2D/conv4_{i}", 3, cin, 256))
        cin = 256
    v.update(_conv("PoseNet2D/conv4_7", 3, 256, 128))
    v.update(_conv("PoseNet2D/conv5_1", 1, 128, 512))
    v.update(_conv("PoseNet2D/conv5_2", 1, 512, 21))
    for unit in (6, 7):  # pass_id+6, concat(scoremap 21, encoding 128)
        cin = 21 + 128
        for i in range(1, 6):
            v.update(_conv(f"PoseNet2D/conv{unit}_{i}", 7, cin, 128))
            cin = 128
        v.update(_conv(f"PoseNet2D/conv{unit}_6", 1, 128, 128))
        v.update(_conv(f"PoseNet2D/conv{unit}_7", 1, 128, 21))
    return v


def poseprior_names(bottleneck=False):
    """ColorHandPose3DNetwork.py:249-267 / PosePriorNetwork.py:97-122."""
    v = {}
    cin = 21
    for i, c in enumerate([32, 64, 128]):
        v.update(_conv(f"PosePrior/conv_pose_{i}_1", 3, cin, c))
        v.update(_conv(f"PosePrior/conv_pose_{i}_2", 3, c, c))
        cin = c
    v.update(_fc("PosePrior/fc_rel0", 4 * 4 * 128 + 2, 512))
    v.update(_fc("PosePrior/fc_rel1", 512, 512))
    if bottleneck:
        v.update(_fc("PosePrior/fc_bottleneck", 512, 30))
        v.update(_fc("PosePrior/fc_xyz", 30, 63))
    else:
        v.update(_fc("PosePrior/fc_xyz", 512, 63))
    return v


def viewpoint_names():
    """ColorHandPose3DNetwork.py:286-308."""
    v = {}
    cin = 21
    for i, c in enumerate([64, 128, 256]):
        v.update(_conv(f"ViewpointNet/conv_vp_{i}_1", 3, cin, c))
        v.update(_conv(f"ViewpointNet/conv_vp_{i}_2", 3, c, c))
        cin = c
    v.update(_fc("ViewpointNet/fc_vp0", 4 * 4 * 256 + 2, 256))
    v.update(_fc("ViewpointNet/fc_vp1", 256, 128))
    for ax in "xyz":
        v.update(_fc(f"ViewpointNet/fc_vp_u{ax}", 128, 1))
    return v


def _materialize(names, seed=0, suffix=""):
    rng = np.random.RandomState(seed)
    return {
        name + suffix: (rng.randn(*shape) * 0.05).astype(np.float32)
        for name, shape in names.items()
    }


def _flat_shapes(tree):
    return {k: tuple(np.shape(v)) for k, v in tree_to_flat(tree).items()}


def _assert_exact_cover(converted, init_tree, what):
    got = _flat_shapes(converted)
    want = _flat_shapes(init_tree)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{what}: shipped names leave tree slots UNFILLED: {missing}"
    assert not extra, f"{what}: shipped names that do NOT map: {extra}"
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, f"{what}: shape mismatches: {mismatched}"


def test_cascade_shipped_pickles_cover_tree_and_run(tmp_path):
    # the two default weight files of net.init (ColorHandPose3DNetwork.py:48):
    # handsegnet-rhd.pickle + posenet3d-*.pickle (PoseNet2D+PosePrior+
    # ViewpointNet). The seg pickle uses ':0'-suffixed names to exercise
    # the suffix-cleaning path.
    seg = _materialize(handsegnet_names(), seed=1, suffix=":0")
    pose3d = _materialize(
        {**posenet_names(), **poseprior_names(), **viewpoint_names()}, seed=2
    )
    p_seg = tmp_path / "handsegnet-rhd.pickle"
    p_pose = tmp_path / "posenet3d-rhd-stb.pickle"
    p_seg.write_bytes(pickle.dumps(seg))
    p_pose.write_bytes(pickle.dumps(pose3d))

    net = ColorHandPose3D()
    converted = convert_reference_pickles([str(p_seg), str(p_pose)])
    _assert_exact_cover(converted, net.init(jax.random.PRNGKey(0)), "cascade")

    # convert -> full-cascade forward: one jitted program, finite outputs
    image = np.random.RandomState(3).rand(1, 128, 160, 3).astype(np.float32) - 0.5
    hand_side = np.asarray([[1.0, 0.0]], np.float32)
    out = jax.jit(net.inference)(converted, jnp.asarray(image), hand_side)
    assert np.isfinite(np.asarray(out.keypoint_coord3d)).all()
    assert np.isfinite(np.asarray(out.keypoint_uv21)).all()
    assert out.keypoint_coord3d.shape == (1, 21, 3)

    # exclude_var_list uses net.init's substring semantics (:55)
    no_prior = convert_reference_pickles(
        [str(p_seg), str(p_pose)], exclude_var_list=["PosePrior"]
    )
    assert "PosePrior" not in no_prior and "ViewpointNet" in no_prior


@pytest.mark.parametrize("variant", VARIANTS)
def test_lifting_variant_pickles_cover_tree(variant, tmp_path):
    # lifting-<variant>.pickle (eval3d.py:76): PosePrior scope, fc_bottleneck
    # for 'bottleneck', plus ViewpointNet only for 'proposed'
    # (PosePriorNetwork.py:76-91)
    names = poseprior_names(bottleneck=variant == "bottleneck")
    if variant == "proposed":
        names = {**names, **viewpoint_names()}
    path = tmp_path / f"lifting-{variant}.pickle"
    path.write_bytes(pickle.dumps(_materialize(names, seed=4)))

    net = PosePriorNetwork(variant)
    converted = convert_reference_pickles([str(path)])
    _assert_exact_cover(
        converted, net.init(jax.random.PRNGKey(0)), f"lifting-{variant}"
    )

    scoremap = np.random.RandomState(5).rand(2, 32, 32, 21).astype(np.float32)
    hand_side = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    out = jax.jit(net.apply)(converted, jnp.asarray(scoremap), hand_side)
    assert np.isfinite(np.asarray(out.coord_xyz_rel_normed)).all()
    assert out.coord_xyz_rel_normed.shape == (2, 21, 3)


def test_training_snapshot_names_discard_and_load(tmp_path):
    # a reference training snapshot carries the same variables plus Adam
    # slots / beta power / global_step; load_weights_from_snapshot drops
    # them via substring discard (general.py:614-651, eval2d_gt_cropped.py:62)
    flat = _materialize(posenet_names(), seed=6)
    junk = {
        "PoseNet2D/conv1_1/weights/Adam": np.zeros((3, 3, 3, 64), np.float32),
        "PoseNet2D/conv1_1/weights/Adam_1": np.zeros((3, 3, 3, 64), np.float32),
        "beta1_power": np.asarray(0.9, np.float32),
        "beta2_power": np.asarray(0.999, np.float32),
        "global_step": np.asarray(12345, np.int64),
    }
    prefix = str(tmp_path / "model-12345")
    write_checkpoint(prefix, {**flat, **junk})

    loaded = load_tf_checkpoint_flat(prefix, discard_list=SNAPSHOT_DISCARD)
    assert set(loaded) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(loaded[k], flat[k])
    # and the surviving names build exactly the PoseNet2D subtree
    from hand3d_tpu.models import posenet

    tree = flat_to_tree(loaded)
    init = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    _assert_exact_cover(tree, init, "posenet snapshot")


def test_rename_semantics_substring_replace():
    # rename is substring replace in order (general.py:638-646)
    flat = {"CPM/PoseNet/conv1_1_CPM/weights": np.zeros(1, np.float32)}
    out = apply_discard_rename(
        flat, None, {"CPM/PoseNet": "PoseNet2D", "_CPM": ""}
    )
    assert list(out) == ["PoseNet2D/conv1_1/weights"]
