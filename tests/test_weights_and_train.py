"""Weight-converter, trainer, and multi-chip dry-run tests."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from hand3d_tpu.models import handsegnet, posenet
from hand3d_tpu.train import (
    make_optimizer,
    piecewise_constant,
    posenet_scoremap_loss,
    handsegnet_loss,
)
from hand3d_tpu.train.trainer import init_state, make_train_step
from hand3d_tpu.weights import (
    apply_discard_rename,
    convert_reference_pickles,
    flat_to_tree,
    load_npz,
    save_npz,
    tree_to_flat,
)


def test_flat_tree_round_trip(rng):
    flat = {
        "HandSegNet/conv1_1/weights": rng.rand(3, 3, 3, 64).astype(np.float32),
        "HandSegNet/conv1_1/biases": rng.rand(64).astype(np.float32),
        "PosePrior/fc_xyz/weights": rng.rand(512, 63).astype(np.float32),
    }
    tree = flat_to_tree(flat)
    assert tree["HandSegNet"]["conv1_1"]["weights"].shape == (3, 3, 3, 64)
    back = tree_to_flat(tree)
    assert set(back) == set(flat)
    np.testing.assert_array_equal(back["PosePrior/fc_xyz/weights"], flat["PosePrior/fc_xyz/weights"])


def test_discard_rename_substring_semantics():
    flat = {"CPM/PersonNet/conv1_1/weights": 1, "CPM/PoseNet/Mconv1/weights": 2,
            "global_step": 3, "Adam/beta1": 4}
    out = apply_discard_rename(
        flat,
        discard_list=["Adam", "global_step", "Mconv"],
        rename_dict={"CPM/PersonNet": "HandSegNet"},
    )
    assert out == {"HandSegNet/conv1_1/weights": 1}


def test_convert_pickle_matches_model_structure(tmp_path, rng):
    """A fake reference pickle with the real variable names loads into the
    model and produces identical outputs to using those arrays directly."""
    params = handsegnet.init(jax.random.PRNGKey(0))
    flat = {
        f"HandSegNet/{layer}/{leaf}:0": np.asarray(v)
        for layer, lp in params.items()
        for leaf, v in lp.items()
    }
    path = tmp_path / "handsegnet-rhd.pickle"
    with open(path, "wb") as f:
        pickle.dump(flat, f)

    tree = convert_reference_pickles([str(path)])
    assert set(tree["HandSegNet"]) == set(params)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    out_a = handsegnet.apply(params, x)[0]
    out_b = handsegnet.apply(
        jax.tree_util.tree_map(jnp.asarray, tree["HandSegNet"]), x
    )[0]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_npz_round_trip(tmp_path):
    params = {"A": {"b": {"weights": np.ones((2, 3), np.float32)}}}
    save_npz(tmp_path / "p.npz", params)
    back = load_npz(tmp_path / "p.npz")
    np.testing.assert_array_equal(back["A"]["b"]["weights"], params["A"]["b"]["weights"])


def test_piecewise_constant_schedule():
    sched = piecewise_constant([10, 20], [1e-4, 1e-5, 1e-6])
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(19)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 1e-6, rtol=1e-6)


def test_train_step_reduces_posenet_loss(rng):
    """A few Adam steps on a fixed tiny batch must reduce the reference loss."""
    params = {"PoseNet2D": posenet.init(jax.random.PRNGKey(0))}
    batch = {
        "image_crop": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) - 0.5),
        "scoremap": jnp.asarray(rng.rand(2, 32, 32, 21).astype(np.float32)),
        "keypoint_vis21": jnp.ones((2, 21)),
    }

    def loss_fn(params, batch, key):
        preds = posenet.apply(params["PoseNet2D"], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"], batch["keypoint_vis21"])

    optimizer = make_optimizer([1e-3], [])
    state = init_state(params, optimizer)
    step = make_train_step(loss_fn, optimizer, donate=False)
    key = jax.random.PRNGKey(0)
    _, m0 = step(state, batch, key)
    for _ in range(5):
        state, m = step(state, batch, key)
    assert float(m["loss"]) < float(m0["loss"])


def test_handsegnet_loss_value():
    logits = jnp.zeros((1, 4, 4, 2))  # uniform -> CE = log(2)
    labels = jnp.stack([jnp.ones((1, 4, 4)), jnp.zeros((1, 4, 4))], -1)
    loss = handsegnet_loss([logits], labels)
    np.testing.assert_allclose(float(loss), np.log(2.0), atol=1e-6)


def test_dryrun_multichip_8_devices():
    """The exact driver path: 8 virtual CPU devices, full train step sharded
    over a ('data', 'model') mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_debug_finite_checks():
    from hand3d_tpu.utils.debug import all_finite, check_finite_pytree
    import pytest as _pytest

    good = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    assert bool(all_finite(good))
    bad = {"a": jnp.asarray([1.0, float("nan")])}
    assert not bool(all_finite(bad))
    check_finite_pytree(good)
    with _pytest.raises(FloatingPointError, match="a"):
        check_finite_pytree(bad, name="params")


def test_train_step_with_remat(rng):
    params = {"PoseNet2D": posenet.init(jax.random.PRNGKey(0))}
    batch = {
        "image_crop": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) - 0.5),
        "scoremap": jnp.asarray(rng.rand(2, 32, 32, 21).astype(np.float32)),
        "keypoint_vis21": jnp.ones((2, 21)),
    }

    def loss_fn(params, batch, key):
        preds = posenet.apply(params["PoseNet2D"], batch["image_crop"])
        return posenet_scoremap_loss(preds, batch["scoremap"], batch["keypoint_vis21"])

    optimizer = make_optimizer([1e-3], [])
    state = init_state(params, optimizer)
    step_plain = make_train_step(loss_fn, optimizer, donate=False)
    step_remat = make_train_step(loss_fn, optimizer, donate=False, remat=True)
    key = jax.random.PRNGKey(0)
    _, m_plain = step_plain(state, batch, key)
    _, m_remat = step_remat(state, batch, key)
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_remat["loss"]), rtol=1e-6
    )


def test_convert_cpm_warmstart_rules():
    from hand3d_tpu.weights import convert_cpm_warmstart

    flat = {
        "CPM/PersonNet/conv1_1_CPM/weights": 1,
        "CPM/PersonNet/conv6_1/weights": 2,       # discarded for handsegnet
        "CPM/PoseNet/conv1_1_CPM/weights": 3,
        "CPM/PoseNet/Mconv1/weights": 4,          # discarded for posenet
        "CPM/PoseNet/conv5_2_CPM/weights": 5,     # discarded for posenet
    }
    pose = convert_cpm_warmstart(dict(flat), "posenet")
    assert pose == {"PoseNet2D": {"conv1_1": {"weights": np.asarray(3)}}} or \
        pose["PoseNet2D"]["conv1_1"]["weights"] == 3
    assert "Mconv1" not in pose.get("PoseNet2D", {})
    seg = convert_cpm_warmstart(dict(flat), "handsegnet")
    assert seg["HandSegNet"]["conv1_1"]["weights"] == 1
    assert "conv6_1" not in seg["HandSegNet"]


def test_top_level_lazy_exports():
    import hand3d_tpu

    assert hand3d_tpu.ColorHandPose3D is not None
    assert hand3d_tpu.PosePriorNetwork is not None
    assert hand3d_tpu.HandPoseEstimator is not None


def test_graft_entry_shapes():
    """Driver compile-check insurance: entry() must return a traceable fn."""
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    shapes = jax.eval_shape(fn, *args)
    assert shapes[0].shape == (8, 21, 3)   # keypoint_coord3d
    assert shapes[1].shape == (8, 21, 2)   # keypoint_uv21
    assert shapes[2].shape == (8, 240, 320, 2)  # hand_scoremap
