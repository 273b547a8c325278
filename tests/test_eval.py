"""Eval layer tests: metric math + all four harnesses end to end on
synthetic fixtures (random weights — checks plumbing and units, not
accuracy)."""

import numpy as np
import jax
import pytest

from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.data.stb import STBDataset
from hand3d_tpu.eval.harnesses import (
    eval2d_full_image,
    eval2d_gt_cropped,
    eval3d_from_posenet,
    eval3d_lifting,
    eval_full_pipeline,
)
from hand3d_tpu.eval.metrics import EvalUtil, calc_auc, get_stb_ref_curves
from hand3d_tpu.models import posenet
from hand3d_tpu.models.cascade import ColorHandPose3D
from hand3d_tpu.models.poseprior import PosePriorNetwork

from fixtures import make_rhd_bin, make_stb_bin


@pytest.fixture(scope="module")
def rhd(tmp_path_factory):
    path = tmp_path_factory.mktemp("rhd") / "rhd.bin"
    make_rhd_bin(path, num_records=5)
    return RHDDataset("evaluation", path=str(path))


@pytest.fixture(scope="module")
def stb(tmp_path_factory):
    path = tmp_path_factory.mktemp("stb") / "stb.bin"
    make_stb_bin(path, num_records=3)
    return STBDataset("evaluation", path=str(path))


def test_evalutil_matches_reference_math(rng):
    """Batch API must agree with the reference's per-sample accumulation."""
    util = EvalUtil(num_kp=4)
    gt = rng.rand(10, 4, 2) * 30
    pred = rng.rand(10, 4, 2) * 30
    vis = rng.rand(10, 4) > 0.3
    dists = np.linalg.norm(gt - pred, axis=-1)
    util.feed_batch(dists, vis)

    mean, median, auc, curve, thr = util.get_measures(0.0, 30.0, 20)

    # golden: reference formulation (per-kp visible lists)
    means, medians, aucs = [], [], []
    norm = np.trapezoid(np.ones(20), np.linspace(0, 30, 20))
    for k in range(4):
        d = dists[vis[:, k], k]
        if d.size == 0:
            continue
        means.append(d.mean())
        medians.append(np.median(d))
        pck = np.array([(d <= t).mean() for t in np.linspace(0, 30, 20)])
        aucs.append(np.trapezoid(pck, np.linspace(0, 30, 20)) / norm)
    np.testing.assert_allclose(mean, np.mean(means))
    np.testing.assert_allclose(median, np.mean(medians))
    np.testing.assert_allclose(auc, np.mean(aucs))
    assert curve.shape == (20,)


def test_evalutil_single_sample_feed():
    util = EvalUtil(num_kp=2)
    util.feed(np.array([[0.0, 0.0], [1.0, 1.0]]), np.array([1, 1]),
              np.array([[3.0, 4.0], [1.0, 1.0]]))
    mean, median, auc, _, _ = util.get_measures(0, 10, 5)
    np.testing.assert_allclose(mean, (5.0 + 0.0) / 2)


def test_calc_auc_and_stb_curves():
    x = np.array([0.0, 1.0, 2.0])
    y = np.array([0.0, 1.0, 1.0])
    np.testing.assert_allclose(calc_auc(x, y), 0.75)
    curves = get_stb_ref_curves()
    assert len(curves) == 3
    for t, v, label in curves:
        assert t.shape == v.shape == (7,)
        assert "AUC" in label


def test_eval2d_gt_cropped_harness(rhd):
    params = posenet.init(jax.random.PRNGKey(0))
    m = eval2d_gt_cropped(params, rhd, batch_size=2)
    assert np.isfinite(m["epe_mean_px"])
    assert 0.0 <= m["auc_0_30px"] <= 1.0
    assert m["pck_curve"].shape == (20,)


def test_eval2d_full_image_harness(rhd):
    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    m = eval2d_full_image(params, rhd, batch_size=2, use_wrist_coord=False,
                          scale_to_size=True)
    assert np.isfinite(m["epe_mean_px"])
    m320 = eval2d_full_image(params, rhd, batch_size=2, use_wrist_coord=False,
                             scale_to_size=False)
    assert np.isfinite(m320["epe_mean_px"])


def test_eval3d_lifting_harness(rhd):
    net = PosePriorNetwork("proposed")
    params = net.init(jax.random.PRNGKey(0))
    m = eval3d_lifting("proposed", params, rhd, batch_size=2)
    assert np.isfinite(m["epe_median_mm"])
    # random net on normalized coords -> errors on the order of the hand
    # size; units must be mm-ish, not meters
    assert 1.0 < m["epe_median_mm"] < 1000.0


def test_eval_full_pipeline_harness_stb(stb):
    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    m = eval_full_pipeline(params, stb, batch_size=2)
    assert np.isfinite(m["epe_mean_mm"])
    assert 0.0 <= m["auc_0_50mm"] <= 1.0
    assert 0.0 <= m["auc_20_50mm"] <= 1.0


def test_eval3d_with_mesh(rhd):
    """DP-sharded eval over the virtual 8-device mesh gives identical
    metrics to single-device."""
    from hand3d_tpu.parallel import make_mesh

    net = PosePriorNetwork("direct")
    params = net.init(jax.random.PRNGKey(0))
    single = eval3d_lifting("direct", params, rhd, batch_size=4)
    mesh = make_mesh(4, 2)
    sharded = eval3d_lifting("direct", params, rhd, batch_size=4, mesh=mesh)
    np.testing.assert_allclose(
        single["epe_mean_mm"], sharded["epe_mean_mm"], rtol=1e-5
    )


def test_eval3d_from_posenet_harness(rhd):
    """The joint-stage eval: lifting from PREDICTED scoremaps, bounded by
    max_batches."""
    net = PosePriorNetwork("proposed")
    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}
    params.update(net.init(jax.random.PRNGKey(1)))
    m = eval3d_from_posenet("proposed", params, rhd, batch_size=2,
                            max_batches=1)
    assert np.isfinite(m["epe_median_mm"])
    assert 1.0 < m["epe_median_mm"] < 1000.0
    # max_batches bounds the pass: 1 batch of 2 from the 5-record set
    full = eval3d_from_posenet("proposed", params, rhd, batch_size=2)
    assert full["pck_curve"].shape == m["pck_curve"].shape


def test_harness_reuses_compiled_step_across_calls(rhd):
    """Periodic in-training evals must not re-trace/re-compile: the fused
    (params, raw) step is cached by (harness, config), and new params with
    the same shapes hit the jit cache."""
    from hand3d_tpu.eval import harnesses as H

    net = PosePriorNetwork("direct")
    p1 = net.init(jax.random.PRNGKey(0))
    p2 = net.init(jax.random.PRNGKey(1))
    m1 = eval3d_lifting("direct", p1, rhd, batch_size=2, max_batches=1)
    step_fn = H._variant_step(H._step_lifting, "direct")
    fused = next(H._FUSED_CACHE[k] for k in H._FUSED_CACHE
                 if k[0] is step_fn)
    size_after_first = len(H._FUSED_CACHE)
    n_compiles = fused._cache_size()
    m2 = eval3d_lifting("direct", p2, rhd, batch_size=2, max_batches=1)
    assert len(H._FUSED_CACHE) == size_after_first  # wrapper reused
    assert fused._cache_size() == n_compiles  # no new trace/compile
    assert m1["epe_mean_mm"] != m2["epe_mean_mm"]  # params actually differ


def test_harness_producer_error_propagates(rhd, monkeypatch):
    """IO failures on the eval producer thread must raise, not hang the
    harness (whose caller may have the training watchdog suspended)."""
    params = {posenet.SCOPE: posenet.init(jax.random.PRNGKey(0))}

    def boom(idx):
        raise OSError("truncated record file")

    monkeypatch.setattr(rhd, "raw_batch", boom)
    with pytest.raises(RuntimeError, match="producer thread failed"):
        eval2d_gt_cropped(params, rhd, batch_size=2)
