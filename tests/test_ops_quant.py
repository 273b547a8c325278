"""int8 post-training quantization (ops/quant.py): numerics vs fp32, the
param-tree transform, and the quantized end-to-end cascade."""

import jax
import jax.numpy as jnp
import numpy as np

from hand3d_tpu.ops import nn
from hand3d_tpu.ops.quant import (
    dequantize_weights,
    quantize_params_int8,
    quantize_weights_int8,
)

KEY = jax.random.PRNGKey(0)


def rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_weight_quantization_round_trip():
    w = np.asarray(nn.xavier_conv_init(KEY, 3, 3, 32, 64))
    w_q, scale = quantize_weights_int8(jnp.asarray(w))
    back = np.asarray(w_q, np.float32) * np.asarray(scale)
    # symmetric rounding: each element within half a quantization step
    assert np.all(np.abs(back - w) <= np.asarray(scale) / 2 + 1e-7)
    assert np.asarray(w_q).dtype == np.int8
    # per-output-channel scales: each channel's max maps to 127
    assert np.all(np.abs(w_q).max(axis=(0, 1, 2)) == 127)


def test_conv2d_int8_matches_fp32_within_quant_error(rng):
    params = nn.conv_init(KEY, 3, 3, 32, 64)
    qparams = quantize_params_int8(params, min_in_chan=0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    ref = nn.conv2d(x, params)
    got = nn.conv2d(x, qparams)
    assert rel_l2(got, ref) < 0.02
    # per-SAMPLE activation scales: batch composition must not matter
    got_single = nn.conv2d(x[:1], qparams)
    np.testing.assert_allclose(
        np.asarray(got[:1]), np.asarray(got_single), atol=1e-5
    )


def test_conv2d_int8_stride_matches(rng):
    params = nn.conv_init(KEY, 3, 3, 8, 16)
    qparams = quantize_params_int8(params, min_in_chan=0, min_out_chan=0)
    x = jnp.asarray(rng.randn(1, 9, 11, 8).astype(np.float32))
    ref = nn.conv2d(x, params, stride=2)
    got = nn.conv2d(x, qparams, stride=2)
    assert got.shape == ref.shape
    assert rel_l2(got, ref) < 0.02


def test_dense_int8_matches_fp32_within_quant_error(rng):
    params = nn.dense_init(KEY, 128, 64)
    qparams = quantize_params_int8(params)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    ref = nn.dense(x, params)
    got = nn.dense(x, qparams)
    assert rel_l2(got, ref) < 0.02


def test_conv2d_transpose_dequant_fallback(rng):
    params = nn.bilinear_upconv_init(4, 8)
    qparams = quantize_params_int8(params, min_in_chan=0, min_out_chan=0)
    x = jnp.asarray(rng.rand(1, 5, 6, 8).astype(np.float32))
    ref = nn.conv2d_transpose(x, params)
    got = nn.conv2d_transpose(x, qparams)
    assert rel_l2(got, ref) < 0.01


def test_quantize_params_tree_transform_and_idempotence():
    tree = {
        "Net": {
            "conv1": nn.conv_init(KEY, 3, 3, 3, 8),
            "fc": nn.dense_init(KEY, 8, 4),
        }
    }
    q = quantize_params_int8(tree, min_in_chan=0, min_out_chan=0)
    assert set(q["Net"]["conv1"]) == {"weights_q", "weight_scale", "biases"}
    assert set(q["Net"]["fc"]) == {"weights_q", "weight_scale", "biases"}
    q2 = quantize_params_int8(q, min_in_chan=0, min_out_chan=0)
    np.testing.assert_array_equal(
        np.asarray(q2["Net"]["conv1"]["weights_q"]),
        np.asarray(q["Net"]["conv1"]["weights_q"]),
    )
    # dequantized kernel close to the original
    back = dequantize_weights(q["Net"]["conv1"])
    assert rel_l2(back, tree["Net"]["conv1"]["weights"]) < 0.01


def test_selective_quantization_by_input_channels():
    """Default min_in_chan keeps narrow (bandwidth-bound) layers float."""
    tree = {
        "conv_narrow": nn.conv_init(KEY, 3, 3, 64, 128),
        "conv_wide": nn.conv_init(KEY, 3, 3, 256, 256),
        "fc": nn.dense_init(KEY, 2048, 512),
    }
    q = quantize_params_int8(tree)
    assert "weights" in q["conv_narrow"]  # untouched
    assert "weights_q" in q["conv_wide"]
    assert "weights_q" in q["fc"]


def test_prediction_heads_stay_float():
    """min_out_chan keeps the scoremap/prediction heads exact: int8 rounding
    in a 21-channel head turns directly into keypoint argmax flips for a
    ~0.1% FLOPs saving (docs/PRESETS.md drift analysis)."""
    from hand3d_tpu.models import handsegnet, posenet

    q = quantize_params_int8(posenet.init(KEY))
    for head in ("conv5_2", "conv6_7", "conv7_7"):
        assert "weights" in q[head], f"{head} must stay float"
    # wide mid-net layers are still on the int8 MXU path
    for wide in ("conv4_4", "conv6_2", "conv7_3"):
        assert "weights_q" in q[wide], f"{wide} must be quantized"

    qs = quantize_params_int8(handsegnet.init(KEY))
    assert "weights" in qs["conv6_2"]  # 2-channel segmentation head
    assert "weights_q" in qs["conv5_1"]

    # QAT view must gate the SAME set
    from hand3d_tpu.ops.quant import qat_view

    v = qat_view(posenet.init(KEY))
    assert "weights" in v["conv5_2"] and "weights_fq" in v["conv4_4"]


def test_cascade_int8_close_to_fp32(rng):
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(KEY)
    qparams = quantize_params_int8(params)
    image = jnp.asarray(rng.rand(1, 120, 160, 3).astype(np.float32) - 0.5)
    hand_side = jnp.asarray([[1.0, 0.0]])
    ref = net.inference(params, image, hand_side)
    got = net.inference(qparams, image, hand_side)
    assert got.keypoint_coord3d.shape == (1, 21, 3)
    assert np.all(np.isfinite(np.asarray(got.keypoint_coord3d)))
    # deep nets accumulate quantization noise; with random (untrained)
    # weights the 31-conv PoseNet still tracks fp32 closely
    assert rel_l2(got.keypoints_scoremap, ref.keypoints_scoremap) < 0.15
    assert rel_l2(got.hand_scoremap, ref.hand_scoremap) < 0.15


def test_qat_forward_matches_ptq(rng):
    """The QAT fake-quant view must see EXACTLY the deployed int8 numerics:
    conv(QDQ(x), QDQ(w)) == dequant(conv(quant(x), quant(w))) (linearity)."""
    from hand3d_tpu.ops.quant import qat_view

    params = nn.conv_init(KEY, 3, 3, 32, 64)
    x = jnp.asarray(rng.randn(2, 12, 14, 32).astype(np.float32))
    out_qat = nn.conv2d(x, qat_view(params, min_in_chan=0))
    out_ptq = nn.conv2d(x, quantize_params_int8(params, min_in_chan=0))
    np.testing.assert_allclose(
        np.asarray(out_qat), np.asarray(out_ptq), atol=2e-4
    )


def test_qat_straight_through_gradients(rng):
    """Gradients flow through the QDQ (STE): close to the float gradient,
    not zero (round/clip alone would have zero gradient a.e.)."""
    from hand3d_tpu.ops.quant import qat_view

    params = {"layer": nn.dense_init(KEY, 64, 32)}
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))

    def loss_float(p):
        return jnp.mean(nn.dense(x, p["layer"]) ** 2)

    def loss_qat(p):
        return jnp.mean(nn.dense(x, qat_view(p, min_in_chan=0)["layer"]) ** 2)

    g_f = jax.grad(loss_float)(params)["layer"]["weights"]
    g_q = jax.grad(loss_qat)(params)["layer"]["weights"]
    assert np.abs(np.asarray(g_q)).max() > 0
    # STE gradient tracks the float gradient to within quantization noise
    assert rel_l2(g_q, g_f) < 0.1


def test_qat_training_reduces_loss(rng):
    import optax
    from hand3d_tpu.ops.quant import qat_view

    params = {"layer": nn.dense_init(KEY, 128, 16)}  # out 16: needs min_out_chan=0
    x = jnp.asarray(rng.randn(8, 128).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 16).astype(np.float32))

    def loss(p):
        return jnp.mean(
            (nn.dense(x, qat_view(p, min_out_chan=0)["layer"]) - y) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(20):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss(params)) < l0


def test_serving_estimator_int8(rng):
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.serving import HandPoseEstimator

    params = ColorHandPose3D().init(KEY)
    est = HandPoseEstimator(
        params, batch_size=2, input_hw=(120, 160), quantize="int8"
    )
    images = (rng.rand(2, 120, 160, 3) * 255).astype(np.uint8)
    out = est.predict(images)
    assert out["keypoint_coord3d"].shape == (2, 21, 3)
    assert np.isfinite(out["keypoint_coord3d"]).all()


def test_serving_int8_mesh_fast_composition(rng):
    """quantize="int8" + mesh + seg_scale compose; mesh-sharded quantized
    serving matches single-device quantized serving."""
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.parallel import make_mesh
    from hand3d_tpu.serving import HandPoseEstimator

    params = ColorHandPose3D().init(KEY)
    images = (rng.rand(4, 120, 160, 3) * 255).astype(np.uint8)
    kw = dict(batch_size=4, input_hw=(120, 160), quantize="int8",
              seg_scale=0.5)
    single = HandPoseEstimator(params, **kw)
    sharded = HandPoseEstimator(params, mesh=make_mesh(4, 2), **kw)
    out_s = single.predict(images)
    out_m = sharded.predict(images)
    np.testing.assert_allclose(
        out_m["keypoint_coord3d"], out_s["keypoint_coord3d"], atol=1e-5
    )


def test_scoped_quantization_handsegnet_only():
    """scopes={"handsegnet"} quantizes only that stage (case-insensitive
    names resolve to scope keys; unknown names raise); PoseNet2D outputs —
    hence uv decode given an identical crop — are bitwise float."""
    import pytest

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.ops.quant import qat_view, resolve_scopes

    net = ColorHandPose3D()
    params = net.init(KEY)
    q = quantize_params_int8(params, scopes={"handsegnet"})
    flat_types = []

    def walk(t, inside):
        for k, v in t.items():
            if isinstance(v, dict) and ("weights" in v or "weights_q" in v):
                flat_types.append((inside, "weights_q" in v))
            elif isinstance(v, dict):
                walk(v, inside)

    walk(q["HandSegNet"], True)
    for scope in ("PoseNet2D", "PosePrior", "ViewpointNet"):
        walk(q[scope], False)
        # unscoped stages are the SAME objects — zero copies, zero rounding
        assert q[scope] is params[scope]
    assert any(quant for inside, quant in flat_types if inside)
    assert not any(quant for inside, quant in flat_types if not inside)

    assert resolve_scopes(params, {"HANDSEGNET"}) == {"HandSegNet"}
    with pytest.raises(ValueError, match="unknown quantize scope"):
        quantize_params_int8(params, scopes={"handsgnet"})

    # QAT view honors the same scoping (training/deployment must agree)
    v = qat_view(params, scopes={"handsegnet"})
    assert v["PoseNet2D"] is params["PoseNet2D"]
    assert any("weights_fq" in lv for lv in v["HandSegNet"].values()
               if isinstance(lv, dict))


def test_serving_estimator_scoped_int8(rng):
    """quantize_scope plumbs through HandPoseEstimator; with an identical
    crop the 2D/3D outputs are bitwise equal to full-float serving on CPU
    (only HandSegNet is quantized, and on this fixture the crop box is
    unchanged)."""
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.serving import HandPoseEstimator

    params = ColorHandPose3D().init(KEY)
    images = (rng.rand(2, 120, 160, 3) * 255).astype(np.uint8)
    kw = dict(batch_size=2, input_hw=(120, 160))
    base = HandPoseEstimator(params, **kw).predict(images)
    scoped = HandPoseEstimator(params, quantize="int8",
                               quantize_scope={"handsegnet"},
                               **kw).predict(images)
    assert np.isfinite(scoped["keypoint_coord3d"]).all()
    # crop boxes agree on this fixture -> everything downstream is the
    # same float program on the same crop
    if np.array_equal(scoped["center"], base["center"]) and np.array_equal(
        scoped["scale_crop"], base["scale_crop"]
    ):
        np.testing.assert_array_equal(
            scoped["keypoint_coord3d"], base["keypoint_coord3d"]
        )
        np.testing.assert_array_equal(
            scoped["keypoint_uv21"], base["keypoint_uv21"]
        )


def test_static_act_scale_conv_matches_fp32(rng):
    """Calibrated static per-channel activation scales: machinery + accuracy.

    Folding identity: conv(x, w) == conv(x / s_in, w * s_in) per input
    channel, so the static path must track fp32 within quantization error;
    with channel ranges spread over two orders of magnitude it must beat
    the dynamic per-sample grid (whose step is set by the WORST channel)."""
    from hand3d_tpu.ops.quant import calibrate_act_scales

    params = nn.conv_init(KEY, 3, 3, 32, 64)
    # wildly heterogeneous channel ranges: dynamic per-sample quantization
    # collapses the small channels onto a coarse grid
    chan_scale = jnp.asarray(
        np.logspace(-2, 0, 32, dtype=np.float32))
    batches = [jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
               * chan_scale for _ in range(3)]

    def run_float(p, x):
        return nn.conv2d(x, p)

    calib = calibrate_act_scales(run_float, params, batches)
    assert id(params["weights"]) in calib
    qstatic = quantize_params_int8(params, min_in_chan=0, act_scales=calib)
    assert "act_scale" in qstatic
    qdyn = quantize_params_int8(params, min_in_chan=0)

    x = batches[0]
    ref = np.asarray(nn.conv2d(x, params))
    err_static = rel_l2(nn.conv2d(x, qstatic), ref)
    err_dyn = rel_l2(nn.conv2d(x, qdyn), ref)
    assert err_static < 0.02
    assert err_static < err_dyn, (err_static, err_dyn)

    # dequantize_weights unfolds the s_in factor back out. The unfold is
    # the exact inverse of the fold (verified below), but the round-trip
    # to the ORIGINAL kernel is only quantization-step accurate in the
    # FOLDED space — small-s_in channels carry proportionally larger
    # unfolded rounding (that redistribution of precision toward the
    # large-activation channels is the point of the scheme).
    w_back = np.asarray(dequantize_weights(qstatic))
    manual = (np.asarray(qstatic["weights_q"], np.float32)
              * np.asarray(qstatic["weight_scale"])
              / np.asarray(calib[id(params["weights"])]).reshape(1, 1, -1, 1))
    np.testing.assert_allclose(w_back, manual, rtol=1e-6)
    assert rel_l2(w_back, np.asarray(params["weights"])) < 0.25


def test_static_act_scale_dense_matches_fp32(rng):
    from hand3d_tpu.ops.quant import calibrate_act_scales

    params = nn.dense_init(KEY, 64, 32)
    batches = [jnp.asarray(rng.randn(4, 64).astype(np.float32))
               for _ in range(2)]
    calib = calibrate_act_scales(lambda p, x: nn.dense(x, p), params,
                                 batches)
    qstatic = quantize_params_int8(params, min_in_chan=0, act_scales=calib)
    assert "act_scale" in qstatic
    ref = np.asarray(nn.dense(batches[0], params))
    assert rel_l2(nn.dense(batches[0], qstatic), ref) < 0.03


def test_static_act_scale_out_of_range_clips(rng):
    """Inputs beyond the calibrated range clip at 127 — bounded, not wild."""
    from hand3d_tpu.ops.quant import calibrate_act_scales

    params = nn.conv_init(KEY, 1, 1, 16, 32)
    calib_batch = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    calib = calibrate_act_scales(lambda p, x: nn.conv2d(x, p), params,
                                 [calib_batch])
    qstatic = quantize_params_int8(params, min_in_chan=0, act_scales=calib)
    hot = calib_batch * 4.0  # 4x beyond calibration
    got = np.asarray(nn.conv2d(hot, qstatic))
    # the clipped result stays finite and within the scale of the clipped
    # float conv (each input saturates at its calibrated max)
    clipped_ref = np.asarray(nn.conv2d(
        jnp.clip(hot, -jnp.abs(calib_batch).max(axis=(0, 1, 2)) ,
                 jnp.abs(calib_batch).max(axis=(0, 1, 2))), params))
    assert np.all(np.isfinite(got))
    assert rel_l2(got, clipped_ref) < 0.05


def test_static_act_scale_under_jit(rng):
    """The deployed static path must be jittable (calibration is eager-only)."""
    from hand3d_tpu.ops.quant import calibrate_act_scales

    params = nn.conv_init(KEY, 3, 3, 32, 64)
    batches = [jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))]
    calib = calibrate_act_scales(lambda p, x: nn.conv2d(x, p), params,
                                 batches)
    qstatic = quantize_params_int8(params, min_in_chan=0, act_scales=calib)
    eager = nn.conv2d(batches[0], qstatic)
    jitted = jax.jit(nn.conv2d)(batches[0], qstatic)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               rtol=1e-5, atol=1e-5)


def test_serving_estimator_int8_static(rng):
    """quantize='int8_static': calibration on representative images wires
    through HandPoseEstimator and the predictions stay finite + close to
    the float estimator's on the calibration distribution."""
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.serving import HandPoseEstimator

    params = ColorHandPose3D().init(KEY)
    images = (rng.rand(2, 120, 160, 3) * 255).astype(np.uint8)
    est_f = HandPoseEstimator(params, batch_size=2, input_hw=(120, 160))
    est_q = HandPoseEstimator(
        params, batch_size=2, input_hw=(120, 160), quantize="int8_static",
        calibration_images=images,
    )
    out_f = est_f.predict(images)
    out_q = est_q.predict(images)
    assert np.isfinite(out_q["keypoint_coord3d"]).all()
    # scoremap-space drift bounded (uv argmax can flip on random weights)
    assert rel_l2(out_q["hand_scoremap"], out_f["hand_scoremap"]) < 0.15


def test_serving_int8_static_requires_calibration():
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.serving import HandPoseEstimator

    import pytest as _pytest

    params = ColorHandPose3D().init(KEY)
    with _pytest.raises(AssertionError, match="calibration_images"):
        HandPoseEstimator(params, batch_size=2, input_hw=(120, 160),
                          quantize="int8_static")


def test_refiner_scoped_quantization():
    """include_substrings + scopes: only the PoseNet refinement units."""
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.ops.quant import is_quantized

    params = ColorHandPose3D().init(KEY)
    q = quantize_params_int8(
        quantize_params_int8(params, scopes={"handsegnet"}),
        scopes={"posenet2d"}, include_substrings={"conv6", "conv7"})
    pose = q["PoseNet2D"]
    assert is_quantized(pose["conv6_1"]) and is_quantized(pose["conv7_5"])
    # heads stay float even inside the included units (min_out_chan gate)
    assert not is_quantized(pose["conv6_7"])
    assert not is_quantized(pose["conv7_7"])
    # trunk stays float under the positive filter
    assert not is_quantized(pose["conv4_3"])
    assert not is_quantized(pose["conv5_1"])
    # handsegnet wide layers quantized by the scoped first pass
    assert is_quantized(q["HandSegNet"]["conv3_1"])
    # other scopes untouched
    assert not is_quantized(q["PosePrior"]["conv_pose_0_1"])


def test_qat_static_forward_matches_ptq_static(rng):
    """QAT-STATIC fake quant must see EXACTLY the deployed int8_static
    numerics: conv(QDQ_static(x), QDQ_static(w)) == dequant(conv_int8) of
    the act_scales deployment path (per-channel factors commute through
    the contraction exactly)."""
    from hand3d_tpu.ops.quant import calibrate_act_scales, qat_view

    params = nn.conv_init(KEY, 3, 3, 32, 64)
    batches = [jnp.asarray(rng.randn(2, 10, 12, 32).astype(np.float32))
               for _ in range(2)]
    calib = calibrate_act_scales(lambda p, x: nn.conv2d(x, p), params,
                                 batches)
    v = qat_view(params, min_in_chan=0, act_scales=calib)
    assert "act_scale_fq" in v
    out_qat = nn.conv2d(batches[0], v)
    out_ptq = nn.conv2d(batches[0], quantize_params_int8(
        params, min_in_chan=0, act_scales=calib))
    np.testing.assert_allclose(np.asarray(out_qat), np.asarray(out_ptq),
                               atol=2e-4)
    # without act_scales the view stays dynamic
    assert "act_scale_fq" not in qat_view(params, min_in_chan=0)


def test_qat_static_gradients_flow(rng):
    from hand3d_tpu.ops.quant import calibrate_act_scales, qat_view

    params = {"layer": nn.dense_init(KEY, 64, 32)}
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    calib = calibrate_act_scales(
        lambda p, b: nn.dense(b, p["layer"]), params, [x])

    def loss_float(p):
        return jnp.mean(nn.dense(x, p["layer"]) ** 2)

    def loss_qat(p):
        return jnp.mean(nn.dense(
            x, qat_view(p, min_in_chan=0, act_scales=calib)["layer"]) ** 2)

    g_f = jax.grad(loss_float)(params)["layer"]["weights"]
    g_q = jax.grad(loss_qat)(params)["layer"]["weights"]
    assert np.abs(np.asarray(g_q)).max() > 0
    assert rel_l2(g_q, g_f) < 0.1


def test_qat_static_training_reduces_loss(rng):
    import optax
    from hand3d_tpu.ops.quant import calibrate_act_scales, qat_view

    params = {"layer": nn.dense_init(KEY, 128, 16)}
    x = jnp.asarray(rng.randn(8, 128).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    calib = calibrate_act_scales(
        lambda p, b: nn.dense(b, p["layer"]), params, [x])

    def loss(p):
        return jnp.mean((nn.dense(x, qat_view(
            p, min_out_chan=0, act_scales=calib)["layer"]) - y) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(lambda p, s: (lambda g: (
        optax.apply_updates(p, opt.update(g, s, p)[0]),
        opt.update(g, s, p)[1]))(jax.grad(loss)(p)))
    l0 = float(loss(params))
    for _ in range(60):
        params, state = step(params, state)
    assert float(loss(params)) < 0.5 * l0
