"""AOT export artifact: round-trip serialize -> load -> run parity.

The exported program bakes weights as StableHLO constants; loading needs no
model code. Outputs must match the live cascade exactly (same XLA program
modulo serialization), and the loader's predict() must honor the serving
padding contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def small_setup():
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    return net, params


def _export_blob(params, **kw):
    from hand3d_tpu.export import export_estimator

    kw.setdefault("batch_size", 2)
    kw.setdefault("input_hw", (120, 160))
    return export_estimator(params, **kw)


def test_roundtrip_matches_live_inference(small_setup, tmp_path):
    from hand3d_tpu.export import ExportedEstimator

    net, params = small_setup
    path = tmp_path / "cascade.h3dx"
    blob = _export_blob(params, path=str(path))
    assert path.read_bytes() == blob

    est = ExportedEstimator.load(str(path))
    assert est.batch_size == 2
    assert est.input_hw == (120, 160)
    assert est.meta["version"] == 1

    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 120, 160, 3)) - 0.5
    )
    got = est.predict(img)

    hand_side = jnp.tile(jnp.asarray([[1.0, 0.0]]), (2, 1))
    ref = net.inference(params, jnp.asarray(img), hand_side)
    np.testing.assert_allclose(
        got["keypoint_coord3d"], np.asarray(ref.keypoint_coord3d),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        got["keypoint_uv21"], np.asarray(ref.keypoint_uv21),
        atol=1e-4, rtol=1e-5)


def test_predict_pads_partial_batches(small_setup):
    from hand3d_tpu.export import ExportedEstimator

    _, params = small_setup
    est = ExportedEstimator.load(_export_blob(params))
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (3, 120, 160, 3)) - 0.5
    )
    out = est.predict(img)  # 3 images through batch-2 buckets
    assert out["keypoint_coord3d"].shape == (3, 21, 3)
    # chunk boundaries must not change per-sample results
    solo = est.predict(img[2:3])
    np.testing.assert_allclose(
        out["keypoint_coord3d"][2], solo["keypoint_coord3d"][0],
        atol=1e-5, rtol=1e-5)


def test_bad_magic_rejected():
    from hand3d_tpu.export import ExportedEstimator

    with pytest.raises(ValueError, match="magic"):
        ExportedEstimator.load(b"NOPE" + b"\x00" * 16)


def test_export_cli(small_setup, tmp_path):
    from hand3d_tpu.weights import save_npz
    import sys

    sys.path.insert(0, "tools")
    try:
        import export_model
    finally:
        sys.path.pop(0)

    _, params = small_setup
    wpath = tmp_path / "w.npz"
    save_npz(str(wpath), params)
    out = tmp_path / "m.h3dx"
    export_model.main([
        "--weights", str(wpath), "--out", str(out),
        "--batch-size", "1", "--input-hw", "120x160",
    ])
    from hand3d_tpu.export import ExportedEstimator

    est = ExportedEstimator.load(str(out))
    assert est.batch_size == 1
    r = est.predict(np.zeros((1, 120, 160, 3), np.uint8))
    assert r["keypoint_uv21"].shape == (1, 21, 2)


def test_snap_estimator_wraps_artifact_any_resolution(small_setup):
    """The HTTP server's --artifact mode serves any input resolution: the
    SnapEstimator wrapper host-resizes into the artifact's baked (H, W)
    bucket and maps keypoint_uv21/center back to the caller's frame."""
    from hand3d_tpu.export import ExportedEstimator
    from hand3d_tpu.serving import SnapEstimator

    _, params = small_setup
    est = SnapEstimator(ExportedEstimator(_export_blob(params)))
    assert est.input_hw == (120, 160)

    rng = np.random.RandomState(3)
    img = (rng.rand(1, 90, 100, 3) * 255).astype(np.uint8)
    out = est.predict(img)
    assert tuple(out["snap_hw"]) == (120, 160)
    assert out["keypoint_uv21"].shape == (1, 21, 2)
    # uv mapped back to the caller's 90x100 frame: exactly the bucket-frame
    # prediction on the resized image, scaled by (100/160, 90/120)
    from hand3d_tpu.serving import _resize_to

    bucket = est.est.predict(_resize_to(
        img.astype(np.float32) / 255.0 - 0.5, (120, 160)), normalized=True)
    np.testing.assert_allclose(
        out["keypoint_uv21"],
        bucket["keypoint_uv21"] * np.asarray([100 / 160, 90 / 120]),
        rtol=1e-5, atol=1e-4)

    # exact-resolution inputs pass through without resizing
    img_exact = (rng.rand(1, 120, 160, 3) * 255).astype(np.uint8)
    direct = est.est.predict(img_exact)
    snapped = est.predict(img_exact)
    np.testing.assert_array_equal(
        snapped["keypoint_uv21"], direct["keypoint_uv21"])
