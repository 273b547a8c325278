"""CLI smoke tests: each entry point runs end to end on synthetic data."""

import os
import sys

import numpy as np
import jax
import pytest

from hand3d_tpu.models import posenet
from hand3d_tpu.weights import save_npz

from fixtures import make_rhd_bin, make_stb_bin


@pytest.fixture(scope="module")
def rhd_bin(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "rhd.bin"
    make_rhd_bin(path, num_records=3)
    return str(path)


@pytest.fixture(scope="module")
def stb_bin(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "stb.bin"
    make_stb_bin(path, num_records=2)
    return str(path)


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


def test_cli_eval2d_gt_cropped(rhd_bin, monkeypatch, capsys):
    from hand3d_tpu.cli import eval2d_gt_cropped as cli

    _run_main(cli, ["--data", rhd_bin, "--batch-size", "2"], monkeypatch)
    out = capsys.readouterr().out
    assert "Average mean EPE" in out


def test_cli_eval3d(rhd_bin, monkeypatch, capsys):
    from hand3d_tpu.cli import eval3d as cli

    _run_main(
        cli, ["--data", rhd_bin, "--batch-size", "2", "--variant", "direct"],
        monkeypatch,
    )
    assert "Evaluation results for direct" in capsys.readouterr().out


def test_cli_eval_full_stb(stb_bin, tmp_path, monkeypatch, capsys):
    from hand3d_tpu.cli import eval_full as cli

    plot = str(tmp_path / "fig9.png")
    _run_main(
        cli,
        ["--dataset", "stb", "--data", stb_bin, "--batch-size", "2",
         "--plot", plot],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "Area under curve between 20mm - 50mm" in out
    assert os.path.exists(plot)


def test_cli_train_posenet_with_npz_weights(rhd_bin, tmp_path, monkeypatch,
                                            capsys):
    from hand3d_tpu.cli import train_posenet as cli

    weights = str(tmp_path / "warm.npz")
    save_npz(weights, {"PoseNet2D": posenet.init(jax.random.PRNGKey(7))})
    snap_dir = str(tmp_path / "snaps")
    metrics = str(tmp_path / "metrics.jsonl")
    _run_main(
        cli,
        ["--data", rhd_bin, "--batch-size", "2", "--max-iter", "2",
         "--weights", weights, "--snapshot-dir", snap_dir,
         "--snapshot-freq", "0", "--metrics-log", metrics,
         "--accum-steps", "2"],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(snap_dir, "snapshot-2.msgpack"))
    import json

    with open(metrics) as f:
        records = [json.loads(line) for line in f]
    assert records and {"step", "loss", "steps_per_s"} <= set(records[0])


def test_cli_demo(tmp_path, monkeypatch, capsys):
    from hand3d_tpu.cli import demo as cli

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    img_path = str(tmp_path / "hand.png")
    rng = np.random.RandomState(0)
    mpimg.imsave(img_path, rng.rand(60, 80, 3))
    _run_main(cli, [img_path, "--out-dir", str(tmp_path)], monkeypatch)
    assert os.path.exists(str(tmp_path / "hand_pose.png"))


def test_cli_train_posenet_mesh_4x2(tmp_path, monkeypatch):
    """DP x TP training through the CLI on the virtual 8-device mesh."""
    from hand3d_tpu.cli import train_posenet as cli

    # batch 4 shards over the data axis, so the fixture needs >= 4 records
    bin_path = str(tmp_path / "rhd4.bin")
    make_rhd_bin(bin_path, num_records=4)
    snap_dir = str(tmp_path / "snaps_mesh")
    _run_main(
        cli,
        ["--data", bin_path, "--batch-size", "4", "--max-iter", "2",
         "--mesh", "4x2", "--crop-size", "32",
         "--snapshot-dir", snap_dir, "--snapshot-freq", "0"],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(snap_dir, "snapshot-2.msgpack"))


def test_serving_estimator(monkeypatch):
    from hand3d_tpu.serving import HandPoseEstimator
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    est = HandPoseEstimator(params, batch_size=2, input_hw=(120, 160))
    images = (np.random.RandomState(0).rand(3, 120, 160, 3) * 255).astype(
        np.uint8
    )  # 3 images -> one full batch + one padded batch
    out = est.predict(images)
    assert out["keypoint_coord3d"].shape == (3, 21, 3)
    assert out["keypoint_uv21"].shape == (3, 21, 2)
    assert out["hand_scoremap"].shape == (3, 120, 160, 2)


def test_serving_estimator_mesh_matches_single_device():
    """Mesh-sharded serving (DP x TP over the virtual 8-device mesh) returns
    the same predictions as single-device serving."""
    from hand3d_tpu.parallel import make_mesh
    from hand3d_tpu.serving import HandPoseEstimator
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    images = (np.random.RandomState(1).rand(4, 120, 160, 3) * 255).astype(
        np.uint8
    )
    single = HandPoseEstimator(params, batch_size=4, input_hw=(120, 160))
    sharded = HandPoseEstimator(
        params, batch_size=4, input_hw=(120, 160), mesh=make_mesh(4, 2)
    )
    out_s = single.predict(images)
    out_m = sharded.predict(images)
    np.testing.assert_allclose(
        out_m["keypoint_coord3d"], out_s["keypoint_coord3d"], atol=1e-5
    )
    np.testing.assert_allclose(
        out_m["keypoint_uv21"], out_s["keypoint_uv21"], atol=1e-4
    )


def test_cli_eval2d(rhd_bin, monkeypatch, capsys):
    from hand3d_tpu.cli import eval2d as cli

    _run_main(
        cli, ["--data", rhd_bin, "--batch-size", "2", "--no-wrist"], monkeypatch
    )
    assert "Average mean EPE" in capsys.readouterr().out


def test_cli_eval3d_quantized(rhd_bin, monkeypatch, capsys):
    from hand3d_tpu.cli import eval3d as cli

    _run_main(
        cli,
        ["--data", rhd_bin, "--batch-size", "2", "--variant", "direct",
         "--quantize", "int8"],
        monkeypatch,
    )
    assert "Average mean EPE" in capsys.readouterr().out


def test_serving_estimator_phase_pack_matches_plain():
    """phase_pack=True returns the same predictions (float-reassociation
    tolerance) as the plain estimator."""
    from hand3d_tpu.serving import HandPoseEstimator
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    images = (np.random.RandomState(1).rand(2, 120, 160, 3) * 255).astype(
        np.uint8
    )
    kw = dict(batch_size=2, input_hw=(120, 160))
    plain = HandPoseEstimator(params, **kw).predict(images)
    packed = HandPoseEstimator(params, phase_pack=True, **kw).predict(images)
    np.testing.assert_allclose(
        packed["keypoint_coord3d"], plain["keypoint_coord3d"], atol=1e-4
    )
    np.testing.assert_allclose(
        packed["keypoint_uv21"], plain["keypoint_uv21"], atol=0.51
    )  # integer-pixel decode: at most off by rounding at exact ties


def test_cli_train_posenet_inline_eval(rhd_bin, tmp_path, monkeypatch, capsys):
    from hand3d_tpu.cli import train_posenet as cli

    metrics = str(tmp_path / "metrics.jsonl")
    _run_main(
        cli,
        ["--data", rhd_bin, "--batch-size", "2", "--max-iter", "2",
         "--crop-size", "32", "--snapshot-dir", str(tmp_path / "s"),
         "--snapshot-freq", "0", "--metrics-log", metrics,
         "--eval-data", rhd_bin, "--eval-freq", "1", "--eval-batches", "1"],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "Eval @" in out
    import json

    evals = [json.loads(l) for l in open(metrics) if "eval_epe_mean_px" in l]
    # eval at step 1 (freq 1) and the final eval at max_iter
    assert len(evals) == 2
    assert all(np.isfinite(e["eval_epe_mean_px"]) for e in evals)
    assert all("eval_auc_0_30px" in e for e in evals)


def test_auto_bucket_estimator():
    from hand3d_tpu.serving import AutoBucketEstimator, HandPoseEstimator
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    auto = AutoBucketEstimator(params, batch_size=2, max_buckets=2)

    rng = np.random.RandomState(0)
    img_a = (rng.rand(2, 120, 160, 3) * 255).astype(np.uint8)
    img_b = (rng.rand(1, 96, 128, 3) * 255).astype(np.uint8)

    out_a = auto.predict(img_a)
    out_b = auto.predict(img_b)
    assert len(auto._buckets) == 2
    ref_a = HandPoseEstimator(params, batch_size=2,
                              input_hw=(120, 160)).predict(img_a)
    np.testing.assert_allclose(out_a["keypoint_uv21"],
                               ref_a["keypoint_uv21"], atol=1e-5)
    assert out_b["keypoint_coord3d"].shape == (1, 21, 3)

    # third distinct resolution exceeds max_buckets
    import pytest

    with pytest.raises(RuntimeError, match="buckets"):
        auto.predict(np.zeros((1, 60, 80, 3), np.uint8))


def test_auto_bucket_snap_maps_uv_back():
    from hand3d_tpu.serving import AutoBucketEstimator
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    auto = AutoBucketEstimator(params, batch_size=1,
                               snap_hws=[(120, 160)])
    rng = np.random.RandomState(1)
    img = (rng.rand(1, 100, 140, 3) * 255).astype(np.uint8)
    out = auto.predict(img)
    assert list(auto._buckets) == [(120, 160)]
    # the snapped bucket frame is reported; uv/center live in the caller's
    # frame (scale_crop/hand_scoremap stay in snap_hw's, as documented)
    np.testing.assert_array_equal(out["snap_hw"], [120, 160])
    assert out["center"].shape == (1, 2)
    # uv back in the caller's 100x140 frame
    assert out["keypoint_uv21"].shape == (1, 21, 2)
    u, v = out["keypoint_uv21"][0, :, 0], out["keypoint_uv21"][0, :, 1]
    assert (u <= 140).all() and (v <= 100).all()
    # the snap path must normalize exactly ONCE: an all-bright image (still
    # in [0,1] after mean subtraction, so a second normalize_images pass
    # would shift it again) must match the manual resize->predict pipeline
    from jax import image as jax_image

    from hand3d_tpu.serving import normalize_images

    bright = np.full((1, 100, 140, 3), 0.9, np.float32)
    got = auto.predict(bright)
    manual_in = np.asarray(jax_image.resize(
        normalize_images(bright), (1, 120, 160, 3), "bilinear"))
    want = auto._bucket((120, 160)).predict(manual_in, normalized=True)
    np.testing.assert_allclose(
        got["keypoint_uv21"],
        want["keypoint_uv21"] * np.asarray([140 / 160, 100 / 120]),
        atol=1e-5,
    )


def test_predict_empty_batch_raises():
    from hand3d_tpu.serving import chunked_predict

    import pytest

    with pytest.raises(ValueError, match="at least one image"):
        chunked_predict(lambda c: {}, np.zeros((0, 8, 8, 3), np.float32), 2)


def test_http_serve_endpoint(tmp_path):
    """POST an image to the HTTP server; JSON keypoints come back in the
    caller's frame. /healthz reports config; bad input -> 400."""
    import http.client
    import io
    import json
    import threading

    from PIL import Image

    from hand3d_tpu.cli import serve
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.serving import AutoBucketEstimator

    params = ColorHandPose3D().init(jax.random.PRNGKey(0))
    est = AutoBucketEstimator(params, batch_size=1, snap_hws=[(120, 160)])
    srv = serve.make_server(est.predict, {"source": "test"}, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        rng = np.random.RandomState(0)
        Image.fromarray(
            (rng.rand(100, 140, 3) * 255).astype(np.uint8)
        ).save(buf, format="PNG")

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok" and health["source"] == "test"

        conn.request("POST", "/predict", body=buf.getvalue(),
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        uv = np.asarray(out["keypoint_uv21"])
        assert uv.shape == (1, 21, 2)
        assert np.asarray(out["keypoint_coord3d"]).shape == (1, 21, 3)
        # uv in the caller's 100x140 frame
        assert (uv[..., 0] <= 140).all() and (uv[..., 1] <= 100).all()

        conn.request("POST", "/predict", body=b"not-an-image",
                     headers={"Content-Type": "image/png"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        text = resp.read().decode()
        assert "hand3d_requests_total 1" in text
        assert "hand3d_errors_total 1" in text
        assert "hand3d_images_total 1" in text
        assert "hand3d_request_seconds_sum" in text
    finally:
        srv.shutdown()
        srv.server_close()


def test_cli_eval3d_from_posenet(rhd_bin, monkeypatch, capsys):
    from hand3d_tpu.cli import eval3d as cli

    _run_main(
        cli,
        ["--data", rhd_bin, "--batch-size", "2", "--variant", "proposed",
         "--from-posenet"],
        monkeypatch,
    )
    assert "Average mean EPE" in capsys.readouterr().out


def test_dynamic_batcher_coalesces_concurrent_requests():
    from concurrent.futures import ThreadPoolExecutor

    from hand3d_tpu.serving import DynamicBatcher, HandPoseEstimator
    from hand3d_tpu.models.cascade import ColorHandPose3D

    params = ColorHandPose3D().init(jax.random.PRNGKey(0))
    est = HandPoseEstimator(params, batch_size=4, input_hw=(120, 160))
    est.warmup()

    calls = []
    inner_predict = est.predict

    def counting_predict(images, normalized=False):
        calls.append(images.shape[0])
        return inner_predict(images, normalized=normalized)

    est.predict = counting_predict
    batcher = DynamicBatcher(est, max_batch=4, max_wait_ms=500.0)
    try:
        rng = np.random.RandomState(0)
        imgs = (rng.rand(4, 120, 160, 3) * 255).astype(np.uint8)
        with ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(batcher.predict, imgs[i : i + 1])
                    for i in range(4)]
            outs = [f.result(timeout=120) for f in futs]
        # the 4 concurrent 1-image requests ran as ONE device batch
        assert calls == [4], calls
        ref = inner_predict(imgs)
        for i, out in enumerate(outs):
            np.testing.assert_allclose(
                out["keypoint_uv21"][0], ref["keypoint_uv21"][i], atol=1e-5
            )

        # errors propagate to the caller, not the batcher thread
        import pytest

        with pytest.raises(AssertionError, match="expected"):
            batcher.predict(np.zeros((1, 60, 80, 3), np.uint8))
        # batcher still alive afterwards
        ok = batcher.predict(imgs[:1])
        assert ok["keypoint_uv21"].shape == (1, 21, 2)
    finally:
        batcher.close()


class _FakeEstimator:
    """Minimal predict() contract for batcher lifecycle tests (no compile):
    returns each input image's mean as a 'keypoint'."""

    def __init__(self, delay=0.0):
        import time

        self.calls = []
        self.delay = delay
        self._time = time

    def predict(self, images, normalized=False):
        self.calls.append(images.shape[0])
        if self.delay:
            self._time.sleep(self.delay)
        return {"mean": images.reshape(images.shape[0], -1).mean(axis=1)}


def test_dynamic_batcher_respects_max_batch():
    from hand3d_tpu.serving import DynamicBatcher

    est = _FakeEstimator()
    batcher = DynamicBatcher(est, max_batch=8, max_wait_ms=200.0)
    try:
        from concurrent.futures import ThreadPoolExecutor

        imgs = np.zeros((5, 8, 8, 3), np.float32)
        with ThreadPoolExecutor(2) as pool:
            futs = [pool.submit(batcher.predict, imgs) for _ in range(2)]
            outs = [f.result(timeout=30) for f in futs]
        # two 5-image requests with max_batch=8 must NOT fuse into a
        # 10-image device batch; the second is deferred to the next round
        assert sorted(est.calls) == [5, 5], est.calls
        for out in outs:
            assert out["mean"].shape == (5,)
    finally:
        batcher.close()


def test_dynamic_batcher_close_semantics():
    import threading

    import pytest

    from hand3d_tpu.serving import DynamicBatcher

    # requests already queued when close() lands still complete (graceful)
    est = _FakeEstimator(delay=0.2)
    batcher = DynamicBatcher(est, max_batch=1, max_wait_ms=1.0)
    imgs = np.zeros((1, 8, 8, 3), np.float32)
    results = []
    threads = [
        threading.Thread(target=lambda: results.append(batcher.predict(imgs)))
        for _ in range(3)
    ]
    for t in threads:
        t.start()
    import time

    time.sleep(0.05)  # let all three enqueue while the first is in-flight
    batcher.close()
    for t in threads:
        t.join(timeout=30)
    assert len(results) == 3 and all(
        r["mean"].shape == (1,) for r in results)

    # after close(): fail fast instead of hanging forever
    with pytest.raises(RuntimeError, match="closed"):
        batcher.predict(imgs)
    batcher.close()  # idempotent


def test_http_serve_predict_failure_is_500():
    """Server-side predict faults are 500s (client errors stay 400) so load
    balancers/alerting classify them correctly."""
    import http.client
    import threading

    from hand3d_tpu.cli import serve

    def broken_predict(images, normalized=False):
        raise RuntimeError("device fell over")

    srv = serve.make_server(broken_predict, {"source": "test"}, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import io

        buf = io.BytesIO()
        np.save(buf, np.zeros((1, 8, 8, 3), np.uint8))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/predict", body=buf.getvalue(),
                     headers={"Content-Type": "application/x-npy"})
        resp = conn.getresponse()
        assert resp.status == 500
        assert b"device fell over" in resp.read()
    finally:
        srv.shutdown()
        srv.server_close()
