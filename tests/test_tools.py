"""Round-trip tests for the dataset build tools (tools/create_*_db.py) and
the inspect_db consistency checker — the L6 tooling layer (SURVEY §2.4)."""

import os
import pickle
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


def _run_tool(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def test_create_binary_db_round_trip(tmp_path, monkeypatch):
    import create_binary_db as tool

    rng = np.random.RandomState(0)
    root = tmp_path / "RHD_published_v2"
    for sub in ("color", "mask"):
        (root / "evaluation" / sub).mkdir(parents=True)

    anno_all, truth = {}, {}
    for sid in range(2):
        xyz = rng.randn(42, 3).astype(np.float32)
        uv = (rng.rand(42, 2) * 320).astype(np.float32)
        vis = rng.randint(0, 2, 42).astype(np.float32)
        K = (np.eye(3) * 300 + rng.rand(3, 3)).astype(np.float32)
        anno_all[sid] = {
            "xyz": xyz,
            "uv_vis": np.concatenate([uv, vis[:, None]], 1),
            "K": K,
        }
        img = rng.randint(0, 256, (320, 320, 3), dtype=np.uint8)
        mask = rng.randint(0, 34, (320, 320), dtype=np.uint8)
        _save_png(str(root / "evaluation" / "color" / ("%.5d.png" % sid)), img)
        _save_png(str(root / "evaluation" / "mask" / ("%.5d.png" % sid)), mask)
        truth[sid] = (xyz, uv, vis, K, img, mask)

    with open(root / "evaluation" / "anno_evaluation.pickle", "wb") as f:
        pickle.dump(anno_all, f)

    out = str(tmp_path / "rhd_evaluation.bin")
    _run_tool(
        tool,
        ["--rhd-path", str(root), "--set", "evaluation", "--out", out],
        monkeypatch,
    )

    from hand3d_tpu.data.rhd import RHDDataset

    ds = RHDDataset("evaluation", path=out)
    assert len(ds) == 2
    raw = ds.raw_batch(np.arange(2))
    for sid in range(2):
        xyz, uv, vis, K, img, mask = truth[sid]
        np.testing.assert_allclose(raw["kp_xyz"][sid], xyz, rtol=1e-6)
        np.testing.assert_allclose(raw["kp_uv"][sid], uv, rtol=1e-6)
        np.testing.assert_allclose(raw["cam_mat"][sid], K, rtol=1e-6)
        np.testing.assert_array_equal(raw["image"][sid], img)
        np.testing.assert_array_equal(raw["hand_parts"][sid], mask)
        np.testing.assert_array_equal(raw["kp_vis"][sid], vis.astype(np.uint8))


def test_create_stb_db_round_trip(tmp_path, monkeypatch):
    scipy_io = pytest.importorskip("scipy.io")
    import create_stb_db as tool

    rng = np.random.RandomState(1)
    root = tmp_path / "StereoHandTracking"
    (root / "labels").mkdir(parents=True)
    (root / "B1Counting").mkdir()

    frames = 2
    monkeypatch.setattr(tool, "SEQUENCES", ["B1Counting"])
    monkeypatch.setattr(tool, "FRAMES_PER_SEQ", frames)

    # handPara: [3, 21, frames], mm, in front of the camera (z > 0)
    hand_para = rng.rand(3, 21, frames).astype(np.float64) * 100
    hand_para[2] += 500
    scipy_io.savemat(str(root / "labels" / "B1Counting_BB.mat"),
                     {"handPara": hand_para})
    imgs = {}
    for i in range(frames):
        for side in ("left", "right"):
            img = rng.randint(0, 256, (480, 640, 3), dtype=np.uint8)
            _save_png(str(root / "B1Counting" / f"BB_{side}_{i}.png"), img)
            imgs[(side, i)] = img

    out = str(tmp_path / "stb_eval.bin")
    _run_tool(tool, ["--stb-path", str(root), "--out", out], monkeypatch)

    from hand3d_tpu.data.stb import STBDataset

    ds = STBDataset("evaluation", path=out)
    assert len(ds) == 2 * frames  # left + right per frame
    raw = ds.raw_batch(np.arange(len(ds)))
    for i in range(frames):
        xyz_l = hand_para[:, :, i].T
        for j, (side, xyz) in enumerate(
            [("left", xyz_l), ("right", xyz_l - [tool.BASELINE_MM, 0, 0])]
        ):
            r = 2 * i + j
            np.testing.assert_allclose(
                raw["kp_xyz"][r], xyz.astype(np.float32), rtol=1e-5
            )
            np.testing.assert_array_equal(raw["image"][r], imgs[(side, i)])
            # stored uv must equal the projection through the BB intrinsics
            uvw = xyz @ tool.K.T
            np.testing.assert_allclose(
                raw["kp_uv_vis"][r, :, :2],
                (uvw[:, :2] / uvw[:, 2:]).astype(np.float32), rtol=1e-4,
            )
            np.testing.assert_array_equal(raw["kp_uv_vis"][r, :, 2], 1.0)


def test_inspect_db_writes_figure(tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_rhd_bin

    import inspect_db as tool

    bin_path = str(tmp_path / "rhd.bin")
    make_rhd_bin(bin_path, num_records=2)
    out = str(tmp_path / "inspect.png")
    _run_tool(
        tool,
        ["--dataset", "rhd", "--data", bin_path, "--num", "2", "--out", out],
        monkeypatch,
    )
    assert os.path.exists(out)


def test_bench_input_smoke(tmp_path):
    """Input-pipeline benchmark runs and reports headroom over train demand."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "bench_input.py"),
         "--records", "16", "--batch", "4"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.splitlines()[-1])
    assert out["memmap_rec_s"] > 0
    assert "memmap_headroom_x" in out


def test_average_params_npz_and_snapshots(tmp_path):
    import sys

    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "tools")
    try:
        import average_params
    finally:
        sys.path.pop(0)

    from hand3d_tpu.train.checkpoints import save_snapshot
    from hand3d_tpu.train.trainer import init_state
    from hand3d_tpu.weights import load_npz, save_npz

    t1 = {"net": {"w": np.full((2, 2), 1.0, np.float32)}}
    t2 = {"net": {"w": np.full((2, 2), 3.0, np.float32)}}
    a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_npz(a, t1)
    save_npz(b, t2)
    out = str(tmp_path / "avg.npz")
    average_params.main([a, b, "--out", out])
    got = load_npz(out)
    np.testing.assert_allclose(got["net"]["w"], 2.0)

    # snapshot tail-averaging
    opt = optax.sgd(0.1)
    snap_dir = str(tmp_path / "snaps")
    for i, v in enumerate([1.0, 2.0, 6.0]):
        state = init_state({"net": {"w": jnp.full((2, 2), v)}}, opt)
        save_snapshot(snap_dir, state, step=i, keep=10)
    out2 = str(tmp_path / "soup.npz")
    average_params.main(["--snapshots", snap_dir, "--last", "3",
                         "--out", out2])
    got2 = load_npz(out2)
    np.testing.assert_allclose(got2["net"]["w"], 3.0)


def test_run_baseline_parity_report_path(tmp_path):
    """tools/run_baseline_parity.py: discovery, harness plumbing, verdicts,
    skip reasons and the markdown report — on synthetic data + fake
    'shipped' pickles (random weights, so verdicts are FAIL; the tool's
    job here is correct plumbing, the PASS path needs the real artifacts)."""
    import pickle as pkl

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import run_baseline_parity as tool
    from fixtures import make_rhd_bin, make_stb_bin

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.models.poseprior import PosePriorNetwork
    from hand3d_tpu.weights.convert import tree_to_flat

    data_dir = tmp_path / "data"
    weights_dir = tmp_path / "weights"
    data_dir.mkdir(), weights_dir.mkdir()
    make_rhd_bin(str(data_dir / "rhd_evaluation.bin"), num_records=4)
    make_stb_bin(str(data_dir / "stb_evaluation.bin"), num_records=4)

    # fake shipped pickles in the reference's format ({name: ndarray})
    full = ColorHandPose3D().init(jax.random.PRNGKey(0))
    seg_flat = tree_to_flat({"HandSegNet": full["HandSegNet"]})
    pose_flat = tree_to_flat({"PoseNet2D": full["PoseNet2D"]})
    lift_flat = tree_to_flat(
        PosePriorNetwork("direct").init(jax.random.PRNGKey(1)))
    full_flat = tree_to_flat(full)
    for name, flat in [("handsegnet-rhd.pickle", seg_flat),
                       ("posenet-rhd-stb.pickle", pose_flat),
                       ("lifting-direct.pickle", lift_flat),
                       ("posenet3d-rhd-stb.pickle", full_flat)]:
        with open(weights_dir / name, "wb") as f:
            pkl.dump({k: np.asarray(v) for k, v in flat.items()}, f)

    results = tool.run_rows(str(data_dir), str(weights_dir),
                            rows=[1, 2, 7, 8, 12], batch_size=2,
                            progress=False)
    # mapped rows with artifacts present ran and were judged
    for row in (1, 7, 12):
        assert not results[row].get("skipped"), results[row]
        assert set(results[row]["measured"]) == set(tool.ROWS[row]["expect"])
        assert results[row]["ok"] in (True, False)
    # retrained row skips with a reason; missing pickle row too
    assert results[2]["skipped"] and "snap_pose" in results[2]["reason"]
    assert results[8]["skipped"] and "bottleneck" in results[8]["reason"]

    class _Args:
        batch_size, tolerance_rel = 2, 0.02

    doc = tool._markdown(results, _Args)
    assert "| 1 |" in doc and "SKIPPED" in doc and "Expected" in doc


@pytest.mark.slow
def test_run_baseline_parity_all_rows_drill(tmp_path):
    """Day-one drill (VERDICT r4 #8): ALL 13 BASELINE rows execute and are
    JUDGED (none skipped) on synthetic .bin + shipped-shaped pickles +
    retrained-shaped snapshots, so the first real-artifact run cannot die
    on plumbing. Random weights make most verdicts FAIL; the tolerance
    logic is additionally proven to fire in BOTH directions by re-judging
    one row against its own measured values."""
    import pickle as pkl

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import run_baseline_parity as tool
    from fixtures import make_rhd_bin, make_stb_bin

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.models.poseprior import PosePriorNetwork
    from hand3d_tpu.models import handsegnet, posenet
    from hand3d_tpu.train.checkpoints import save_snapshot
    from hand3d_tpu.train.trainer import init_state, make_optimizer
    from hand3d_tpu.weights.convert import tree_to_flat

    data_dir = tmp_path / "data"
    weights_dir = tmp_path / "weights"
    retrained_dir = tmp_path / "retrained"
    data_dir.mkdir(), weights_dir.mkdir(), retrained_dir.mkdir()
    make_rhd_bin(str(data_dir / "rhd_evaluation.bin"), num_records=4)
    make_stb_bin(str(data_dir / "stb_evaluation.bin"), num_records=4)

    full = ColorHandPose3D().init(jax.random.PRNGKey(0))
    pickles = {
        "handsegnet-rhd.pickle": tree_to_flat(
            {"HandSegNet": full["HandSegNet"]}),
        "posenet-rhd-stb.pickle": tree_to_flat(
            {"PoseNet2D": full["PoseNet2D"]}),
        "posenet3d-rhd-stb.pickle": tree_to_flat(full),
    }
    for i, variant in enumerate(tool._VARIANT_BY_ROW.values()):
        pickles[f"lifting-{variant}.pickle"] = tree_to_flat(
            PosePriorNetwork(variant).init(jax.random.PRNGKey(1 + i)))
    for name, flat in pickles.items():
        with open(weights_dir / name, "wb") as f:
            pkl.dump({k: np.asarray(v) for k, v in flat.items()}, f)

    # retrained-shaped msgpack snapshots for rows 2/6
    opt = make_optimizer([1e-4], [])
    save_snapshot(str(retrained_dir / "snap_pose"),
                  init_state({"PoseNet2D": posenet.init(
                      jax.random.PRNGKey(7))}, opt), step=1)
    save_snapshot(str(retrained_dir / "snap_seg"),
                  init_state({"HandSegNet": handsegnet.init(
                      jax.random.PRNGKey(8))}, opt), step=1)

    results = tool.run_rows(str(data_dir), str(weights_dir),
                            retrained_dir=str(retrained_dir),
                            batch_size=2, progress=False)
    assert sorted(results) == list(range(1, 14))
    for row, r in results.items():
        assert not r.get("skipped"), (row, r)
        assert set(r["measured"]) == set(tool.ROWS[row]["expect"]), row
        assert r["ok"] in (True, False), row
        assert all(np.isfinite(v) for v in r["measured"].values()), (row, r)

    # tolerance logic fires both ways: a row re-judged against its own
    # measured numbers must PASS; against far-off numbers it must FAIL
    row1 = results[1]
    for k, v in row1["measured"].items():
        assert tool._tol_ok(k, v, v, 0.02)
        assert not tool._tol_ok(k, v, v + (1.0 if "auc" in k else
                                           max(1.0, abs(v))), 0.02)
