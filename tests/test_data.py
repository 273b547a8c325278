"""Data layer tests: codec round trip, derived features, crop math, pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from hand3d_tpu.data import (
    PreprocessConfig,
    RHDDataset,
    STBDataset,
    InputPipeline,
)
from hand3d_tpu.data.codec import RHD_RECORD_DTYPE, STB_RECORD_DTYPE
from hand3d_tpu.data.preprocess import preprocess_rhd, preprocess_stb, STB_KP_PERM

from fixtures import make_rhd_bin, make_stb_bin


@pytest.fixture(scope="module")
def rhd_left(tmp_path_factory):
    path = tmp_path_factory.mktemp("rhd") / "rhd_left.bin"
    make_rhd_bin(path, num_records=4, dominant="left")
    return RHDDataset("evaluation", path=str(path))


@pytest.fixture(scope="module")
def rhd_right(tmp_path_factory):
    path = tmp_path_factory.mktemp("rhd") / "rhd_right.bin"
    make_rhd_bin(path, num_records=2, dominant="right")
    return RHDDataset("evaluation", path=str(path))


@pytest.fixture(scope="module")
def stb(tmp_path_factory):
    path = tmp_path_factory.mktemp("stb") / "stb_eval.bin"
    make_stb_bin(path, num_records=4)
    return STBDataset("evaluation", path=str(path))


def test_record_dtypes_match_reference_layout():
    # byte accounting per BinaryDbReader.py:101-124 and BinaryDbReaderSTB.py:96-113
    assert RHD_RECORD_DTYPE.itemsize == 2 + 4 * (42 * 3 + 42 * 2 + 9) + 320 * 320 * 4 + 42
    assert STB_RECORD_DTYPE.itemsize == 4 * (21 * 3 + 21 * 3) + 480 * 640 * 3


def test_rhd_codec_round_trip(rhd_left):
    raw = rhd_left.raw_batch([0, 1])
    assert raw["image"].shape == (2, 320, 320, 3)
    assert raw["kp_xyz"].shape == (2, 42, 3)
    assert raw["cam_mat"][0, 2, 2] == 1.0
    assert raw["hand_parts"].max() >= 2


def test_preprocess_rhd_basic_features(rhd_left):
    cfg = PreprocessConfig()
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0, 1, 2]).items()}
    data = preprocess_rhd(cfg, raw)

    for key in [
        "image", "hand_parts", "hand_mask", "keypoint_xyz", "keypoint_uv",
        "keypoint_vis", "cam_mat", "hand_side", "keypoint_xyz21",
        "keypoint_vis21", "keypoint_uv21", "keypoint_scale",
        "keypoint_xyz21_normed", "keypoint_xyz21_local", "keypoint_xyz21_can",
        "rot_mat", "scoremap",
    ]:
        assert key in data, key

    # image normalized to [-0.5, 0.5]
    img = np.asarray(data["image"])
    assert img.min() >= -0.5 and img.max() <= 0.5

    # dominant hand is left -> one-hot [1, 0]; 21-subset = first 21 kps
    np.testing.assert_allclose(np.asarray(data["hand_side"]), [[1, 0]] * 3)
    np.testing.assert_allclose(
        np.asarray(data["keypoint_xyz21"]), np.asarray(data["keypoint_xyz"])[:, :21]
    )

    # normalization invariant: ||normed[12] - normed[11]|| == 1
    normed = np.asarray(data["keypoint_xyz21_normed"])
    np.testing.assert_allclose(
        np.linalg.norm(normed[:, 12] - normed[:, 11], axis=-1), 1.0, atol=1e-5
    )
    # scale * normed == root-relative metric coords
    rel = np.asarray(data["keypoint_xyz21"]) - np.asarray(data["keypoint_xyz21"])[:, :1]
    np.testing.assert_allclose(
        normed * np.asarray(data["keypoint_scale"])[:, None, None], rel, atol=1e-6
    )

    # rot_mat maps canonical coords back: can @ rot_mat == normed (left hands)
    can = np.asarray(data["keypoint_xyz21_can"])
    rot = np.asarray(data["rot_mat"])
    np.testing.assert_allclose(np.matmul(can, rot), normed, atol=1e-4)

    # scoremap at full image size, peak at the truncated uv of visible kps
    assert data["scoremap"].shape == (3, 320, 320, 21)


def test_preprocess_rhd_right_hand_selection(rhd_right):
    cfg = PreprocessConfig()
    raw = {k: jnp.asarray(v) for k, v in rhd_right.raw_batch([0, 1]).items()}
    data = preprocess_rhd(cfg, raw)
    np.testing.assert_allclose(np.asarray(data["hand_side"]), [[0, 1]] * 2)
    np.testing.assert_allclose(
        np.asarray(data["keypoint_xyz21"]), np.asarray(data["keypoint_xyz"])[:, 21:]
    )
    # right hands are mirrored into canonical left frame: can @ rot != normed,
    # but flipping z of can @ ... — verify via the flip identity instead:
    can = np.asarray(data["keypoint_xyz21_can"])
    rot = np.asarray(data["rot_mat"])
    normed = np.asarray(data["keypoint_xyz21_normed"])
    can_unflipped = can * np.array([1, 1, -1.0])
    np.testing.assert_allclose(np.matmul(can_unflipped, rot), normed, atol=1e-4)


def test_preprocess_rhd_palm_coord(rhd_left):
    cfg = PreprocessConfig(use_wrist_coord=False)
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0]).items()}
    data = preprocess_rhd(cfg, raw)
    kp0 = np.asarray(data["keypoint_xyz"])[0, 0]
    raw_xyz = np.asarray(raw["kp_xyz"])[0]
    np.testing.assert_allclose(kp0, 0.5 * (raw_xyz[0] + raw_xyz[12]), atol=1e-6)


def test_preprocess_rhd_hand_crop(rhd_left):
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False)
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0, 1]).items()}
    data = preprocess_rhd(cfg, raw)

    assert data["image_crop"].shape == (2, 256, 256, 3)
    assert data["scoremap"].shape == (2, 256, 256, 21)
    scale = np.asarray(data["crop_scale"])
    assert np.all(scale >= 1.0) and np.all(scale <= 10.0)
    # kp12 (the crop center) must land at the crop midpoint (128, 128)
    uv = np.asarray(data["keypoint_uv21"])
    np.testing.assert_allclose(uv[:, 12], 128.0, atol=1e-3)
    # cam_mat update: K'[0,0] == scale * K[0,0]
    cam_old = np.asarray(raw["cam_mat"])
    cam_new = np.asarray(data["cam_mat"])
    np.testing.assert_allclose(cam_new[:, 0, 0], scale * cam_old[:, 0, 0], rtol=1e-5)


def test_preprocess_rhd_scale_to_size(rhd_left):
    cfg = PreprocessConfig(scale_to_size=True, use_wrist_coord=True)
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0]).items()}
    data = preprocess_rhd(cfg, raw)
    assert set(data) == {"image", "keypoint_uv21", "keypoint_vis21"}
    assert data["image"].shape == (1, 240, 320, 3)


def test_preprocess_rhd_random_crop(rhd_left):
    import jax

    cfg = PreprocessConfig(random_crop_to_size=True, hue_aug=True)
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0, 1]).items()}
    data = preprocess_rhd(cfg, raw, key=jax.random.PRNGKey(0))
    assert set(data) == {"image", "hand_parts", "hand_mask"}
    assert data["image"].shape == (2, 256, 256, 3)
    assert data["hand_mask"].shape == (2, 256, 256, 2)
    # mask still consistent with parts after the joint crop
    parts = np.asarray(data["hand_parts"])
    mask = np.asarray(data["hand_mask"])
    np.testing.assert_array_equal(mask[..., 1], (parts > 1).astype(np.int32))


def test_preprocess_stb_features(stb):
    cfg = PreprocessConfig(use_wrist_coord=False)
    raw = {k: jnp.asarray(v) for k, v in stb.raw_batch([0, 1]).items()}
    data = preprocess_stb(cfg, raw)

    # keypoint reordering + mm -> m
    raw_xyz = np.asarray(raw["kp_xyz"]) / 1000.0
    np.testing.assert_allclose(
        np.asarray(data["keypoint_xyz21"])[:, 1], raw_xyz[:, 20], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(data["keypoint_xyz21"])[:, 0], raw_xyz[:, 0], atol=1e-6
    )
    # left hand constant
    np.testing.assert_allclose(np.asarray(data["hand_side"]), [[1, 0]] * 2)
    # intrinsics constant
    np.testing.assert_allclose(np.asarray(data["cam_mat"])[0, 0, 0], 822.79041)
    # canonical has no flip: can @ rot == normed
    can = np.asarray(data["keypoint_xyz21_can"])
    rot = np.asarray(data["rot_mat"])
    np.testing.assert_allclose(
        np.matmul(can, rot), np.asarray(data["keypoint_xyz21_normed"]), atol=1e-4
    )


def test_preprocess_stb_wrist_extrapolation(stb):
    cfg = PreprocessConfig(use_wrist_coord=True)
    raw = {k: jnp.asarray(v) for k, v in stb.raw_batch([0]).items()}
    data = preprocess_stb(cfg, raw)
    perm = np.asarray(STB_KP_PERM)
    xyz = np.asarray(raw["kp_xyz"])[0][perm] / 1000.0
    want_wrist = xyz[16] + 2.0 * (xyz[0] - xyz[16])
    np.testing.assert_allclose(
        np.asarray(data["keypoint_xyz21"])[0, 0], want_wrist, atol=1e-6
    )


def test_pipeline_iterates_and_is_deterministic(rhd_left):
    cfg = PreprocessConfig(hand_crop=True, coord_uv_noise=True)
    pipe_a = InputPipeline(rhd_left, cfg, batch_size=2, shuffle=True, seed=7)
    pipe_b = InputPipeline(rhd_left, cfg, batch_size=2, shuffle=True, seed=7)
    batches_a = list(pipe_a.iterate(epochs=1))
    batches_b = list(pipe_b.iterate(epochs=1))
    assert len(batches_a) == 2  # 4 records / batch 2
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_allclose(
            np.asarray(a["image_crop"]), np.asarray(b["image_crop"])
        )
        np.testing.assert_allclose(
            np.asarray(a["keypoint_uv21"]), np.asarray(b["keypoint_uv21"])
        )


def test_pipeline_native_backend(rhd_left):
    cfg = PreprocessConfig(hand_crop=True)
    pipe = InputPipeline(rhd_left, cfg, batch_size=2, shuffle=True, seed=3,
                         use_native=True)
    batches = list(pipe.iterate(epochs=1))
    assert len(batches) == 2
    for b in batches:
        assert b["image_crop"].shape == (2, 256, 256, 3)


def test_projection_consistency_like_reference_smoke_test(rhd_left, stb):
    """The reference's manual reader check (BinaryDbReaderSTB.__main__):
    stored uv must equal the stored xyz projected through cam_mat. Our
    fixtures are built that way; preprocess must preserve it."""
    # RHD: uv is truncated to ints by the reader semantics -> 1px tolerance
    cfg = PreprocessConfig(render_scoremap=False)
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0, 1]).items()}
    d = preprocess_rhd(cfg, raw)
    proj = np.einsum("bkc,bxc->bkx", np.asarray(d["keypoint_xyz21"]),
                     np.asarray(d["cam_mat"]))
    proj = proj[..., :2] / proj[..., 2:3]
    np.testing.assert_allclose(np.asarray(d["keypoint_uv21"]), proj, atol=1.0)

    # STB (no wrist extrapolation so kp0 stays projective-consistent)
    cfg = PreprocessConfig(use_wrist_coord=False, render_scoremap=False)
    raw = {k: jnp.asarray(v) for k, v in stb.raw_batch([0, 1]).items()}
    d = preprocess_stb(cfg, raw)
    proj = np.einsum("bkc,bxc->bkx", np.asarray(d["keypoint_xyz21"]),
                     np.asarray(d["cam_mat"]))
    proj = proj[..., :2] / proj[..., 2:3]
    np.testing.assert_allclose(np.asarray(d["keypoint_uv21"]), proj, atol=1e-2)


def test_projection_consistency_survives_crop(rhd_left):
    """The cam_mat update under cropping (BinaryDbReader.py:325-346) must
    keep K' @ xyz == uv' in the crop frame.

    use_wrist_coord=True: the palm variant's kp0 mixes a mean-of-projections
    (uv) with a projection-of-means (xyz), which differ under perspective —
    an approximation inherited from the reference, not a crop-math error.
    """
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=True,
                           render_scoremap=False)
    raw = {k: jnp.asarray(v) for k, v in rhd_left.raw_batch([0, 1]).items()}
    d = preprocess_rhd(cfg, raw)
    proj = np.einsum("bkc,bxc->bkx", np.asarray(d["keypoint_xyz21"]),
                     np.asarray(d["cam_mat"]))
    proj = proj[..., :2] / proj[..., 2:3]
    # residual = the reader's uv int-truncation (<= ~1px, BinaryDbReader.py:149)
    # amplified by the crop scale, plus float roundoff
    scale = np.asarray(d["crop_scale"])
    np.testing.assert_allclose(
        np.asarray(d["keypoint_uv21"]), proj, atol=1.2 * float(scale.max()) + 0.5
    )


def test_random_hue_per_sample_deltas_and_inverse():
    """Each sample must draw its own hue delta (reference applies
    tf.image.random_hue per sample, before batching); rotation must be a
    bijection on hue (rotate by d then -d is identity isn't testable with
    random deltas, so check: same image twice in a batch gets two
    different hues, and zero max_delta is the identity)."""
    import jax
    from hand3d_tpu.data import augment

    rng = np.random.RandomState(3)
    one = rng.rand(8, 10, 3).astype(np.float32) - 0.5
    batch = jnp.asarray(np.stack([one, one]))
    out = np.asarray(augment.random_hue(jax.random.PRNGKey(0), batch, 0.4))
    assert np.abs(out[0] - out[1]).max() > 1e-3  # per-sample deltas
    same = np.asarray(augment.random_hue(jax.random.PRNGKey(0), batch, 0.0))
    np.testing.assert_allclose(same, np.asarray(batch), atol=1e-5)


def test_epoch_indices_pad_small_dataset():
    """drop_remainder=False must pad cyclically even when batch_size is
    much larger than the dataset."""
    from hand3d_tpu.data.pipeline import epoch_indices

    batches = epoch_indices(3, 8, shuffle=False, seed=0, drop_remainder=False)
    assert batches.shape == (1, 8)
    assert set(batches[0]) == {0, 1, 2}


def test_epoch_indices_process_shards_partition_the_epoch():
    from hand3d_tpu.data.pipeline import epoch_indices

    full = epoch_indices(10, 1, shuffle=True, seed=5).ravel()
    s0 = epoch_indices(10, 1, shuffle=True, seed=5, process_shard=(0, 2)).ravel()
    s1 = epoch_indices(10, 1, shuffle=True, seed=5, process_shard=(1, 2)).ravel()
    assert set(s0) & set(s1) == set()
    assert sorted([*s0, *s1]) == sorted(full)
    # strided slices of the SAME permutation (identical seed across hosts)
    np.testing.assert_array_equal(s0, full[0::2])
    np.testing.assert_array_equal(s1, full[1::2])


def test_pipeline_process_sharding(rhd_left):
    """Two single-process pipelines with explicit (i, 2) shards must read
    disjoint halves of the epoch and report halved steps_per_epoch."""
    cfg = PreprocessConfig(hand_crop=True)
    pipes = [
        InputPipeline(rhd_left, cfg, batch_size=1, shuffle=True, seed=7,
                      process_shard=(i, 2))
        for i in range(2)
    ]
    assert [p.steps_per_epoch() for p in pipes] == [2, 2]

    # 4 records, shard = 2 each; crops from the two shards together must
    # equal the crops of the unsharded epoch (same permutation)
    unsharded = InputPipeline(rhd_left, cfg, batch_size=1, shuffle=True,
                              seed=7, process_shard=(0, 1))
    ref = [np.asarray(b["image_crop"]) for b in unsharded.iterate(epochs=1)]
    got0 = [np.asarray(b["image_crop"]) for b in pipes[0].iterate(epochs=1)]
    got1 = [np.asarray(b["image_crop"]) for b in pipes[1].iterate(epochs=1)]
    np.testing.assert_allclose(got0, ref[0::2])
    np.testing.assert_allclose(got1, ref[1::2])

    # oversize per-shard batch fails loudly
    import pytest

    big = InputPipeline(rhd_left, cfg, batch_size=3, process_shard=(0, 2))
    with pytest.raises(ValueError, match="shard"):
        big.steps_per_epoch()


def test_process_shards_equal_length_with_uneven_dataset():
    """7 records over 2 processes: both shards truncate to 3 so step counts
    agree across hosts (a 4-vs-3 skew would hang lock-step collectives)."""
    from hand3d_tpu.data.pipeline import epoch_indices

    s0 = epoch_indices(7, 1, shuffle=True, seed=9, process_shard=(0, 2))
    s1 = epoch_indices(7, 1, shuffle=True, seed=9, process_shard=(1, 2))
    assert s0.shape == s1.shape == (3, 1)
    assert set(s0.ravel()) & set(s1.ravel()) == set()


def test_multihost_without_sharding_rejected(rhd_left, monkeypatch):
    """Auto process-sharding without global-array assembly would silently
    train divergent per-host models — must raise."""
    import jax as jax_mod
    import pytest

    monkeypatch.setattr(jax_mod, "process_count", lambda: 2)
    monkeypatch.setattr(jax_mod, "process_index", lambda: 0)
    cfg = PreprocessConfig(hand_crop=True)
    with pytest.raises(ValueError, match="sharding"):
        InputPipeline(rhd_left, cfg, batch_size=1)
    # explicit opt-in still allowed
    pipe = InputPipeline(rhd_left, cfg, batch_size=1, process_shard=(0, 2))
    assert pipe.steps_per_epoch() == 2


def test_pipeline_resume_matches_straight_through(rhd_left):
    """iterate(start_epoch=, skip_steps=) yields exactly the tail of an
    uninterrupted stream — same shuffle order AND same augmentation keys
    (what train.loop.fit relies on for exact --resume)."""
    cfg = PreprocessConfig(hand_crop=True, coord_uv_noise=True)
    pipe = InputPipeline(rhd_left, cfg, batch_size=2, shuffle=True, seed=7)
    spe = pipe.steps_per_epoch()
    assert spe == 2
    straight = list(pipe.iterate(epochs=3))  # 6 steps
    resumed = list(pipe.iterate(epochs=2, start_epoch=1, skip_steps=1))
    assert len(resumed) == len(straight) - 3
    for a, b in zip(straight[3:], resumed):
        np.testing.assert_array_equal(
            np.asarray(a["image_crop"]), np.asarray(b["image_crop"]))
        np.testing.assert_array_equal(
            np.asarray(a["keypoint_uv21"]), np.asarray(b["keypoint_uv21"]))


def test_pipeline_producer_error_propagates(rhd_left, monkeypatch):
    """An IO failure on the producer thread must raise in the consumer,
    not leave it blocked in q.get() forever."""
    import pytest

    cfg = PreprocessConfig(hand_crop=True)
    pipe = InputPipeline(rhd_left, cfg, batch_size=2, shuffle=False, seed=0)
    calls = {"n": 0}
    real = rhd_left.raw_batch

    def flaky(idx):
        calls["n"] += 1
        if calls["n"] > 1:
            raise OSError("disk on fire")
        return real(idx)

    monkeypatch.setattr(rhd_left, "raw_batch", flaky)
    it = pipe.iterate(epochs=1)
    next(it)  # first batch fine
    with pytest.raises(RuntimeError, match="producer thread failed"):
        for _ in it:
            pass


def test_native_reader_delivers_deterministic_order(tmp_path):
    """The C++ streamer must yield one reproducible batch order for a fixed
    seed regardless of worker-thread completion order."""
    from fixtures import make_rhd_bin

    path = str(tmp_path / "rhd16.bin")
    make_rhd_bin(path, num_records=16)
    ds = RHDDataset("evaluation", path=path)
    try:
        from hand3d_tpu.data.native import NativeRecordReader, NativeUnavailable
    except Exception:
        pytest.skip("native bindings unavailable")

    def stream(seed):
        try:
            r = NativeRecordReader(path, ds.records.dtype, 2, shuffle=True,
                                   seed=seed, num_threads=2,
                                   queue_capacity=3)
        except NativeUnavailable as e:
            pytest.skip(f"native streamer unavailable: {e}")
        try:
            r.reset(2)  # two epochs
            order = []
            while True:
                item = r.next_batch()
                if item is None:
                    return order
                order.append(tuple(item[1]))
        finally:
            r.close()

    a, b = stream(5), stream(5)
    assert len(a) == 16  # 16 records / batch 2 x 2 epochs
    assert a == b
    assert stream(6) != a  # seed actually matters
