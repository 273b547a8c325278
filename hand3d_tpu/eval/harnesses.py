"""The four evaluation harnesses, batched and jitted.

Library equivalents of the reference's eval scripts — same data settings,
same metric math, same threshold grids — but each runs the whole per-batch
computation (preprocess -> network -> keypoint decode -> distances) as one
jitted program and streams batches through the device, instead of 2.7k-6k
single-sample sess.run round trips (eval_full.py:71-86):

  * eval2d_gt_cropped  <- eval2d_gt_cropped.py (PoseNet on GT crops, px EPE)
  * eval2d_full_image  <- eval2d.py (HandSegNet+PoseNet on full frames)
  * eval3d_lifting     <- eval3d.py (lifting variants from GT scoremaps, mm)
  * eval_full_pipeline <- eval_full.py (image -> 3D, mm, + 20-50mm AUC)

Each returns a dict of metrics; expected reference values are listed in
BASELINE.md rows 1-13.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hand3d_tpu.data.config import PreprocessConfig
from hand3d_tpu.data.preprocess import preprocess_rhd, preprocess_stb
from hand3d_tpu.data.rhd import RHDDataset
from hand3d_tpu.eval.metrics import EvalUtil, calc_auc
from hand3d_tpu.models.cascade import CROP_SIZE, ColorHandPose3D
from hand3d_tpu.models.poseprior import PosePriorNetwork
from hand3d_tpu.ops.image import resize_bilinear
from hand3d_tpu.ops.keypoints import decode_upsampled


def _preprocess_fn(dataset):
    return preprocess_rhd if isinstance(dataset, RHDDataset) else preprocess_stb


def _eval_batches(dataset, batch_size):
    """Yield (indices, valid_count); the last batch is padded by repetition."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        valid = len(idx)
        if valid < batch_size:
            idx = np.concatenate([idx, np.full(batch_size - valid, n - 1)])
        yield idx, valid


_FUSED_CACHE = {}


class _ProducerError:
    """Queue sentinel carrying the IO thread's exception to the consumer."""

    def __init__(self, exc):
        self.exc = exc


def _fused_step(step_fn, pre, cfg):
    """One jitted (params, raw) -> outputs function per (harness, config).

    The params are a jit ARGUMENT, not a baked-in closure constant, and the
    wrapper is cached by key — so repeated harness calls (periodic
    in-training validation in particular) reuse the compiled program
    instead of re-tracing the whole network with new weight constants
    every time.
    """
    key = (step_fn, pre, cfg)
    fused = _FUSED_CACHE.get(key)
    if fused is None:
        fused = jax.jit(lambda params, raw: step_fn(params, pre(cfg, raw)))
        _FUSED_CACHE[key] = fused
    return fused


def _run(dataset, cfg, batch_size, step_fn, params, util_feed, progress=None,
         mesh=None, window=3, max_batches=None):
    """Stream the dataset through ``step_fn(params, data)`` with a fully
    pipelined loop:

    - preprocess + metrics step fuse into ONE jitted program per batch
      (dispatch overhead matters: through this environment's TPU tunnel a
      dispatch costs ~300 ms — two dispatches + a synchronous fetch per
      batch measured 4 img/s end to end despite ~1000 fps device compute);
    - raw record slicing runs on a background thread;
    - results are fetched through a ``window``-deep async queue, so batch
      i's device compute overlaps batch i+1's host IO and upload.
    """
    import collections
    import queue
    import threading

    pre = _preprocess_fn(dataset)
    sharding = None
    if mesh is not None:
        from hand3d_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)

    # multi-host (one jax process per host, mesh spanning them): every
    # process runs this loop over the SAME global batch list; each feeds
    # the rows of its addressable "data" shards (jax.devices() orders by
    # process, so those are contiguous), and metric outputs are
    # all-gathered so every host computes identical metrics.
    nproc = jax.process_count()
    multihost = sharding is not None and nproc > 1
    if multihost:
        from jax.experimental import multihost_utils

        assert batch_size % nproc == 0, (
            f"eval batch_size {batch_size} must divide over "
            f"{nproc} processes"
        )
        per = batch_size // nproc
        lo = jax.process_index() * per

    fused_pr = _fused_step(step_fn, pre, cfg)

    def fused(raw):
        return fused_pr(params, raw)

    def place(raw):
        # raw values are host numpy (dataset.raw_batch); upload each row
        # range exactly once — in multihost mode slice the local rows on
        # host BEFORE any device transfer (uploading the global batch and
        # slicing it back would cost 2x the batch in transfers and stage
        # rows this process never feeds)
        if sharding is None:
            return {k: jnp.asarray(v) for k, v in raw.items()}
        if multihost:
            return {
                k: jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(v[lo : lo + per])
                )
                for k, v in raw.items()
            }
        return {k: jax.device_put(v, sharding) for k, v in raw.items()}

    q = queue.Queue(maxsize=2)
    batches = list(_eval_batches(dataset, batch_size))
    if max_batches is not None:
        batches = batches[:max_batches]

    def producer():
        try:
            for idx, valid in batches:
                q.put((dataset.raw_batch(idx), valid))
        except BaseException as e:  # surface IO errors to the consumer,
            # which would otherwise block in q.get() forever (and the
            # training watchdog is suspended during in-training evals)
            q.put((_ProducerError(e), 0))

    threading.Thread(target=producer, daemon=True).start()

    pending = collections.deque()

    def drain_one(bi):
        out, valid = pending.popleft()
        if multihost:
            # gather the data-sharded metric outputs so every host feeds
            # the full batch and reports identical metrics
            out = multihost_utils.process_allgather(out, tiled=True)
        util_feed({k: np.asarray(v)[:valid] for k, v in out.items()})
        if progress:
            progress(bi, valid)

    drained = 0
    for _ in range(len(batches)):
        raw, valid = q.get()
        if isinstance(raw, _ProducerError):
            raise RuntimeError("eval IO producer thread failed") from raw.exc
        pending.append((fused(place(raw)), valid))
        if len(pending) >= window:  # keep at most ``window`` in flight
            drain_one(drained)
            drained += 1
    while pending:
        drain_one(drained)
        drained += 1


def _step_gt_cropped(posenet_params, data):
    from hand3d_tpu.models import posenet

    preds = posenet.apply(posenet_params, data["image_crop"])
    factor = CROP_SIZE // preds[-1].shape[1]
    coord_hw = decode_upsampled(preds[-1], factor)
    coord_uv = coord_hw[..., ::-1]
    scale = data["crop_scale"][:, None, None]
    dists = jnp.linalg.norm(
        data["keypoint_uv21"] / scale - coord_uv / scale, axis=-1
    )
    return {"dists": dists, "vis": data["keypoint_vis21"]}


def eval2d_gt_cropped(posenet_params, dataset, batch_size=32, progress=None,
                      mesh=None, max_batches=None):
    """PoseNet alone on ground-truth crops; 2D EPE in source-image pixels.

    Reference: eval2d_gt_cropped.py (reader settings :38, EPE / crop_scale
    :82, thresholds 0-30 px over 20 steps :87). ``max_batches`` bounds the
    pass (e.g. for periodic in-training validation).
    """
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False)

    util = EvalUtil()
    _run(dataset, cfg, batch_size, _step_gt_cropped, posenet_params,
         lambda o: util.feed_batch(o["dists"], o["vis"]), progress, mesh,
         max_batches=max_batches)
    mean, median, auc, curve, thr = util.get_measures(0.0, 30.0, 20)
    return {"epe_mean_px": mean, "epe_median_px": median, "auc_0_30px": auc,
            "pck_curve": curve, "thresholds_px": thr}


def _step_full_image(params, data):
    image = data["image"]
    h, w = image.shape[1:3]
    image_scaled = resize_bilinear(image, (240, 320))
    out = ColorHandPose3D().inference2d(params, image_scaled)
    # map predictions back to the dataset frame (eval2d.py:98-99)
    coord_uv = out.keypoint_uv21 * jnp.asarray(
        [w / 320.0, h / 240.0], jnp.float32
    )
    dists = jnp.linalg.norm(data["keypoint_uv21"] - coord_uv, axis=-1)
    return {"dists": dists, "vis": data["keypoint_vis21"]}


def eval2d_full_image(params, dataset, batch_size=16, use_wrist_coord=True,
                      scale_to_size=True, progress=None, mesh=None):
    """HandSegNet + PoseNet on full frames; 2D EPE in dataset pixels.

    Reference: eval2d.py. With scale_to_size=True both GT and predictions
    live in the 240x320 frame (the paper setting, rows 3-4 of BASELINE.md);
    with scale_to_size=False the network still sees 240x320 but coords are
    mapped back to the 320x320 RHD frame (row 5).
    """
    cfg = PreprocessConfig(
        use_wrist_coord=use_wrist_coord, scale_to_size=scale_to_size,
        render_scoremap=False,
    )

    util = EvalUtil()
    _run(dataset, cfg, batch_size, _step_full_image, params,
         lambda o: util.feed_batch(o["dists"], o["vis"]), progress, mesh)
    mean, median, auc, curve, thr = util.get_measures(0.0, 30.0, 20)
    return {"epe_mean_px": mean, "epe_median_px": median, "auc_0_30px": auc,
            "pck_curve": curve, "thresholds_px": thr}


_VARIANT_STEPS = {}


def _variant_step(base, variant):
    """Per-(step, variant) function with a STABLE identity, so the fused-jit
    cache hits across harness calls (a fresh closure per call would defeat
    it)."""
    key = (base, variant)
    fn = _VARIANT_STEPS.get(key)
    if fn is None:
        def fn(params, data):
            return base(variant, params, data)

        _VARIANT_STEPS[key] = fn
    return fn


def _step_lifting(variant, lifting_params, data):
    out = PosePriorNetwork(variant).apply(
        lifting_params, data["scoremap"], data["hand_side"]
    )
    pred = out.coord_xyz_rel_normed * data["keypoint_scale"][:, None, None]
    gt = data["keypoint_xyz21"] - data["keypoint_xyz21"][:, :1]
    dists = jnp.linalg.norm(gt - pred, axis=-1)
    return {"dists": dists}


def eval3d_lifting(variant, lifting_params, dataset, batch_size=32,
                   progress=None, mesh=None, max_batches=None):
    """A lifting variant from GT scoremaps; 3D EPE in meters.

    Reference: eval3d.py (reader :50, pred * keypoint_scale and root-centered
    GT :88-96, thresholds 0-50mm :101, all keypoints counted visible :98).
    """
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False)

    util = EvalUtil()
    _run(dataset, cfg, batch_size, _variant_step(_step_lifting, variant),
         lifting_params,
         lambda o: util.feed_batch(o["dists"], np.ones_like(o["dists"])),
         progress, mesh, max_batches=max_batches)
    mean, median, auc, curve, thr = util.get_measures(0.0, 0.050, 20)
    return {"epe_mean_mm": mean * 1000, "epe_median_mm": median * 1000,
            "auc_0_50mm": auc, "pck_curve": curve, "thresholds_m": thr}


def _step_from_posenet(variant, params, data):
    from hand3d_tpu.models import posenet as posenet_mod

    preds = posenet_mod.apply(params[posenet_mod.SCOPE], data["image_crop"])
    scoremap = preds[-1]
    if scoremap.shape[1] != 32:
        scoremap = resize_bilinear(scoremap, (32, 32))
    out = PosePriorNetwork(variant).apply(params, scoremap, data["hand_side"])
    pred = out.coord_xyz_rel_normed * data["keypoint_scale"][:, None, None]
    gt = data["keypoint_xyz21"] - data["keypoint_xyz21"][:, :1]
    dists = jnp.linalg.norm(gt - pred, axis=-1)
    return {"dists": dists}


def eval3d_from_posenet(variant, params, dataset, batch_size=32,
                        progress=None, mesh=None, max_batches=None):
    """Lifting from PoseNet's PREDICTED scoremaps on GT crops; 3D EPE (m).

    No reference analog (eval3d.py feeds GT scoremaps; eval_full.py also
    includes detection): this isolates the 2D->3D hand-off that
    cli/train_joint.py fine-tunes. Metric math matches eval3d.py:88-101.
    ``params`` holds the PoseNet2D + PosePrior(+ViewpointNet) scopes.
    """
    cfg = PreprocessConfig(hand_crop=True, use_wrist_coord=False,
                           render_scoremap=False)

    util = EvalUtil()
    _run(dataset, cfg, batch_size, _variant_step(_step_from_posenet, variant),
         params,
         lambda o: util.feed_batch(o["dists"], np.ones_like(o["dists"])),
         progress, mesh, max_batches=max_batches)
    mean, median, auc, curve, thr = util.get_measures(0.0, 0.050, 20)
    return {"epe_mean_mm": mean * 1000, "epe_median_mm": median * 1000,
            "auc_0_50mm": auc, "pck_curve": curve, "thresholds_m": thr}


def _step_full_pipeline(params, data):
    image_scaled = resize_bilinear(data["image"], (240, 320))
    out = ColorHandPose3D().inference(params, image_scaled, data["hand_side"])
    pred = out.keypoint_coord3d * data["keypoint_scale"][:, None, None]
    gt = data["keypoint_xyz21"] - data["keypoint_xyz21"][:, :1]
    dists = jnp.linalg.norm(gt - pred, axis=-1)
    return {"dists": dists, "vis": data["keypoint_vis21"]}


def eval_full_pipeline(params, dataset, batch_size=16, progress=None,
                       mesh=None):
    """Full cascade image -> 3D; EPE mm + AUC(0-50) + AUC(20-50) subset.

    Reference: eval_full.py (240x320 input :50, pred * keypoint_scale,
    root-centered GT :80-86, thresholds 0-50mm :92, subset curve[8:] :99-101).
    Works on STB (paper Figure 9) and RHD evaluation sets.
    """
    cfg = PreprocessConfig(use_wrist_coord=False, render_scoremap=False)

    util = EvalUtil()
    _run(dataset, cfg, batch_size, _step_full_pipeline, params,
         lambda o: util.feed_batch(o["dists"], o["vis"]), progress, mesh)
    mean, median, auc, curve, thr = util.get_measures(0.0, 0.050, 20)
    curve_sub, thr_sub = curve[8:], thr[8:] * 1000.0
    return {
        "epe_mean_mm": mean * 1000,
        "epe_median_mm": median * 1000,
        "auc_0_50mm": auc,
        "auc_20_50mm": calc_auc(thr_sub, curve_sub),
        "pck_curve": curve,
        "thresholds_m": thr,
    }
