"""Serving API: a padded-batch, fixed-shape hand-pose estimator.

The reference's only "serving" story was run.py's one-image sess.run loop.
This wraps the cascade for production use: one compiled program per
(batch, height, width) bucket, automatic padding of partial batches, numpy
in / numpy out, and optional bf16 compute.

Example:
    est = HandPoseEstimator.from_npz("weights.npz", batch_size=32)
    out = est.predict(images)          # [N, H, W, 3] uint8 or float
    out["keypoint_uv21"], out["keypoint_coord3d"], out["hand_scoremap"]
"""

import threading

import numpy as np
import jax
import jax.numpy as jnp

from hand3d_tpu.models.cascade import ColorHandPose3D
from hand3d_tpu.weights import load_npz


def prepare_params(params, quantize=None, phase_pack=False,
                   quantize_scope=None, calibration_batches=None,
                   calibrate_fn=None):
    """Apply the optional inference-time param transforms (shared by the
    live estimator and the AOT exporter).

    ``quantize_scope``: optional iterable of stage names (case-insensitive,
    e.g. {"handsegnet"}) restricting int8 quantization to those scopes —
    the drift-free preset: the measured ablation localizes all int8 uv
    drift to PoseNet2D activations while HandSegNet carries ~half the
    cascade FLOPs (docs/DESIGN.md, docs/PRESETS.md).

    ``quantize="int8_static"``: int8 with CALIBRATED static per-input-
    channel activation scales (ops/quant.py) — pass representative
    ``calibration_batches`` plus ``calibrate_fn(params, batch)`` running
    the float model eagerly (e.g. ``lambda p, b: net.inference(p, b,
    hand_side)``)."""
    assert quantize in (None, "int8", "int8_static"), quantize
    if quantize is not None:
        from hand3d_tpu.ops.quant import (calibrate_act_scales,
                                          quantize_params_int8)

        act = None
        if quantize == "int8_static":
            assert calibration_batches is not None and calibrate_fn, (
                "quantize='int8_static' needs calibration_batches + "
                "calibrate_fn (see ops.quant.calibrate_act_scales)")
            act = calibrate_act_scales(calibrate_fn, params,
                                       calibration_batches)
        params = quantize_params_int8(
            params,
            scopes=set(quantize_scope) if quantize_scope else None,
            act_scales=act)
    else:
        assert not quantize_scope, "quantize_scope requires quantize='int8'"
    if phase_pack:
        from hand3d_tpu.ops.phasepack import phase_pack_params

        params = phase_pack_params(params)
    return params


def select_serving_outputs(out):
    """The served subset of a CascadeOutput — ONE definition shared by the
    live estimator and the AOT exporter so the two predict() contracts
    cannot drift apart."""
    return {
        "keypoint_coord3d": out.keypoint_coord3d,
        "keypoint_uv21": out.keypoint_uv21,
        "hand_scoremap": out.hand_scoremap,
        "scale_crop": out.scale_crop,
        "center": out.center,
    }


def chunked_predict(run_chunk, images, batch_size):
    """Shared batched-predict contract: chunk ``images`` into fixed-size
    batches (zero-padding the last), dispatch EVERY chunk before fetching
    any result (jax dispatch is async, so chunk i's device compute overlaps
    chunk i+1's host-side padding/transfer), then trim and concatenate.

    ``run_chunk(padded_chunk) -> dict of device arrays``."""
    n = images.shape[0]
    if n == 0:
        raise ValueError("predict() needs at least one image")
    pending = []
    for start in range(0, n, batch_size):
        chunk = images[start : start + batch_size]
        valid = chunk.shape[0]
        if valid < batch_size:
            pad = np.zeros(
                (batch_size - valid, *chunk.shape[1:]), chunk.dtype
            )
            chunk = np.concatenate([chunk, pad])
        pending.append((run_chunk(chunk), valid))
    outs = [
        {k: np.asarray(v)[:valid] for k, v in out.items()}
        for out, valid in pending
    ]
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def normalize_images(images):
    """[N,H,W,3] uint8 in [0,255] / float in [0,1] / mean-subtracted float
    -> mean-subtracted float32 (the cascade's input convention)."""
    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0 - 0.5
    elif images.min() >= 0.0 and images.max() <= 1.0:
        images = images.astype(np.float32) - 0.5
    return images.astype(np.float32, copy=False)


class HandPoseEstimator:
    def __init__(self, params, batch_size=16, input_hw=(240, 320),
                 compute_dtype=None, left_hand=True, seg_scale=1.0,
                 mesh=None, quantize=None, phase_pack=False,
                 quantize_scope=None, calibration_images=None):
        """``mesh``: optional jax.sharding.Mesh (parallel.make_mesh) for
        multi-chip serving — the batch shards over the "data" axis and the
        params get the tensor-parallel layout for the mesh's "model" axis
        (replicated when n_model == 1). batch_size must be divisible by the
        data-axis size.

        ``quantize``: None or "int8" — post-training int8 quantization of
        the conv/FC path (ops.quant; ~2x MXU rate on v5e). Composable with
        seg_scale and mesh. ``quantize_scope``: restrict quantization to
        the named stages (e.g. {"handsegnet"} — the drift-free scoped
        preset; see prepare_params).

        ``phase_pack``: pack conv1_2's two horizontal output phases into the
        MXU's 128 lanes with a fused conv+relu+pool (ops.phasepack). Same
        multiply-adds, float-reassociation-level numeric delta only. Wins
        at small batch in bf16 (+10% at batch 1, +6% at batch 32, neutral
        at 128; slower in fp32 — see docs/DESIGN.md). Composable with
        quantize/mesh, with two caveats: the packed conv needs an even
        input width (round(input width x seg_scale) — all stock resolutions
        are), and combining with seg_scale < 1 measured a batch-1 latency
        REGRESSION (DESIGN.md) — pick one lever or the other.

        ``calibration_images``: [N, H, W, 3] representative images (any
        accepted dtype), required with quantize="int8_static" — calibrates
        the static activation scales on the float model before quantizing.
        """
        net_cal = ColorHandPose3D(seg_scale=seg_scale)
        calib_batches, calib_fn = None, None
        if quantize == "int8_static":
            assert calibration_images is not None, (
                "quantize='int8_static' needs calibration_images")
            imgs = normalize_images(np.asarray(calibration_images))
            hs = jnp.tile(
                jnp.asarray([[1.0, 0.0]] if left_hand else [[0.0, 1.0]]),
                (len(imgs), 1))
            calib_batches = [jnp.asarray(imgs)]
            calib_fn = (lambda p, b: net_cal.inference(p, b, hs))
        params = prepare_params(params, quantize, phase_pack,
                                quantize_scope=quantize_scope,
                                calibration_batches=calib_batches,
                                calibrate_fn=calib_fn)
        self.net = ColorHandPose3D(compute_dtype=compute_dtype,
                                   seg_scale=seg_scale)
        self.batch_size = batch_size
        self.input_hw = tuple(input_hw)
        self._input_sharding = None
        hand_side = jnp.tile(
            jnp.asarray([[1.0, 0.0]] if left_hand else [[0.0, 1.0]]),
            (batch_size, 1),
        )
        if mesh is not None:
            from hand3d_tpu.parallel import mesh as pmesh

            n_shards = pmesh.batch_shard_count(mesh)
            assert batch_size % n_shards == 0, (
                f"batch_size {batch_size} not divisible by the mesh's "
                f"{n_shards} batch shards (slice x data)"
            )
            self.params = pmesh.shard_params(mesh, params)
            self._input_sharding = pmesh.batch_sharding(mesh)
            self.hand_side = jax.device_put(hand_side, self._input_sharding)
        else:
            self.params = jax.device_put(params)
            self.hand_side = hand_side

        @jax.jit
        def _fwd(params, image, hand_side):
            return select_serving_outputs(
                self.net.inference(params, image, hand_side)
            )

        self._fwd = _fwd

    @classmethod
    def from_npz(cls, path, **kwargs):
        return cls(load_npz(path), **kwargs)

    def _to_device(self, batch):
        if self._input_sharding is not None:
            return jax.device_put(batch, self._input_sharding)
        return jnp.asarray(batch)

    def warmup(self):
        """Compile ahead of serving traffic."""
        dummy = np.zeros((self.batch_size, *self.input_hw, 3), np.float32)
        jax.block_until_ready(
            self._fwd(self.params, self._to_device(dummy), self.hand_side)
        )
        return self

    def predict(self, images, *, normalized=False):
        """images: [N, H, W, 3], uint8 in [0,255] or float in [0,1] or
        mean-subtracted float. Returns dict of numpy arrays with leading N.
        The input H, W must match this estimator's bucket; see
        AutoBucketEstimator for mixed-resolution traffic.
        ``normalized=True`` asserts the caller already ran
        normalize_images (the [0,1]-range heuristic must only run once)."""
        if not normalized:
            images = normalize_images(images)
        else:
            images = np.asarray(images)
        assert images.shape[1:3] == self.input_hw, (
            f"expected {self.input_hw} input, got {images.shape[1:3]}; "
            "resize on the client or build a second estimator bucket"
        )
        return chunked_predict(
            lambda chunk: self._fwd(
                self.params, self._to_device(chunk), self.hand_side
            ),
            images, self.batch_size,
        )


def _resize_to(images, target_hw):
    """Host-side bilinear resize of [N,H,W,3] into ``target_hw``."""
    import jax.image

    return np.asarray(jax.image.resize(
        images, (images.shape[0], *target_hw, 3), "bilinear"
    ))


def _map_back(out, hw, target_hw):
    """Map pixel-space outputs from the bucket frame ``target_hw`` back to
    the caller's frame ``hw``: keypoint_uv21 is (u, v), center is (row,
    col). hand_scoremap and scale_crop stay in the bucket frame (a scalar
    crop scale cannot survive an anisotropic resize); the ``snap_hw``
    output records that frame."""
    scale_uv = np.asarray(
        [hw[1] / target_hw[1], hw[0] / target_hw[0]], np.float32
    )
    out["keypoint_uv21"] = out["keypoint_uv21"] * scale_uv
    out["center"] = out["center"] * scale_uv[::-1]
    return out


class SnapEstimator:
    """Wrap a single fixed-resolution estimator (e.g. an
    ``export.ExportedEstimator``, whose compiled program is baked at one
    (H, W)): any-resolution inputs are host-resized to its bucket and
    keypoint_uv21/center mapped back to the caller's frame — the same
    contract AutoBucketEstimator provides for live weights."""

    def __init__(self, estimator):
        self.est = estimator
        self.batch_size = estimator.batch_size
        self.input_hw = tuple(estimator.input_hw)

    def predict(self, images, *, normalized=False):
        images = np.asarray(images) if normalized else normalize_images(
            images)
        hw = tuple(images.shape[1:3])
        if hw != self.input_hw:
            images = _resize_to(images, self.input_hw)
        out = self.est.predict(images, normalized=True)
        if hw != self.input_hw:
            out = _map_back(out, hw, self.input_hw)
        out["snap_hw"] = np.asarray(self.input_hw, np.int32)
        return out


class AutoBucketEstimator:
    """Serving across mixed input resolutions: one compiled bucket per
    observed (height, width), built lazily and cached.

    Each distinct resolution costs one compile on first sight (XLA programs
    are shape-static); ``max_buckets`` bounds that. With ``snap_hws`` the
    input is first bilinearly resized (on host, cheap vs a new compile) to
    the nearest configured bucket — keypoint_uv21 and center are then
    mapped back to the caller's frame. hand_scoremap and scale_crop remain
    in the bucket's frame (a scalar crop scale cannot survive an
    anisotropic resize); the ``snap_hw`` output records that frame.

    All other constructor kwargs pass through to HandPoseEstimator.
    """

    def __init__(self, params, batch_size=16, snap_hws=None, max_buckets=8,
                 **kwargs):
        self.params = params
        self.batch_size = batch_size
        self.kwargs = kwargs
        self.snap_hws = [tuple(hw) for hw in snap_hws] if snap_hws else None
        self.max_buckets = max_buckets
        self._buckets = {}

    def _bucket(self, hw):
        est = self._buckets.get(hw)
        if est is None:
            if len(self._buckets) >= self.max_buckets:
                raise RuntimeError(
                    f"over {self.max_buckets} resolution buckets "
                    f"(adding {hw}); pass snap_hws to pool resolutions or "
                    "raise max_buckets"
                )
            est = HandPoseEstimator(
                self.params, batch_size=self.batch_size, input_hw=hw,
                **self.kwargs,
            )
            self._buckets[hw] = est
        return est

    def _snap(self, hw):
        if self.snap_hws is None:
            return hw
        # nearest by log-area + aspect distance; exact matches win
        if hw in self.snap_hws:
            return hw
        h, w = hw

        def dist(b):
            bh, bw = b
            return abs(np.log(bh * bw / (h * w))) + abs(
                np.log((bh / bw) / (h / w))
            )

        return min(self.snap_hws, key=dist)

    def predict(self, images, *, normalized=False):
        """Same contract as HandPoseEstimator.predict, any resolution."""
        images = np.asarray(images) if normalized else normalize_images(
            images)
        hw = tuple(images.shape[1:3])
        target = self._snap(hw)
        if target != hw:
            images = _resize_to(images, target)
        out = self._bucket(target).predict(images, normalized=True)
        if target != hw:
            out = _map_back(out, hw, target)
        out["snap_hw"] = np.asarray(target, np.int32)
        return out


class DynamicBatcher:
    """Aggregate CONCURRENT predict() calls into one device batch.

    Production serving pattern (cf. TF-Serving/Triton dynamic batching):
    callers from many threads each submit a few images; a single batcher
    thread drains the queue, coalesces up to ``max_batch`` images — waiting
    at most ``max_wait_ms`` for stragglers after the first arrival — runs
    ONE predict on the wrapped estimator, and scatters the results back.
    Under load the device sees full batches (its efficient regime, see
    DESIGN.md batch-32 vs batch-1 numbers); an isolated request pays at
    most max_wait_ms extra latency.

    Wraps any estimator with the predict() contract (HandPoseEstimator,
    AutoBucketEstimator, ExportedEstimator). Requests whose (H, W) differ
    are batched separately (shapes must agree within one device batch).
    """

    def __init__(self, estimator, max_batch=None, max_wait_ms=5.0):
        import queue as queue_mod

        self.est = estimator
        self.max_batch = max_batch or getattr(estimator, "batch_size", 8)
        self.max_wait = max_wait_ms / 1000.0
        self._q = queue_mod.Queue()
        self._queue_mod = queue_mod
        self._stop = False
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="dynamic-batcher")
        self._thread.start()

    def close(self):
        """Stop accepting new requests, finish everything already queued,
        then stop the batcher thread. Idempotent."""
        with self._lock:
            if self._stop:
                return
            self._stop = True
        self._q.put(None)  # shutdown token: drained strictly after all
        # requests enqueued before close() (predict holds _lock, so no
        # request can slip in after _stop is set)
        self._thread.join(timeout=30)

    def predict(self, images):
        """Same contract as the wrapped estimator; thread-safe. Raises
        RuntimeError after close()."""
        from concurrent.futures import Future

        images = normalize_images(images)
        fut = Future()
        with self._lock:
            if self._stop:
                raise RuntimeError("DynamicBatcher is closed")
            self._q.put((images, fut))
        return fut.result()

    def _collect(self, first):
        """Coalesce requests: same-(H,W) items totalling at most max_batch
        images, waiting at most max_wait for more after the first arrival.
        Items that don't fit this batch (other resolution, or would
        overflow max_batch) are re-queued for the next round."""
        import time as time_mod

        items = [first]
        hw = first[0].shape[1:3]
        total = first[0].shape[0]
        deadline = time_mod.monotonic() + self.max_wait
        put_back = []
        saw_stop = False
        while total < self.max_batch:
            remaining = deadline - time_mod.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except self._queue_mod.Empty:
                break
            if item is None:
                saw_stop = True
                break
            n = item[0].shape[0]
            if item[0].shape[1:3] != hw:
                put_back.append(item)  # different bucket: next round
                continue
            if total + n > self.max_batch:
                put_back.append(item)  # would overflow: next round
                break  # this batch is as full as it gets
            items.append(item)
            total += n
        for item in put_back:
            self._q.put(item)
        if saw_stop:
            # re-queue the shutdown token BEHIND the put-back items so the
            # loop still processes them before exiting
            self._q.put(None)
        return items

    def _loop(self):
        draining = False
        try:
            while True:
                if draining:
                    # shutdown token seen: finish whatever is still queued
                    # (e.g. put-back items re-queued behind the token),
                    # then exit
                    try:
                        first = self._q.get_nowait()
                    except self._queue_mod.Empty:
                        return
                else:
                    first = self._q.get()
                if first is None:
                    draining = True
                    continue
                items = self._collect(first)
                try:
                    batch = np.concatenate([im for im, _ in items])
                    out = self.est.predict(batch, normalized=True)
                    start = 0
                    for im, fut in items:
                        n = im.shape[0]
                        fut.set_result(
                            {k: v[start : start + n] for k, v in out.items()
                             if k != "snap_hw"}
                            | ({"snap_hw": out["snap_hw"]}
                               if "snap_hw" in out else {})
                        )
                        start += n
                except Exception as e:
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)
        finally:
            # fail anything still queued so no caller blocks forever
            # (normally empty: close() guarantees the token drains last)
            while True:
                try:
                    item = self._q.get_nowait()
                except self._queue_mod.Empty:
                    break
                if item is not None and not item[1].done():
                    item[1].set_exception(
                        RuntimeError("DynamicBatcher closed"))
