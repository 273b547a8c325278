"""Host -> device input pipeline with background prefetch.

Replaces the reference's TF queue runners + shuffle_batch_join
(BinaryDbReader.py:394-408, started at e.g. training_handsegnet.py:52): a
daemon thread slices raw record batches out of the memmap and pushes them to
a bounded queue; the consumer device_puts them (optionally sharded over the
"data" mesh axis) and runs the jitted on-device preprocess. Queue depth 2
double-buffers host IO against device compute.
"""

import queue
import threading

import jax
import numpy as np

from hand3d_tpu.data.preprocess import preprocess_rhd, preprocess_stb
from hand3d_tpu.data.rhd import RHDDataset


class _ProducerError:
    """Queue sentinel carrying a background-thread exception to the
    consumer (which would otherwise block in q.get() forever)."""

    def __init__(self, exc):
        self.exc = exc


def epoch_indices(num_samples, batch_size, shuffle, seed, drop_remainder=True,
                  process_shard=(0, 1)):
    """Batched index arrays for one epoch.

    ``process_shard=(i, n)``: take the i-th of n disjoint strided slices of
    the (identically seeded, hence identical across hosts) epoch
    permutation — multi-host data loading where every process reads only
    its own records. Shards are disjoint, and every shard is truncated to
    the same floor(N/n) length so all hosts run identical step counts per
    epoch (a one-record length skew would desynchronize lock-step
    collectives); up to n-1 trailing records of the permutation are
    dropped per epoch, a different subset each epoch under shuffling.
    """
    idx = np.arange(num_samples)
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    pidx, pcount = process_shard
    if pcount > 1:
        idx = idx[pidx::pcount][: num_samples // pcount]
    if drop_remainder:
        n = (len(idx) // batch_size) * batch_size
        idx = idx[:n]
    else:
        pad = (-len(idx)) % batch_size
        # np.resize tiles idx cyclically, so this also covers
        # batch_size > 2 * num_samples (idx[:pad] would come up short)
        idx = np.concatenate([idx, np.resize(idx, pad)]) if pad else idx
    return idx.reshape(-1, batch_size)


class InputPipeline:
    """Iterates preprocessed device batches from an RHD/STB dataset.

    Args:
      dataset: RHDDataset or STBDataset.
      cfg: PreprocessConfig (selects derived features/augmentations).
      batch_size: per-step global batch.
      shuffle: reshuffle every epoch.
      seed: shuffle + augmentation seed.
      sharding: optional jax.sharding.Sharding for the raw batch arrays
        (e.g. parallel.mesh.batch_sharding(mesh) for DP).
      prefetch: host-side queue depth.
      process_shard: multi-host data loading. None (default) auto-detects
        (jax.process_index(), jax.process_count()); pass an explicit
        (index, count) to override (or to test sharding single-process).
        With count > 1, ``batch_size`` is the PER-PROCESS batch, each
        process reads a disjoint strided shard of the identically-seeded
        epoch permutation, and device placement goes through
        jax.make_array_from_process_local_data so the global array's
        "data"-axis shards come from each process's local batch.
    """

    def __init__(self, dataset, cfg, batch_size, shuffle=True, seed=0,
                 sharding=None, prefetch=2, use_native=False, yield_raw=False,
                 process_shard=None):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        self.use_native = use_native
        if process_shard is None:
            process_shard = (jax.process_index(), jax.process_count())
            if process_shard[1] > 1 and sharding is None:
                # per-process shards WITHOUT global-array assembly would
                # silently train n independent models on 1/n of the data
                # each — demand an explicit choice instead
                raise ValueError(
                    f"{jax.process_count()} jax processes but no "
                    "``sharding``: pass a mesh batch sharding (global "
                    "arrays, synchronized DP training) or an explicit "
                    "process_shard to opt into independent per-host "
                    "iteration"
                )
        pidx, pcount = process_shard
        assert 0 <= pidx < pcount, process_shard
        self.process_shard = (int(pidx), int(pcount))
        # yield_raw: skip on-pipeline preprocessing and yield the raw record
        # dict (device-resident) — used by fused train steps that run
        # preprocess inside the same jitted program as fwd/bwd/update
        self.yield_raw = yield_raw
        self._preprocess = (
            preprocess_rhd if isinstance(dataset, RHDDataset) else preprocess_stb
        )

    def _emit(self, raw, key):
        if self.yield_raw:
            return raw
        return self._preprocess(self.cfg, raw, key)

    def _shard_len(self):
        # every process's shard is truncated to the same length (see
        # epoch_indices) so step counts agree across hosts
        return len(self.dataset) // self.process_shard[1]

    def _place(self, raw):
        if self.sharding is None:
            return raw
        shardings = jax.tree_util.tree_map(lambda _: self.sharding, raw)
        # keyed on the actual runtime topology, not process_shard: explicit
        # (i, n) shards on a single process (tests) still device_put locally
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x, s: jax.make_array_from_process_local_data(
                    s, np.asarray(x)
                ),
                raw, shardings,
            )
        return jax.device_put(raw, shardings)

    def steps_per_epoch(self):
        steps = self._shard_len() // self.batch_size
        if steps == 0:
            raise ValueError(
                f"batch_size {self.batch_size} exceeds this process's "
                f"dataset shard ({self._shard_len()} of "
                f"{len(self.dataset)} records): every epoch would yield "
                "zero batches"
            )
        return steps

    def __iter__(self):
        return self.iterate(epochs=1)

    def iterate(self, epochs=None, start_epoch=0, skip_steps=0):
        """Yield feature dicts; ``epochs=None`` iterates forever.

        ``start_epoch``/``skip_steps`` resume the stream mid-run: the first
        yielded batch is step ``skip_steps`` of epoch ``start_epoch``, with
        exactly the shuffle order and augmentation keys an uninterrupted
        run would have used there (train.loop.fit derives both from the
        restored step counter on --resume)."""
        spe = self.steps_per_epoch()  # validate batch size vs dataset
        assert 0 <= skip_steps < spe, (
            f"skip_steps {skip_steps} outside epoch of {spe} steps "
            "(fold whole epochs into start_epoch)"
        )
        if (self.use_native and start_epoch == 0 and skip_steps == 0
                and self.process_shard[1] == 1):
            # the native streamer owns its shuffle state: it cannot resume
            # from a later epoch's order/keys, and its order is unsharded —
            # resumed or multi-host iteration uses the threaded path (which
            # honors start_epoch/skip_steps and the per-process epoch shard
            # exactly)
            native_it = self._iterate_native(epochs)
            if native_it is not None:
                yield from native_it
                return
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                epoch = start_epoch
                while not stop.is_set() and (
                        epochs is None or epoch < start_epoch + epochs):
                    batches = epoch_indices(
                        len(self.dataset), self.batch_size, self.shuffle,
                        self.seed + epoch, process_shard=self.process_shard,
                    )
                    first = skip_steps if epoch == start_epoch else 0
                    for step, idx in enumerate(batches):
                        if step < first:
                            continue
                        if stop.is_set():
                            return
                        raw = self.dataset.raw_batch(idx)
                        q.put((epoch, step, raw))
                    epoch += 1
                q.put(None)
            except BaseException as e:  # propagate: a silent death would
                # leave the consumer blocked in q.get() forever
                q.put(_ProducerError(e))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        base_key = jax.random.PRNGKey(self.seed)
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, _ProducerError):
                    raise RuntimeError(
                        "input-pipeline producer thread failed"
                    ) from item.exc
                epoch, step, raw = item
                raw = self._place(raw)
                key = None
                if self.cfg.needs_rng:
                    key = jax.random.fold_in(
                        jax.random.fold_in(base_key, epoch), step
                    )
                    if self.process_shard[1] > 1:
                        # distinct augmentation noise per host
                        key = jax.random.fold_in(key, self.process_shard[0])
                yield self._emit(raw, key)
        finally:
            stop.set()
            # drain so the producer can observe the stop flag
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def _iterate_native(self, epochs):
        """C++ streamer path: shuffling, pread and batch assembly happen on
        native threads (see native/recordio.cpp). Returns None if the native
        library can't be built/loaded, so iterate() falls back to the
        threaded-memmap path."""
        try:
            from hand3d_tpu.data.native import NativeRecordReader
        except Exception:
            return None
        try:
            reader = NativeRecordReader(
                self.dataset.path, self.dataset.records.dtype, self.batch_size,
                shuffle=self.shuffle, seed=self.seed,
                queue_capacity=max(2, self.prefetch),
            )
        except Exception:
            return None

        def gen():
            base_key = jax.random.PRNGKey(self.seed)
            steps_per_epoch = self.steps_per_epoch()  # >= 1 (validated)
            try:
                reader.reset(-1 if epochs is None else epochs)
                step_total = 0
                while True:
                    item = reader.next_batch()
                    if item is None:
                        return
                    recs, _ = item
                    raw = self._place(self.dataset.raw_from_records(recs))
                    key = None
                    if self.cfg.needs_rng:
                        epoch, step = divmod(step_total, steps_per_epoch)
                        key = jax.random.fold_in(
                            jax.random.fold_in(base_key, epoch), step
                        )
                    step_total += 1
                    yield self._emit(raw, key)
            finally:
                reader.close()

        return gen()
