"""Input-pipeline throughput benchmark.

Answers ROADMAP's "verify the native streamer hides IO under real training":
generates a training-scale synthetic RHD .bin (reference record layout,
data/codec.RHD_RECORD_DTYPE, ~410 KB/record — same bytes/record as
BinaryDbReader.py:104-124), then measures host-side record throughput of

  1. the native C++ streamer (native/recordio.cpp: mmap + shuffled batch
     assembly on worker threads), and
  2. the numpy memmap gather path (data/codec.FixedLenRecordFile),

and compares both against the training-step demand (PoseNet step at the
reference batch 8 runs ~34 ms on one v5e chip => ~235 records/s; pass
--step-ms to use a different measured step time).

Files are created immediately before measurement, so this measures the
page-cache-hot decode/shuffle/assembly path — the steady-state regime of
epoch >= 2 training, and the pipeline software overhead we control. Cold
first-epoch throughput is disk-bound and out of scope.

Usage: python tools/bench_input.py [--records 256] [--batch 8] [--step-ms 34]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hand3d_tpu.data.codec import RHD_RECORD_DTYPE, FixedLenRecordFile


def make_bin(path, num_records, seed=0):
    """Random-bytes records in the reference layout (IO cost is layout-
    independent; content only matters to decode parity tests, not here)."""
    rng = np.random.RandomState(seed)
    rec = np.zeros(num_records, dtype=RHD_RECORD_DTYPE)
    rec["image"] = rng.randint(0, 255, rec["image"].shape, dtype=np.uint8)
    rec.tofile(path)
    return os.path.getsize(path)


def bench_native(path, batch, epochs=3):
    from hand3d_tpu.data.native import NativeRecordReader

    reader = NativeRecordReader(
        path, RHD_RECORD_DTYPE, batch, shuffle=True, seed=1
    )
    try:
        # warm-up epoch (thread spin-up, page cache)
        reader.reset(epochs=1)
        while reader.next_batch() is not None:
            pass
        reader.reset(epochs=epochs)
        n = 0
        t0 = time.perf_counter()
        while True:
            out = reader.next_batch()
            if out is None:
                break
            n += len(out[0])
        dt = time.perf_counter() - t0
    finally:
        reader.close()
    return n / dt


def bench_memmap(path, batch, epochs=3):
    f = FixedLenRecordFile(path, RHD_RECORD_DTYPE)
    rng = np.random.RandomState(1)
    # warm-up
    f.gather(rng.permutation(len(f))[:batch])
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        order = rng.permutation(len(f))
        for i in range(0, len(f) - batch + 1, batch):
            rec = f.gather(order[i : i + batch])
            n += len(rec)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--step-ms", type=float, default=34.0,
                    help="measured train-step time at --batch (ms)")
    ap.add_argument("--keep", help="write the .bin here and keep it")
    args = ap.parse_args()

    path = args.keep or os.path.join(
        tempfile.mkdtemp(prefix="hand3d_inbench_"), "rhd_big.bin"
    )
    size = make_bin(path, args.records)
    demand = args.batch / (args.step_ms / 1e3)

    results = {
        "records": args.records,
        "record_kb": RHD_RECORD_DTYPE.itemsize / 1024,
        "file_mb": size / 1e6,
        "batch": args.batch,
        "train_demand_rec_s": round(demand, 1),
    }
    try:
        rs = bench_native(path, args.batch)
        results["native_rec_s"] = round(rs, 1)
        results["native_gb_s"] = round(rs * RHD_RECORD_DTYPE.itemsize / 1e9, 2)
        results["native_headroom_x"] = round(rs / demand, 1)
    except Exception as e:  # NativeUnavailable or build failure
        results["native_error"] = str(e)
    rs = bench_memmap(path, args.batch)
    results["memmap_rec_s"] = round(rs, 1)
    results["memmap_gb_s"] = round(rs * RHD_RECORD_DTYPE.itemsize / 1e9, 2)
    results["memmap_headroom_x"] = round(rs / demand, 1)

    if not args.keep:
        os.unlink(path)
        os.rmdir(os.path.dirname(path))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
