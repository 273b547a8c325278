"""ctypes bindings for the native C++ record streamer (native/recordio.cpp).

Builds librecordio.so on first use (g++ -O3, cached next to the source) and
falls back cleanly: callers should catch NativeUnavailable and use the
numpy-memmap path (hand3d_tpu.data.codec.FixedLenRecordFile).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "recordio.cpp"))
_LIB = os.path.abspath(os.path.join(_NATIVE_DIR, "librecordio.so"))

_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build():
    # compile to a private temp name, then atomically rename into place:
    # concurrent builds from several processes (fresh checkout, multi-host
    # launch) each produce a complete .so and the rename is last-wins —
    # never a partially written ELF for a peer to dlopen
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp,
        "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
    except FileNotFoundError as e:  # no g++ on this machine
        raise NativeUnavailable(f"g++ not found: {e}") from e
    if proc.returncode != 0:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise NativeUnavailable(f"g++ build failed:\n{proc.stderr}")
    os.replace(tmp, _LIB)


def load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SRC):
            raise NativeUnavailable(f"missing source: {_SRC}")
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.rr_open.restype = ctypes.c_void_p
        lib.rr_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.rr_num_records.restype = ctypes.c_int64
        lib.rr_num_records.argtypes = [ctypes.c_void_p]
        lib.rr_reset.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rr_next.restype = ctypes.c_int64
        lib.rr_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class NativeRecordReader:
    """Streams shuffled record batches assembled by C++ threads.

    Args mirror the pipeline: record_dtype (numpy structured dtype defining
    the record), batch_size, shuffle, seed, drop_remainder.
    """

    def __init__(self, path, record_dtype, batch_size, shuffle=True, seed=0,
                 drop_remainder=True, num_threads=2, queue_capacity=4):
        self._lib = load_library()
        self.dtype = record_dtype
        self.batch_size = batch_size
        self._handle = self._lib.rr_open(
            str(path).encode(), record_dtype.itemsize, batch_size,
            int(shuffle), seed, int(drop_remainder), num_threads,
            queue_capacity,
        )
        if not self._handle:
            raise NativeUnavailable(f"rr_open failed for {path}")
        self.num_records = self._lib.rr_num_records(self._handle)
        self._buf = np.empty(batch_size, dtype=record_dtype)
        self._idx = np.empty(batch_size, dtype=np.int64)

    def reset(self, epochs=-1):
        """Arm the producers for ``epochs`` passes (-1 = stream forever)."""
        self._lib.rr_reset(self._handle, epochs)

    def next_batch(self):
        """Returns (records, indices) copies, or None when drained.

        Batches arrive in the deterministic claimed order (same seed ->
        same stream, independent of native worker scheduling)."""
        n = self._lib.rr_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.c_char_p),
            self._idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n < 0:
            raise IOError(
                "native record streamer hit a short read (truncated or "
                "concurrently modified file?)"
            )
        if n == 0:
            return None
        return self._buf[:n].copy(), self._idx[:n].copy()

    def close(self):
        if self._handle:
            self._lib.rr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
