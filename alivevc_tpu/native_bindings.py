"""ctypes bindings for the native C++ runtime pieces (native/*.cpp).

  * ``dio_stonemask_native`` — C++ WORLD-style F0 labeler (same algorithm as
    ops/world.py; ~50x faster for dataset preparation)
  * ``NativeRingBuffer`` — lock-free SPSC ring for the realtime audio thread

The library is built with ``make -C native`` (g++, no external deps).  All
callers fall back to the Python implementations when the .so is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "libalivevc_native.so"),
    "libalivevc_native.so",
]

_lib: Optional[ctypes.CDLL] = None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        lib.alive_dio_stonemask.restype = ctypes.c_int32
        lib.alive_dio_stonemask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        try:
            lib.alive_dio_stonemask_batch.restype = ctypes.c_int32
            lib.alive_dio_stonemask_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ]
        except AttributeError:   # older .so without the batch entry
            pass
        lib.alive_ring_create.restype = ctypes.c_void_p
        lib.alive_ring_create.argtypes = [ctypes.c_int64]
        lib.alive_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.alive_ring_size.restype = ctypes.c_int64
        lib.alive_ring_size.argtypes = [ctypes.c_void_p]
        lib.alive_ring_push.restype = ctypes.c_int64
        lib.alive_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
        ]
        lib.alive_ring_pop.restype = ctypes.c_int64
        lib.alive_ring_pop.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
        ]
        lib.alive_ring_overruns.restype = ctypes.c_int64
        lib.alive_ring_overruns.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib
    return None


def native_available() -> bool:
    return load_native() is not None


def dio_stonemask_native(
    x: np.ndarray,
    fs: int,
    f0_floor: float = 40.0,
    f0_ceil: float = 800.0,
    frame_period_ms: float = 5.0,
    channels_in_octave: float = 2.0,
    allowed_range: float = 0.1,
) -> np.ndarray:
    """x [L] float → f0 [F] Hz (0 = unvoiced), F ≈ duration/frame_period."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built — run `make -C native`")
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    n_frames_max = int(len(x32) / fs * 1000.0 / frame_period_ms) + 2
    out = np.zeros(n_frames_max, dtype=np.float64)
    n = lib.alive_dio_stonemask(
        x32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x32), fs, f0_floor, f0_ceil, frame_period_ms,
        channels_in_octave, allowed_range,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out[:n]


def dio_stonemask_native_batch(
    x: np.ndarray,            # [N, L] float
    fs: int,
    f0_floor: float = 40.0,
    f0_ceil: float = 800.0,
    frame_period_ms: float = 5.0,
    channels_in_octave: float = 2.0,
    allowed_range: float = 0.1,
    n_threads: int = 0,       # 0 = hardware_concurrency
) -> np.ndarray:
    """Threaded batch labeler: [N, L] → f0 [N, F] Hz (0 = unvoiced).

    Items are independent, so the C++ side shards them over a worker pool —
    the dataset-preparation path (WaveChunkDataset with_f0) goes from one
    core to all of them."""
    lib = load_native()
    if lib is None or not hasattr(lib, "alive_dio_stonemask_batch"):
        raise RuntimeError("native batch labeler not built — run `make -C native`")
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    n_items, item_len = x32.shape
    frames = int(item_len / fs * 1000.0 / frame_period_ms) + 1
    out = np.zeros((n_items, frames), dtype=np.float64)
    got = lib.alive_dio_stonemask_batch(
        x32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_items, item_len, fs, f0_floor, f0_ceil, frame_period_ms,
        channels_in_octave, allowed_range,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_threads,
    )
    if got != frames:
        raise RuntimeError(f"batch labeler returned {got}, expected {frames}")
    return out


class NativeRingBuffer:
    """Lock-free SPSC sample ring for the realtime audio path."""

    def __init__(self, capacity_samples: int):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library not built — run `make -C native`")
        self._lib = lib
        self._h = lib.alive_ring_create(capacity_samples)
        if not self._h:
            raise MemoryError("ring buffer allocation failed")

    def push(self, samples: np.ndarray) -> int:
        """Push up to ``len(samples)``; returns the count actually stored.

        On overflow the newest samples are dropped (the producer never
        writes past ``tail + capacity``), so a concurrent ``pop`` can never
        observe a torn read; dropped samples are tallied in ``overruns``.
        """
        s = np.ascontiguousarray(samples, dtype=np.float32)
        return self._lib.alive_ring_push(
            self._h, s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s)
        )

    def pop(self, n: int) -> Optional[np.ndarray]:
        out = np.empty(n, dtype=np.float32)
        got = self._lib.alive_ring_pop(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out if got == n else None

    def __len__(self) -> int:
        return int(self._lib.alive_ring_size(self._h))

    @property
    def overruns(self) -> int:
        return int(self._lib.alive_ring_overruns(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.alive_ring_destroy(self._h)
            self._h = None
