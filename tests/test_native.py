"""Native C++ components: WORLD F0 vs the numpy implementation; ring buffer."""

import subprocess
import os

import numpy as np
import pytest

from alivevc_tpu.native_bindings import (
    NativeRingBuffer,
    dio_stonemask_native,
    native_available,
)
from alivevc_tpu.ops.world import dio, stonemask

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
    assert native_available()


def harmonic(f0_hz, fs, dur, seed=0):
    t = np.arange(int(fs * dur)) / fs
    rng = np.random.default_rng(seed)
    x = sum((1.0 / k) * np.sin(2 * np.pi * k * f0_hz * t + rng.uniform(0, 2 * np.pi))
            for k in range(1, 6))
    return (x / np.abs(x).max()).astype(np.float64)


@pytest.mark.parametrize("f0_true", [110.0, 220.0])
def test_native_dio_matches_python(f0_true):
    fs = 8000
    x = harmonic(f0_true, fs, 1.0)
    f0_py, t = dio(x, fs)
    f0_py = stonemask(x, f0_py, t, fs)
    f0_cpp = dio_stonemask_native(x, fs)
    assert f0_cpp.shape[0] == f0_py.shape[0]
    mid = slice(20, -20)
    voiced_py = f0_py[mid] > 0
    voiced_cpp = f0_cpp[mid] > 0
    # voicing decisions nearly identical; voiced values within 2 Hz
    assert (voiced_py == voiced_cpp).mean() > 0.95
    both = voiced_py & voiced_cpp
    assert np.abs(f0_py[mid][both] - f0_cpp[mid][both]).max() < 2.0
    assert abs(np.median(f0_cpp[mid][voiced_cpp]) - f0_true) < 2.0


def test_native_dio_speed():
    import time

    fs = 8000
    x = harmonic(150.0, fs, 2.0)
    t0 = time.perf_counter()
    dio_stonemask_native(x, fs)
    dt_cpp = time.perf_counter() - t0
    t0 = time.perf_counter()
    f0, t = dio(x, fs)
    stonemask(x, f0, t, fs)
    dt_py = time.perf_counter() - t0
    # sanity: native path must not be slower than numpy
    assert dt_cpp < dt_py


def test_ring_buffer_spsc():
    rb = NativeRingBuffer(4096)
    assert len(rb) == 0
    assert rb.pop(10) is None
    data = np.arange(1000, dtype=np.float32)
    rb.push(data)
    assert len(rb) == 1000
    out = rb.pop(600)
    np.testing.assert_array_equal(out, data[:600])
    assert len(rb) == 400
    rb.push(data)
    out = rb.pop(1400)
    np.testing.assert_array_equal(out, np.concatenate([data[600:], data]))
    assert rb.overruns == 0


def test_ring_buffer_overflow_drops_newest():
    rb = NativeRingBuffer(256)  # rounds to 256
    data = np.arange(300, dtype=np.float32)
    stored = rb.push(data)
    # push must report what was actually stored and never overwrite live data
    assert stored == 256
    assert rb.overruns == 44
    assert len(rb) == 256
    np.testing.assert_array_equal(rb.pop(256), data[:256])


def test_ring_buffer_concurrent_stress():
    """Producer/consumer threads hammer push/pop; the consumed stream must be
    the exact produced sequence (no torn reads, no loss with retries)."""
    import threading

    total = 1_000_000
    rb = NativeRingBuffer(1 << 12)
    seq = np.arange(total, dtype=np.float32)
    consumed = []
    stop = threading.Event()

    def producer():
        rng = np.random.default_rng(1)
        i = 0
        while i < total:
            n = int(rng.integers(1, 1500))
            chunk = seq[i : i + n]
            wrote = rb.push(chunk)
            i += wrote  # drop-newest + retry ⇒ lossless stream
        stop.set()

    def consumer():
        rng = np.random.default_rng(2)
        got = 0
        while got < total:
            n = min(int(rng.integers(1, 1500)), total - got)
            out = rb.pop(n)
            if out is None:
                if stop.is_set() and len(rb) < n:
                    n = len(rb)
                    if n == 0:
                        continue
                    out = rb.pop(n)
                    if out is None:
                        continue
                else:
                    continue
            consumed.append(out)
            got += len(out)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=60); tc.join(timeout=60)
    assert not tp.is_alive() and not tc.is_alive()
    stream = np.concatenate(consumed)
    np.testing.assert_array_equal(stream, seq)


def test_batch_labeler_equals_per_item():
    """The threaded batch labeler (alive_dio_stonemask_batch) must produce
    exactly the per-item native path's output — items are independent and
    the C++ worker pool only shards them."""
    import numpy as np
    import pytest

    from alivevc_tpu.native_bindings import native_available

    if not native_available():
        pytest.skip("native library not built")
    from alivevc_tpu.native_bindings import (
        dio_stonemask_native,
        dio_stonemask_native_batch,
    )

    fs, L = 8000, 8000
    t = np.arange(L) / fs
    waves = np.stack(
        [(0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
         for f in (110.0, 170.0, 230.0, 90.0)]
    )
    batch = dio_stonemask_native_batch(waves, fs, f0_floor=20.0, f0_ceil=4096.0)
    for i, w in enumerate(waves):
        item = dio_stonemask_native(w, fs, f0_floor=20.0, f0_ceil=4096.0)
        np.testing.assert_allclose(batch[i][: len(item)], item, rtol=0, atol=0)
