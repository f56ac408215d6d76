"""utils/thread_warnings: deferral of overflow warnings to the
consuming thread (the trainer's input-prefetch worker must not raise
warnings off the main thread — warnings filter contexts are not
thread-safe)."""

import warnings
from concurrent.futures import ThreadPoolExecutor

import pytest

from pointgnn_tpu.utils import thread_warnings


def test_direct_call_passes_through():
    with pytest.warns(RuntimeWarning, match="direct"):
        thread_warnings.warn("direct", RuntimeWarning)


def test_deferred_records_instead_of_warning():
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any real warning would raise
        with thread_warnings.deferred() as entries:
            thread_warnings.warn("held back", RuntimeWarning)
    assert entries == [("held back", RuntimeWarning)]
    # emit on the consuming side re-raises it
    with pytest.warns(RuntimeWarning, match="held back"):
        thread_warnings.emit(entries)


def test_deferral_is_thread_local():
    """A worker inside deferred() records; the main thread's own warn
    at the same time stays live (nothing global is mutated)."""

    def worker():
        with thread_warnings.deferred() as entries:
            thread_warnings.warn("worker-side", RuntimeWarning)
        return entries

    with ThreadPoolExecutor(1) as pool:
        fut = pool.submit(worker)
        with pytest.warns(RuntimeWarning, match="main-side"):
            thread_warnings.warn("main-side", RuntimeWarning)
        entries = fut.result()
    assert entries == [("worker-side", RuntimeWarning)]


def test_nested_deferred_restores_outer_sink():
    with thread_warnings.deferred() as outer:
        with thread_warnings.deferred() as inner:
            thread_warnings.warn("in", RuntimeWarning)
        thread_warnings.warn("out", RuntimeWarning)
    assert inner == [("in", RuntimeWarning)]
    assert outer == [("out", RuntimeWarning)]


def test_pack_points_overflow_defers(tmp_path):
    """The real producer: device_builder.pack_points' point-overflow
    warning is recorded (not raised) under deferred()."""
    import numpy as np

    from pointgnn_tpu.graph import device_builder as db

    xyz = np.zeros((16, 3), np.float32)
    attr = np.zeros((16, 1), np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        with thread_warnings.deferred() as entries:
            db.pack_points(xyz, attr, num_points=8)
    assert len(entries) == 1
    assert "point overflow" in entries[0][0]
    # and without deferral the same call warns as before
    with pytest.warns(RuntimeWarning, match="point overflow"):
        db.pack_points(xyz, attr, num_points=8)
