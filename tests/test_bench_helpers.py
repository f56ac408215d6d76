"""bench.py helper coverage (CPU): the redraw guard and the analytic
slab accounting that backs the published MFU/overfetch numbers."""

import os
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _bench():
    sys.path.insert(0, ROOT)
    import bench

    return bench


def test_redraw_is_noop_on_cpu(monkeypatch):
    """The degraded-state re-exec must never trigger off-TPU (tests,
    dev boxes): on the cpu backend it returns the history untouched."""
    bench = _bench()
    monkeypatch.setenv("POINTGNN_BENCH_PROBES", "[12.5]")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe/exec must not run on cpu")

    monkeypatch.setattr(bench, "_chip_matmul_tflops", boom)
    monkeypatch.setattr(os, "execve", boom)
    assert bench._redraw_if_degraded() == []


def test_slab_accounting_consistency():
    """slab_accounting on a small real frame: useful <= walked FLOPs,
    overfetch multipliers >= 1, and the useful count matches an
    independent pointgnn_forward_flops call."""
    bench = _bench()
    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=512,
        cell_caps=(8, 16), per_center_caps=(8, 16),
    )
    pts, _ = synthetic_lidar_frame(seed=0)
    acct = bench.slab_accounting(cfg, spec, pts)
    assert acct["useful_fwd_flops"] > 0
    assert acct["walked_kernel_flops"] > 0
    assert acct["l1_overfetch_x"] >= 1.0
    assert acct["l0_overfetch_x"] >= 1.0
    # the per-pair chains dominate: walked kernel flops must exceed
    # useful edge flops whenever overfetch > 1 (they share the chains)
    assert acct["walked_kernel_flops"] >= 0.5 * acct["useful_fwd_flops"]
