"""Native KITTI AP evaluator: perfect detections score ~100, shifted
detections score lower, missing detections lower recall."""

import os
import subprocess

import numpy as np
import pytest

from pointgnn_tpu.postprocess import kitti_eval


def _gt_line(x, z, yaw=0.1, name="Car", occ=0, trunc=0.0, bbox_h=60):
    y1, y2 = 150.0, 150.0 + bbox_h
    return (
        "%s %.2f %d -0.2 300.0 %.1f 400.0 %.1f 1.6 1.8 4.0 %.2f 1.65 %.2f %.2f"
        % (name, trunc, occ, y1, y2, x, z, yaw)
    )


def _det_line(x, z, score, yaw=0.1, name="Car"):
    return (
        "%s -1 -1 -0.2 300.0 150.0 400.0 210.0 1.6 1.8 4.0 %.2f 1.65 %.2f %.2f %.4f"
        % (name, x, z, yaw, score)
    )


@pytest.fixture(scope="module")
def eval_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_eval")
    gt_dir = root / "gt"
    res_dir = root / "results"
    os.makedirs(gt_dir)
    os.makedirs(res_dir / "data")
    rng = np.random.default_rng(0)
    # the 41-point recall grid needs >= 41 GTs to fill; fewer GTs
    # leave trailing precision samples at 0 by protocol
    for f in range(20):
        name = "%06d.txt" % f
        gts, dets = [], []
        for k in range(3):
            x = float(rng.uniform(-15, 15))
            z = float(rng.uniform(10, 50))
            gts.append(_gt_line(x, z))
            dets.append(_det_line(x, z, score=float(rng.uniform(0.5, 1.0))))
        # one false positive far away, low score
        dets.append(_det_line(100.0, 100.0, score=0.01))
        (gt_dir / name).write_text("\n".join(gts) + "\n")
        (res_dir / "data" / name).write_text("\n".join(dets) + "\n")
    return str(gt_dir), str(res_dir)


def test_binary_builds():
    assert os.path.isfile(kitti_eval.binary_path())


def test_perfect_detections_score_high(eval_dirs):
    gt_dir, res_dir = eval_dirs
    results = kitti_eval.evaluate(gt_dir, res_dir)
    assert "Car_3d_moderate" in results
    for metric in ("detection", "bev", "3d"):
        for diff in ("easy", "moderate", "hard"):
            ap = results["Car_%s_%s" % (metric, diff)]["ap"]
            assert ap > 90, "Car_%s_%s = %.2f" % (metric, diff, ap)
    # stats file written
    assert os.path.isfile(os.path.join(res_dir, "stats_car_ap.txt"))


def test_shifted_detections_score_lower(eval_dirs, tmp_path):
    gt_dir, _ = eval_dirs
    res_dir = tmp_path / "shifted"
    os.makedirs(res_dir / "data")
    rng = np.random.default_rng(0)
    for f in range(20):
        name = "%06d.txt" % f
        dets = []
        for k in range(3):
            x = float(rng.uniform(-15, 15))
            z = float(rng.uniform(10, 50))
            rng.uniform(0.5, 1.0)  # keep rng stream aligned with fixture
            # shift by 2.5m: 3D IoU well below 0.7
            dets.append(_det_line(x + 2.5, z, score=0.9))
        (res_dir / "data" / name).write_text("\n".join(dets) + "\n")
    results = kitti_eval.evaluate(gt_dir, str(res_dir))
    assert results["Car_3d_moderate"]["ap"] < 10
    # 2D is unchanged (same bbox) so detection AP stays high
    assert results["Car_detection_moderate"]["ap"] > 90


def test_van_detection_not_penalized(tmp_path):
    # detections on Van gts are ignored for Car, not false positives
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    os.makedirs(gt_dir)
    os.makedirs(res_dir / "data")
    rng = np.random.default_rng(1)
    for f in range(20):
        name = "%06d.txt" % f
        gts, dets = [], []
        for k in range(3):
            x = float(rng.uniform(-15, 15))
            z = float(rng.uniform(10, 50))
            gts.append(_gt_line(x, z))
            dets.append(_det_line(x, z, score=float(rng.uniform(0.5, 1.0))))
        # a Van gt with a matching detection: ignored, not a FP
        gts.append(_gt_line(0.0, 60.0, name="Van"))
        dets.append(_det_line(0.0, 60.0, score=0.95))
        (gt_dir / name).write_text("\n".join(gts) + "\n")
        (res_dir / "data" / name).write_text("\n".join(dets) + "\n")
    results = kitti_eval.evaluate(str(gt_dir), str(res_dir))
    assert results["Car_3d_easy"]["ap"] > 90


def test_stale_binary_detection(tmp_path):
    """Committed binaries must be rebuilt when cpp/ sources are newer
    (the staleness check both loaders use before trusting lib/)."""
    import time

    from pointgnn_tpu.graph._native import stale

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    target = tmp_path / "out.so"
    # missing target -> stale
    assert stale(str(target), str(src_dir))
    target.write_bytes(b"x")
    (src_dir / "a.cpp").write_text("// old")
    old = time.time() - 100
    os.utime(src_dir / "a.cpp", (old, old))
    assert not stale(str(target), str(src_dir))
    # touch the source newer than the target -> stale
    new = os.path.getmtime(target) + 100
    os.utime(src_dir / "a.cpp", (new, new))
    assert stale(str(target), str(src_dir))
    # non-source files never trigger rebuilds
    os.utime(src_dir / "a.cpp", (old, old))
    (src_dir / "notes.txt").write_text("irrelevant")
    assert not stale(str(target), str(src_dir))
