"""End-to-end test of the reference-parity runner on a synthetic
TF-layout checkpoint dump.

The .npz fixture is constructed with HAND-WRITTEN slim variable names
(the reference's tf.variable_scope nesting, models/gnn.py:34-163) — not
via train/convert.py's own name map — so the converter is exercised
against an independently-built checkpoint, not a self-round-trip."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pointgnn_tpu import configs

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fixture_npz(path, rng):
    """car T=1 checkpoint in the reference's exact variable layout."""
    shapes = {
        # layer1: PointSetPooling — point MLP (in 1 feature + 3 rel
        # coords) under extract_vertex_features, output MLP under
        # combined_features (gnn.py:258, 268)
        "layer1/extract_vertex_features/fully_connected": (4, 32),
        "layer1/extract_vertex_features/fully_connected_1": (32, 64),
        "layer1/extract_vertex_features/fully_connected_2": (64, 128),
        "layer1/extract_vertex_features/fully_connected_3": (128, 300),
        "layer1/combined_features/fully_connected": (300, 300),
        "layer1/combined_features/fully_connected_1": (300, 300),
        # layer2: GraphNetAutoCenter — auto-offset MLP at layer scope
        # (gnn.py:341-346), edge MLP under extract_vertex_features
        # (input 300 features + 3 rel coords), update MLP under
        # combined_features
        "layer2/fully_connected": (300, 64),
        "layer2/fully_connected_1": (64, 3),
        "layer2/extract_vertex_features/fully_connected": (303, 300),
        "layer2/extract_vertex_features/fully_connected_1": (300, 300),
        "layer2/combined_features/fully_connected": (300, 300),
        "layer2/combined_features/fully_connected_1": (300, 300),
        # output: ClassAwarePredictor — shared cls head + 4 per-class
        # loc heads (gnn.py:146-163), 7-dof box encoding
        "output/predictor/cls/fully_connected": (300, 64),
        "output/predictor/cls/fully_connected_1": (64, 4),
    }
    for ci in range(4):
        p = "output/predictor/loc/cls_%d" % ci
        shapes[p + "/fully_connected"] = (300, 64)
        shapes[p + "/fully_connected_1"] = (64, 64)
        shapes[p + "/fully_connected_2"] = (64, 7)
    arrays = {}
    for prefix, (fan_in, fan_out) in shapes.items():
        arrays[prefix + "/weights"] = (
            rng.normal(0, 0.05, (fan_in, fan_out)).astype(np.float32)
        )
        arrays[prefix + "/biases"] = np.zeros(fan_out, np.float32)
    # decoys a real TF checkpoint carries — the converter must skip them
    arrays["global_step"] = np.int64(1400000)
    arrays["layer1/combined_features/fully_connected/weights/Momentum"] = (
        rng.normal(0, 1, (300, 300)).astype(np.float32)
    )
    np.savez(path, **arrays)
    return shapes


def test_parity_runner_end_to_end(tmp_path):
    rng = np.random.default_rng(7)
    npz = str(tmp_path / "car_T1.npz")
    _fixture_npz(npz, rng)

    kitti_root = str(tmp_path / "kitti")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/make_synthetic_kitti.py"),
         kitti_root, "2"],
        check=True,
    )
    cfg_path = str(tmp_path / "ref_config")
    with open(cfg_path, "w") as f:
        json.dump(configs.model_config("Car", T=1), f)

    work = str(tmp_path / "parity")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools/validate_reference_parity.py"),
            npz, cfg_path,
            "--dataset_root_dir", kitti_root,
            "--dataset_split_file",
            os.path.join(kitti_root, "3DOP_splits/val.txt"),
            "--workdir", work,
            "--capacity", "8192,2048,2048:32768,65536",
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # 26 hand-written (w, b) pairs -> 52 arrays; the decoys are skipped
    assert "converted 52 arrays" in out.stdout, out.stdout
    report = json.load(open(os.path.join(work, "parity_report.json")))
    assert report["baseline"]["Car_3d"][1] == 79.47
    assert os.path.isfile(os.path.join(work, "results/data/000000.txt"))
    # the converted checkpoint is a regular orbax dir: run.py's
    # contract (config + weights) holds
    assert os.path.isfile(os.path.join(work, "train_dir/config"))


def test_gate_fails_on_vacuous_runs():
    """A requested AP gate over ZERO produced metrics must fail — the
    evaluator emits no rows for classes without ground truths, so a
    mis-pointed dataset would otherwise certify parity (exit 0)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from validate_reference_parity import score_against_baseline

    rows, failed, messages = score_against_baseline({}, 78.9)
    assert failed and not rows and "no moderate-3D" in messages[0]
    # report-only mode stays permissive on empty results
    _, failed, _ = score_against_baseline({}, -1.0)
    assert not failed
    # gate passes / fails on real rows
    ok = {"Car_3d_moderate": {"ap": 80.0, "ap_r40": 80.0}}
    _, failed, _ = score_against_baseline(ok, 78.9)
    assert not failed
    _, failed, msgs = score_against_baseline(ok, 85.0)
    assert failed and "Car_3d_moderate" in msgs[0]


def test_evaluator_binary_survives_failed_rebuild(monkeypatch):
    """When the C++ sources look newer but the rebuild fails (no
    toolchain), a present committed binary must still be used (warn),
    not crash the whole evaluation."""
    import warnings

    from pointgnn_tpu.postprocess import kitti_eval

    monkeypatch.setattr(
        "pointgnn_tpu.graph._native.stale", lambda *a: True
    )

    def broken_make(*a, **k):
        raise FileNotFoundError("make: not found")

    monkeypatch.setattr(kitti_eval.subprocess, "run", broken_make)
    assert os.path.isfile(kitti_eval._BINARY)  # committed binary
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        path = kitti_eval.binary_path()
    assert path == kitti_eval._BINARY
    assert any("rebuild failed" in str(w.message) for w in caught)


def test_converter_rejects_incomplete_dumps(tmp_path):
    """A dump missing variables must fail loudly, naming them."""
    from pointgnn_tpu.train.convert import convert_reference_weights

    rng = np.random.default_rng(0)
    npz = str(tmp_path / "partial.npz")
    shapes = _fixture_npz(npz, rng)
    tf_vars = dict(np.load(npz))
    del tf_vars["layer2/extract_vertex_features/fully_connected/weights"]
    cfg = configs.model_config("Car", T=1)
    with pytest.raises(KeyError, match="extract_vertex_features"):
        convert_reference_weights(
            tf_vars, cfg["model_kwargs"]["layer_configs"],
            cfg["num_classes"],
        )
    # sanity: the full fixture covers every name the converter uses
    from pointgnn_tpu.train.convert import used_variable_names

    used = set(used_variable_names(
        cfg["model_kwargs"]["layer_configs"], cfg["num_classes"]
    ))
    have = set(np.load(npz).keys())
    assert used <= have, sorted(used - have)[:5]


def test_kitti_tail_byte_parity_with_reference_replay():
    """``detections_to_kitti_labels`` + ``format_kitti_lines`` must emit
    BYTE-identical label text to the oracle's independent numpy replay
    of run.py:360-433 on identical NMS survivors.  This is the gate the
    parity oracle applies per frame; here it runs TF-free on random
    detections covering the truncation drop, the empty-inlier occlusion
    case, and both label families."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from oracle_reference_parity import (
        make_synthetic_calib,
        ref_format_lines,
        ref_tail_replay,
    )

    from pointgnn_tpu.infer import (
        detections_to_kitti_labels,
        format_kitti_lines,
    )

    calib = make_synthetic_calib()
    rng = np.random.default_rng(7)
    for method, n_cls in (("Car", 4), ("Pedestrian_and_Cyclist", 6)):
        for trial in range(4):
            n = int(rng.integers(0, 8))
            boxes = np.zeros((n, 7))
            boxes[:, 0] = rng.normal(0, 6, n)          # some project
            boxes[:, 1] = rng.normal(1.6, 0.3, n)      # off-image ->
            boxes[:, 2] = rng.uniform(3, 60, n)        # truncation drop
            boxes[:, 3] = rng.uniform(0.5, 4.5, n)
            boxes[:, 4] = rng.uniform(1.0, 2.0, n)
            boxes[:, 5] = rng.uniform(0.4, 2.0, n)
            boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
            cls = rng.integers(1, n_cls - 1, n)
            scores = rng.uniform(1.0 / n_cls, 1.0, n)
            # sparse hypothesis set: some boxes get zero inliers (the
            # occlusion==0 branch)
            hyp = np.vstack(
                [boxes[: n // 2, :3] + rng.normal(0, 0.3, (n // 2, 3)),
                 rng.normal(0, 30, (20, 3))]
            ).astype(np.float32)
            ours = detections_to_kitti_labels(
                method, cls, boxes, scores, calib, {"hyp_xyz": hyp}
            )
            replay = ref_tail_replay(method, cls, boxes, scores, calib, hyp)
            assert format_kitti_lines(ours) == ref_format_lines(replay), (
                method, trial,
            )


def test_survivor_set_diff_is_order_free_and_catches_mismatch():
    """The oracle's survivor comparison must tolerate rank swaps from
    near-equal scores (greedy NMS emits in score order; ~1e-5
    cross-side noise legitimately permutes ties) while still flagging
    genuinely different survivor sets."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from oracle_reference_parity import survivor_set_diff

    cls_a = np.array([1, 1, 3])
    boxes_a = np.array([
        [0.0, 1.0, 10.0, 4, 1.5, 1.6, 0.1],
        [5.0, 1.0, 20.0, 4, 1.5, 1.6, 0.2],
        [-3.0, 1.0, 15.0, 1, 1.7, 0.6, 0.0],
    ])
    scores_a = np.array([0.9, 0.9000001, 0.5])
    # same set, ranks 0/1 swapped, values off by fp noise
    perm = [1, 0, 2]
    ok, mb, ms = survivor_set_diff(
        cls_a[perm], boxes_a[perm] + 1e-7, scores_a[perm],
        cls_a, boxes_a, scores_a,
    )
    assert ok and mb <= 1e-6 and ms <= 1e-6, (ok, mb, ms)
    # genuinely different box: matched pairing still succeeds but the
    # max diff explodes past any gate
    boxes_b = boxes_a.copy()
    boxes_b[0, 0] += 2.5
    ok, mb, _ = survivor_set_diff(
        cls_a, boxes_a, scores_a, cls_a, boxes_b, scores_a
    )
    assert ok and mb > 1.0
    # different class multiset -> hard mismatch
    cls_b = np.array([1, 3, 3])
    ok, mb, _ = survivor_set_diff(
        cls_a, boxes_a, scores_a, cls_b, boxes_a, scores_a
    )
    assert not ok


def test_calibrate_bg_bias_hits_target_count():
    """The spread-leg bias search must land ~target survivors above the
    strict prob > 1/C gate for an arbitrary logit distribution."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from oracle_reference_parity import calibrate_bg_bias

    rng = np.random.default_rng(3)
    for n_cls, scale in ((4, 2.0), (6, 5.0)):
        logits = rng.normal(0, scale, (1500, n_cls))
        b = calibrate_bg_bias(logits, target_survivors=40)
        z = logits.copy()
        z[:, 0] += b
        z[:, -1] += b
        e = np.exp(z - z.max(1, keepdims=True))
        p = e / e.sum(1, keepdims=True)
        count = int((p[:, 1:-1] > 1.0 / n_cls).sum())
        assert 10 <= count <= 160, (n_cls, b, count)
