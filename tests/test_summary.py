"""Unit tests for train/summary.py (the TB-summaries component).

Reference contract: util/summary_util.py:6-17 — ``write_summary_scale``
caches one writer per directory and appends scalars.  This
implementation additionally guarantees a ``scalars.jsonl`` sink that
exists even without TensorBoard.
"""

import json
import os

from pointgnn_tpu.train import summary


def _read_jsonl(directory):
    with open(os.path.join(directory, "scalars.jsonl")) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_write_summary_scale_appends_jsonl(tmp_path):
    d = str(tmp_path / "train_dir")
    summary.write_summary_scale("loss/total", 0.5, 10, d)
    summary.write_summary_scale("loss/total", 0.25, 20, d)
    summary.flush(d)
    rows = _read_jsonl(d)
    assert [(r["key"], r["value"], r["step"]) for r in rows] == [
        ("loss/total", 0.5, 10),
        ("loss/total", 0.25, 20),
    ]
    assert all("time" in r for r in rows)


def test_writer_cached_per_directory(tmp_path):
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    summary.write_summary_scale("k", 1, 1, d1)
    f1 = summary._FILES[d1]
    summary.write_summary_scale("k", 2, 2, d1)
    assert summary._FILES[d1] is f1  # same cached handle, not reopened
    summary.write_summary_scale("k", 3, 3, d2)
    assert summary._FILES[d2] is not f1
    summary.flush()
    assert len(_read_jsonl(d1)) == 2
    assert len(_read_jsonl(d2)) == 1


def test_numpy_and_int_values_coerce(tmp_path):
    import numpy as np

    d = str(tmp_path / "c")
    summary.write_summary_scale("m", np.float32(0.125), np.int64(7), d)
    summary.flush(d)
    (row,) = _read_jsonl(d)
    assert row["value"] == 0.125 and row["step"] == 7


def test_tensorboard_event_file_written_when_available(tmp_path):
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401
    except Exception:
        return  # JSONL-only environments are a supported configuration
    d = str(tmp_path / "tb")
    summary.write_summary_scale("x", 1.0, 1, d)
    summary.flush(d)
    assert any(
        name.startswith("events.out.tfevents") for name in os.listdir(d)
    )
