"""Scalar summary logging (TensorBoard when available, JSONL always).

Replaces the reference's cached tf.summary FileWriter
(/root/reference/util/summary_util.py:6-17): one writer per directory,
``write_summary_scale(key, value, step, dir)`` API preserved.  Scalars
are always appended to ``<dir>/scalars.jsonl`` so runs are inspectable
without TensorBoard; a ``torch.utils.tensorboard`` event file is written
too when the package is importable.
"""

import json
import os
import time
from typing import Dict

_WRITERS: Dict[str, object] = {}
_FILES: Dict[str, object] = {}


def _tb_writer(directory: str):
    if directory in _WRITERS:
        return _WRITERS[directory]
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=directory)
    except Exception:
        writer = None
    _WRITERS[directory] = writer
    return writer


def _jsonl(directory: str):
    if directory not in _FILES:
        os.makedirs(directory, exist_ok=True)
        _FILES[directory] = open(
            os.path.join(directory, "scalars.jsonl"), "a"
        )
    return _FILES[directory]


def write_summary_scale(key: str, value, step: int, directory: str):
    """summary_util.py:6-17 API parity."""
    writer = _tb_writer(directory)
    if writer is not None:
        writer.add_scalar(key, float(value), int(step))
    f = _jsonl(directory)
    f.write(
        json.dumps(
            {
                "key": key,
                "value": float(value),
                "step": int(step),
                "time": time.time(),
            }
        )
        + "\n"
    )
    f.flush()


def flush(directory: str = None):
    for d, w in _WRITERS.items():
        if w is not None and (directory is None or d == directory):
            w.flush()
    for d, f in _FILES.items():
        if directory is None or d == directory:
            f.flush()
