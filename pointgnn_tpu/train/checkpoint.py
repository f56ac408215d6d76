"""Orbax checkpointing with the reference's frozen-config contract.

The reference saves TF checkpoints plus the frozen ``config`` /
``train_config`` JSONs into ``train_dir`` so a checkpoint directory is
self-describing and the inference driver needs only the dir
(/root/reference/train.py:578-593, 624-650; run.py:64-67).  Same
contract here: ``save_checkpoint`` writes an orbax step directory
``model-<step>`` and the frozen configs; ``latest_checkpoint`` /
``restore_checkpoint`` recover weights + optimizer state + step for
crash-resume (train.py:508-519).
"""

import os
import re
from typing import Any, Dict, Optional, Tuple

from pointgnn_tpu.utils import config_io

_STEP_RE = re.compile(r"^model-(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    train_dir: str,
    step: int,
    state: Dict[str, Any],
    config: Optional[dict] = None,
    train_config: Optional[dict] = None,
) -> str:
    """Save pytree ``state`` as ``<train_dir>/model-<step>`` and freeze
    the configs next to it."""
    train_dir = os.path.abspath(train_dir)
    os.makedirs(train_dir, exist_ok=True)
    path = os.path.join(train_dir, "model-%d" % step)
    _checkpointer().save(path, state, force=True)
    if config is not None:
        config_io.save_config(os.path.join(train_dir, "config"), config)
    if train_config is not None:
        config_io.save_train_config(
            os.path.join(train_dir, "train_config"), train_config
        )
    return path


def list_checkpoint_steps(train_dir: str):
    if not os.path.isdir(train_dir):
        return []
    steps = []
    for name in os.listdir(train_dir):
        m = _STEP_RE.match(name)
        if m and os.path.isdir(os.path.join(train_dir, name)):
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(train_dir: str) -> Optional[str]:
    """Path of the newest ``model-<step>`` dir, or None."""
    steps = list_checkpoint_steps(train_dir)
    if not steps:
        return None
    return os.path.join(train_dir, "model-%d" % steps[-1])


def restore_checkpoint(
    train_dir: str,
    template: Optional[Dict[str, Any]] = None,
    step: Optional[int] = None,
) -> Tuple[Optional[Dict[str, Any]], int]:
    """Restore ``(state, step)`` from the latest (or given) checkpoint.

    ``template`` (a matching pytree of arrays) restores with the right
    dtypes/shardings; without it orbax returns plain numpy arrays.
    Returns ``(None, 0)`` when no checkpoint exists.
    """
    if step is None:
        steps = list_checkpoint_steps(train_dir)
        if not steps:
            return None, 0
        step = steps[-1]
    path = os.path.join(os.path.abspath(train_dir), "model-%d" % step)
    if template is not None:
        import orbax.checkpoint as ocp

        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        state = _checkpointer().restore(
            path, restore_args=restore_args, item=template
        )
    else:
        # no template: restore every leaf as plain numpy so checkpoints
        # written under a different device topology load anywhere
        import jax
        import numpy as np
        import orbax.checkpoint as ocp

        ckptr = _checkpointer()
        tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        state = ckptr.restore(path, restore_args=restore_args)
    return state, step
