"""Evaluator: eval_once over a trained checkpoint, eval_repeat polling."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pointgnn_tpu import configs
from pointgnn_tpu.graph.pad import GraphCapacity
from pointgnn_tpu.train.evaluator import Evaluator
from pointgnn_tpu.train.pipeline import DatasetSpec, FetchSpec
from pointgnn_tpu.train.trainer import Trainer

SMALL_CAP = GraphCapacity(vertices=(8192, 2048, 2048), edges=(32768, 65536))


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_eval_root"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "make_synthetic_kitti.py"),
            root, "2",
        ],
        check=True,
    )
    config = configs.model_config("Car", T=0)
    train_config = configs.train_config("Car")
    train_dir = os.path.join(root, "train_dir")
    train_config.update(
        {
            "train_dir": train_dir, "batch_size": 2, "NUM_GPU": 1,
            "num_load_dataset_workers": 0, "max_epoch": 1, "max_steps": -1,
            "save_every_epoch": 1, "initial_lr": 0.01,
        }
    )
    spec = DatasetSpec.from_kitti_root(root, num_classes=4)
    trainer = Trainer(
        config, train_config, FetchSpec(spec, config, train_config),
        num_frames=2, capacity=SMALL_CAP,
    )
    trainer.train()
    trainer.close()
    return root, train_dir, config, spec


def test_eval_once_and_repeat(trained_dir):
    root, train_dir, config, spec = trained_dir
    eval_config = configs.eval_config("Car")
    eval_dir = os.path.join(root, "eval_dir")
    evaluator = Evaluator(
        config, eval_config, FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=2, capacity=SMALL_CAP,
    )
    try:
        results = evaluator.eval_once(train_dir, eval_dir, step=1)
        assert np.isfinite(results["total_loss"])
        assert "mAP_1" in results
        assert os.path.isfile(os.path.join(eval_dir, "scalars.jsonl"))
        # eval_repeat skips already-evaluated checkpoints and honors
        # max_polls without sleeping forever
        evaluator.eval_repeat(
            train_dir, eval_dir, eval_every_second=0.01, max_polls=2
        )
        assert evaluator._evaluated_steps == {1}
    finally:
        evaluator.close()


def test_eval_cli_subprocess(trained_dir, tmp_path):
    """The eval.py CLI polls the train_dir, evaluates the checkpoint,
    and exits at max_step."""
    import json

    root, train_dir, config, spec = trained_dir
    eval_cfg = {
        "eval_dataset": "train.txt",
        "train_dir": train_dir,
        "eval_dir": str(tmp_path / "eval_out"),
        "NUM_TEST_SAMPLE": 1,
        "eval_every_second": 1,
        "max_step": 1,
    }
    cfg_path = str(tmp_path / "eval_config")
    with open(cfg_path, "w") as f:
        json.dump(eval_cfg, f)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "eval.py"),
            cfg_path,
            "--dataset_root_dir", root,
            "--dataset_split_file",
            os.path.join(root, "3DOP_splits/train.txt"),
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.isfile(
        os.path.join(eval_cfg["eval_dir"], "scalars.jsonl")
    ), out.stdout[-1000:]


def test_evaluator_follows_device_graph_checkpoints(trained_dir):
    """A device_graph train_config auto-enables device-graph evaluation
    (graph built inside the jitted step on the checkpoint's own
    neighborhoods); forcing the HOST path instead must auto-size the
    edge buckets for the uncapped density — evaluating at the training
    capacity silently truncates edges and mis-scores the checkpoint
    (docs/PERF_NOTES.md, measured BEV 0.00 vs 100)."""
    root, train_dir, config, spec = trained_dir
    eval_config = configs.eval_config("Car")
    base = Evaluator(
        config, eval_config,
        FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=2,
    )
    base.close()
    assert not base.device_graph

    auto = Evaluator(
        config, eval_config,
        FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=2, train_config={"device_graph": True},
    )
    auto.close()
    assert auto.device_graph and auto.device_spec is not None

    host_forced = Evaluator(
        config, dict(eval_config, device_graph=False),
        FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=2, train_config={"device_graph": True},
    )
    host_forced.close()
    assert not host_forced.device_graph
    assert host_forced.capacity.vertices == base.capacity.vertices
    for grown, orig in zip(
        host_forced.capacity.edges, base.capacity.edges
    ):
        assert grown == 4 * orig


def test_eval_once_device_graph_mode(trained_dir):
    """Device-graph eval: the provider yields packed DeviceFrames and
    the jitted eval step builds the graph + labels + encoding itself;
    metrics must come out finite over a real checkpoint."""
    from pointgnn_tpu.graph import device_builder as db

    root, train_dir, config, spec = trained_dir
    dspec = db.spec_from_config(
        config, num_points=16384, num_keypoints=4096, runtime=False
    )
    # pass the spec THROUGH a JSON round-trip: that is what the
    # evaluator reads back from a frozen train_dir/train_config (json
    # has no tuple type, NamedTuples come back as nested lists)
    import json

    from pointgnn_tpu.train.device_pipeline import coerce_device_spec

    json_spec = json.loads(json.dumps(dspec))
    assert isinstance(json_spec, list)
    assert coerce_device_spec(json_spec) == dspec
    eval_config = dict(
        configs.eval_config("Car"),
        device_graph=True, device_graph_spec=json_spec,
    )
    evaluator = Evaluator(
        config, eval_config,
        FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=2,
    )
    try:
        results = evaluator.eval_once(
            train_dir, os.path.join(root, "eval_device"), step=1
        )
        assert np.isfinite(results["total_loss"])
        assert "mAP_1" in results
        assert evaluator.frames_per_second > 0
    finally:
        evaluator.close()


def test_eval_once_grows_capacity_instead_of_truncating(
    trained_dir, recwarn
):
    """Dense frames at default settings must never be silently
    edge-truncated: eval_once grows the bucket (one recompile) and the
    metrics see the full graph."""
    import warnings

    root, train_dir, config, spec = trained_dir
    eval_config = configs.eval_config("Car")
    tiny = GraphCapacity(vertices=(8192, 2048, 2048), edges=(512, 1024))
    evaluator = Evaluator(
        config, eval_config,
        FetchSpec(spec, config, eval_config, is_eval=True),
        num_frames=2, capacity=tiny,
    )
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            results = evaluator.eval_once(
                train_dir, os.path.join(root, "eval_grow"), step=1
            )
        assert np.isfinite(results["total_loss"])
        # the bucket actually grew past the deliberately-tiny start
        assert evaluator.capacity.edges[0] > tiny.edges[0]
        assert evaluator.frames_per_second > 0
    finally:
        evaluator.close()
