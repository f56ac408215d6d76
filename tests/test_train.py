"""Training stack: metrics math, fetch pipeline, provider cache, and a
short end-to-end DP training run on the 8-device CPU mesh."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pointgnn_tpu import configs
from pointgnn_tpu.graph.pad import GraphCapacity
from pointgnn_tpu.train import metrics as metrics_lib
from pointgnn_tpu.train.pipeline import (
    DataProvider,
    DatasetSpec,
    FetchSpec,
    build_fetch,
)
from pointgnn_tpu.train.trainer import Trainer

SMALL_CAP = GraphCapacity(vertices=(8192, 2048, 2048), edges=(32768, 65536))


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_root"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "make_synthetic_kitti.py"),
            root,
            "4",
        ],
        check=True,
    )
    return root


@pytest.fixture(scope="module")
def fetch_spec(kitti_root):
    config = configs.model_config("Car", T=0)
    train_config = configs.train_config("Car")
    train_config["train_dir"] = os.path.join(kitti_root, "train_dir")
    spec = DatasetSpec.from_kitti_root(kitti_root, num_classes=4)
    return FetchSpec(spec, config, train_config)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_interpolated_pr_auc_perfect_classifier():
    # all positives above all negatives -> AUC ~ 1
    edges = metrics_lib.thresholds()
    pos = np.histogram([0.9] * 50, bins=edges)[0].astype(float)
    neg = np.histogram([0.1] * 50, bins=edges)[0].astype(float)
    pos_above = np.concatenate([np.cumsum(pos[::-1])[::-1], [0.0]])
    neg_above = np.concatenate([np.cumsum(neg[::-1])[::-1], [0.0]])
    auc = metrics_lib.interpolated_pr_auc(
        pos_above, neg_above, pos.sum() - pos_above
    )
    assert auc == pytest.approx(1.0, abs=0.02)


def test_interpolated_pr_auc_random_classifier():
    rng = np.random.default_rng(0)
    edges = metrics_lib.thresholds()
    scores = rng.uniform(0, 1, 40000)
    labels = rng.uniform(0, 1, 40000) < 0.3  # 30% positives
    pos = np.histogram(scores[labels], bins=edges)[0].astype(float)
    neg = np.histogram(scores[~labels], bins=edges)[0].astype(float)
    pos_above = np.concatenate([np.cumsum(pos[::-1])[::-1], [0.0]])
    neg_above = np.concatenate([np.cumsum(neg[::-1])[::-1], [0.0]])
    auc = metrics_lib.interpolated_pr_auc(
        pos_above, neg_above, pos.sum() - pos_above
    )
    # random classifier PR-AUC ~ positive rate
    assert auc == pytest.approx(0.3, abs=0.03)


def test_device_updates_and_streaming():
    import jax.numpy as jnp

    logits = jnp.asarray(
        [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]]
    )
    labels = jnp.asarray([0, 1, 2, 2])
    mask = jnp.ones(4)
    upd = metrics_lib.device_updates(logits, labels, mask, 3)
    m = metrics_lib.StreamingMetrics(3)
    m.update(
        {
            "cls_loss": 1.0,
            "loc_loss": 2.0,
            "reg_loss": 0.0,
            "total_loss": 3.0,
            **{k: np.asarray(v) for k, v in upd.items()},
        }
    )
    r = m.results()
    assert r["recall_0"] == 1.0 and r["precision_0"] == 1.0
    assert r["recall_1"] == 1.0 and r["precision_1"] == 0.5
    assert r["recall_2"] == 0.5 and r["precision_2"] == 1.0
    assert r["cls_loss"] == 1.0 and r["total_loss"] == 3.0
    # masked-out rows don't count
    m2 = metrics_lib.StreamingMetrics(3)
    upd2 = metrics_lib.device_updates(logits, labels, jnp.zeros(4), 3)
    m2.update({k: np.asarray(v) for k, v in upd2.items()})
    assert m2.results()["recall_0"] == 0.0


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def test_fetch_produces_frame_data(fetch_spec):
    fetch = build_fetch(fetch_spec)
    frame = fetch(0, seed=0)
    assert frame.features.dtype == np.float32
    assert len(frame.vertex_coord_list) == 3
    assert frame.cls_labels.shape[0] == frame.vertex_coord_list[2].shape[0]
    assert frame.encoded_boxes.shape[1:] == (1, 7)
    # car clusters produce some positive labels
    assert (frame.cls_labels > 0).sum() > 0
    # eval mode skips augmentation but still yields labels
    eval_fetch = build_fetch(fetch_spec._replace(is_eval=True))
    frame_e = eval_fetch(0, seed=0)
    assert (frame_e.cls_labels > 0).sum() > 0


def test_provider_cache_and_workers(fetch_spec):
    provider = DataProvider(
        fetch_spec,
        load_dataset_to_mem=True,
        load_dataset_every_N_time=2,
        capacity=1,
        num_workers=2,
        num_frames=4,
        preload_list=[0, 1],
        seed=0,
    )
    try:
        a = provider.provide(0)
        b = provider.provide(0)  # cached variant (ctr < N)
        np.testing.assert_array_equal(a.features, b.features)
        batch = provider.provide_batch([0, 1, 2, 3])
        assert len(batch) == 4
    finally:
        provider.close()
    # no-buffer mode refetches with fresh randomness
    provider2 = DataProvider(
        fetch_spec,
        load_dataset_to_mem=False,
        num_workers=0,
        num_frames=4,
        seed=0,
    )
    x = provider2.provide(0)
    y = provider2.provide(0)
    assert x.features.shape[1] == y.features.shape[1]
    provider2.close()


# ---------------------------------------------------------------------------
# trainer (end-to-end, 8-device CPU mesh)
# ---------------------------------------------------------------------------

def test_trainer_short_run(fetch_spec, tmp_path):
    config = fetch_spec.config
    train_config = dict(fetch_spec.train_config)
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir"),
            "device_graph": False,  # this test covers the host path
            "batch_size": 4,
            "NUM_GPU": 2,
            "num_load_dataset_workers": 0,
            "max_epoch": 2,
            "max_steps": -1,
            "save_every_epoch": 1,
            "initial_lr": 0.01,
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
        capacity=SMALL_CAP,
    )
    try:
        assert trainer.n_devices == 2
        trainer.train()
        assert trainer.global_step == 2  # 4 frames / batch 4 = 1 step/epoch
        # checkpoint written with frozen configs
        assert os.path.isfile(os.path.join(train_config["train_dir"], "config"))
        results = trainer.metrics.results()
        assert np.isfinite(results["total_loss"])
        # resume restores step
        trainer2 = Trainer(
            config,
            train_config,
            fetch_spec._replace(train_config=train_config),
            num_frames=4,
            capacity=SMALL_CAP,
        )
        step = trainer2.restore()
        assert step == 2
        trainer2.close()
    finally:
        trainer.close()


def test_trainer_single_device(fetch_spec, tmp_path):
    config = fetch_spec.config
    train_config = dict(fetch_spec.train_config)
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir_1dev"),
            "device_graph": False,  # host path
            "batch_size": 2,
            "NUM_GPU": 1,
            "num_load_dataset_workers": 0,
            "max_epoch": 1,
            "max_steps": -1,
            "initial_lr": 0.01,
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
        capacity=SMALL_CAP,
    )
    try:
        aux = trainer.train_batch([0, 1])
        assert np.isfinite(float(np.asarray(aux["total_loss"])))
    finally:
        trainer.close()


def test_trainer_profiler_trace(fetch_spec, tmp_path):
    """profile_dir in train_config writes a jax.profiler trace of a few
    steady-state steps without disturbing training."""
    config = fetch_spec.config
    train_config = dict(fetch_spec.train_config)
    profile_dir = str(tmp_path / "profile")
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir"),
            "device_graph": False,  # this test covers the host path
            "batch_size": 4,
            "NUM_GPU": 2,
            "num_load_dataset_workers": 0,
            "max_epoch": 4,
            "max_steps": -1,
            "save_every_epoch": 10,
            "initial_lr": 0.01,
            "profile_dir": profile_dir,
            "profile_start_step": 1,
            "profile_steps": 1,
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
        capacity=SMALL_CAP,
    )
    try:
        trainer.train()
        assert trainer.global_step == 4
        found = []
        for root, _dirs, files in os.walk(profile_dir):
            found += [f for f in files if f.endswith((".pb", ".json.gz"))]
        assert found, "no profiler trace written under profile_dir"
    finally:
        trainer.close()


# ---------------------------------------------------------------------------
# on-device training pipeline (device_graph mode)
# ---------------------------------------------------------------------------

def _small_device_spec():
    from pointgnn_tpu.graph import device_builder as db

    cfg = configs.model_config("Car", T=0)
    return db.spec_from_config(
        cfg, num_points=4096, num_keypoints=1024, runtime=False,
        cell_caps=(16, 32), per_center_caps=(16, 64),
    )


def test_device_fetch_applies_augmentation(fetch_spec):
    """The device-pipeline fetch (train/device_pipeline.build_device_fetch)
    runs the SAME host augmentation stage as the host-graph fetch
    (reference train.py:78-133: augment before graph gen); only graph
    construction moves on device."""
    tc = dict(fetch_spec.train_config)
    tc["data_aug_configs"] = [
        {
            "method_name": "random_rotation_all",
            "method_kwargs": {"yaw_std": 0.4},
        }
    ]
    dspec = _small_device_spec()
    spec_aug = fetch_spec._replace(
        train_config=tc, device_spec=dspec
    )
    spec_plain = fetch_spec._replace(
        train_config=dict(tc, data_aug_configs=[]), device_spec=dspec
    )
    fetch_aug = build_fetch(spec_aug)
    fetch_plain = build_fetch(spec_plain)
    frame_aug = fetch_aug(0, seed=7)
    frame_plain = fetch_plain(0, seed=7)
    # same packing shape, different (rotated) point coordinates
    assert frame_aug.packed_points.shape == frame_plain.packed_points.shape
    assert not np.allclose(
        frame_aug.packed_points, frame_plain.packed_points
    )
    # GT boxes rotate with the cloud
    assert not np.allclose(
        np.asarray(frame_aug.labels.target_box),
        np.asarray(frame_plain.labels.target_box),
    )
    # determinism per seed
    again = fetch_aug(0, seed=7)
    np.testing.assert_array_equal(
        frame_aug.packed_points, again.packed_points
    )


def test_trainer_device_graph_single_device(fetch_spec, tmp_path):
    """device_graph mode: graph + labels + encoding inside the jitted
    step; loss is finite and decreases over repeated steps."""
    config = fetch_spec.config
    train_config = dict(fetch_spec.train_config)
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir_devg"),
            "batch_size": 1,
            "NUM_GPU": 1,
            "num_load_dataset_workers": 0,
            "max_epoch": 1,
            "max_steps": -1,
            "initial_lr": 0.05,
            "device_graph": True,
            "device_graph_slab": False,  # slab = interpret-mode-slow on CPU
            "device_graph_spec": _small_device_spec(),
            "load_dataset_every_N_time": 1000,  # reuse the cached frame
            # freeze the graph across steps for a clean overfit signal
            # (the randomized default is covered separately below)
            "device_graph_rnd3d": False,
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
    )
    try:
        losses = []
        for _ in range(4):
            aux = trainer.train_batch([0])
            losses.append(float(np.asarray(aux["total_loss"])))
        assert all(np.isfinite(l) for l in losses), losses
        # same cached frame each step -> SGD must reduce the loss
        assert losses[-1] < losses[0], losses
    finally:
        trainer.close()


def test_trainer_device_graph_rnd3d(fetch_spec, tmp_path):
    """Per-step graph randomization (the default, mirroring the
    reference's add_rnd3d re-randomization on every fetch): repeated
    steps on the SAME frame see different keypoint sets — the
    num_endpoint aux (= selected keypoint count) varies across steps —
    and training still converges."""
    config = fetch_spec.config
    assert config["graph_gen_kwargs"].get("add_rnd3d") is True
    train_config = dict(fetch_spec.train_config)
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir_devg_rnd"),
            "batch_size": 1,
            "NUM_GPU": 1,
            "num_load_dataset_workers": 0,
            "max_epoch": 1,
            "max_steps": -1,
            "initial_lr": 0.05,
            "device_graph": True,
            "device_graph_slab": False,
            "device_graph_spec": _small_device_spec(),
            "load_dataset_every_N_time": 1000,
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
    )
    try:
        valids, losses = [], []
        for _ in range(5):
            aux = trainer.train_batch([0])
            # num_endpoint saturates at the keypoint capacity on dense
            # frames; the foreground-keypoint count (valid boxes) is the
            # uncapped signal that moves with the jittered selection
            valids.append(
                int(np.asarray(aux["num_valid_endpoint"]).sum())
            )
            losses.append(float(np.asarray(aux["total_loss"])))
        assert all(np.isfinite(l) for l in losses), losses
        # the jittered voxel grid changes the keypoint selection per step
        assert len(set(valids)) > 1, valids
    finally:
        trainer.close()


def test_trainer_device_graph_mesh(fetch_spec, tmp_path):
    """device_graph mode over the 8-device CPU mesh: the raw DeviceFrame
    batch shards over the data axis and the SPMD step runs."""
    config = fetch_spec.config
    train_config = dict(fetch_spec.train_config)
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir_devg_mesh"),
            "batch_size": 2,
            "NUM_GPU": 2,
            "num_load_dataset_workers": 0,
            "max_epoch": 1,
            "max_steps": -1,
            "initial_lr": 0.05,
            "device_graph": True,
            "device_graph_slab": False,
            "device_graph_spec": _small_device_spec(),
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
    )
    try:
        aux = trainer.train_batch([0, 1])
        assert np.isfinite(float(np.asarray(aux["total_loss"])))
        assert int(trainer.global_step) == 1
    finally:
        trainer.close()


def test_trainer_device_graph_mesh_resume_determinism(fetch_spec, tmp_path):
    """On-mesh resume reproduces the uninterrupted stream EXACTLY.

    ``graph_rng_seed`` keys the per-step keypoint randomization off
    ``state.step`` (parallel/step.py) precisely so a mid-run orbax
    save/restore continues the same graph sequence the uninterrupted
    run would have seen (the reference resume contract,
    train.py:508-519).  Train 6 steps; train 3 + save + restore into a
    FRESH trainer + 3: the per-step losses and foreground-endpoint
    counts must match bitwise, and the final params must be identical.
    """
    config = fetch_spec.config
    assert config["graph_gen_kwargs"].get("add_rnd3d") is True

    def make_trainer(train_dir):
        train_config = dict(fetch_spec.train_config)
        train_config.update(
            {
                "train_dir": train_dir,
                "batch_size": 2,
                "NUM_GPU": 2,
                "num_load_dataset_workers": 0,
                "max_epoch": 1,
                "max_steps": -1,
                "initial_lr": 0.05,
                "device_graph": True,
                "device_graph_slab": False,
                "device_graph_spec": _small_device_spec(),
                # deterministic host fetch: no augmentation, frames stay
                # cached — the only step-dependent randomness left is
                # the graph key folded from state.step
                "data_aug_configs": [],
                "load_dataset_every_N_time": 1000,
            }
        )
        return Trainer(
            config,
            train_config,
            fetch_spec._replace(train_config=train_config),
            num_frames=4,
        )

    batches = [[0, 1], [2, 3], [1, 2], [0, 3], [3, 1], [2, 0]]

    def run(trainer, batch_list):
        out = []
        for b in batch_list:
            aux = trainer.train_batch(b)
            out.append(
                (
                    float(np.asarray(aux["total_loss"])),
                    int(np.asarray(aux["num_valid_endpoint"]).sum()),
                )
            )
        return out

    # --- run A: 6 uninterrupted steps
    tr_a = make_trainer(str(tmp_path / "resume_a"))
    try:
        rec_a = run(tr_a, batches)
        params_a = [
            np.asarray(x)
            for x in __import__("jax").tree_util.tree_leaves(
                tr_a.state.params
            )
        ]
    finally:
        tr_a.close()

    # --- run B: 3 steps, save, fresh trainer, restore, 3 steps
    dir_b = str(tmp_path / "resume_b")
    tr_b1 = make_trainer(dir_b)
    try:
        rec_b = run(tr_b1, batches[:3])
        tr_b1.save()
    finally:
        tr_b1.close()
    tr_b2 = make_trainer(dir_b)
    try:
        assert tr_b2.restore() == 3
        assert tr_b2.global_step == 3
        rec_b += run(tr_b2, batches[3:])
        params_b = [
            np.asarray(x)
            for x in __import__("jax").tree_util.tree_leaves(
                tr_b2.state.params
            )
        ]
    finally:
        tr_b2.close()

    # bitwise agreement: same graphs, same data, same restored bits
    assert rec_a == rec_b, (rec_a, rec_b)
    # the graph randomization actually varied across steps (the test
    # would pass trivially with frozen graphs)
    assert len({v for _, v in rec_a}) > 1, rec_a
    for a, b in zip(params_a, params_b):
        np.testing.assert_array_equal(a, b)


def test_trainer_auto_routes_none_norm_to_device_graph(fetch_spec, tmp_path):
    """NONE-normalization configs (all 7 shipped ones) auto-route to
    device_graph training unless the train_config says otherwise, and
    the resolved decision is frozen into the train_config saved beside
    checkpoints (the continuous evaluator reads it from there)."""
    config = fetch_spec.config
    base = dict(fetch_spec.train_config)
    base.update(
        {
            "train_dir": str(tmp_path / "train_dir_auto"),
            "batch_size": 1,
            "NUM_GPU": 1,
            "num_load_dataset_workers": 0,
            "device_graph_spec": _small_device_spec(),
        }
    )
    assert "device_graph" not in base
    tr = Trainer(
        config, base, fetch_spec._replace(train_config=base), num_frames=4
    )
    try:
        assert tr.device_graph is True
        assert tr.train_config["device_graph"] is True
    finally:
        tr.close()
    # explicit opt-out wins
    off = dict(base, device_graph=False,
               train_dir=str(tmp_path / "train_dir_auto_off"))
    tr2 = Trainer(
        config, off, fetch_spec._replace(train_config=off), num_frames=4,
        capacity=SMALL_CAP,
    )
    try:
        assert tr2.device_graph is False
    finally:
        tr2.close()
    # a non-NONE normalization keeps the host path by default
    import copy

    bn_cfg = copy.deepcopy(config)
    bn_cfg["model_kwargs"]["layer_configs"][0]["kwargs"][
        "point_MLP_normalization_type"
    ] = "batch_norm"
    from pointgnn_tpu.train.trainer import _all_norms_none

    assert _all_norms_none(config) and not _all_norms_none(bn_cfg)
    # the bare 'normalization_type' key (no MLP-name prefix) must also
    # block the auto-route — a predictor layer configured with it is
    # not NONE-norm even though no '*_normalization_type' key says so
    bare_cfg = copy.deepcopy(config)
    bare_cfg["model_kwargs"]["layer_configs"][-1]["kwargs"][
        "normalization_type"
    ] = "batch_norm"
    assert not _all_norms_none(bare_cfg)


def test_resolve_device_setup_clears_preset_slab_flags():
    """A JSON-round-tripped spec can arrive with slab flags already
    set; when slab resolves False (e.g. CPU backend) the flags must be
    CLEARED, or build_padded_graph emits slab metadata + dummy 1-edge
    lists that a model without slab wiring aggregates as garbage."""
    from pointgnn_tpu.train import device_pipeline as dpipe

    config = configs.model_config("Car", T=1)
    dspec_on, extra_on = dpipe.resolve_device_setup(config, slab=True)
    assert dspec_on.slab_level1 and dspec_on.slab_level0
    assert "slab_level1" in extra_on and "slab_level0" in extra_on
    # feed the slab-flagged spec back with slab=False
    dspec_off, extra_off = dpipe.resolve_device_setup(
        config, spec=dspec_on, slab=False
    )
    assert not dspec_off.slab_level1 and not dspec_off.slab_level0
    assert "slab_level1" not in extra_off
    assert extra_off["edge_sentinel"] == "src"


def test_resolve_device_setup_consumes_compute_dtype(monkeypatch):
    """tpu_settings' compute_dtype flows into the model wiring; an
    explicit model_kwargs["compute_dtype"] in the config wins."""
    from pointgnn_tpu.train import device_pipeline as dpipe

    config = configs.model_config("Car", T=1)
    base = configs.tpu_settings("Car")
    monkeypatch.setattr(
        configs, "tpu_settings",
        lambda name: dict(base, compute_dtype="bfloat16"),
    )
    _, extra = dpipe.resolve_device_setup(config, slab=True)
    assert extra["compute_dtype"] == "bfloat16"
    # default (None) adds nothing
    monkeypatch.setattr(configs, "tpu_settings", lambda name: base)
    _, extra = dpipe.resolve_device_setup(config, slab=True)
    assert "compute_dtype" not in extra
    # explicit model_kwargs wins: resolve must not duplicate the kwarg
    monkeypatch.setattr(
        configs, "tpu_settings",
        lambda name: dict(base, compute_dtype="bfloat16"),
    )
    cfg2 = dict(config, model_kwargs=dict(
        config["model_kwargs"], compute_dtype="float32"
    ))
    _, extra = dpipe.resolve_device_setup(cfg2, slab=True)
    assert "compute_dtype" not in extra


def test_trainer_freezes_resolved_device_setup(fetch_spec, tmp_path):
    """'auto' slab resolves from the TRAINING process's backend; the
    trainer must freeze the RESOLVED decision (and the resolved spec)
    into the train_config saved beside checkpoints, so a continuous
    evaluator on a different backend sees the same graph semantics."""
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.utils import config_io

    config = fetch_spec.config
    train_config = dict(fetch_spec.train_config)
    train_config.update(
        {
            "train_dir": str(tmp_path / "train_dir_frozen"),
            "batch_size": 1,
            "NUM_GPU": 1,
            "num_load_dataset_workers": 0,
            "device_graph": True,
            # leave device_graph_slab at its 'auto' default
            "device_graph_spec": _small_device_spec(),
        }
    )
    trainer = Trainer(
        config,
        train_config,
        fetch_spec._replace(train_config=train_config),
        num_frames=4,
    )
    try:
        assert trainer.train_config["device_graph_slab"] in (True, False)
        assert trainer.train_config["device_graph_slab"] == bool(
            trainer.device_spec.slab_level1
        )
        trainer.save()
        loaded = config_io.load_train_config(
            os.path.join(train_config["train_dir"], "train_config")
        )
        assert loaded["device_graph_slab"] in (True, False)
        # the frozen spec JSON-round-trips back to the resolved spec
        dspec = dpipe.coerce_device_spec(loaded["device_graph_spec"])
        assert dspec == trainer.device_spec
    finally:
        trainer.close()
