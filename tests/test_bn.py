"""BN moving-average semantics (reference slim BN, gnn.py:9-23).

Train mode normalizes with masked BATCH statistics and the train step
folds collected sufficient statistics into slim-style moving averages
stored beside each layer's beta (``nn/mlp.init_norm``); eval/test
modes normalize with the stored averages (``is_training=False``).  No
shipped config uses BN — these tests keep the latent path honest.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointgnn_tpu import configs
from pointgnn_tpu.graph import pad
from pointgnn_tpu.model.pointgnn import PointGNN
from pointgnn_tpu.nn import mlp
from pointgnn_tpu.parallel import mesh as pmesh
from pointgnn_tpu.parallel import step as pstep
from pointgnn_tpu.train import optimizers

from test_parallel import CAP, LOSS_CFG, _frame


def bn_layer_configs(T=1, norm="fused_BN_center"):
    lcs = copy.deepcopy(configs.layer_configs(T=T))
    for lc in lcs:
        for key in list(lc.get("kwargs", {})):
            if key.endswith("normalization_type"):
                lc["kwargs"][key] = norm
    return lcs


def _bn_model(mode="train", norm="fused_BN_center"):
    return PointGNN(4, 7, bn_layer_configs(norm=norm), mode=mode)


def _ema_leaves(params):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys[-1] in ("ema_mean", "ema_var"):
            out[tuple(keys)] = np.asarray(leaf)
    return out


def test_init_carries_slim_moving_averages():
    model = _bn_model()
    assert model._has_bn
    params = model.init(jax.random.PRNGKey(0), 1)
    emas = _ema_leaves(params)
    assert emas, "BN layers must carry ema slots"
    for key, val in emas.items():
        expect = 0.0 if key[-1] == "ema_mean" else 1.0
        np.testing.assert_array_equal(val, expect)
    # NONE configs carry no ema state (structure unchanged)
    plain = PointGNN(4, 7, configs.layer_configs(T=1), mode="train")
    assert not plain._has_bn
    assert not _ema_leaves(plain.init(jax.random.PRNGKey(0), 1))


def test_stored_stats_match_batch_stats_at_decay_zero():
    """mlp-level exactness: normalizing with stored averages equals
    batch normalization when the stored averages ARE the batch stats
    (one update at decay 0)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 3 + 1)
    mask = jnp.asarray((rng.rand(64) > 0.3).astype(np.float32))
    params = mlp.init_mlp(
        jax.random.PRNGKey(1), 8, [16, 16], "fused_BN_center"
    )
    collect = {}
    y_batch = mlp.apply_mlp(
        x=x, params=params, is_logits=False,
        normalization_type="fused_BN_center", mask=mask,
        bn_collect=collect,  # prefix (): paths index the layer list
    )
    assert set(collect) == {(0,), (1,)}
    updated = mlp.update_bn_ema(params, collect, decay=0.0)
    y_stored = mlp.apply_mlp(
        x=x, params=updated, is_logits=False,
        normalization_type="fused_BN_center", mask=mask,
        bn_use_stored=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_batch), np.asarray(y_stored), rtol=1e-5, atol=1e-5
    )


def test_train_step_updates_ema_and_test_mode_uses_it():
    rng = np.random.RandomState(2)
    graph = pad.pad_frame(_frame(rng), CAP)
    model = _bn_model()
    assert model.edge_chunks == 1  # BN forces unchunked edges
    params = model.init(jax.random.PRNGKey(0), 1)
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.01, "decay_step": 1000, "decay_factor": 0.1,
         "optimizer": "sgd"}
    )
    state = pstep.init_train_state(params, opt)
    step_fn = pstep.make_train_step(
        model, opt, LOSS_CFG, mesh=None, bn_decay=0.9
    )
    before = _ema_leaves(state.params)
    for _ in range(2):
        state, aux = step_fn(state, graph)
    assert "bn_stats" not in aux  # consumed by the step
    assert np.isfinite(float(aux["total_loss"]))
    after = _ema_leaves(state.params)
    moved = [k for k in before if not np.allclose(before[k], after[k])]
    assert moved, "EMA slots must move during training"
    for key, val in after.items():
        assert np.isfinite(val).all(), key
        if key[-1] == "ema_var":
            assert (val >= 0).all(), key

    # test mode consumes the stored averages (slim is_training=False):
    # deterministic, and distinct from batch-stat normalization
    test_model = _bn_model(mode="test")
    logits_stored, _ = jax.jit(test_model.apply)(state.params, graph)
    train_model = _bn_model(mode="train")
    logits_batch, _ = jax.jit(train_model.apply)(state.params, graph)
    assert np.isfinite(np.asarray(logits_stored)).all()
    assert not np.allclose(
        np.asarray(logits_stored), np.asarray(logits_batch)
    )


def test_bn_dp_step_psums_stats(setup_mesh=None):
    """BN over the 8-device mesh: per-device batch statistics normalize
    each shard (the reference's per-tower slim BN), while the EMA
    update folds the psum-combined union statistics once."""
    rng = np.random.RandomState(3)
    frames = [_frame(rng) for _ in range(8)]
    graphs = [pad.pad_frame(f, CAP) for f in frames]
    model = _bn_model()
    params = model.init(jax.random.PRNGKey(0), 1)
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.01, "decay_step": 1000, "decay_factor": 0.1,
         "optimizer": "sgd"}
    )
    mesh = pmesh.make_mesh()
    state = pstep.init_train_state(params, opt)
    step_fn = pstep.make_train_step(
        model, opt, LOSS_CFG, mesh=mesh, bn_decay=0.5
    )
    stacked = pmesh.shard_batch(mesh, pmesh.stack_graphs(graphs))
    state, aux = step_fn(state, stacked)
    assert np.isfinite(float(aux["total_loss"]))
    after = _ema_leaves(jax.device_get(state.params))
    moved = [
        k for k, v in after.items()
        if not np.allclose(v, 0.0 if k[-1] == "ema_mean" else 1.0)
    ]
    assert moved


def test_infer_pipeline_bn_falls_back_to_general_path():
    """A BN config must not auto-enable the slab/pallas fast paths
    (they require NONE normalization) and must run end-to-end through
    test-mode apply with stored statistics."""
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=1)
    cfg["model_kwargs"]["layer_configs"] = bn_layer_configs(T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=512, runtime=True,
        cell_caps=(16, 32), per_center_caps=(8, 16),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec, use_box_score=False
    )
    assert pipe.slab is False
    assert pipe.pallas_tail is False
    points, _ = synthetic_lidar_frame(seed=0, n_beams=8, points_per_beam=60)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = pipe.run_frame(points, np.random.default_rng(0))
    assert out is not None
