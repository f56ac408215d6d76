import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointgnn_tpu import configs
from pointgnn_tpu.graph import builder, pad
from pointgnn_tpu.model.pointgnn import PointGNN
from pointgnn_tpu.parallel import mesh as pmesh
from pointgnn_tpu.parallel import step as pstep
from pointgnn_tpu.train import optimizers


def _frame(rng, n=300):
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.randn(n) * 8
    pts[:, 1] = rng.randn(n)
    pts[:, 2] = np.abs(rng.randn(n)) * 15 + 2
    lc = [
        {
            "graph_gen_kwargs": {"num_neighbors": -1, "radius": 1.0},
            "graph_gen_method": "disjointed_rnn_local_graph_v3",
            "graph_level": 0,
            "graph_scale": 1,
        },
        {
            "graph_gen_kwargs": {"num_neighbors": 16, "radius": 4.0},
            "graph_gen_method": "disjointed_rnn_local_graph_v3",
            "graph_level": 1,
            "graph_scale": 1,
        },
    ]
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        pts, 0.8, lc, rng=np.random.default_rng(5)
    )
    k = len(vcl[-1])
    labels = rng.randint(0, 4, (k, 1))
    boxes = rng.random_sample((k, 1, 7)).astype(np.float32)
    valid = (labels[:, :, None] == 1).astype(np.float32)
    feats = rng.random_sample((n, 1)).astype(np.float32)
    return pad.FrameData(feats, vcl, kil, el, labels, boxes, valid)


CAP = pad.GraphCapacity(vertices=(512, 320, 320), edges=(4096, 8192))
LOSS_CFG = {
    "cls_loss_type": "softmax",
    "cls_loss_weight": 0.1,
    "loc_loss_weight": 10.0,
}


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(1)
    model = PointGNN(
        4, 7, configs.layer_configs(T=1), mode="train",
        regularizer_type="l1", regularizer_kwargs={"scale": 5e-7},
    )
    params = model.init(jax.random.PRNGKey(0), 1)
    frames = [_frame(rng) for _ in range(8)]
    graphs = [pad.pad_frame(f, CAP) for f in frames]
    return model, params, frames, graphs


def test_mesh_has_8_devices(setup):
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_runs_and_syncs_params(setup):
    model, params, frames, graphs = setup
    mesh = pmesh.make_mesh()
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.01, "decay_step": 1000, "decay_factor": 0.1,
         "optimizer": "sgd"}
    )
    state = pstep.init_train_state(params, opt)
    step_fn = pstep.make_train_step(model, opt, LOSS_CFG, mesh=mesh)
    stacked = pmesh.stack_graphs(graphs)
    stacked = pmesh.shard_batch(mesh, stacked)
    state2, aux = step_fn(state, stacked)
    assert int(state2.step) == 1
    assert np.isfinite(float(aux["total_loss"]))
    assert aux["num_endpoint"].shape == (8,)
    # params changed
    delta = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state2.params),
            jax.tree_util.tree_leaves(params),
        )
    )
    assert delta > 0


def test_dp_matches_single_device_big_batch(setup):
    """unify_copies semantics: 8-device DP must equal one device seeing
    the union of all 8 graphs (up to float tolerance)."""
    model, params, frames, graphs = setup
    mesh = pmesh.make_mesh()
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.1, "decay_step": 1000, "decay_factor": 0.1,
         "optimizer": "sgd"}
    )
    # --- DP over 8 devices
    state = pstep.init_train_state(params, opt)
    step_fn = pstep.make_train_step(model, opt, LOSS_CFG, mesh=mesh)
    stacked = pmesh.shard_batch(mesh, pmesh.stack_graphs(graphs))
    state_dp, aux_dp = step_fn(state, stacked)

    # --- single device, all frames as one graph union
    union = pad.batch_and_pad(frames, CAP.scaled(8))
    state1 = pstep.init_train_state(params, opt)
    step1 = pstep.make_train_step(model, opt, LOSS_CFG, mesh=None)
    state_single, aux_single = step1(state1, union)

    # losses agree
    np.testing.assert_allclose(
        float(aux_dp["cls_loss"]), float(aux_single["cls_loss"]),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        float(aux_dp["loc_loss"]), float(aux_single["loc_loss"]),
        rtol=2e-4,
    )
    # updated parameters agree
    for a, b in zip(
        jax.tree_util.tree_leaves(state_dp.params),
        jax.tree_util.tree_leaves(state_single.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_optimizer_registry():
    for name in ("sgd", "momentum", "rmsprop", "adam"):
        opt = optimizers.build_optimizer(name, 0.1)
        assert opt is not None


def test_lr_schedule_staircase():
    lr = optimizers.exponential_decay_lr(0.125, 100, 0.1, True)
    assert float(lr(0)) == pytest.approx(0.125)
    assert float(lr(99)) == pytest.approx(0.125)
    assert float(lr(100)) == pytest.approx(0.0125)
    assert float(lr(250)) == pytest.approx(0.00125)


def _device_frames(n, spec, cfg):
    from pointgnn_tpu.data.labels import LABEL_METHODS
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import select_input_features
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    label_map, num_classes = LABEL_METHODS[cfg["label_method"]]
    frames = []
    for i in range(n):
        points, labels = synthetic_lidar_frame(
            seed=i, n_beams=8, points_per_beam=80
        )
        feats = select_input_features(points.attr, cfg["input_features"])
        packed = db.pack_points(points.xyz, feats, spec.num_points)
        plabels = dpipe.dl.pack_frame_labels(labels, label_map, num_classes)
        frames.append(dpipe.DeviceFrame(packed, plabels))
    return frames


def _device_setup():
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.model.pointgnn import get_model
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.train.trainer import loss_config

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=512, runtime=False,
        cell_caps=(16, 32), per_center_caps=(16, 64),
    )
    model = get_model(cfg["model_name"])(
        num_classes=cfg["num_classes"], box_encoding_len=7,
        mode="train", edge_sentinel="src", edges_sorted=False,
        **cfg["model_kwargs"],
    )
    builder = dpipe.make_graph_builder(spec, model.output_graph_level, cfg)
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.1, "decay_step": 1000, "decay_factor": 0.1,
         "optimizer": "sgd"}
    )
    return cfg, spec, model, builder, params, opt


def test_multi_frame_union_matches_manual_weighting():
    """frames_per_device > 1 must combine per-frame losses with the
    reference's graph-union endpoint weighting (train.py:135-171):
    cls = sum_f cls_f*n_ep_f / sum_f n_ep_f, loc over n_val_f."""
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.train.trainer import loss_config

    cfg, spec, model, builder, params, opt = _device_setup()
    frames = _device_frames(3, spec, cfg)
    lcfg = loss_config(cfg)

    # manual per-frame losses through the F=1 loss path
    base_loss = pstep.make_loss_fn(model, lcfg)
    cls_w = loc_w = n_ep_t = n_val_t = 0.0
    for f in frames:
        graph = builder(f)
        _, d = base_loss(params, graph)
        n_ep = float(np.sum(np.asarray(
            graph.vertex_mask[model.output_graph_level]
        )))
        n_val = float(np.sum(np.asarray(graph.valid_boxes)))
        cls_w += float(d["cls_loss"]) * n_ep
        loc_w += float(d["loc_loss"]) * n_val
        n_ep_t += n_ep
        n_val_t += n_val
    want_cls = cls_w / max(n_ep_t, 1.0)
    want_loc = loc_w / max(n_val_t, 1.0)

    state = pstep.init_train_state(params, opt)
    step_fn = pstep.make_train_step(
        model, opt, lcfg, mesh=None, graph_builder=builder,
        frames_per_device=3,
    )
    batch = dpipe.stack_frames(frames)
    state2, aux = step_fn(state, batch)
    np.testing.assert_allclose(float(aux["cls_loss"]), want_cls, rtol=1e-5)
    np.testing.assert_allclose(float(aux["loc_loss"]), want_loc, rtol=1e-5)
    assert int(np.asarray(aux["num_endpoint"]).sum()) == int(n_ep_t)
    assert int(state2.step) == 1


def test_multi_frame_dp_matches_single_device_union():
    """2 devices x 2 frames with unify_copies must equal one device
    seeing all 4 frames (the global graph union) — losses AND updated
    params (deterministic graph builds: no rng seed)."""
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.train.trainer import loss_config

    cfg, spec, model, builder, params, opt = _device_setup()
    frames = _device_frames(4, spec, cfg)
    lcfg = loss_config(cfg)

    single = pstep.make_train_step(
        model, opt, lcfg, mesh=None, graph_builder=builder,
        frames_per_device=4,
    )
    s1, aux1 = single(
        pstep.init_train_state(params, opt), dpipe.stack_frames(frames)
    )

    mesh = pmesh.make_mesh(2)
    dp = pstep.make_train_step(
        model, opt, lcfg, mesh=mesh, graph_builder=builder,
        frames_per_device=2, unify_copies=True,
    )
    per_dev = [dpipe.stack_frames(frames[:2]), dpipe.stack_frames(frames[2:])]
    stacked = pmesh.shard_batch(mesh, pmesh.stack_graphs(per_dev))
    s2, aux2 = dp(pstep.init_train_state(params, opt), stacked)

    np.testing.assert_allclose(
        float(aux1["cls_loss"]), float(aux2["cls_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(aux1["loc_loss"]), float(aux2["loc_loss"]), rtol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
        )


def test_stream_sharded_over_mesh():
    """stream(mesh=...) shards the serving batch over the device mesh
    (pure-DP inference) and yields the same results as single-device
    streaming."""
    import numpy as np

    from pointgnn_tpu import configs
    from pointgnn_tpu.core.points import Points
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.parallel import mesh as pmesh
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=1)
    spec = db.spec_from_config(
        cfg, num_points=2048, num_keypoints=512,
        per_center_caps=(16, 64), cell_caps=(32, 64),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, device_spec=spec,
        use_box_score=False, seed=7, slab=False, pallas_tail=False,
    )
    frames = []
    for i in range(8):
        pts, _ = synthetic_lidar_frame(seed=i)
        frames.append(Points(xyz=pts.xyz[:1500], attr=pts.attr[:1500]))
    mesh = pmesh.make_mesh(4)
    single = list(pipe.stream(frames, batch=4))
    sharded = list(pipe.stream(frames, batch=4, mesh=mesh))
    assert len(single) == len(sharded) == len(frames)
    for (c1, b1, s1, _), (c2, b2, s2, _) in zip(single, sharded):
        assert len(c1) == len(c2)
        np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(b1, b2, rtol=1e-4, atol=1e-4)
