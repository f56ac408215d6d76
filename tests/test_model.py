import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointgnn_tpu.graph import builder, pad
from pointgnn_tpu.model.pointgnn import PointGNN, get_model


def car_t3_layer_configs(T=3):
    """The car_auto_T3 architecture (same hyperparameters as
    configs/car_auto_T3_train_config:39-148): PointSetPooling with point
    MLP [32,64,128,300] / out [300,300], T auto-offset GNN iterations,
    class-aware predictor."""
    layers = [
        {
            "scope": "layer1",
            "type": "scatter_max_point_set_pooling",
            "graph_level": 0,
            "kwargs": {
                "point_MLP_depth_list": [32, 64, 128, 300],
                "point_MLP_normalization_type": "NONE",
                "point_MLP_activation_type": "ReLU",
                "output_MLP_depth_list": [300, 300],
                "output_MLP_normalization_type": "NONE",
                "output_MLP_activation_type": "ReLU",
            },
        }
    ]
    for t in range(T):
        layers.append(
            {
                "scope": "layer%d" % (t + 2),
                "type": "scatter_max_graph_auto_center_net",
                "graph_level": 1,
                "kwargs": {
                    "auto_offset": True,
                    "auto_offset_MLP_depth_list": [64, 3],
                    "auto_offset_MLP_normalization_type": "NONE",
                    "auto_offset_MLP_feature_activation_type": "ReLU",
                    "edge_MLP_depth_list": [300, 300],
                    "edge_MLP_normalization_type": "NONE",
                    "edge_MLP_activation_type": "ReLU",
                    "update_MLP_depth_list": [300, 300],
                    "update_MLP_normalization_type": "NONE",
                    "update_MLP_activation_type": "ReLU",
                },
            }
        )
    layers.append(
        {
            "scope": "output",
            "type": "classaware_predictor",
            "graph_level": 1,
            "kwargs": {
                "normalization_type": "NONE",
                "activation_type": "ReLU",
            },
        }
    )
    return layers


def _level_configs():
    return [
        {
            "graph_gen_kwargs": {"num_neighbors": -1, "radius": 1.0},
            "graph_gen_method": "disjointed_rnn_local_graph_v3",
            "graph_level": 0,
            "graph_scale": 1,
        },
        {
            "graph_gen_kwargs": {"num_neighbors": 64, "radius": 4.0},
            "graph_gen_method": "disjointed_rnn_local_graph_v3",
            "graph_level": 1,
            "graph_scale": 1,
        },
    ]


def _padded_graph(rng, n=600, cap=None, with_labels=True):
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.randn(n) * 8
    pts[:, 1] = rng.randn(n)
    pts[:, 2] = np.abs(rng.randn(n)) * 15 + 2
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        pts, 0.8, _level_configs(), rng=np.random.default_rng(3)
    )
    feats = rng.random_sample((n, 1)).astype(np.float32)
    k = len(vcl[-1])
    labels = rng.randint(0, 4, (k, 1)) if with_labels else None
    boxes = (
        rng.random_sample((k, 1, 7)).astype(np.float32)
        if with_labels
        else None
    )
    valid = (
        (labels[:, :, None] == 1).astype(np.float32) if with_labels else None
    )
    f = pad.FrameData(feats, vcl, kil, el, labels, boxes, valid)
    if cap is None:
        cap = pad.GraphCapacity(
            vertices=(1024, 640, 640), edges=(8192, 24576)
        )
    assert all(
        len(e) <= c for e, c in zip(el, cap.edges)
    ), "test graph must fit capacity (no truncation)"
    return pad.pad_frame(f, cap), f


@pytest.fixture(scope="module")
def model_and_graph():
    rng = np.random.RandomState(0)
    g, f = _padded_graph(rng)
    model = PointGNN(
        num_classes=4,
        box_encoding_len=7,
        layer_configs=car_t3_layer_configs(T=1),
        regularizer_type="l1",
        regularizer_kwargs={"scale": 5e-7},
        mode="train",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    return model, params, g, f


def test_forward_shapes(model_and_graph):
    model, params, g, _ = model_and_graph
    logits, boxes = jax.jit(model.apply)(params, g)
    assert logits.shape == (640, 4)
    assert boxes.shape == (640, 4, 7)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(boxes)).all()


def test_padding_invariance(model_and_graph):
    """THE static-shape invariant: growing capacities must not change
    outputs on valid rows."""
    model, params, g, f = model_and_graph
    big_cap = pad.GraphCapacity(
        vertices=(2048, 1024, 1024), edges=(16384, 49152)
    )
    g2 = pad.pad_frame(f, big_cap)
    logits1, boxes1 = jax.jit(model.apply)(params, g)
    logits2, boxes2 = jax.jit(model.apply)(params, g2)
    k = len(f.vertex_coord_list[-1])
    np.testing.assert_allclose(
        np.asarray(logits1)[:k], np.asarray(logits2)[:k], rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(boxes1)[:k], np.asarray(boxes2)[:k], rtol=1e-4,
        atol=1e-5,
    )


def test_loss_and_grads(model_and_graph):
    model, params, g, _ = model_and_graph
    loss_cfg = {
        "cls_loss_type": "softmax",
        "cls_loss_weight": 0.1,
        "loc_loss_weight": 10.0,
    }

    def total_loss(p):
        logits, boxes = model.apply(p, g)
        d = model.loss(
            p, logits, g.cls_labels, boxes, g.encoded_boxes,
            g.valid_boxes, g.vertex_mask[model.output_graph_level],
            **loss_cfg,
        )
        return d["cls_loss"] + d["loc_loss"] + d["reg_loss"], d

    (loss, d), grads = jax.jit(
        lambda p: jax.value_and_grad(total_loss, has_aux=True)(p)
    )(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(d["num_endpoint"]) > 0
    assert float(d["num_valid_endpoint"]) >= 0
    assert d["classwise_loc_loss"].shape == (4, 7)
    gnorm = sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0 and np.isfinite(gnorm)


def test_loss_focal_variants(model_and_graph):
    model, params, g, _ = model_and_graph
    logits, boxes = jax.jit(model.apply)(params, g)
    mask = g.vertex_mask[model.output_graph_level]
    for cls_type in ("focal_sigmoid", "focal_softmax", "top_k_softmax"):
        kwargs = {"k": 64} if cls_type == "top_k_softmax" else {}
        d = model.loss(
            params, logits, g.cls_labels, boxes, g.encoded_boxes,
            g.valid_boxes, mask,
            cls_loss_type=cls_type, cls_loss_kwargs=kwargs,
        )
        assert np.isfinite(float(d["cls_loss"]))


def test_loss_top_k_huber(model_and_graph):
    model, params, g, _ = model_and_graph
    logits, boxes = jax.jit(model.apply)(params, g)
    mask = g.vertex_mask[model.output_graph_level]
    d = model.loss(
        params, logits, g.cls_labels, boxes, g.encoded_boxes,
        g.valid_boxes, mask,
        loc_loss_type="top_k_huber_loss", loc_loss_kwargs={"k": 128},
    )
    assert np.isfinite(float(d["loc_loss"]))


def test_per_mode_loss_dicts(model_and_graph):
    """models.py:198-207: weights/types may be dicts keyed by mode."""
    model, params, g, _ = model_and_graph
    logits, boxes = jax.jit(model.apply)(params, g)
    mask = g.vertex_mask[model.output_graph_level]
    d = model.loss(
        params, logits, g.cls_labels, boxes, g.encoded_boxes,
        g.valid_boxes, mask,
        cls_loss_type={"train": "softmax", "eval": "softmax"},
        cls_loss_kwargs={"train": {}, "eval": {}},
        cls_loss_weight={"train": 0.1, "eval": 1.0},
        loc_loss_weight={"train": 10.0, "eval": 1.0},
    )
    assert np.isfinite(float(d["cls_loss"]))


def test_model_registry():
    assert get_model("multi_layer_fast_local_graph_model_v2") is PointGNN


def test_postprocess_softmax(model_and_graph):
    model, params, g, _ = model_and_graph
    logits, _ = jax.jit(model.apply)(params, g)
    probs = np.asarray(model.postprocess(logits))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_bn_config_supported_at_test_mode():
    """BN configs build in every mode: train normalizes with batch
    statistics + maintains moving averages, test/eval normalize with
    the stored averages (slim is_training semantics; tests/test_bn.py
    covers the numerics)."""
    from pointgnn_tpu import configs
    from pointgnn_tpu.model.pointgnn import PointGNN

    cfg = configs.model_config("Car", T=1)
    layer_configs = [dict(c, kwargs=dict(c["kwargs"]))
                     for c in cfg["model_kwargs"]["layer_configs"]]
    for key in list(layer_configs[0]["kwargs"]):
        if key.endswith("normalization_type"):
            layer_configs[0]["kwargs"][key] = "fused_BN_center"
    for mode in ("train", "eval", "test"):
        model = PointGNN(num_classes=4, box_encoding_len=7,
                         layer_configs=layer_configs, mode=mode)
        assert model._has_bn
        assert model.edge_chunks == 1  # batch stats need unchunked edges
