"""Reference-checkpoint converter: name map round-trip + CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _fake_tf_vars(model, params):
    """Flatten our params under the reference's TF variable names
    (pointgnn_tpu/train/convert.py's slim scheme): biases only on plain
    layers, ``BatchNorm/*`` vars on normalized layers."""
    from pointgnn_tpu.train.convert import reference_name_map

    name_map = reference_name_map(
        model.layer_configs, model.num_classes
    )
    tf_vars = {}

    def put(descs, layers):
        for d, layer in zip(descs, layers):
            tf_vars[d["w"]] = np.asarray(layer["w"])
            if d["b"]:
                tf_vars[d["b"]] = np.asarray(layer["b"])
            if d["bn"]:
                norm = layer["norm"]
                tf_vars[d["bn"] + "/moving_mean"] = np.asarray(
                    norm["ema_mean"]
                )
                tf_vars[d["bn"] + "/moving_variance"] = np.asarray(
                    norm["ema_var"]
                )
                if d["center"]:
                    tf_vars[d["bn"] + "/beta"] = np.asarray(
                        norm["beta"]
                    )

    for scope, entry in name_map.items():
        for key, descs in entry.items():
            if key == ("loc",):
                for ci, ds in enumerate(descs):
                    put(ds, params[scope]["loc"][ci])
            else:
                put(descs, params[scope][key])
    # the checkpoint also carries entries the converter must ignore
    tf_vars["global_step"] = np.asarray(1400000)
    return tf_vars


@pytest.fixture(scope="module")
def model_and_params():
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.model.pointgnn import PointGNN

    cfg = configs.model_config("Car", T=2)
    model = PointGNN(
        num_classes=cfg["num_classes"],
        box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"],
        mode="test",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    return cfg, model, params


def test_convert_round_trip(model_and_params):
    from pointgnn_tpu.train.convert import convert_reference_weights

    cfg, model, params = model_and_params
    tf_vars = _fake_tf_vars(model, params)
    rebuilt = convert_reference_weights(
        tf_vars, model.layer_configs, model.num_classes
    )
    import jax

    ref_leaves = jax.tree_util.tree_leaves(params)
    new_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), rebuilt
        )
    )
    assert len(ref_leaves) == len(new_leaves)
    for a, b in zip(ref_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_missing_variable_raises(model_and_params):
    from pointgnn_tpu.train.convert import convert_reference_weights

    cfg, model, params = model_and_params
    tf_vars = _fake_tf_vars(model, params)
    victim = next(k for k in tf_vars if k.endswith("weights"))
    del tf_vars[victim]
    with pytest.raises(KeyError, match="missing"):
        convert_reference_weights(
            tf_vars, model.layer_configs, model.num_classes
        )


def test_convert_cli_produces_loadable_checkpoint(
    model_and_params, tmp_path
):
    from pointgnn_tpu.utils.config_io import save_config

    cfg, model, params = model_and_params
    tf_vars = _fake_tf_vars(model, params)
    npz = str(tmp_path / "ref.npz")
    np.savez(npz, **tf_vars)
    cfg_path = str(tmp_path / "config")
    save_config(cfg_path, cfg)
    out_dir = str(tmp_path / "converted")
    r = subprocess.run(
        [sys.executable,
         os.path.join(TOOLS, "convert_reference_checkpoint.py"),
         npz, cfg_path, out_dir, "--step", "1400000"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    from pointgnn_tpu.train import checkpoint as ckpt

    state, step = ckpt.restore_checkpoint(out_dir)
    assert step == 1400000
    restored = state["params"]

    # converted params drive the model to the same outputs
    import jax
    import jax.numpy as jnp

    from pointgnn_tpu.graph import builder, pad
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    points, _ = synthetic_lidar_frame(seed=0)
    rng = np.random.default_rng(0)
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        points.xyz[:4000], **cfg["graph_gen_kwargs"], rng=rng
    )
    cap = pad.GraphCapacity(
        vertices=(4096, 2048, 2048), edges=(16384, 65536)
    )
    frame = pad.FrameData(
        points.attr[:4000, :1].astype(np.float32), vcl, kil, el
    )
    graph = pad.pad_frame(frame, cap)
    ref_logits, ref_boxes = model.apply(params, graph)
    new_logits, new_boxes = model.apply(restored, graph)
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(new_logits), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_boxes), np.asarray(new_boxes), atol=1e-5
    )


def test_convert_bn_config_round_trip():
    """BN configs convert: slim drops biases on normalized layers and
    stores BatchNorm/{beta,moving_mean,moving_variance}; the converter
    maps them into our norm slots and zero-fills the dropped biases.
    flatten(convert(V)) == V proves the name map is a bijection over
    the checkpoint's variables."""
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.model.pointgnn import PointGNN
    from pointgnn_tpu.train.convert import convert_reference_weights

    cfg = configs.model_config("Car", T=1)
    for lc in cfg["model_kwargs"]["layer_configs"]:
        for k in list(lc["kwargs"]):
            if k.endswith("normalization_type"):
                lc["kwargs"][k] = "fused_BN_center"
    model = PointGNN(
        num_classes=cfg["num_classes"], box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"], mode="eval",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    tf_vars = _fake_tf_vars(model, params)
    assert any("BatchNorm/moving_mean" in k for k in tf_vars)
    assert any("BatchNorm/beta" in k for k in tf_vars)
    # normalized layers have no biases; is_logits finals keep theirs
    assert not any(
        k == "layer1/extract_vertex_features/fully_connected/biases"
        for k in tf_vars
    )
    assert "output/predictor/cls/fully_connected_1/biases" in tf_vars

    # randomize every checkpoint array, convert, flatten back
    rng = np.random.default_rng(0)
    tf_vars = {
        k: (
            # variances must stay positive or BN rsqrt NaNs
            (np.abs(rng.normal(0, 1, v.shape)) + 0.5
             if k.endswith("moving_variance")
             else rng.normal(0, 1, v.shape)).astype(np.float32)
            if getattr(v, "ndim", 0) else v
        )
        for k, v in tf_vars.items()
    }
    rebuilt = convert_reference_weights(
        tf_vars, model.layer_configs, model.num_classes
    )
    import jax.tree_util as jtu

    assert jtu.tree_structure(rebuilt) == jtu.tree_structure(
        jtu.tree_map(np.asarray, params)
    )
    out_vars = _fake_tf_vars(model, rebuilt)
    assert set(out_vars) == set(tf_vars)
    for k in tf_vars:
        np.testing.assert_array_equal(out_vars[k], tf_vars[k])
    # dropped biases land as zeros
    b0 = rebuilt["layer1"]["point_mlp"][0]["b"]
    assert (np.asarray(b0) == 0).all() and b0.shape[0] > 0
    # eval-mode forward runs with the converted tree (stored-stat BN)
    from pointgnn_tpu.graph import builder, pad
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    points, _ = synthetic_lidar_frame(seed=0)
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        points.xyz[:2000], **cfg["graph_gen_kwargs"],
        rng=np.random.default_rng(0),
    )
    cap = pad.GraphCapacity(
        vertices=(2048, 1024, 1024), edges=(8192, 16384)
    )
    frame = pad.FrameData(
        points.attr[:2000, :1].astype(np.float32), vcl, kil, el
    )
    graph = pad.pad_frame(frame, cap)
    logits, boxes = model.apply(rebuilt, graph)
    assert np.isfinite(np.asarray(logits)).all()
