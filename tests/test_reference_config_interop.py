"""Config interop: the reference's shipped JSON config files drive this
framework unchanged (loader, registries, model construction, forward).

Skipped when the reference checkout is not mounted.
"""

import os

import numpy as np
import pytest

REF_CONFIGS = "/root/reference/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS), reason="reference configs not mounted"
)


@pytest.mark.parametrize(
    "name",
    [
        "car_auto_T3_train_config",
        "car_auto_T0_train_config",
        "ped_cyl_auto_T3_trainval_config",
    ],
)
def test_reference_config_loads_and_runs(name):
    import jax

    from pointgnn_tpu.graph import builder, pad
    from pointgnn_tpu.graph.pad import GraphCapacity
    from pointgnn_tpu.infer import input_feature_dim
    from pointgnn_tpu.model import encodings
    from pointgnn_tpu.model.pointgnn import get_model
    from pointgnn_tpu.utils import config_io
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    config_complete = config_io.load_config(os.path.join(REF_CONFIGS, name))
    config = config_complete.get("train", config_complete)
    enc_len = encodings.get_encoding_len(config["box_encoding_method"])
    assert enc_len == 7
    model = get_model(config["model_name"])(
        num_classes=config["num_classes"],
        box_encoding_len=enc_len,
        mode="test",
        **config["model_kwargs"],
    )
    points, _ = synthetic_lidar_frame(seed=0)
    pts = points.mask(np.arange(2500))
    rng = np.random.default_rng(0)
    vcl, kil, el = builder.gen_multi_level_local_graph_v3(
        pts.xyz, **config["graph_gen_kwargs"], rng=rng
    )
    cap = GraphCapacity(vertices=(4096, 1024, 1024), edges=(16384, 65536))
    dim = input_feature_dim(config["input_features"])
    frame = pad.FrameData(
        np.zeros((pts.n, dim), np.float32), vcl, kil, el
    )
    graph = pad.pad_frame(frame, cap)
    params = model.init(jax.random.PRNGKey(0), input_dim=dim)
    logits, boxes = jax.jit(model.apply)(params, graph)
    assert logits.shape == (1024, config["num_classes"])
    assert boxes.shape == (1024, config["num_classes"], 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_reference_train_config_drives_optimizer():
    from pointgnn_tpu.train import optimizers
    from pointgnn_tpu.utils import config_io

    tc = config_io.load_train_config(
        os.path.join(REF_CONFIGS, "car_auto_T3_train_train_config")
    )
    assert tc["optimizer"] == "sgd"
    opt, lr = optimizers.build_from_train_config(tc)
    assert lr(0) == pytest.approx(tc["initial_lr"])
    assert lr(tc["decay_step"]) == pytest.approx(
        tc["initial_lr"] * tc["decay_factor"]
    )


def test_reference_aug_configs_compose():
    from pointgnn_tpu.data import augment
    from pointgnn_tpu.utils import config_io

    tc = config_io.load_train_config(
        os.path.join(REF_CONFIGS, "car_auto_T3_train_train_config")
    )
    fn = augment.get_data_aug(tc["data_aug_configs"])
    assert callable(fn)
