"""Device-side label assignment + encode vs the host assigner."""

import jax
import jax.numpy as jnp
import numpy as np

from pointgnn_tpu.data import labels as labels_lib
from pointgnn_tpu.graph import device_labels as dl
from pointgnn_tpu.model import encodings


def _synthetic_labels(rng, n_cars=6):
    out = []
    for _ in range(n_cars):
        out.append({
            "name": "Car",
            "x3d": rng.uniform(-15, 15), "y3d": rng.uniform(0.5, 2.0),
            "z3d": rng.uniform(5, 40), "length": rng.uniform(3, 4.5),
            "height": rng.uniform(1.3, 1.8), "width": rng.uniform(1.5, 2),
            "yaw": rng.uniform(-np.pi, np.pi),
        })
    out.append({  # unmapped class -> DontCare id, valid 0
        "name": "Truck",
        "x3d": 0.0, "y3d": 1.0, "z3d": 20.0, "length": 8.0,
        "height": 3.0, "width": 2.5, "yaw": 0.3,
    })
    out.append({  # DontCare by name: skipped entirely
        "name": "DontCare",
        "x3d": 5.0, "y3d": 1.0, "z3d": 10.0, "length": 2.0,
        "height": 1.0, "width": 1.0, "yaw": 0.0,
    })
    return out


def test_device_assignment_matches_host(rng):
    np_rng = np.random.RandomState(3)
    labels = _synthetic_labels(np_rng)
    label_map, num_classes = labels_lib.LABEL_METHODS["Car"]
    # keypoints: background + points inside the objects
    kp = np_rng.uniform([-20, 0, 0], [20, 3, 50], (2000, 3)).astype(
        np.float32
    )
    for lab in labels[:6]:
        center = np.array([lab["x3d"], lab["y3d"] - 0.5, lab["z3d"]])
        kp[np_rng.choice(2000, 40, replace=False)] = (
            center + np_rng.uniform(-0.5, 0.5, (40, 3))
        ).astype(np.float32)

    host_cls, host_boxes, host_valid, _ = (
        labels_lib.assign_classaware_labels(
            labels, kp.astype(np.float64), (1.0, 1.0, 1.0),
            label_map, num_classes,
        )
    )
    packed = dl.pack_frame_labels(labels, label_map, num_classes)
    kp_mask = jnp.ones((2000,), jnp.float32)
    dev_cls, dev_box, dev_valid = jax.jit(dl.assign_labels_jax)(
        jnp.asarray(kp), kp_mask, packed
    )
    np.testing.assert_array_equal(np.asarray(dev_cls), host_cls[:, 0])
    np.testing.assert_array_equal(
        np.asarray(dev_valid), host_valid[:, 0, 0]
    )
    np.testing.assert_allclose(
        np.asarray(dev_box), host_boxes[:, 0, :], rtol=1e-5, atol=1e-5
    )

    # device encode == host encode on the assigned targets
    enc_fn = dl.get_encode_jax(
        "classaware_all_class_box_encoding", label_map
    )
    dev_enc = np.asarray(jax.jit(enc_fn)(dev_cls, jnp.asarray(kp), dev_box))
    host_enc = encodings.classaware_all_class_box_encoding(
        host_cls, kp.astype(np.float64), host_boxes, label_map
    )[:, 0, :]
    np.testing.assert_allclose(dev_enc, host_enc, rtol=2e-4, atol=2e-4)
    # decode round-trips for valid foreground targets
    dec = encodings.classaware_decode_jax(
        dev_cls, jnp.asarray(kp), jnp.asarray(dev_enc),
        encodings.build_class_tables(label_map),
    )
    fg = np.asarray(dev_valid) > 0
    np.testing.assert_allclose(
        np.asarray(dec)[fg], np.asarray(dev_box)[fg], rtol=1e-3, atol=1e-3
    )


def test_pack_frame_labels_overflow_warns():
    import warnings

    label_map, num_classes = labels_lib.LABEL_METHODS["Car"]
    labels = _synthetic_labels(np.random.RandomState(0), n_cars=70)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        packed = dl.pack_frame_labels(
            labels, label_map, num_classes, max_boxes=64
        )
        assert any("extra labels dropped" in str(x.message) for x in w)
    assert packed.active.sum() == 64
