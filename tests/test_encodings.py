import numpy as np
import pytest

from pointgnn_tpu.model import encodings as E

LABEL_MAP_8 = {
    "Background": 0,
    "Car": 1,
    "Pedestrian": 3,
    "Cyclist": 5,
    "Van": 7,
    "Truck": 9,
    "Person_sitting": 11,
    "Tram": 13,
    "Misc": 15,
    "DontCare": 17,
}
LABEL_MAP_CAR = {"Background": 0, "Car": 1, "DontCare": 3}


def _random_classaware_problem(rng, n=2000, ids=(0, 1, 3, 5, 7, 9, 11, 13, 15, 17)):
    cls_labels = rng.choice(ids, (n, 1))
    points_xyz = rng.random_sample((n, 3)) * 10
    boxes_3d = rng.random_sample((n, 1, 7)) * 10
    boxes_3d[:, :, 3:6] = np.abs(boxes_3d[:, :, 3:6]) + 0.1
    return cls_labels, points_xyz, boxes_3d


@pytest.mark.parametrize(
    "method",
    [
        "direct_encoding",
        "center_box_encoding",
        "classaware_all_class_box_encoding",
        "classaware_all_class_box_canonical_encoding",
    ],
)
def test_roundtrip(rng, method):
    cls, pts, boxes = _random_classaware_problem(rng)
    if method in ("direct_encoding", "center_box_encoding"):
        boxes = boxes[:, 0, :]
    enc_fn = E.get_box_encoding_fn(method)
    dec_fn = E.get_box_decoding_fn(method)
    enc = enc_fn(cls, pts, boxes, LABEL_MAP_8)
    dec = dec_fn(cls, pts, enc, LABEL_MAP_8)
    np.testing.assert_allclose(dec, boxes, atol=1e-8)
    assert E.get_encoding_len(method) == 7


def test_voxelnet_roundtrip(rng):
    cls = rng.choice(5, (1000, 1))
    pts = rng.random_sample((1000, 3)) * 10
    boxes = rng.random_sample((1000, 7)) * 10
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.1
    enc = E.voxelnet_box_encoding(cls, pts, boxes)
    dec = E.voxelnet_box_decoding(cls, pts, enc)
    np.testing.assert_allclose(dec, boxes, atol=1e-8)


def test_classaware_voxelnet_roundtrip(rng):
    cls = rng.choice(8, (1000, 1))
    pts = rng.random_sample((1000, 3)) * 10
    boxes = rng.random_sample((1000, 1, 7)) * 10
    boxes[:, :, 3:6] = np.abs(boxes[:, :, 3:6]) + 0.1
    enc = E.classaware_voxelnet_box_encoding(cls, pts, boxes)
    dec = E.classaware_voxelnet_box_decoding(cls, pts, enc)
    valid = ((cls > 0) & (cls < 7))[:, 0]
    np.testing.assert_allclose(dec[valid], boxes[valid], atol=1e-8)


def test_encoding_is_pure(rng):
    cls, pts, boxes = _random_classaware_problem(rng, n=100)
    before = boxes.copy()
    E.classaware_all_class_box_encoding(cls, pts, boxes, LABEL_MAP_8)
    np.testing.assert_array_equal(boxes, before)


def test_active_classes_are_scale_normalized(rng):
    """Car rows must be normalized by the Car median size."""
    n = 4
    cls = np.full((n, 1), 1)  # Car horizontal
    pts = np.zeros((n, 3))
    boxes = np.zeros((n, 1, 7))
    l, h, w = E.MEDIAN_OBJECT_SIZE["Car"]
    boxes[:, 0, 3:6] = (l, h, w)
    boxes[:, 0, 0:3] = (l, h, w)  # offset equal to one size unit
    enc = E.classaware_all_class_box_encoding(cls, pts, boxes, LABEL_MAP_CAR)
    np.testing.assert_allclose(enc[:, 0, 0:3], 1.0, atol=1e-9)
    np.testing.assert_allclose(enc[:, 0, 3:6], 0.0, atol=1e-9)


def test_vertical_subclass_yaw_offset():
    cls = np.array([[2]])  # Car vertical
    pts = np.zeros((1, 3))
    boxes = np.zeros((1, 1, 7))
    boxes[0, 0, 3:6] = E.MEDIAN_OBJECT_SIZE["Car"]
    boxes[0, 0, 6] = np.pi / 2
    enc = E.classaware_all_class_box_encoding(cls, pts, boxes, LABEL_MAP_CAR)
    assert np.isclose(enc[0, 0, 6], 0.0)


def test_inactive_ids_passthrough_offset_only(rng):
    cls = np.array([[0], [3]])  # Background, DontCare (car map)
    pts = rng.random_sample((2, 3))
    boxes = rng.random_sample((2, 1, 7))
    enc = E.classaware_all_class_box_encoding(cls, pts, boxes, LABEL_MAP_CAR)
    np.testing.assert_allclose(
        enc[:, 0, 0:3], boxes[:, 0, 0:3] - pts, atol=1e-12
    )
    np.testing.assert_allclose(enc[:, 0, 3:], boxes[:, 0, 3:], atol=1e-12)


def test_jax_decode_matches_numpy(rng):
    cls, pts, boxes = _random_classaware_problem(rng, n=512, ids=(0, 1, 2, 3))
    label_map = LABEL_MAP_CAR
    tables = E.build_class_tables(label_map)
    enc = E.classaware_all_class_box_encoding(cls, pts, boxes, label_map)
    dec_np = E.classaware_all_class_box_decoding(cls, pts, enc, label_map)

    import jax

    dec_jax = jax.jit(
        lambda c, p, e: E.classaware_decode_jax(c, p, e, tables)
    )(
        cls[:, 0].astype(np.int32),
        pts.astype(np.float32),
        enc[:, 0, :].astype(np.float32),
    )
    np.testing.assert_allclose(
        np.asarray(dec_jax), dec_np[:, 0, :], rtol=2e-5, atol=2e-5
    )


# --------------------------------------------------------------------------
# Device-decoder dispatch: get_decode_jax must match the host decoder for
# EVERY registered encoding (the fused inference path was previously
# hardwired to classaware semantics; reference dispatch
# box_encoding.py:469-502).
# --------------------------------------------------------------------------

_DEVICE_DECODE_IDS = {
    "direct_encoding": (0, 1, 2, 3),
    "center_box_encoding": (0, 1, 2, 3),
    "voxelnet_box_encoding": (0, 1, 2, 3),
    "classaware_voxelnet_box_encoding": (0, 1, 2, 3, 4, 5, 6, 7),
    "classaware_all_class_box_encoding": (0, 1, 3, 5, 7, 9, 11, 13, 15, 17),
    "classaware_all_class_box_canonical_encoding":
        (0, 1, 3, 5, 7, 9, 11, 13, 15, 17),
}


@pytest.mark.parametrize("method", sorted(_DEVICE_DECODE_IDS))
def test_device_decode_matches_host(rng, method):
    import jax

    n = 512
    ids = _DEVICE_DECODE_IDS[method]
    cls_labels = rng.choice(ids, (n, 1))
    points_xyz = (rng.random_sample((n, 3)) * 10).astype(np.float32)
    encoded = (rng.random_sample((n, 7)).astype(np.float32) - 0.5) * 2
    host_fn = E.get_box_decoding_fn(method)
    if method.startswith("classaware"):
        host = host_fn(
            cls_labels, points_xyz, encoded[:, None, :].astype(np.float64),
            LABEL_MAP_8,
        )[:, 0, :]
    else:
        host = host_fn(
            cls_labels[:, 0], points_xyz, encoded.astype(np.float64),
            LABEL_MAP_8,
        )
    dev_fn = E.get_decode_jax(method, LABEL_MAP_8)
    dev = np.asarray(
        jax.jit(dev_fn)(
            cls_labels[:, 0].astype(np.int32), points_xyz, encoded
        )
    )
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-5)


def test_pipeline_uses_config_decoder():
    """InferencePipeline binds the decoder matching the config's
    box_encoding_method instead of assuming classaware."""
    from pointgnn_tpu import configs
    from pointgnn_tpu.infer import InferencePipeline

    cfg = configs.model_config("Car", T=1)
    cfg = dict(cfg, box_encoding_method=
               "classaware_all_class_box_canonical_encoding")
    pipe = InferencePipeline(cfg, use_box_merge=False, use_box_score=False)
    assert pipe.decode_jax.func is E.classaware_canonical_decode_jax
