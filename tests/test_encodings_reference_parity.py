"""Numerical parity vs the reference implementation.

The reference's box_encoding.py is pure numpy, so when the reference
tree is mounted we import it directly and compare outputs bit-for-bit
(up to float tolerance).  Skipped when the mount is absent.
"""

import importlib.util
import os

import numpy as np
import pytest

from pointgnn_tpu.model import encodings as E

REF = "/root/reference/models/box_encoding.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.isfile(REF):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_box_encoding", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


LABEL_MAP = {
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


def _problem(rng, n=5000):
    cls = rng.choice(list(LABEL_MAP.values()) + [2, 4, 6, 8], (n, 1))
    pts = rng.random_sample((n, 3)) * 20 - 10
    boxes = rng.random_sample((n, 1, 7)) * 10
    boxes[:, :, 3:6] = np.abs(boxes[:, :, 3:6]) + 0.1
    return cls, pts, boxes


@pytest.mark.parametrize(
    "name",
    [
        "classaware_all_class_box_encoding",
        "classaware_all_class_box_canonical_encoding",
    ],
)
def test_classaware_encode_decode_parity(ref, rng, name):
    cls, pts, boxes = _problem(rng)
    ref_enc = ref.get_box_encoding_fn(name)(
        cls, pts, boxes.copy(), LABEL_MAP
    )
    my_enc = E.get_box_encoding_fn(name)(cls, pts, boxes, LABEL_MAP)
    np.testing.assert_allclose(my_enc, ref_enc, rtol=1e-10, atol=1e-10)

    ref_dec = ref.get_box_decoding_fn(name)(
        cls, pts, ref_enc.copy(), LABEL_MAP
    )
    my_dec = E.get_box_decoding_fn(name)(cls, pts, my_enc, LABEL_MAP)
    np.testing.assert_allclose(my_dec, ref_dec, rtol=1e-10, atol=1e-10)


def test_classaware_voxelnet_parity(ref, rng):
    cls = rng.choice(8, (3000, 1))
    pts = rng.random_sample((3000, 3)) * 10
    boxes = rng.random_sample((3000, 1, 7)) * 10
    boxes[:, :, 3:6] = np.abs(boxes[:, :, 3:6]) + 0.1
    ref_enc = ref.classaware_voxelnet_box_encoding(cls, pts, boxes.copy())
    my_enc = E.classaware_voxelnet_box_encoding(cls, pts, boxes)
    # The reference leaves inactive rows' l,h,w untouched but zeroes the
    # rest of the row buffer; compare only the defined entries:
    valid = ((cls > 0) & (cls < 7))[:, 0]
    np.testing.assert_allclose(
        my_enc[valid], ref_enc[valid], rtol=1e-10, atol=1e-10
    )
    ref_dec = ref.classaware_voxelnet_box_decoding(cls, pts, ref_enc.copy())
    my_dec = E.classaware_voxelnet_box_decoding(cls, pts, my_enc)
    np.testing.assert_allclose(
        my_dec[valid], ref_dec[valid], rtol=1e-10, atol=1e-10
    )


def test_voxelnet_parity(ref, rng):
    cls = rng.choice(5, (3000, 1))
    pts = rng.random_sample((3000, 3)) * 10
    boxes = rng.random_sample((3000, 7)) * 10
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.1
    ref_enc = ref.voxelnet_box_encoding(cls, pts, boxes.copy())
    my_enc = E.voxelnet_box_encoding(cls, pts, boxes)
    np.testing.assert_allclose(my_enc, ref_enc, rtol=1e-10, atol=1e-10)
    ref_dec = ref.voxelnet_box_decoding(cls, pts, ref_enc.copy())
    my_dec = E.voxelnet_box_decoding(cls, pts, my_enc)
    np.testing.assert_allclose(my_dec, ref_dec, rtol=1e-10, atol=1e-10)
