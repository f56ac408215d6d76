"""Augmentation suite: label/point consistency invariants per method."""

import numpy as np
import pytest

from pointgnn_tpu.core import boxes as box_ops
from pointgnn_tpu.core.points import Points
from pointgnn_tpu.data import augment, crop_aug


def _label(name="Car", x=0.0, y=1.0, z=20.0, yaw=0.0):
    return {
        "name": name, "x3d": x, "y3d": y, "z3d": z,
        "length": 4.0, "height": 1.6, "width": 1.8, "yaw": yaw,
        "truncation": 0.0, "occlusion": 0, "alpha": 0.0,
        "xmin": 0, "ymin": 0, "xmax": 100, "ymax": 100,
    }


@pytest.fixture
def frame():
    rng = np.random.default_rng(0)
    n = 3000
    xyz = np.column_stack(
        [
            rng.uniform(-30, 30, n),
            rng.uniform(-0.5, 2.0, n),
            rng.uniform(5, 60, n),
        ]
    )
    # dense cluster inside the car at (0, 1, 20)
    cluster = np.column_stack(
        [
            rng.uniform(-1.8, 1.8, 200),
            rng.uniform(-0.5, 0.9, 200),
            rng.uniform(19.2, 20.8, 200),
        ]
    )
    xyz = np.vstack([xyz, cluster])
    attr = rng.uniform(0, 1, (len(xyz), 4)).astype(np.float32)
    labels = [_label(), _label("Pedestrian", x=10.0), _label("DontCare", x=-900.0)]
    return Points(xyz=xyz, attr=attr), labels


def _points_in(label, xyz):
    return box_ops.points_in_box(xyz, box_ops.label_to_box(label)).sum()


def test_random_jitter(frame):
    points, labels = frame
    rng = np.random.default_rng(1)
    out, out_labels = augment.random_jitter(points, labels, rng=rng)
    assert out.xyz.shape == points.xyz.shape
    assert not np.allclose(out.xyz, points.xyz)
    assert out_labels == labels


def test_random_drop_and_global_drop(frame):
    points, labels = frame
    rng = np.random.default_rng(1)
    out, _ = augment.random_drop(points, labels, drop_prob=0.5, rng=rng)
    assert 0 < out.n < points.n
    out2, _ = augment.random_drop(points, labels, drop_prob=[0.2, 0.8], rng=rng)
    assert 0 < out2.n < points.n
    out3, _ = augment.random_global_drop(points, labels, rng=rng)
    assert 0 < out3.n <= points.n
    # drop everything -> restored
    out4, _ = augment.random_drop(points, labels, drop_prob=1.0, rng=rng)
    assert out4.n == points.n


def test_random_voxel_downsample(frame):
    points, labels = frame
    rng = np.random.default_rng(3)
    out, _ = augment.random_voxel_downsample(points, labels, rng=rng)
    assert out.n <= points.n


def test_random_rotation_all_consistency(frame):
    points, labels = frame
    rng = np.random.default_rng(2)
    n_before = _points_in(labels[0], points.xyz)
    out, out_labels = augment.random_rotation_all(
        points, labels, yaw_std=0.5, rng=rng
    )
    # points stay inside their (rotated) boxes
    assert _points_in(out_labels[0], out.xyz) == n_before
    # DontCare untouched
    assert out_labels[2]["x3d"] == labels[2]["x3d"]
    # norm preserved by rotation
    np.testing.assert_allclose(
        np.linalg.norm(out.xyz, axis=1),
        np.linalg.norm(points.xyz, axis=1),
        rtol=1e-9,
    )


def test_random_flip_all(frame):
    points, labels = frame
    n_before = _points_in(labels[0], points.xyz)
    out, out_labels = augment.random_flip_all(
        points, labels, flip_prob=1.1, rng=np.random.default_rng(0)
    )
    np.testing.assert_allclose(out.xyz[:, 0], -points.xyz[:, 0])
    assert out_labels[0]["yaw"] == np.pi - labels[0]["yaw"]
    assert _points_in(out_labels[0], out.xyz) == n_before
    # flip_prob=0 -> no-op
    same, _ = augment.random_flip_all(
        points, labels, flip_prob=0.0, rng=np.random.default_rng(0)
    )
    np.testing.assert_array_equal(same.xyz, points.xyz)


def test_random_scale_all(frame):
    points, labels = frame
    n_before = _points_in(labels[0], points.xyz)
    out, out_labels = augment.random_scale_all(
        points, labels, scale_std=0.2, rng=np.random.default_rng(5)
    )
    assert _points_in(out_labels[0], out.xyz) == n_before
    ratio = out_labels[0]["length"] / labels[0]["length"]
    np.testing.assert_allclose(out.xyz, points.xyz * ratio)


def test_random_transition(frame):
    points, labels = frame
    n_before = _points_in(labels[0], points.xyz)
    out, out_labels = augment.random_transition(
        points, labels, xyz_std=(1, 1, 1), rng=np.random.default_rng(4)
    )
    assert _points_in(out_labels[0], out.xyz) == n_before


def test_random_box_rotation(frame):
    points, labels = frame
    n_before = _points_in(labels[0], points.xyz)
    out, out_labels = augment.random_box_rotation(
        points, labels, yaw_std=0.4, max_overlap_num_allowed=5,
        rng=np.random.default_rng(6),
    )
    assert len(out_labels) == len(labels)
    assert out.n == points.n
    # rotated box still holds (at least) its cluster
    assert _points_in(out_labels[0], out.xyz) >= 0.9 * n_before


def test_random_box_global_rotation(frame):
    points, labels = frame
    out, out_labels = augment.random_box_global_rotation(
        points, labels, yaw_std=0.3, max_overlap_num_allowed=50,
        rng=np.random.default_rng(7),
    )
    assert len(out_labels) == len(labels)
    assert out.n <= points.n  # swallowed points may be removed
    assert _points_in(out_labels[0], out.xyz) > 0


def test_random_box_shift(frame):
    points, labels = frame
    n_before = _points_in(labels[0], points.xyz)
    out, out_labels = augment.random_box_shift(
        points, labels, xyz_std=(3, 0, 3), max_overlap_num_allowed=20,
        max_overlap_rate=0.01, rng=np.random.default_rng(8),
    )
    assert len(out_labels) == len(labels)
    assert _points_in(out_labels[0], out.xyz) >= 0.9 * n_before


def test_dilute_and_remove_background(frame):
    points, labels = frame
    out, kept = augment.dilute_background(
        points, labels, rng=np.random.default_rng(9)
    )
    assert out.n < points.n
    assert all(l["name"] != "DontCare" for l in kept)
    out2, kept2 = augment.remove_background(
        points, labels, rng=np.random.default_rng(9)
    )
    assert 0 < out2.n < points.n
    # every surviving point is near an object box
    assert all(l["name"] != "DontCare" for l in kept2)


def test_composer_matches_reference_config(frame):
    points, labels = frame
    aug_configs = [
        {
            "method_name": "random_rotation_all",
            "method_kwargs": {"method_name": "normal", "yaw_std": 0.39,
                              "expend_factor": [1.0, 1.0, 1.0]},
        },
        {"method_name": "random_flip_all", "method_kwargs": {"flip_prob": 0.5}},
        {
            "method_name": "random_box_shift",
            "method_kwargs": {
                "method_name": "normal", "xyz_std": [3, 0, 3],
                "expend_factor": [1.1, 1.1, 1.1],
                "max_overlap_num_allowed": 100, "max_overlap_rate": 0.01,
                "appr_factor": 10, "max_trails": 100,
            },
        },
    ]
    fn = augment.get_data_aug(aug_configs)
    out, out_labels = fn(points, labels, rng=np.random.default_rng(10))
    assert out.n == points.n
    assert len(out_labels) == len(labels)
    # empty config -> identity
    assert augment.get_data_aug([]) is augment.empty


def test_crop_aug_roundtrip(tmp_path, frame):
    points, labels = frame
    lib = {
        "Car": [_label(x=0.0, z=0.0)],
        "Pedestrian": [_label("Pedestrian", x=0.0, z=0.0)],
    }
    pts = {
        "Car": [
            [np.random.uniform(-1, 1, (30, 3)).tolist(),
             np.random.uniform(0, 1, (30, 4)).tolist()]
        ],
        "Pedestrian": [
            [np.random.uniform(-0.3, 0.3, (20, 3)).tolist(),
             np.random.uniform(0, 1, (20, 4)).tolist()]
        ],
    }
    import json

    path = str(tmp_path / "crops.json")
    with open(path, "w") as f:
        json.dump((lib, pts), f)
    sampler = crop_aug.CropAugSampler(path)
    out, out_labels = sampler.crop_aug(
        points,
        labels,
        sample_rate={"Car": 1, "Pedestrian": 1},
        parser_kwargs={
            "overlap_mode": "box_and_point",
            "max_overlap_num_allowed": 50,
            "max_trails": 10,
            "yaw_std": 0.3,
        },
        rng=np.random.default_rng(11),
    )
    assert len(out_labels) >= len(labels)
    if len(out_labels) > len(labels):
        assert out.n != points.n


def test_save_and_load_cropped_boxes(tmp_path, frame):
    # minimal dataset stub exposing the two methods save_cropped_boxes uses
    points, labels = frame

    class Stub:
        num_files = 1

        def get_label(self, i):
            return labels

        def get_cam_points_in_image_with_rgb(self, i):
            return points

    path = str(tmp_path / "lib.json")
    crop_aug.save_cropped_boxes(Stub(), path, minimum_points=10)
    loaded_labels, loaded_points = crop_aug.load_cropped_boxes(path)
    assert "Car" in loaded_labels
    assert loaded_points["Car"][0].xyz.shape[1] == 3
