import numpy as np
import pytest

from pointgnn_tpu.core import boxes as B


def _reference_single_box_corners(box, expand=(1.0, 1.0, 1.0)):
    """Direct transliteration of the corner formula for independent
    verification (kitti_dataset.py:85-116 semantics)."""
    x, y, z, l, h, w, yaw = box
    R = np.array(
        [
            [np.cos(yaw), 0, np.sin(yaw)],
            [0, 1, 0],
            [-np.sin(yaw), 0, np.cos(yaw)],
        ]
    )
    dh = h * (expand[0] - 1)
    w = w * expand[1]
    l = l * expand[2]
    corners = np.array(
        [
            [l / 2, dh / 2, w / 2],
            [l / 2, dh / 2, -w / 2],
            [-l / 2, dh / 2, -w / 2],
            [-l / 2, dh / 2, w / 2],
            [l / 2, -h - dh / 2, w / 2],
            [l / 2, -h - dh / 2, -w / 2],
            [-l / 2, -h - dh / 2, -w / 2],
            [-l / 2, -h - dh / 2, w / 2],
        ]
    )
    return corners.dot(R.T) + np.array([x, y, z])


@pytest.mark.parametrize("expand", [(1.0, 1.0, 1.0), (1.1, 1.2, 1.3)])
def test_corners_match_reference_formula(rng, expand):
    for _ in range(20):
        box = rng.uniform(-5, 5, size=7)
        box[3:6] = np.abs(box[3:6]) + 0.5
        got = B.boxes_to_corners(box[None], expand)[0]
        want = _reference_single_box_corners(box, expand)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_points_in_box_axis_aligned():
    box = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0])
    pts = np.array(
        [
            [0.0, -1.0, 0.0],   # center of volume -> inside
            [1.9, -0.1, 0.9],   # near corner -> inside
            [2.1, -1.0, 0.0],   # beyond +l/2 -> outside
            [0.0, 0.5, 0.0],    # below bottom face (y>0) -> outside
            [0.0, -2.1, 0.0],   # above top -> outside
        ]
    )
    mask = B.points_in_box(pts, box)
    assert mask.tolist() == [True, True, False, False, False]


def test_points_in_box_rotated(rng):
    yaw = 0.7
    box = np.array([1.0, 2.0, 3.0, 4.0, 2.0, 2.0, yaw])
    # generate points in the box frame, map into world, all must be inside
    local = rng.uniform(
        [-1.9, -1.9, -0.9], [1.9, -0.1, 0.9], size=(100, 3)
    )
    R = B.yaw_rotation(np.array(yaw))
    world = local @ R.T + box[:3]
    assert B.points_in_box(world, box).all()
    # points clearly outside
    far = world + 10.0
    assert not B.points_in_box(far, box).any()


def test_points_in_box_bev_ignores_height():
    box = np.array([0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.3])
    pts = np.array([[0.0, -50.0, 0.0], [0.0, 50.0, 0.0]])
    assert B.points_in_box_bev(pts, box).all()
    assert not B.points_in_box(pts, box).any()


def test_normals_bounds_consistency(rng):
    for _ in range(10):
        box = rng.uniform(-5, 5, size=7)
        box[3:6] = np.abs(box[3:6]) + 0.5
        normals, lower, upper = B.boxes_to_normals(box[None])
        assert (upper[0] > lower[0]).all()


def test_normalize_yaw():
    assert np.isclose(B.normalize_yaw(np.pi), 0.0)
    assert np.isclose(B.normalize_yaw(-np.pi / 2), np.pi / 2)
    assert np.isclose(B.normalize_yaw(0.1), 0.1)
    v = B.normalize_yaw(0.75 * np.pi)
    assert -0.25 * np.pi <= v <= 0.75 * np.pi


def test_label_box_roundtrip():
    box = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.5])
    assert np.allclose(B.label_to_box(B.box_to_label(box)), box)
