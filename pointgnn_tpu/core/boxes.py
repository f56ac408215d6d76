"""7-DoF 3D box geometry in KITTI camera coordinates.

A box is ``(x, y, z, l, h, w, yaw)``: center of the *bottom* face at
``(x, y, z)`` (camera frame: x right, y down, z forward), length ``l``
along the heading axis, height ``h`` upward (negative y), width ``w``,
and ``yaw`` the rotation around the y axis.

Behavioral parity targets (all formulas re-derived, fully vectorized):
- corners layout matches /root/reference/models/nms.py:9-27 and
  /root/reference/dataset/kitti_dataset.py:85-116 (order: front-up-right,
  front-up-left, back-up-left, back-up-right, then the four bottom
  corners at ``y - h``... note camera y points down so "up" rows are at
  ``y`` and the "down" rows at ``y - h`` in reference's sign convention).
- ``expand_factor`` semantics of kitti_dataset.py:100-110: height grows
  symmetrically by ``h*(f0-1)`` while width/length scale multiplicatively.
- face-normal bounds test of kitti_dataset.py:118-162.
"""

from typing import Dict, Tuple

import numpy as np

# Unit-box corner template in the box frame before yaw rotation.  Rows:
# 4 top corners (y=yt), then the same x/z pattern at the bottom (y=yb).
_CORNER_XZ = np.array(
    [[1, 1], [1, -1], [-1, -1], [-1, 1]], dtype=np.float64
)  # (l/2 sign, w/2 sign)


def yaw_rotation(yaw: np.ndarray) -> np.ndarray:
    """Rotation matrices about the camera y axis. [..., 3, 3]."""
    yaw = np.asarray(yaw)
    c, s = np.cos(yaw), np.sin(yaw)
    zeros = np.zeros_like(c)
    ones = np.ones_like(c)
    rows = np.stack(
        [
            np.stack([c, zeros, s], axis=-1),
            np.stack([zeros, ones, zeros], axis=-1),
            np.stack([-s, zeros, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def boxes_to_corners(
    boxes: np.ndarray, expand: Tuple[float, float, float] = (1.0, 1.0, 1.0)
) -> np.ndarray:
    """Convert ``[N, 7]`` boxes to ``[N, 8, 3]`` corner coordinates.

    With the default ``expand`` the top face sits at ``y`` and the bottom
    face at ``y - h`` (camera y points down, so visually the box extends
    upward).  ``expand=(f0, f1, f2)`` grows height symmetrically and
    scales width/length, matching the reference's ``expend_factor``.
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 7)
    x, y, z, l, h, w, yaw = [boxes[:, i] for i in range(7)]
    f0, f1, f2 = expand
    dh = h * (f0 - 1.0)
    w = w * f1
    l = l * f2
    # corners in box frame: [N, 8, 3]
    cx = np.concatenate([_CORNER_XZ[:, 0], _CORNER_XZ[:, 0]])[None, :]  # [1,8]
    cz = np.concatenate([_CORNER_XZ[:, 1], _CORNER_XZ[:, 1]])[None, :]
    local_x = cx * (l[:, None] / 2.0)
    local_z = cz * (w[:, None] / 2.0)
    top_y = (dh / 2.0)[:, None] * np.ones((1, 4))
    bot_y = (-h - dh / 2.0)[:, None] * np.ones((1, 4))
    local_y = np.concatenate([top_y, bot_y], axis=1)
    local = np.stack([local_x, local_y, local_z], axis=-1)  # [N, 8, 3]
    rot = yaw_rotation(yaw)  # [N, 3, 3]
    # batched matmul, not einsum: BLAS accumulation order makes this
    # BITWISE equal to the reference's per-box `corners.dot(R.T)`
    # (nms.py:24) — the KITTI-text byte-identity oracle depends on it
    rotated = np.matmul(local, rot.transpose(0, 2, 1))
    centers = np.stack([x, y, z], axis=-1)[:, None, :]
    return rotated + centers


def box_to_corners(box, expand=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Single-box convenience wrapper → [8, 3]."""
    return boxes_to_corners(np.asarray(box)[None, :], expand)[0]


def boxes_to_normals(
    boxes: np.ndarray, expand: Tuple[float, float, float] = (1.0, 1.0, 1.0)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-box face normals and projection bounds.

    Returns ``(normals [N,3,3], lower [N,3], upper [N,3])`` such that a
    point ``p`` lies inside box ``i`` iff
    ``lower[i] < normals[i] @ p < upper[i]`` component-wise.  The normals
    are *unnormalized* edge vectors (corner differences), exactly the
    construction of kitti_dataset.py:118-141, so bounds are comparable.
    """
    corners = boxes_to_corners(boxes, expand)  # [N, 8, 3]
    # axis x: corner0 - corner4 (top-front-right minus bottom-front-right
    # in the reference ordering) spans the height axis; axis y: 0-1 spans
    # width; axis z: 0-3 spans length.  Names follow the reference.
    wx = corners[:, 0, :] - corners[:, 4, :]
    wy = corners[:, 0, :] - corners[:, 1, :]
    wz = corners[:, 0, :] - corners[:, 3, :]
    normals = np.stack([wx, wy, wz], axis=1)  # [N, 3, 3]
    lo_pts = np.stack([corners[:, 4, :], corners[:, 1, :], corners[:, 3, :]], axis=1)
    hi_pts = np.stack([corners[:, 0, :], corners[:, 0, :], corners[:, 0, :]], axis=1)
    # row-wise dot via matmul (not einsum) for bitwise parity with the
    # reference's `np.matmul(w, corner)` bounds (kitti_dataset.py:931-940)
    lower = np.matmul(normals[:, :, None, :], lo_pts[:, :, :, None])[:, :, 0, 0]
    upper = np.matmul(normals[:, :, None, :], hi_pts[:, :, :, None])[:, :, 0, 0]
    return normals, lower, upper


def points_in_boxes(
    xyz: np.ndarray,
    boxes: np.ndarray,
    expand: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> np.ndarray:
    """Boolean mask [N_boxes, N_points]: strict interior test on all 3 axes."""
    normals, lower, upper = boxes_to_normals(boxes, expand)
    # batched matmul == the reference's per-box `matmul(xyz, normals.T)`
    # (kitti_dataset.py:952) bitwise; einsum is a few ulp off
    projected = np.matmul(
        np.asarray(xyz, np.float64)[None, :, :], normals.transpose(0, 2, 1)
    )
    inside = (projected > lower[:, None, :]) & (projected < upper[:, None, :])
    return inside.all(axis=-1)


def points_in_box(xyz, box, expand=(1.0, 1.0, 1.0)) -> np.ndarray:
    """[N_points] mask for one box (kitti_dataset.py:143-162 parity)."""
    return points_in_boxes(xyz, np.asarray(box)[None, :], expand)[0]


def points_in_box_bev(xyz, box, expand=(1.0, 1.0, 1.0)) -> np.ndarray:
    """2D (width/length plane) containment, ignoring the height axis.

    Parity with ``sel_xyz_in_box2d`` (kitti_dataset.py:164-182), which
    drops the first (height-spanning) normal.
    """
    normals, lower, upper = boxes_to_normals(np.asarray(box)[None, :], expand)
    normals, lower, upper = normals[0, 1:], lower[0, 1:], upper[0, 1:]
    projected = np.asarray(xyz, np.float64) @ normals.T
    inside = (projected > lower) & (projected < upper)
    return inside.all(axis=-1)


def label_to_box(label: Dict) -> np.ndarray:
    """KITTI label dict → [7] box array (x, y, z, l, h, w, yaw)."""
    return np.array(
        [
            label["x3d"],
            label["y3d"],
            label["z3d"],
            label["length"],
            label["height"],
            label["width"],
            label["yaw"],
        ],
        dtype=np.float64,
    )


def box_to_label(box: np.ndarray) -> Dict:
    x, y, z, l, h, w, yaw = [float(v) for v in np.asarray(box).reshape(7)]
    return {
        "x3d": x,
        "y3d": y,
        "z3d": z,
        "length": l,
        "height": h,
        "width": w,
        "yaw": yaw,
    }


def normalize_yaw(yaw: float) -> float:
    """Fold yaw into [-pi/4, 3*pi/4) as the reference label assigners do
    (kitti_dataset.py:1158-1162)."""
    while yaw < -0.25 * np.pi:
        yaw += np.pi
    while yaw > 0.75 * np.pi:
        yaw -= np.pi
    return yaw
