"""Visualization helpers (headless-friendly: files, not windows).

The reference drives Open3D windows for interactive 3D inspection
(kitti_dataset.py:1286-1395, run.py:151-189) and cv2 for image-space box
drawing (kitti_dataset.py:1069-1120, run.py:434-535).  Open3D is not a
dependency here; the equivalents are:

- :func:`draw_2d_boxes` / :func:`draw_3d_boxes` — cv2 drawing on the
  camera image (same edge topology as vis_draw_3d_box);
- :func:`plot_bev` — matplotlib bird's-eye-view of points + rotated
  boxes (the practical stand-in for the Open3D point viewer);
- :func:`save_detection_image` — one-call overlay used by run.py's
  visualization levels, written to a PNG instead of a window.
"""

from typing import Dict, List, Optional, Sequence

import numpy as np

from pointgnn_tpu.core import boxes as box_ops
from pointgnn_tpu.core.points import Points

# box corner connectivity (top face, bottom face, verticals) matching
# the reference's line set (kitti_dataset.py:1090-1118)
BOX_EDGES = (
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
)

OCCLUSION_COLORS = ((0, 128, 0), (0, 255, 255), (0, 0, 128), (255, 255, 255))
DONTCARE_COLOR = (255, 191, 0)


def draw_2d_boxes(image: np.ndarray, label_list: List[Dict]) -> np.ndarray:
    """Draw KITTI 2D boxes, colored by occlusion
    (kitti_dataset.py:1069-1087)."""
    import cv2

    image = image.copy()
    for label in label_list:
        if label["name"] == "DontCare":
            color = DONTCARE_COLOR
        else:
            color = OCCLUSION_COLORS[
                int(np.clip(label.get("occlusion", 0), 0, 3))
            ]
        p1 = (int(label["xmin"]), int(label["ymin"]))
        p2 = (int(label["xmax"]), int(label["ymax"]))
        cv2.rectangle(image, p1, p2, color, 2)
        cv2.putText(
            image, label["name"], p1, cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 2
        )
    return image


def draw_3d_boxes(
    image: np.ndarray,
    boxes_3d: np.ndarray,
    calib: Dict,
    color=(0, 255, 0),
    scores: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Project 7-DoF boxes and draw their wireframes
    (kitti_dataset.py:1089-1120)."""
    import cv2

    from pointgnn_tpu.data.kitti import KittiDataset

    image = image.copy()
    boxes_3d = np.asarray(boxes_3d).reshape(-1, 7)
    corners = box_ops.boxes_to_corners(boxes_3d)
    for i in range(len(corners)):
        img_pts = KittiDataset.cam_points_to_image(
            Points(xyz=corners[i], attr=None), calib
        )
        xy = img_pts.xyz[:, :2].astype(np.int32)
        for a, b in BOX_EDGES:
            cv2.line(image, tuple(xy[a]), tuple(xy[b]), color, 2)
        if scores is not None:
            cv2.putText(
                image,
                "%.2f" % scores[i],
                tuple(xy[0]),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.4,
                color,
                1,
            )
    return image


def plot_bev(
    points_xyz: np.ndarray,
    boxes_3d: Optional[np.ndarray] = None,
    gt_boxes_3d: Optional[np.ndarray] = None,
    path: Optional[str] = None,
    max_points: int = 50000,
):
    """Bird's-eye view (camera x right, z forward) with rotated boxes.

    Detections in green, ground truth in red. Saves to ``path`` when
    given, else returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    pts = np.asarray(points_xyz)
    if len(pts) > max_points:
        pts = pts[:: len(pts) // max_points + 1]
    ax.scatter(pts[:, 0], pts[:, 2], s=0.2, c="#777777", linewidths=0)

    def draw(boxes, color):
        boxes = np.asarray(boxes).reshape(-1, 7)
        corners = box_ops.boxes_to_corners(boxes)[:, :4, :]  # top face
        for c in corners:
            poly = np.vstack([c[:, [0, 2]], c[[0], [0, 2]]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.0)

    if boxes_3d is not None and len(boxes_3d):
        draw(boxes_3d, "green")
    if gt_boxes_3d is not None and len(gt_boxes_3d):
        draw(gt_boxes_3d, "red")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")
    if path is not None:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_graph_bev(
    vertex_xyz: np.ndarray,
    edges: np.ndarray,
    center_xyz: Optional[np.ndarray] = None,
    path: Optional[str] = None,
    max_edges: int = 20000,
):
    """Bird's-eye view of a proximity graph (the headless equivalent of
    the reference's Open3D ``vis_point_graph``,
    kitti_dataset.py:1286-1395): vertices as dots, edges as segments
    from source points to their (possibly distinct) center set."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    vertex_xyz = np.asarray(vertex_xyz)
    center_xyz = (
        vertex_xyz if center_xyz is None else np.asarray(center_xyz)
    )
    edges = np.asarray(edges).reshape(-1, 2)
    if len(edges) > max_edges:
        edges = edges[:: len(edges) // max_edges + 1]
    fig, ax = plt.subplots(figsize=(10, 10))
    segs = np.stack(
        [vertex_xyz[edges[:, 0]][:, [0, 2]],
         center_xyz[edges[:, 1]][:, [0, 2]]],
        axis=1,
    )
    ax.add_collection(
        LineCollection(segs, colors="#1f77b4", linewidths=0.2, alpha=0.4)
    )
    ax.scatter(
        vertex_xyz[:, 0], vertex_xyz[:, 2], s=0.5, c="#333333", linewidths=0
    )
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")
    ax.autoscale()
    if path is not None:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def save_detection_image(
    image: np.ndarray,
    pred_labels: List[tuple],
    calib: Dict,
    path: str,
) -> str:
    """Overlay run.py-format detections (name, ..., bbox, h, w, l, x, y,
    z, yaw, score) on the image and write a PNG."""
    import cv2

    image = image.copy()
    boxes, scores = [], []
    for p in pred_labels:
        name = p[0]
        xmin, ymin, xmax, ymax = p[4:8]
        h, w, l, x, y, z, yaw, score = p[8:16]
        boxes.append([x, y, z, l, h, w, yaw])
        scores.append(score)
        cv2.rectangle(
            image, (int(xmin), int(ymin)), (int(xmax), int(ymax)),
            (0, 255, 0), 2,
        )
        cv2.putText(
            image,
            "%s | %.3f" % (name[0], score),
            (int(xmin), int(ymin)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.4,
            (0, 255, 0),
            1,
        )
    if boxes:
        image = draw_3d_boxes(image, np.asarray(boxes), calib)
    cv2.imwrite(path, image)
    return path
