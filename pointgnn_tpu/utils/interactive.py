"""Optional interactive 3D viewers (Open3D), with headless fallbacks.

Counterparts of the reference's Open3D debug views
(/root/reference/dataset/kitti_dataset.py:1286-1395 ``vis_points`` /
``vis_graph``, /root/reference/run.py:151-189 detection view,
/root/reference/crop_aug.py:54-74,211-243 crop-library inspection).
Open3D is not shipped in every environment, so each function degrades
to the matching headless PNG writer in :mod:`pointgnn_tpu.utils.vis`
when the import fails — pass ``save_path`` to force a file even when a
display is available.
"""

from typing import Dict, List, Optional, Sequence

import numpy as np

_CLASS_COLORS = {
    # reference palette (kitti_dataset.py:1288-1295)
    "Pedestrian": (255, 20, 147),
    "Person_sitting": (255, 255, 147),
    "Car": (255, 0, 0),
    "Van": (255, 255, 0),
    "Cyclist": (250, 128, 114),
    "DontCare": (0, 0, 255),
}
_DEFAULT_COLOR = (0, 128, 0)


def _try_open3d():
    try:
        import open3d

        return open3d
    except Exception:
        return None


def _box_lineset(o3d, box, color):
    """12-edge wireframe for one [x, y, z, l, h, w, yaw] camera-frame
    box (corner layout of core/boxes.py:47-75)."""
    from pointgnn_tpu.core import boxes as boxes_lib

    corners = boxes_lib.boxes_to_corners(np.asarray(box)[None])[0]
    lines = [
        [0, 1], [1, 2], [2, 3], [3, 0],
        [4, 5], [5, 6], [6, 7], [7, 4],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ]
    ls = o3d.geometry.LineSet(
        points=o3d.utility.Vector3dVector(corners.reshape(-1, 3)),
        lines=o3d.utility.Vector2iVector(lines),
    )
    ls.colors = o3d.utility.Vector3dVector(
        [np.asarray(color) / 255.0] * len(lines)
    )
    return ls


def _show(o3d, geometries, save_path=None):
    if save_path:
        vis = o3d.visualization.Visualizer()
        vis.create_window(visible=False)
        for g in geometries:
            vis.add_geometry(g)
        vis.capture_screen_image(save_path, do_render=True)
        vis.destroy_window()
        return save_path
    o3d.visualization.draw_geometries(geometries)
    return None


def vis_points(
    points_xyz: np.ndarray,
    colors: Optional[np.ndarray] = None,
    label_list: Optional[List[Dict]] = None,
    save_path: Optional[str] = None,
):
    """Point cloud + optional GT/detection wireframes.

    Open3D analog of kitti_dataset.py:1286-1320; falls back to
    :func:`pointgnn_tpu.utils.vis.plot_bev`."""
    o3d = _try_open3d()
    boxes, names = _labels_to_boxes(label_list)
    if o3d is None:
        from pointgnn_tpu.utils import vis

        out = save_path or "vis_points_bev.png"
        vis.plot_bev(
            points_xyz,
            boxes_3d=(np.asarray(boxes) if boxes else None),
            path=out,
        )
        return out
    pcd = o3d.geometry.PointCloud(
        o3d.utility.Vector3dVector(points_xyz)
    )
    if colors is not None:
        pcd.colors = o3d.utility.Vector3dVector(
            np.clip(colors, 0, 1)
        )
    geoms = [pcd]
    for box, name in zip(boxes, names):
        geoms.append(
            _box_lineset(
                o3d, box, _CLASS_COLORS.get(name, _DEFAULT_COLOR)
            )
        )
    return _show(o3d, geoms, save_path)


def vis_graph(
    points_xyz: np.ndarray,
    edges_src: np.ndarray,
    edges_dst: np.ndarray,
    save_path: Optional[str] = None,
):
    """Graph edges as 3D line segments (kitti_dataset.py:1322-1345);
    falls back to :func:`pointgnn_tpu.utils.vis.plot_graph_bev`."""
    o3d = _try_open3d()
    if o3d is None:
        from pointgnn_tpu.utils import vis

        out = save_path or "vis_graph_bev.png"
        vis.plot_graph_bev(
            points_xyz,
            np.stack([edges_src, edges_dst], axis=1),
            path=out,
        )
        return out
    lines = np.stack([edges_src, edges_dst], axis=1).astype(np.int32)
    ls = o3d.geometry.LineSet(
        points=o3d.utility.Vector3dVector(points_xyz),
        lines=o3d.utility.Vector2iVector(lines),
    )
    ls.colors = o3d.utility.Vector3dVector(
        [[1.0, 0.0, 0.0]] * len(lines)
    )
    pcd = o3d.geometry.PointCloud(
        o3d.utility.Vector3dVector(points_xyz)
    )
    return _show(o3d, [pcd, ls], save_path)


def vis_detections(
    points_xyz: np.ndarray,
    boxes_3d: Sequence,
    names: Optional[Sequence[str]] = None,
    save_path: Optional[str] = None,
):
    """Detections over the cloud (run.py:151-189 debug view)."""
    labels = [
        {
            "name": (names[i] if names is not None else "Car"),
            "box": np.asarray(boxes_3d[i]),
        }
        for i in range(len(boxes_3d))
    ]
    return vis_points(points_xyz, label_list=labels, save_path=save_path)


def vis_crop_aug(
    frame_xyz: np.ndarray,
    crop_xyz: np.ndarray,
    crop_box,
    save_path: Optional[str] = None,
):
    """Inspect one crop-paste: frame cloud (grey), pasted object points
    (red), its box (crop_aug.py:211-243 debug view)."""
    o3d = _try_open3d()
    if o3d is None:
        from pointgnn_tpu.utils import vis

        out = save_path or "vis_crop_aug_bev.png"
        all_xyz = np.concatenate([frame_xyz, crop_xyz], axis=0)
        vis.plot_bev(
            all_xyz, boxes_3d=np.asarray(crop_box)[None], path=out
        )
        return out
    frame = o3d.geometry.PointCloud(
        o3d.utility.Vector3dVector(frame_xyz)
    )
    frame.paint_uniform_color([0.6, 0.6, 0.6])
    crop = o3d.geometry.PointCloud(
        o3d.utility.Vector3dVector(crop_xyz)
    )
    crop.paint_uniform_color([1.0, 0.0, 0.0])
    geoms = [frame, crop, _box_lineset(o3d, crop_box, (255, 0, 0))]
    return _show(o3d, geoms, save_path)


def _labels_to_boxes(label_list):
    boxes, names = [], []
    for lab in label_list or []:
        if "box" in lab:
            boxes.append(np.asarray(lab["box"], np.float64))
        else:
            boxes.append(
                np.array(
                    [
                        lab["x3d"], lab["y3d"], lab["z3d"],
                        lab["length"], lab["height"], lab["width"],
                        lab["yaw"],
                    ],
                    np.float64,
                )
            )
        names.append(lab.get("name", "Car"))
    return boxes, names
