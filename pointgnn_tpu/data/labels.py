"""Class-aware per-point label assignment.

Behavioral parity with the three assigners of the reference
(/root/reference/dataset/kitti_dataset.py:1132-1284):

- every class is split into a *horizontal* and a *vertical* sub-class by
  the box yaw folded into ``[-pi/4, 3*pi/4)`` and split at ``pi/4``
  (horizontal gets class ``c``, vertical ``c + 1``);
- points inside a DontCare-mapped object (anything not in the label map)
  get the last class id with ``valid = 0`` so the loss ignores them;
- the background class is 0, the DontCare class is ``num_classes - 1``.

Instead of the reference's three near-identical functions, one generic
assigner is parameterized by a label map; the three named variants are
thin wrappers kept for API parity.
"""

from typing import Dict, List, Tuple

import numpy as np

from pointgnn_tpu.core import boxes as box_ops

LABEL_MAP_YAW: Dict[str, int] = {
    "Background": 0,
    "Car": 1,
    "Pedestrian": 3,
    "Cyclist": 5,
    "DontCare": 7,
}
LABEL_MAP_CAR: Dict[str, int] = {"Background": 0, "Car": 1, "DontCare": 3}
LABEL_MAP_PED_CYC: Dict[str, int] = {
    "Background": 0,
    "Pedestrian": 1,
    "Cyclist": 3,
    "DontCare": 5,
}

# label_method name (config "label_method") -> (label_map, num_classes)
LABEL_METHODS = {
    "yaw": (LABEL_MAP_YAW, 8),
    "Car": (LABEL_MAP_CAR, 4),
    "Pedestrian_and_Cyclist": (LABEL_MAP_PED_CYC, 6),
}


def assign_classaware_labels(
    labels: List[Dict],
    xyz: np.ndarray,
    expend_factor: Tuple[float, float, float],
    label_map: Dict[str, int],
    num_classes: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict[str, int]]:
    """Assign a class id and a target 7-DoF box to every point.

    Returns ``(cls_labels [N,1] int64, boxes_3d [N,1,7] float64,
    valid_boxes [N,1,1] float32, label_map)``.
    """
    xyz = np.asarray(xyz)
    num_points = xyz.shape[0]
    assert num_points > 0, "No point No prediction"
    assert xyz.shape[1] == 3
    dontcare_cls = num_classes - 1

    cls_labels = np.zeros((num_points, 1), dtype=np.int64)
    boxes_3d = np.zeros((num_points, 1, 7))
    valid_boxes = np.zeros((num_points, 1, 1), dtype=np.float32)

    for label in labels:
        obj_cls = label_map.get(label["name"], dontcare_cls)
        if 1 <= obj_cls <= num_classes - 2:
            box = box_ops.label_to_box(label)
            mask = box_ops.points_in_box(xyz, box, expend_factor)
            yaw = box_ops.normalize_yaw(label["yaw"])
            # vertical sub-class (yaw in [pi/4, 3pi/4)) is obj_cls + 1
            cls_labels[mask, :] = obj_cls + (yaw >= 0.25 * np.pi)
            box[6] = yaw
            boxes_3d[mask, 0, :] = box
            valid_boxes[mask, 0, :] = 1.0
        elif label["name"] != "DontCare":
            box = box_ops.label_to_box(label)
            mask = box_ops.points_in_box(xyz, box, expend_factor)
            cls_labels[mask, :] = obj_cls
            valid_boxes[mask, 0, :] = 0.0
    return cls_labels, boxes_3d, valid_boxes, label_map


def assign_classaware_label_to_points(labels, xyz, expend_factor):
    """8-class variant (kitti_dataset.py:1132-1182)."""
    return assign_classaware_labels(
        labels, xyz, expend_factor, LABEL_MAP_YAW, 8
    )


def assign_classaware_car_label_to_points(labels, xyz, expend_factor):
    """4-class Car variant (kitti_dataset.py:1184-1232)."""
    return assign_classaware_labels(
        labels, xyz, expend_factor, LABEL_MAP_CAR, 4
    )


def assign_classaware_ped_and_cyc_label_to_points(labels, xyz, expend_factor):
    """6-class Pedestrian+Cyclist variant (kitti_dataset.py:1234-1284)."""
    return assign_classaware_labels(
        labels, xyz, expend_factor, LABEL_MAP_PED_CYC, 6
    )


def get_label_assigner(label_method: str):
    """Registry keyed by the config's ``label_method`` string."""
    label_map, num_classes = LABEL_METHODS[label_method]

    def assign(labels, xyz, expend_factor):
        return assign_classaware_labels(
            labels, xyz, expend_factor, label_map, num_classes
        )

    return assign
