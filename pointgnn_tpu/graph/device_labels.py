"""On-device label assignment + box-target encoding for training.

The host trainer assigns labels AFTER graph building because targets
attach to keypoints, and keypoints are chosen by the downsampler.  When
graphs are built on device (graph/device_builder.py), the keypoints are
only known inside the jitted program — so label assignment must run
there too.  The host packs each frame's handful of GT objects into
fixed-size arrays (box face normals / projection bounds precomputed in
numpy, exactly ``core.boxes.boxes_to_normals``); the device projects
every keypoint against every box and encodes the winning target.

Semantic parity with the host assigner
(``data/labels.assign_classaware_labels``, reference
kitti_dataset.py:1132-1284):

- later labels overwrite earlier ones (last-match-wins);
- foreground classes split horizontal/vertical by normalized yaw;
- unmapped non-DontCare objects mark their points with the DontCare
  class id and ``valid = 0`` (loss ignores localization);
- everything else is Background (0) with ``valid = 0``.
"""

from typing import Dict, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from pointgnn_tpu.core import boxes as box_ops
from pointgnn_tpu.model import encodings


class PackedLabels(NamedTuple):
    """Fixed-size per-frame GT arrays (host -> device, ~10KB)."""

    normals: np.ndarray     # [M, 3, 3] f32 box face normals
    lower: np.ndarray       # [M, 3] f32 projection lower bounds
    upper: np.ndarray       # [M, 3] f32 projection upper bounds
    box_cls: np.ndarray     # [M] i32 assigned class id (incl. vertical)
    target_box: np.ndarray  # [M, 7] f32 target box (normalized yaw)
    has_target: np.ndarray  # [M] f32 1 = localization target valid
    active: np.ndarray      # [M] f32 1 = slot holds a real object


def pack_frame_labels(
    labels: List[Dict],
    label_map: Dict[str, int],
    num_classes: int,
    expend_factor: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    max_boxes: int = 64,
) -> PackedLabels:
    """Host-side: KITTI label dicts -> fixed-size device arrays."""
    dontcare_cls = num_classes - 1
    normals = np.zeros((max_boxes, 3, 3), np.float32)
    lower = np.zeros((max_boxes, 3), np.float32)
    upper = np.full((max_boxes, 3), -1.0, np.float32)  # empty test fails
    box_cls = np.zeros((max_boxes,), np.int32)
    target_box = np.zeros((max_boxes, 7), np.float32)
    has_target = np.zeros((max_boxes,), np.float32)
    active = np.zeros((max_boxes,), np.float32)
    slot = 0
    for label in labels:
        obj_cls = label_map.get(label["name"], dontcare_cls)
        is_fg = 1 <= obj_cls <= num_classes - 2
        if not is_fg and label["name"] == "DontCare":
            continue
        if slot >= max_boxes:
            import warnings

            warnings.warn(
                "pack_frame_labels: more than %d objects; extra labels "
                "dropped" % max_boxes,
                RuntimeWarning,
                stacklevel=2,
            )
            break
        box = box_ops.label_to_box(label)
        n, lo, up = box_ops.boxes_to_normals(box[None], expend_factor)
        normals[slot] = n[0]
        lower[slot] = lo[0]
        upper[slot] = up[0]
        if is_fg:
            yaw = box_ops.normalize_yaw(label["yaw"])
            box_cls[slot] = obj_cls + (yaw >= 0.25 * np.pi)
            tb = box.copy()
            tb[6] = yaw
            target_box[slot] = tb
            has_target[slot] = 1.0
        else:
            box_cls[slot] = obj_cls  # dontcare id, valid = 0
        active[slot] = 1.0
        slot += 1
    return PackedLabels(
        normals, lower, upper, box_cls, target_box, has_target, active
    )


def stack_packed_labels(packed: List[PackedLabels]) -> PackedLabels:
    """Stack per-frame PackedLabels along a leading batch axis."""
    return PackedLabels(*[np.stack(f) for f in zip(*packed)])


def assign_labels_jax(kp_xyz, kp_mask, packed: PackedLabels):
    """Device-side assignment for one frame's keypoints.

    Returns ``(cls_labels [K] i32, target_boxes [K, 7] f32,
    valid_boxes [K] f32)``; padded keypoints get background/invalid.
    """
    proj = jnp.einsum(
        "mij,kj->mki", jnp.asarray(packed.normals, jnp.float32),
        kp_xyz.astype(jnp.float32),
    )  # [M, K, 3]
    inside = jnp.all(
        (proj > packed.lower[:, None, :])
        & (proj < packed.upper[:, None, :]),
        axis=-1,
    ) & (packed.active[:, None] > 0)  # [M, K]
    m = inside.shape[0]
    # last-match-wins (host assigner overwrites in label order)
    midx = (m - 1) - jnp.argmax(inside[::-1], axis=0)  # [K]
    hit = jnp.any(inside, axis=0) & kp_mask.astype(bool)
    cls_labels = jnp.where(hit, packed.box_cls[midx], 0).astype(jnp.int32)
    target = jnp.where(
        hit[:, None], packed.target_box[midx], 0.0
    ).astype(jnp.float32)
    valid = jnp.where(
        hit, packed.has_target[midx], 0.0
    ).astype(jnp.float32)
    return cls_labels, target, valid


def classaware_encode_jax(cls_ids, points_xyz, boxes, tables):
    """Device encode for the class-aware table methods — the jnp mirror
    of ``model.encodings._classaware_encode`` (and the inverse of
    ``classaware_decode_jax``)."""
    sizes, yaw_offset, active = tables
    sizes = jnp.asarray(sizes, jnp.float32)
    yaw_offset = jnp.asarray(yaw_offset, jnp.float32)
    active = jnp.asarray(active)
    ids = jnp.clip(cls_ids, 0, sizes.shape[0] - 1)
    sz = sizes[ids]
    yoff = yaw_offset[ids]
    act = active[ids]
    off = boxes[:, 0:3] - points_xyz
    xyz = jnp.where(act[:, None], off / sz, off)
    lhw = jnp.where(
        act[:, None],
        jnp.log(jnp.maximum(boxes[:, 3:6], 1e-12) / sz),
        boxes[:, 3:6],
    )
    yaw = jnp.where(
        act,
        (boxes[:, 6] - yoff) / encodings.QUARTER_PI,
        boxes[:, 6],
    )
    return jnp.concatenate([xyz, lhw, yaw[:, None]], axis=-1)


def get_encode_jax(name, label_map):
    """Device encoder matched to the config's box_encoding_method
    (training-target counterpart of ``encodings.get_decode_jax``)."""
    import functools

    if name == "classaware_all_class_box_encoding":
        tables = encodings.build_class_tables(label_map)
        return functools.partial(classaware_encode_jax, tables=tables)
    raise KeyError(
        "no device encoder for box encoding %r — train on host graphs "
        "for this config" % name
    )
