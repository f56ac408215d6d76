"""Greedy NMS with box merging and overlap-weighted rescoring.

One parameterized greedy pass implements all four reference variants
(/root/reference/models/nms.py:108-239):

- ``suppress``            — plain NMS (bboxes_nms, nms.py:108-131)
- ``merge + rescore``     — the paper's "box merging and scoring"
  (bboxes_nms_uncertainty, nms.py:133-170): overlapped same-class boxes
  are replaced by their elementwise *median* (including the kept box)
  and the kept score is incremented by the removed scores weighted by
  their overlap with the merged box.
- ``merge only``          — median merge, no rescore (nms.py:172-202)
- ``rescore only``        — no merge (nms.py:204-239)

Semantics preserved exactly: boxes are processed in decreasing score
order; pairwise overlaps always use the *original* box corners (the
reference precomputes corners once and never refreshes them after a
merge); the merged-vs-removed overlap used for rescoring *is* computed
from the merged box.
"""

from typing import Optional

import numpy as np

from pointgnn_tpu.core import boxes as box_ops
from pointgnn_tpu.postprocess import iou


def boxes_3d_to_corners(boxes_3d: np.ndarray) -> np.ndarray:
    """[N, 7] -> [N, 8, 3] corners (nms.py:9-27 layout)."""
    return box_ops.boxes_to_corners(boxes_3d)


def bboxes_sort(classes, scores, bboxes, top_k=400, attributes=None):
    """Sort by decreasing score, keep top_k (<=0 disables the cap)."""
    order = np.argsort(-scores)
    if top_k > 0:
        order = order[:top_k]
    attributes = attributes[order] if attributes is not None else None
    return classes[order], scores[order], bboxes[order], attributes


def _greedy_nms(
    classes: np.ndarray,
    scores: np.ndarray,
    bboxes: np.ndarray,
    nms_threshold: float,
    overlapped_fn,
    merge: bool,
    rescore: bool,
    quantize_factor: Optional[float] = None,
):
    """Shared greedy loop. Mutates copies; returns kept indices applied."""
    bboxes = np.array(bboxes, dtype=np.float64, copy=True)
    scores = np.array(scores, copy=True)
    corners = boxes_3d_to_corners(bboxes)
    if quantize_factor is not None:
        # integer quantization used by the legacy rasterized path
        corners = np.int32(corners * quantize_factor).astype(np.float64)
    if overlapped_fn is iou.overlapped_boxes_3d:
        # the native loop implements exactly this overlap geometry
        # (cpp/graphlib/nms.cpp); pure-Python loop below is the fallback
        from pointgnn_tpu.graph import _native

        native = _native.greedy_nms_native(
            bboxes, corners, classes, scores,
            nms_threshold, merge, rescore,
        )
        if native is not None:
            return native
    n = len(scores)
    keep = np.ones(n, dtype=bool)
    for i in range(n - 1):
        if not keep[i]:
            continue
        rest = np.arange(i + 1, n)[keep[i + 1:]]
        if len(rest) == 0:
            continue
        overlap = overlapped_fn(corners[i], corners[rest])
        removed = rest[(overlap > nms_threshold) & (classes[rest] == classes[i])]
        if merge or rescore:
            if merge:
                group = np.concatenate([bboxes[removed], bboxes[[i]]], axis=0)
                bboxes[i] = np.median(group, axis=0)
            if rescore and len(removed) > 0:
                merged_corners = boxes_3d_to_corners(bboxes[[i]])[0]
                merged_overlap = overlapped_fn(merged_corners, corners[removed])
                scores[i] += float(np.sum(scores[removed] * merged_overlap))
        keep[removed] = False
    return keep, scores, bboxes


def _nms(
    class_labels,
    detection_boxes_3d,
    detection_scores,
    overlapped_thres,
    overlapped_fn,
    appr_factor,
    top_k,
    attributes,
    merge,
    rescore,
    quantize=False,
):
    classes, scores, bboxes, attributes = bboxes_sort(
        class_labels,
        detection_scores,
        detection_boxes_3d,
        top_k=top_k,
        attributes=attributes,
    )
    if len(scores) == 0:
        return classes, bboxes, scores, attributes
    keep, scores, bboxes = _greedy_nms(
        classes,
        scores,
        bboxes,
        nms_threshold=overlapped_thres,
        overlapped_fn=overlapped_fn,
        merge=merge,
        rescore=rescore,
        quantize_factor=appr_factor if quantize else None,
    )
    attributes = attributes[keep] if attributes is not None else None
    return classes[keep], bboxes[keep], scores[keep], attributes


def nms_boxes_3d(
    class_labels,
    detection_boxes_3d,
    detection_scores,
    overlapped_thres=0.5,
    overlapped_fn=iou.overlapped_boxes_3d,
    appr_factor=10.0,
    top_k=-1,
    attributes=None,
):
    """Plain suppression (nms.py:241-255). Corners are quantized by
    appr_factor as in the reference's rasterized path."""
    return _nms(
        class_labels, detection_boxes_3d, detection_scores,
        overlapped_thres, overlapped_fn, appr_factor, top_k, attributes,
        merge=False, rescore=False, quantize=True,
    )


def nms_boxes_3d_uncertainty(
    class_labels,
    detection_boxes_3d,
    detection_scores,
    overlapped_thres=0.5,
    overlapped_fn=iou.overlapped_boxes_3d,
    appr_factor=10.0,
    top_k=-1,
    attributes=None,
):
    """Median merge + overlap-weighted rescoring (nms.py:256-270) — the
    default inference path (run.py:294-301)."""
    return _nms(
        class_labels, detection_boxes_3d, detection_scores,
        overlapped_thres, overlapped_fn, appr_factor, top_k, attributes,
        merge=True, rescore=True,
    )


def nms_boxes_3d_merge_only(
    class_labels,
    detection_boxes_3d,
    detection_scores,
    overlapped_thres=0.5,
    overlapped_fn=iou.overlapped_boxes_3d,
    appr_factor=10.0,
    top_k=-1,
    attributes=None,
):
    """Median merge without rescoring (nms.py:271-285)."""
    return _nms(
        class_labels, detection_boxes_3d, detection_scores,
        overlapped_thres, overlapped_fn, appr_factor, top_k, attributes,
        merge=True, rescore=False,
    )


def nms_boxes_3d_score_only(
    class_labels,
    detection_boxes_3d,
    detection_scores,
    overlapped_thres=0.5,
    overlapped_fn=iou.overlapped_boxes_3d,
    appr_factor=10.0,
    top_k=-1,
    attributes=None,
):
    """Rescoring without merging (nms.py:286-300)."""
    return _nms(
        class_labels, detection_boxes_3d, detection_scores,
        overlapped_thres, overlapped_fn, appr_factor, top_k, attributes,
        merge=False, rescore=True,
    )


def get_nms_fn(box_merge: bool = True, box_score: bool = True):
    """Select the variant the inference driver needs (run.py:293-325)."""
    if box_merge and box_score:
        return nms_boxes_3d_uncertainty
    if box_merge:
        return nms_boxes_3d_merge_only
    if box_score:
        return nms_boxes_3d_score_only
    return nms_boxes_3d
