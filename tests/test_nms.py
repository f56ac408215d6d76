"""Rotated IoU + all four NMS variants."""

import numpy as np
import pytest

from pointgnn_tpu.postprocess import iou, nms


def _box(x=0.0, z=0.0, l=4.0, w=2.0, yaw=0.0, y=0.0, h=1.5):
    return np.array([x, y, z, l, h, w, yaw], dtype=np.float64)


def test_polygon_area_and_clip():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=np.float64)
    assert iou.polygon_area(sq) == pytest.approx(4.0)
    shifted = sq + 1.0
    inter = iou.rect_intersection_area(sq, shifted)
    assert inter == pytest.approx(1.0)
    # disjoint
    assert iou.rect_intersection_area(sq, sq + 10.0) == 0.0
    # clip winding order should not matter
    assert iou.rect_intersection_area(sq, shifted[::-1]) == pytest.approx(1.0)


def test_identical_boxes_full_overlap():
    corners = nms.boxes_3d_to_corners(np.stack([_box(), _box()]))
    ov = iou.overlapped_boxes_3d(corners[0], corners[1:])
    assert ov[0] == pytest.approx(1.0)


def test_axis_aligned_iou_matches_analytic():
    # two unit-height boxes, 4x2 footprints, shifted by 2 along x:
    # intersection BEV = 2*2=4, areas 8 each, y overlap full
    a, b = _box(x=0.0), _box(x=2.0)
    corners = nms.boxes_3d_to_corners(np.stack([a, b]))
    ov = iou.overlapped_boxes_3d(corners[0], corners[1:])
    h = 1.5
    inter = h * 4.0
    union = h * 8.0 + h * 8.0
    assert ov[0] == pytest.approx(inter / (union - inter))


def test_rotated_iou():
    # 45-degree rotated square on top of an identical unrotated square:
    # classic intersection of two unit squares = 2*(sqrt(2)-1)^2... use
    # a known simple case: square footprint l=w=2 rotated by 90 deg is
    # identical -> full overlap.
    a = _box(l=2.0, w=2.0, yaw=0.0)
    b = _box(l=2.0, w=2.0, yaw=np.pi / 2)
    corners = nms.boxes_3d_to_corners(np.stack([a, b]))
    ov = iou.overlapped_boxes_3d(corners[0], corners[1:])
    assert ov[0] == pytest.approx(1.0, abs=1e-6)
    # 45 degrees: intersection is a regular octagon, area 8*(sqrt(2)-1)
    c = _box(l=2.0, w=2.0, yaw=np.pi / 4)
    corners = nms.boxes_3d_to_corners(np.stack([a, c]))
    ov = iou.overlapped_boxes_3d(corners[0], corners[1:])
    h = 1.5
    inter_bev = 8 * (np.sqrt(2) - 1)
    inter = h * inter_bev
    union = 2 * h * 4.0
    assert ov[0] == pytest.approx(inter / (union - inter), rel=1e-6)


def _toy_detections():
    # three overlapping same-class boxes + one far box + one other class
    boxes = np.stack(
        [
            _box(x=0.0),
            _box(x=0.3),
            _box(x=-0.2),
            _box(x=50.0),
            _box(x=0.1),
        ]
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.95])
    classes = np.array([1, 1, 1, 1, 2])
    return classes, boxes, scores


def test_nms_suppress():
    classes, boxes, scores = _toy_detections()
    cls, out_boxes, out_scores, _ = nms.nms_boxes_3d(
        classes, boxes, scores, overlapped_thres=0.3, appr_factor=100.0
    )
    # class-2 box kept (different class), cluster collapses to one,
    # far box kept
    assert sorted(cls.tolist()) == [1, 1, 2]
    assert out_scores.max() == pytest.approx(0.95)


def test_nms_uncertainty_merges_and_rescores():
    classes, boxes, scores = _toy_detections()
    cls, out_boxes, out_scores, _ = nms.nms_boxes_3d_uncertainty(
        classes, boxes, scores, overlapped_thres=0.3
    )
    assert sorted(cls.tolist()) == [1, 1, 2]
    kept1 = out_scores[cls == 1]
    # the cluster's kept score must exceed its original top score
    assert kept1.max() > 0.9
    # merged box x is the median of (0.3, -0.2, 0.0) = 0.0
    cluster_box = out_boxes[(cls == 1) & (out_scores > 0.9)][0]
    assert cluster_box[0] == pytest.approx(0.0)


def test_nms_merge_only_keeps_scores():
    classes, boxes, scores = _toy_detections()
    _, _, out_scores, _ = nms.nms_boxes_3d_merge_only(
        classes, boxes, scores, overlapped_thres=0.3
    )
    assert set(np.round(out_scores, 6)) <= {0.9, 0.6, 0.95}


def test_nms_score_only_keeps_boxes():
    classes, boxes, scores = _toy_detections()
    cls, out_boxes, out_scores, _ = nms.nms_boxes_3d_score_only(
        classes, boxes, scores, overlapped_thres=0.3
    )
    # kept class-1 cluster box is the original highest-score box (x=0)
    cluster_box = out_boxes[(cls == 1) & (out_scores > 0.9)][0]
    assert cluster_box[0] == pytest.approx(0.0)


def test_top_k_and_attributes():
    classes, boxes, scores = _toy_detections()
    attrs = np.arange(5)
    cls, out_boxes, out_scores, out_attrs = nms.nms_boxes_3d_uncertainty(
        classes, boxes, scores, overlapped_thres=0.3, top_k=2, attributes=attrs
    )
    assert len(cls) <= 2
    assert out_attrs is not None and len(out_attrs) == len(cls)


def test_get_nms_fn():
    assert nms.get_nms_fn(True, True) is nms.nms_boxes_3d_uncertainty
    assert nms.get_nms_fn(True, False) is nms.nms_boxes_3d_merge_only
    assert nms.get_nms_fn(False, True) is nms.nms_boxes_3d_score_only
    assert nms.get_nms_fn(False, False) is nms.nms_boxes_3d


def test_empty_input():
    cls, boxes, scores, _ = nms.nms_boxes_3d_uncertainty(
        np.zeros(0, dtype=np.int64), np.zeros((0, 7)), np.zeros(0)
    )
    assert len(cls) == 0 and boxes.shape[0] == 0


def _random_boxes(rng, n):
    boxes = np.stack(
        [
            rng.uniform(-20, 20, n),          # x
            rng.uniform(0.5, 2.5, n),         # y
            rng.uniform(5, 60, n),            # z
            rng.uniform(2.5, 5.0, n),         # l
            rng.uniform(1.2, 2.0, n),         # h
            rng.uniform(1.4, 2.2, n),         # w
            rng.uniform(-np.pi, np.pi, n),    # yaw
        ],
        axis=1,
    )
    # force overlap clusters so merge/rescore paths exercise
    boxes[n // 2:, :3] = boxes[: n - n // 2, :3] + rng.normal(
        0, 0.4, (n - n // 2, 3)
    )
    return boxes


def test_native_nms_parity_all_variants():
    """C++ greedy NMS (cpp/graphlib/nms.cpp) vs the pure-Python loop:
    identical keeps, scores, and merged boxes on clustered random boxes
    for all four reference variants."""
    from pointgnn_tpu.graph import _native

    if _native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    # a non-default overlapped_fn with identical geometry forces the
    # pure-Python loop (the native fast path dispatches on identity)
    python_fn = lambda a, b: iou.overlapped_boxes_3d(a, b)  # noqa: E731
    for trial in range(5):
        n = int(rng.integers(30, 120))
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0.2, 1.0, n)
        classes = rng.integers(1, 3, n).astype(np.int64)
        for fn in (
            nms.nms_boxes_3d,
            nms.nms_boxes_3d_uncertainty,
            nms.nms_boxes_3d_merge_only,
            nms.nms_boxes_3d_score_only,
        ):
            cn, bn, sn, _ = fn(
                classes, boxes, scores, overlapped_thres=0.12,
                appr_factor=100.0, top_k=-1,
            )
            cp, bp, sp, _ = fn(
                classes, boxes, scores, overlapped_thres=0.12,
                overlapped_fn=python_fn, appr_factor=100.0, top_k=-1,
            )
            np.testing.assert_array_equal(cn, cp, err_msg=fn.__name__)
            np.testing.assert_allclose(
                bn, bp, atol=1e-12, err_msg=fn.__name__
            )
            # rescored scores accumulate in a different order (numpy
            # pairwise sum vs sequential) — bit parity isn't expected
            np.testing.assert_allclose(
                sn, sp, rtol=1e-7, atol=1e-9, err_msg=fn.__name__
            )


def _quantized_corners(boxes, factor):
    return np.int32(nms.boxes_3d_to_corners(boxes) * factor).astype(
        np.float64
    )


def test_rasterized_overlap_converges_to_exact():
    """At high appr_factor the pixel-count approximation approaches the
    exact convex-clip overlap (reference nms.py:29-62 vs :64-88)."""
    rng = np.random.default_rng(0)
    boxes = np.stack(
        [
            _box(
                x=rng.uniform(-3, 3), z=rng.uniform(-3, 3),
                l=rng.uniform(2, 5), w=rng.uniform(1, 3),
                yaw=rng.uniform(-np.pi, np.pi), y=rng.uniform(-0.5, 0.5),
                h=rng.uniform(1, 2),
            )
            for _ in range(12)
        ]
    )
    factor = 200.0
    corners_q = _quantized_corners(boxes, factor)
    exact = iou.overlapped_boxes_3d(corners_q[0], corners_q[1:])
    approx = iou.overlapped_boxes_3d_rasterized(corners_q[0], corners_q[1:])
    np.testing.assert_allclose(approx, exact, atol=0.03)
    # rasterization counts something real: every strongly-overlapping
    # pair is detected as such
    assert np.all((exact > 0.2) == (approx > 0.2))


def test_rasterized_overlap_identical_boxes():
    boxes = np.stack([_box(), _box()])
    corners_q = _quantized_corners(boxes, 100.0)
    ov = iou.overlapped_boxes_3d_rasterized(corners_q[0], corners_q[1:])
    assert ov[0] == pytest.approx(1.0, abs=1e-6)


def test_rasterized_overlap_disjoint_aabb_prefilter():
    boxes = np.stack([_box(), _box(x=100.0)])
    corners_q = _quantized_corners(boxes, 100.0)
    ov = iou.overlapped_boxes_3d_rasterized(corners_q[0], corners_q[1:])
    assert ov[0] == 0.0


def test_numpy_scanline_matches_cv2_fill():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    for _ in range(20):
        # realistic use: rotated box footprints quantized to pixels
        l, w = rng.uniform(15, 30), rng.uniform(8, 20)
        yaw = rng.uniform(-np.pi, np.pi)
        cx, cz = rng.uniform(25, 40, size=2)
        rect = np.array(
            [[l / 2, w / 2], [l / 2, -w / 2], [-l / 2, -w / 2],
             [-l / 2, w / 2]]
        )
        rot = np.array(
            [[np.cos(yaw), np.sin(yaw)], [-np.sin(yaw), np.cos(yaw)]]
        )
        quad = np.int32(rect @ rot + [cx, cz])
        ref = np.zeros((64, 64), dtype=np.int32)
        cv2.fillPoly(ref, [quad], color=1)
        ours = np.zeros((64, 64), dtype=np.int32)
        iou._fill_convex_quad(ours, quad)
        # scanline endpoint conventions differ by at most the boundary
        # pixels; interiors must agree
        diff = np.abs(ref - ours).sum()
        assert diff <= 4 * 60  # boundary band only
        inter = np.count_nonzero(ref * ours)
        assert inter >= 0.9 * max(np.count_nonzero(ref), 1)


def test_nms_boxes_3d_with_rasterized_backend():
    """nms_boxes_3d runs end-to-end with the legacy backend plugged in
    (the reference's default wiring, nms.py:241-255)."""
    boxes = np.stack([_box(), _box(x=0.1), _box(x=30.0)])
    classes = np.array([1, 1, 1])
    scores = np.array([0.9, 0.8, 0.7])
    cls_out, boxes_out, scores_out, _ = nms.nms_boxes_3d(
        classes, boxes, scores,
        overlapped_thres=0.5,
        overlapped_fn=iou.overlapped_boxes_3d_rasterized,
        appr_factor=100.0,
    )
    assert len(scores_out) == 2  # near-duplicate suppressed, far box kept
    assert scores_out[0] == pytest.approx(0.9)
