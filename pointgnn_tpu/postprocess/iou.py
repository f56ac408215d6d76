"""Rotated-box 3D overlap (BEV polygon intersection x height overlap).

Two backends, mirroring the reference's pair (models/nms.py:29-88):

- ``overlapped_boxes_3d`` — exact, dependency-free Sutherland-Hodgman
  convex clipper standing in for the Shapely polygon path (nms.py:64-88);
  the default everywhere and the geometry the native C++ NMS implements.
- ``overlapped_boxes_3d_rasterized`` — the legacy cv2.fillPoly pixel
  counting approximation (nms.py:29-62) over appr_factor-quantized
  corners, for bit-level behavioral parity with the reference's
  ``nms_boxes_3d`` default path.

The overlap definition matches the reference exactly:

    intersection = shared_y * bev_shared_area
    union        = (y_max-y_min) * area2 + (y0_max-y0_min) * area1
    overlap      = intersection / (union - intersection)

(i.e. each box's "volume" uses its own full y extent times its own BEV
area, so this is IoU over y-extruded BEV footprints.)
"""

import numpy as np


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area of an (N, 2) polygon (sign-free)."""
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(
        float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    )


def clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip convex ``subject`` by convex ``clip``.

    Both are (N, 2) vertex arrays; ``clip`` must be convex (ours are
    rectangles).  Returns the intersection polygon, possibly empty.
    """
    def cross2(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    # ensure counter-clockwise clip polygon so "inside" is a fixed side
    if cross2(clip[1] - clip[0], clip[2] - clip[1]) < 0:
        clip = clip[::-1]
    output = subject
    for i in range(len(clip)):
        if len(output) == 0:
            break
        a, b = clip[i], clip[(i + 1) % len(clip)]
        edge = b - a
        d = cross2(edge, output - a)  # >0 strictly inside
        next_d = np.roll(d, -1)
        next_v = np.roll(output, -1, axis=0)
        new_pts = []
        for j in range(len(output)):
            if d[j] >= 0:
                new_pts.append(output[j])
            if (d[j] >= 0) != (next_d[j] >= 0):
                denom = d[j] - next_d[j]
                if denom != 0:
                    t = d[j] / denom
                    new_pts.append(output[j] + t * (next_v[j] - output[j]))
        output = np.array(new_pts) if new_pts else np.zeros((0, 2))
    return output


def rect_intersection_area(poly1: np.ndarray, poly2: np.ndarray) -> float:
    inter = clip_polygon(poly1, poly2)
    if len(inter) < 3:
        return 0.0
    return polygon_area(inter)


def overlapped_boxes_3d(single_box: np.ndarray, box_list: np.ndarray) -> np.ndarray:
    """Overlap of one box against a list, all given as (8, 3) corners.

    Parity target: ``overlapped_boxes_3d_fast_poly`` (nms.py:64-88),
    including the AABB prefilter and the exact union formula.  The first
    four corner rows are the top face whose (x, z) columns form the BEV
    footprint.
    """
    box_list = np.asarray(box_list)
    if len(box_list) == 0:
        return np.zeros(0)
    single_max = np.max(single_box, axis=0)
    single_min = np.min(single_box, axis=0)
    x0_max, y0_max, z0_max = single_max
    x0_min, y0_min, z0_min = single_min
    max_corner = np.max(box_list, axis=1)
    min_corner = np.min(box_list, axis=1)
    non_overlap = np.any(
        (single_max < min_corner) | (single_min > max_corner), axis=1
    )
    poly1 = single_box[:4][:, [0, 2]]
    area1 = polygon_area(poly1)
    overlap = np.zeros(len(box_list))
    for i in np.flatnonzero(~non_overlap):
        poly2 = box_list[i][:4][:, [0, 2]]
        shared_area = rect_intersection_area(poly1, poly2)
        area2 = polygon_area(poly2)
        y_max, y_min = max_corner[i, 1], min_corner[i, 1]
        shared_y = min(y_max, y0_max) - max(y_min, y0_min)
        intersection = shared_y * shared_area
        union = (y_max - y_min) * area2 + (y0_max - y0_min) * area1
        overlap[i] = np.float32(intersection) / (union - intersection)
    return overlap


# fast-poly variant name kept for API parity; same geometry, computed
# exactly with the convex clipper instead of Shapely.
overlapped_boxes_3d_fast_poly = overlapped_boxes_3d


def _fill_convex_quad(buf: np.ndarray, quad: np.ndarray) -> None:
    """Rasterize a convex integer quad into ``buf`` (rows = z, cols = x).

    Scanline fill matching cv2.fillPoly's pixel rule closely enough for
    the legacy approximate-IoU use (each row covers the span between the
    polygon's edge crossings, endpoints included).  Used only when cv2
    is not importable.
    """
    n = len(quad)
    zs = quad[:, 1]
    z_lo = max(int(np.min(zs)), 0)
    z_hi = min(int(np.max(zs)), buf.shape[0] - 1)
    for z in range(z_lo, z_hi + 1):
        xs = []
        for j in range(n):
            (x0, z0), (x1, z1) = quad[j], quad[(j + 1) % n]
            if z0 == z1:
                if z == z0:
                    xs.extend([x0, x1])
                continue
            lo, hi = (z0, z1) if z0 < z1 else (z1, z0)
            if lo <= z <= hi:
                xs.append(x0 + (x1 - x0) * (z - z0) / (z1 - z0))
        if not xs:
            continue
        # rounding the crossing endpoints tracks cv2's line-inclusive
        # fill much closer than an interior-only span (measured)
        x_lo = max(int(round(min(xs))), 0)
        x_hi = min(int(round(max(xs))), buf.shape[1] - 1)
        if x_hi >= x_lo:
            buf[z, x_lo:x_hi + 1] = 1


def overlapped_boxes_3d_rasterized(
    single_box: np.ndarray, box_list: np.ndarray
) -> np.ndarray:
    """Legacy rasterized approximate overlap (reference nms.py:29-62).

    Expects *integer-quantized* corners (the caller multiplies by
    ``appr_factor`` and truncates to int32, reference nms.py:113-114):
    the BEV footprints are drawn into pixel buffers with cv2.fillPoly
    and the overlap ratio is computed from pixel counts, so the result
    is an ``appr_factor``-controlled approximation of the exact polygon
    IoU.  Kept for bit-level behavioral parity with the reference's
    ``nms_boxes_3d(..., overlapped_fn=overlapped_boxes_3d)`` path; the
    exact convex-clip backend above is the default everywhere.
    """
    try:
        import cv2
    except ImportError:
        cv2 = None
    box_list = np.asarray(box_list)
    if len(box_list) == 0:
        return np.zeros(0)
    single_box = np.asarray(single_box)
    single_max = np.max(single_box, axis=0)
    single_min = np.min(single_box, axis=0)
    x0_max, y0_max, z0_max = single_max
    x0_min, y0_min, z0_min = single_min
    max_corner = np.max(box_list, axis=1)
    min_corner = np.min(box_list, axis=1)
    non_overlap = np.any(
        (single_max < min_corner) | (single_min > max_corner), axis=1
    )
    overlap = np.zeros(len(box_list))
    quad1 = single_box[:4][:, [0, 2]]
    for i in np.flatnonzero(~non_overlap):
        box = box_list[i]
        x_max, y_max, z_max = max_corner[i]
        x_min, y_min, z_min = min_corner[i]
        # draw both footprints on a shared canvas anchored at the
        # joint AABB minimum (reference nms.py:46-57)
        offset = np.array(
            [min(x0_min, x_min), min(z0_min, z_min)], dtype=np.int64
        )
        w = int(max(x0_max, x_max) - offset[0])
        h = int(max(z0_max, z_max) - offset[1])
        if w <= 0 or h <= 0:
            continue
        buf1 = np.zeros((h, w), dtype=np.int32)
        buf2 = np.zeros_like(buf1)
        q1 = (quad1 - offset).astype(np.int32)
        q2 = (box[:4][:, [0, 2]] - offset).astype(np.int32)
        if cv2 is not None:
            cv2.fillPoly(buf1, [q1], color=1)
            cv2.fillPoly(buf2, [q2], color=1)
        else:
            _fill_convex_quad(buf1, q1)
            _fill_convex_quad(buf2, q2)
        shared_area = int(np.count_nonzero(buf1 * buf2))
        area1 = int(np.count_nonzero(buf1))
        area2 = int(np.count_nonzero(buf2))
        shared_y = min(y_max, y0_max) - max(y_min, y0_min)
        intersection = shared_y * shared_area
        union = (y_max - y_min) * area2 + (y0_max - y0_min) * area1
        overlap[i] = np.float32(intersection) / (union - intersection)
    return overlap
