"""Rotated-box 3D overlap (BEV polygon intersection x height overlap).

Replaces the reference's two IoU backends — Shapely polygons
(/root/reference/models/nms.py:64-88) and cv2 rasterization
(nms.py:29-62) — with a dependency-free Sutherland-Hodgman convex
clipper.  The overlap definition matches the reference exactly:

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


# legacy rasterized variant name kept for API parity; same geometry,
# computed exactly (the reference's cv2.fillPoly pixel counting was an
# integer approximation controlled by appr_factor).
overlapped_boxes_3d_fast_poly = overlapped_boxes_3d
