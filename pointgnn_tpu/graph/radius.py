"""Fixed-radius neighbor search via spatial grid hashing (host, numpy).

Replaces the reference's per-frame sklearn ball-tree query
(/root/reference/models/graph_gen.py:197-220) with a fully vectorized
grid-bucket search:

1. hash points into cubic cells of edge ``radius``;
2. build a CSR layout (sorted point order + per-cell ranges);
3. for every center, gather candidates from its 27 neighboring cells in
   one flat ragged gather (``repeat``/``cumsum`` arithmetic, no Python
   loop over centers);
4. distance-filter (``d <= radius``, inclusive, matching sklearn) and
   optionally cap neighbors per center by uniform random subsampling
   without replacement (graph_gen.py:210-214 semantics).

Output edges are ``[E, 2] = (point_index, center_index)`` sorted by
center index — the same grouped-by-center layout the reference's
``np.concatenate`` over per-center lists produces, which also makes the
downstream segment aggregation's indices sorted.
"""

from typing import Optional

import numpy as np

_NEIGHBOR_OFFSETS = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int64,
)  # [27, 3]


def radius_neighbors(
    points_xyz: np.ndarray,
    centers_xyz: np.ndarray,
    radius: float,
    num_neighbors: int = -1,
    rng: Optional[np.random.Generator] = None,
    use_native: bool = True,
) -> np.ndarray:
    """All (point, center) pairs with ``|p - c| <= radius``.

    Args:
      points_xyz: [N, 3] candidate points.
      centers_xyz: [M, 3] query centers.
      radius: search radius (inclusive).
      num_neighbors: if > 0, cap neighbors per center by uniform random
        subsampling without replacement.
      rng: generator for the subsampling (required if capping fires).

    Returns: [E, 2] int64 edges (point_index, center_index), grouped by
    center in ascending center order.
    """
    points_xyz = np.ascontiguousarray(points_xyz, dtype=np.float32)
    centers_xyz = np.ascontiguousarray(centers_xyz, dtype=np.float32)
    n = len(points_xyz)
    m = len(centers_xyz)
    if n == 0 or m == 0:
        return np.zeros((0, 2), dtype=np.int64)

    if use_native:
        from pointgnn_tpu.graph import _native

        seed = (
            int(rng.integers(0, 2**63 - 1)) if rng is not None else 12345
        )
        edges = _native.radius_neighbors_native(
            points_xyz, centers_xyz, radius, num_neighbors, seed
        )
        if edges is not None:
            return edges

    inv = 1.0 / float(radius)
    origin = points_xyz.min(axis=0)
    pcell = np.floor((points_xyz - origin) * inv).astype(np.int64)
    ccell = np.floor((centers_xyz - origin) * inv).astype(np.int64)
    # grid dims from the union so center cells outside the point bbox
    # still get valid (possibly empty) keys
    hi = np.maximum(pcell.max(axis=0), ccell.max(axis=0)) + 2
    lo = np.minimum(pcell.min(axis=0), ccell.min(axis=0)) - 1
    pcell -= lo
    ccell -= lo
    dims = hi - lo + 1

    def key_of(cell):
        return (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]

    pkey = key_of(pcell)
    order = np.argsort(pkey, kind="stable")
    sorted_key = pkey[order]

    # candidate cells for each center: 27 neighbor cells -> keys
    neigh = ccell[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]  # [M, 27, 3]
    nkey = (
        (neigh[:, :, 0] * dims[1] + neigh[:, :, 1]) * dims[2] + neigh[:, :, 2]
    ).reshape(-1)  # [M*27]
    starts = np.searchsorted(sorted_key, nkey, side="left")
    ends = np.searchsorted(sorted_key, nkey, side="right")
    counts = ends - starts  # [M*27]

    total = int(counts.sum())
    if total == 0:
        return np.zeros((0, 2), dtype=np.int64)

    # flat ragged gather: for each (center, cell) range emit its span
    cand_center = np.repeat(
        np.repeat(np.arange(m, dtype=np.int64), 27), counts.reshape(-1)
    )
    # positions within the sorted point array
    cum = np.cumsum(counts)
    flat_pos = np.arange(total, dtype=np.int64) - np.repeat(cum - counts, counts)
    cand_sorted_pos = np.repeat(starts, counts) + flat_pos
    cand_point = order[cand_sorted_pos]

    d2 = np.sum(
        (points_xyz[cand_point] - centers_xyz[cand_center]) ** 2, axis=-1
    )
    keep = d2 <= radius * radius + 1e-12
    cand_point = cand_point[keep]
    cand_center = cand_center[keep]

    if num_neighbors > 0:
        if rng is None:
            rng = np.random.default_rng()
        # random rank within each center group, keep rank < cap
        priority = rng.random(len(cand_center))
        order2 = np.lexsort((priority, cand_center))
        cand_center = cand_center[order2]
        cand_point = cand_point[order2]
        group_start = np.ones(len(cand_center), dtype=bool)
        group_start[1:] = cand_center[1:] != cand_center[:-1]
        group_idx = np.cumsum(group_start) - 1
        first_of_group = np.flatnonzero(group_start)
        rank = np.arange(len(cand_center)) - first_of_group[group_idx]
        sel = rank < num_neighbors
        cand_center = cand_center[sel]
        cand_point = cand_point[sel]
    else:
        order2 = np.argsort(cand_center, kind="stable")
        cand_center = cand_center[order2]
        cand_point = cand_point[order2]

    return np.stack([cand_point, cand_center], axis=1)
