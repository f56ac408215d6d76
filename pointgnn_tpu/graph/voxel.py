"""Vectorized voxel-grid downsampling (host side, numpy).

Capability parity with the reference's downsampling family
(/root/reference/models/graph_gen.py:11-153 and
/root/reference/dataset/kitti_dataset.py:16-82) with two deliberate
upgrades for the TPU pipeline:

- every variant is fully vectorized (the reference's random variant is a
  Python dict loop over points, ~10^4 dict ops per frame);
- randomness flows through an explicit ``numpy.random.Generator`` so
  multiprocess data loading stays reproducible.

Semantics preserved: voxel keys are computed from the min-corner offset
grid exactly like the reference (floor-divide after offset, optional
random 3D shift of the grid), "same scale level" copies vertices and
emits identity keypoint indices, and the random variant picks one
*original* point per occupied voxel uniformly at random.
"""

from typing import List, Optional, Tuple

import numpy as np

from pointgnn_tpu.core.points import Points


def _voxel_keys(xyz: np.ndarray, voxel_size, rng=None) -> np.ndarray:
    """Scalar voxel key per point. Optional random grid shift (add_rnd3d)."""
    if len(xyz) == 0:  # empty frame (e.g. degenerate frustum crop):
        return np.zeros(0, dtype=np.int64)  # no occupied voxels
    xyz_min = xyz.min(axis=0, keepdims=True)
    shifted = xyz - xyz_min
    if rng is not None:
        shifted = shifted + voxel_size * rng.random((1, 3))
    idx = np.floor(shifted / voxel_size).astype(np.int64)
    dims = idx.max(axis=0) + 1
    return idx[:, 0] + idx[:, 1] * dims[0] + idx[:, 2] * dims[1] * dims[0]


def voxel_downsample_average(
    points: Points, voxel_size: float, rng: Optional[np.random.Generator] = None
) -> Points:
    """Average xyz (and attr) of all points per occupied voxel."""
    keys = _voxel_keys(points.xyz, voxel_size, rng)
    order = np.argsort(keys, kind="stable")
    sorted_xyz = points.xyz[order]
    _, starts, counts = np.unique(
        keys[order], return_index=True, return_counts=True
    )
    mean_xyz = np.add.reduceat(sorted_xyz, starts, axis=0) / counts[:, None]
    attr = None
    if points.attr is not None:
        sorted_attr = points.attr[order]
        attr = np.add.reduceat(sorted_attr, starts, axis=0) / counts[:, None]
    return Points(xyz=mean_xyz, attr=attr)


def voxel_downsample_random_indices(
    xyz: np.ndarray,
    voxel_size: float,
    rng: np.random.Generator,
    add_rnd3d: bool = False,
) -> np.ndarray:
    """Pick one random point index per occupied voxel.  Returns [K] indices.

    Vectorized equivalent of graph_gen.py:134-150: shuffle point order,
    then take the first point of each voxel group in shuffled order —
    a uniform choice per voxel.
    """
    keys = _voxel_keys(xyz, voxel_size, rng if add_rnd3d else None)
    perm = rng.permutation(len(keys))
    order = perm[np.argsort(keys[perm], kind="stable")]
    sorted_keys = keys[order]
    first = np.ones(len(sorted_keys), dtype=bool)
    first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return order[first]


def voxel_downsample_random(
    points: Points,
    voxel_size: float,
    rng: Optional[np.random.Generator] = None,
    add_rnd3d: bool = False,
) -> Points:
    if rng is None:
        rng = np.random.default_rng()
    sel = voxel_downsample_random_indices(points.xyz, voxel_size, rng, add_rnd3d)
    return points.mask(sel)


def multi_level_downsample_random(
    points_xyz: np.ndarray,
    base_voxel_size: float,
    levels: List[float],
    add_rnd3d: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Random-point-per-voxel multi-level downsampling.

    Returns ``(vertex_coord_list, keypoint_indices_list)`` with
    ``len(vertex_coord_list) == len(levels) + 1`` where consecutive equal
    scales copy coordinates and use identity keypoint indices
    (graph_gen.py:92-153 semantics).  Keypoint indices are [K, 1] arrays
    of indices into the previous level.
    """
    if rng is None:
        rng = np.random.default_rng()
    vertex_coord_list = [np.asarray(points_xyz)]
    keypoint_indices_list = []
    last_level = 0.0
    for level in levels:
        last_xyz = vertex_coord_list[-1]
        if np.isclose(last_level, level):
            vertex_coord_list.append(last_xyz.copy())
            keypoint_indices_list.append(
                np.arange(len(last_xyz), dtype=np.int64)[:, None]
            )
        else:
            sel = voxel_downsample_random_indices(
                last_xyz, base_voxel_size * level, rng, add_rnd3d
            )
            vertex_coord_list.append(last_xyz[sel])
            keypoint_indices_list.append(sel.astype(np.int64)[:, None])
        last_level = level
    return vertex_coord_list, keypoint_indices_list


def multi_level_downsample_select(
    points_xyz: np.ndarray,
    base_voxel_size: float,
    levels: List[float],
    add_rnd3d: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """'center' method: voxel-average then snap to the nearest original
    point (graph_gen.py:49-90).

    The nearest-neighbor match uses a cKDTree (C implementation in
    scipy); this runs once per frame on the host and is not a TPU-path
    dependency.
    """
    from scipy.spatial import cKDTree

    if rng is None:
        rng = np.random.default_rng()
    points_xyz = np.asarray(points_xyz)
    vertex_coord_list = [points_xyz]
    keypoint_indices_list = []
    last_level = 0.0
    for level in levels:
        base = vertex_coord_list[-1]
        if np.isclose(last_level, level):
            vertex_coord_list.append(base.copy())
            keypoint_indices_list.append(
                np.arange(len(base), dtype=np.int64)[:, None]
            )
        else:
            centers = voxel_downsample_average(
                Points(xyz=base, attr=None),
                base_voxel_size * level,
                rng if add_rnd3d else None,
            ).xyz
            tree = cKDTree(base)
            _, idx = tree.query(centers, k=1)
            idx = np.asarray(idx, dtype=np.int64)
            vertex_coord_list.append(base[idx])
            keypoint_indices_list.append(idx[:, None])
        last_level = level
    return vertex_coord_list, keypoint_indices_list
