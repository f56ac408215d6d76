"""Multi-level proximity-graph construction (host orchestration).

API parity with /root/reference/models/graph_gen.py:155-227: the same
registry names, argument names and return structure
``(vertex_coord_list, keypoint_indices_list, edges_list)`` so configs
written for the reference drive this builder unchanged.  The underlying
search is the vectorized grid hash of :mod:`pointgnn_tpu.graph.radius`
instead of a per-frame sklearn ball-tree.
"""

from typing import List, Optional

import numpy as np

from pointgnn_tpu.graph import radius as radius_search
from pointgnn_tpu.graph import voxel


def gen_disjointed_rnn_local_graph_v3(
    points_xyz: np.ndarray,
    center_xyz: np.ndarray,
    radius: float,
    num_neighbors: int,
    neighbors_downsample_method: str = "random",
    scale=None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Radius-neighbor edges (graph_gen.py:197-220 parity).

    Returns [E, 2] (point_index, center_index) int edges.
    """
    if neighbors_downsample_method != "random":
        raise ValueError(
            "unknown neighbors_downsample_method: %s"
            % neighbors_downsample_method
        )
    if scale is not None:
        scale = np.asarray(scale)
        points_xyz = points_xyz / scale
        center_xyz = center_xyz / scale
    edges = radius_search.radius_neighbors(
        points_xyz, center_xyz, radius, num_neighbors=num_neighbors, rng=rng
    )
    return edges.astype(np.int64)


def gen_multi_level_local_graph_v3(
    points_xyz: np.ndarray,
    base_voxel_size: float,
    level_configs: List[dict],
    add_rnd3d: bool = False,
    downsample_method: str = "random",
    rng: Optional[np.random.Generator] = None,
):
    """Build the multi-scale graph stack (graph_gen.py:155-195 parity).

    Level i's edges connect ``vertex_coord_list[graph_level]`` (points)
    to ``vertex_coord_list[graph_level + 1]`` (centers), so a GNN layer
    stack can consume the levels sequentially.
    """
    if rng is None:
        rng = np.random.default_rng()
    if isinstance(base_voxel_size, list):
        base_voxel_size = np.array(base_voxel_size)
    scales = [cfg["graph_scale"] for cfg in level_configs]
    if downsample_method == "center":
        vertex_coord_list, keypoint_indices_list = (
            voxel.multi_level_downsample_select(
                points_xyz, base_voxel_size, scales, add_rnd3d=add_rnd3d,
                rng=rng,
            )
        )
    elif downsample_method == "random":
        vertex_coord_list, keypoint_indices_list = (
            voxel.multi_level_downsample_random(
                points_xyz, base_voxel_size, scales, add_rnd3d=add_rnd3d,
                rng=rng,
            )
        )
    else:
        raise ValueError("unknown downsample_method: %s" % downsample_method)

    edges_list = []
    for cfg in level_configs:
        graph_level = cfg["graph_level"]
        gen_graph_fn = get_graph_generate_fn(cfg["graph_gen_method"])
        kwargs = dict(cfg["graph_gen_kwargs"])
        level_points = vertex_coord_list[graph_level]
        level_centers = vertex_coord_list[graph_level + 1]
        edges_list.append(
            gen_graph_fn(level_points, level_centers, rng=rng, **kwargs)
        )
    return vertex_coord_list, keypoint_indices_list, edges_list


_GRAPH_FNS = {
    "disjointed_rnn_local_graph_v3": gen_disjointed_rnn_local_graph_v3,
    "multi_level_local_graph_v3": gen_multi_level_local_graph_v3,
}


def get_graph_generate_fn(method_name: str):
    return _GRAPH_FNS[method_name]
