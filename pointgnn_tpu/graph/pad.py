"""Static-shape padded graphs — the TPU-side data representation.

The reference feeds ragged ``[None, ...]`` tensors per frame
(/root/reference/train.py:179-262) and batches frames by concatenating
disjoint graphs with index offsets (/root/reference/train.py:135-171).
XLA requires static shapes, so this module keeps the graph-union
batching but pads every array to fixed capacities:

- vertex levels padded to ``capacity.vertices[i]`` with a validity mask;
- edge lists padded to ``capacity.edges[i]``; padded edges carry a
  *sentinel destination* equal to the destination level's capacity, so a
  segment aggregation with ``num_segments = K + 1`` routes all padding
  into one extra segment that is sliced off — no masking needed in the
  hot loop;
- per-vertex supervision (labels / encoded boxes / box validity) padded
  along the last level.

Capacity overflow is handled by *balanced truncation*: edges are ranked
within their destination group and the highest ranks are dropped first,
so every center keeps its closest-rank neighbors instead of late
centers losing all edges.
"""

import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class GraphCapacity:
    """Static capacities per graph level.

    ``vertices`` has one entry per vertex level (L+1 entries for L edge
    levels); ``edges`` one entry per edge level.
    """

    vertices: Tuple[int, ...]
    edges: Tuple[int, ...]

    def __post_init__(self):
        assert len(self.vertices) == len(self.edges) + 1

    @property
    def num_levels(self) -> int:
        return len(self.edges)

    def scaled(self, factor: int) -> "GraphCapacity":
        return GraphCapacity(
            vertices=tuple(v * factor for v in self.vertices),
            edges=tuple(e * factor for e in self.edges),
        )


# Defaults sized for KITTI frames under the shipped car/ped_cyl configs
# (≈20k in-image points, voxel 0.8 → ≈6k keypoints; level-1 radius 4.0
# capped at 256 neighbors but with typical total edge counts far lower).
CAR_FRAME_CAPACITY = GraphCapacity(
    vertices=(32768, 8192, 8192), edges=(262144, 786432)
)
PED_CYL_FRAME_CAPACITY = GraphCapacity(
    vertices=(32768, 16384, 16384), edges=(262144, 786432)
)


class FrameData(NamedTuple):
    """Ragged per-frame arrays, the host pipeline's output
    (mirrors fetch_data's 7-tuple, /root/reference/train.py:78-133)."""

    features: np.ndarray                 # [P0, C]
    vertex_coord_list: List[np.ndarray]  # [L+1][Pi, 3]
    keypoint_indices_list: List[np.ndarray]  # [L][Ki, 1]
    edges_list: List[np.ndarray]         # [L][Ei, 2]
    cls_labels: Optional[np.ndarray] = None       # [K_last, 1]
    encoded_boxes: Optional[np.ndarray] = None    # [K_last, 1, 7]
    valid_boxes: Optional[np.ndarray] = None      # [K_last, 1, 1]


class PaddedGraph(NamedTuple):
    """Fixed-shape device representation of one (possibly multi-frame)
    disjoint graph union.  All arrays have static shapes given by a
    :class:`GraphCapacity`; jit-compatible pytree."""

    features: np.ndarray                    # [P0, C] float32
    vertex_xyz: Tuple[np.ndarray, ...]      # [L+1][Pi, 3] float32
    vertex_mask: Tuple[np.ndarray, ...]     # [L+1][Pi] float32 (1=valid)
    keypoint_indices: Tuple[np.ndarray, ...]  # [L][K(i+1)] int32 -> level i
    edges_src: Tuple[np.ndarray, ...]       # [L][Ei] int32 -> level i
    edges_dst: Tuple[np.ndarray, ...]       # [L][Ei] int32 -> level i+1,
    #                                         padded rows = K(i+1) sentinel
    cls_labels: np.ndarray                  # [K_last] int32
    encoded_boxes: np.ndarray               # [K_last, 7] float32
    valid_boxes: np.ndarray                 # [K_last] float32
    # slab-mode level-1 metadata (device_builder.slab_metadata): cell
    # row offsets + per-vertex cell ids replace the level-1 edge list
    slab_offsets: Optional[np.ndarray] = None     # [g*g+1] int32
    slab_center_cell: Optional[np.ndarray] = None  # [K1] int32
    # slab-mode level-0: raw points are level-0-cell-sorted; offsets
    # index point rows, center cells are the keypoints' level-0 cells
    slab0_offsets: Optional[np.ndarray] = None     # [g0*g0+1] int32
    slab0_center_cell: Optional[np.ndarray] = None  # [K1] int32

    @property
    def num_levels(self) -> int:
        return len(self.edges_src)


def _pad_rows(arr: np.ndarray, size: int, fill=0):
    """Pad/truncate the leading dim of ``arr`` to ``size``."""
    n = arr.shape[0]
    if n >= size:
        return arr[:size], min(n, size)
    pad_shape = (size - n,) + arr.shape[1:]
    return (
        np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], 0),
        n,
    )


def _balanced_truncate_edges(
    edges: np.ndarray, cap: int, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Drop edges above ``cap`` keeping per-center balance.

    Edges must be grouped by ``edges[:, 1]`` (guaranteed by the radius
    search).  Rank each edge within its center group and keep the
    globally lowest ranks, then restore center-sorted order.
    """
    if len(edges) <= cap:
        return edges
    dst = edges[:, 1]
    group_start = np.ones(len(dst), dtype=bool)
    group_start[1:] = dst[1:] != dst[:-1]
    first = np.flatnonzero(group_start)
    group_idx = np.cumsum(group_start) - 1
    rank = np.arange(len(dst)) - first[group_idx]
    keep = np.argsort(rank, kind="stable")[:cap]
    keep.sort()  # restores grouped-by-center order
    return edges[keep]


def pad_frame(
    frame: FrameData,
    capacity: GraphCapacity,
    rng: Optional[np.random.Generator] = None,
) -> PaddedGraph:
    return batch_and_pad([frame], capacity, rng)


def _bucket(n: int, headroom: float, multiple: int) -> int:
    """Quantized size: ``n`` x headroom rounded up to ``multiple`` —
    the one definition of the capacity rounding policy, shared by
    :func:`suggest_capacity` and :func:`grow_to_fit`."""
    return int(np.ceil(n * headroom / multiple) * multiple)


def suggest_capacity(
    frames: Sequence[FrameData],
    headroom: float = 1.25,
    multiple: int = 1024,
) -> GraphCapacity:
    """Size a capacity bucket from sample frames: max observed counts x
    headroom, rounded up to ``multiple`` (avoids silent truncation when
    the workload's density is unknown a priori)."""
    num_levels = len(frames[0].edges_list)
    vertices = tuple(
        _bucket(
            max(f.vertex_coord_list[li].shape[0] for f in frames),
            headroom, multiple,
        )
        for li in range(num_levels + 1)
    )
    edges = tuple(
        _bucket(
            max(f.edges_list[li].shape[0] for f in frames),
            headroom, multiple,
        )
        for li in range(num_levels)
    )
    return GraphCapacity(vertices=vertices, edges=edges)


def grow_to_fit(
    capacity: GraphCapacity,
    frames: Sequence[FrameData],
    headroom: float = 1.25,
    multiple: int = 4096,
) -> Tuple[GraphCapacity, bool]:
    """Return ``(capacity, grew)`` where the capacity is enlarged (never
    shrunk) so that the union of ``frames`` fits without truncation.

    Enforces the CLAUDE.md invariant in code instead of contributor
    memory: a checkpoint trained on uncapped neighborhoods (slab /
    device_graph mode) silently mislocalizes when the host path's
    padded graph drops edges (measured BEV AP 0.00 vs 100 —
    docs/PERF_NOTES.md "train/test neighbor-cap mismatch").  Growth is
    quantized to ``multiple`` with ``headroom`` so repeated calls over a
    dataset trigger at most a handful of recompiles.
    """
    num_levels = capacity.num_levels
    # SUM (not max) over frames: batch_and_pad unions the frames into
    # one disjoint graph, so the bucket must hold all of them at once
    need_v = [
        sum(f.vertex_coord_list[li].shape[0] for f in frames)
        for li in range(num_levels + 1)
    ]
    need_e = [
        sum(f.edges_list[li].shape[0] for f in frames)
        for li in range(num_levels)
    ]
    # Grow only on TRUE overflow (need > capacity); the headroomed
    # bucket is the growth TARGET, not part of the fit test — otherwise
    # a frame using >1/headroom of its bucket triggers a spurious
    # recompile plus a misleading overflow warning downstream.
    vertices = tuple(
        max(c, _bucket(n, headroom, multiple)) if n > c else c
        for c, n in zip(capacity.vertices, need_v)
    )
    edges = tuple(
        max(c, _bucket(n, headroom, multiple)) if n > c else c
        for c, n in zip(capacity.edges, need_e)
    )
    grew = vertices != capacity.vertices or edges != capacity.edges
    if grew:
        capacity = GraphCapacity(vertices=vertices, edges=edges)
    return capacity, grew


def batch_and_pad(
    frames: Sequence[FrameData],
    capacity: GraphCapacity,
    rng: Optional[np.random.Generator] = None,
) -> PaddedGraph:
    """Graph-union batching (offset indices) + capacity padding.

    Index-offset logic mirrors /root/reference/train.py:135-171; the
    result is a single disjoint graph covering all frames.
    """
    num_levels = capacity.num_levels
    for f in frames:
        assert len(f.edges_list) == num_levels

    # ---- union with offsets -------------------------------------------
    vertex_levels: List[np.ndarray] = []
    for li in range(num_levels + 1):
        vertex_levels.append(
            np.concatenate([f.vertex_coord_list[li] for f in frames], 0)
        )
    keypoint_levels: List[np.ndarray] = []
    edge_levels: List[np.ndarray] = []
    for li in range(num_levels):
        kp_parts, e_parts = [], []
        point_off = 0
        center_off = 0
        for f in frames:
            kp = f.keypoint_indices_list[li].reshape(-1)
            e = f.edges_list[li]
            kp_parts.append(kp + point_off)
            e_parts.append(
                np.stack([e[:, 0] + point_off, e[:, 1] + center_off], 1)
            )
            point_off += f.vertex_coord_list[li].shape[0]
            center_off += kp.shape[0]
        keypoint_levels.append(np.concatenate(kp_parts, 0))
        # edge groups stay center-sorted because center offsets increase
        edge_levels.append(np.concatenate(e_parts, 0))

    features = np.concatenate([f.features for f in frames], 0)
    has_labels = frames[0].cls_labels is not None
    if has_labels:
        cls_labels = np.concatenate(
            [f.cls_labels.reshape(-1) for f in frames], 0
        )
        encoded_boxes = np.concatenate(
            [f.encoded_boxes.reshape(-1, 7) for f in frames], 0
        )
        valid_boxes = np.concatenate(
            [f.valid_boxes.reshape(-1) for f in frames], 0
        )

    # ---- capacity truncation (vertices first, then dependents) --------
    caps_v = capacity.vertices
    for li in range(num_levels + 1):
        nv = vertex_levels[li].shape[0]
        if nv > caps_v[li]:
            # thread_warnings.warn: defers to the consuming thread when
            # called from the trainer's prefetch worker, plain
            # warnings.warn otherwise
            from pointgnn_tpu.utils import thread_warnings

            thread_warnings.warn(
                "vertex overflow at level %d: %d > capacity %d; "
                "truncating (detections may be lost — raise the "
                "GraphCapacity for this workload)" % (li, nv, caps_v[li]),
                RuntimeWarning,
                stacklevel=2,
            )
            vertex_levels[li] = vertex_levels[li][: caps_v[li]]
    # clamp keypoints / edges that reference dropped vertices
    for li in range(num_levels):
        nv_src = vertex_levels[li].shape[0]
        nv_dst = vertex_levels[li + 1].shape[0]
        # keypoints align positionally with level-(i+1) vertices: truncate
        # to the surviving vertex count and clamp dangling references
        kp = keypoint_levels[li][:nv_dst]
        keypoint_levels[li] = np.clip(kp, 0, max(nv_src - 1, 0))
        e = edge_levels[li]
        e = e[(e[:, 0] < nv_src) & (e[:, 1] < nv_dst)]
        if len(e) > capacity.edges[li]:
            from pointgnn_tpu.utils import thread_warnings

            thread_warnings.warn(
                "edge overflow at level %d: %d > capacity %d; dropping "
                "%d edges (balanced per center). Aggregated features "
                "shift when the model was trained on uncapped "
                "neighborhoods — measured to collapse BEV AP to 0 for a "
                "slab-trained checkpoint (docs/PERF_NOTES.md); raise "
                "GraphCapacity.edges for this workload"
                % (li, len(e), capacity.edges[li],
                   len(e) - capacity.edges[li]),
                RuntimeWarning,
                stacklevel=2,
            )
        edge_levels[li] = _balanced_truncate_edges(
            e, capacity.edges[li], rng
        )
    features = features[: caps_v[0]]

    # ---- pad to capacity ----------------------------------------------
    out_xyz, out_mask = [], []
    for li in range(num_levels + 1):
        padded, n = _pad_rows(
            vertex_levels[li].astype(np.float32), caps_v[li]
        )
        mask = np.zeros((caps_v[li],), np.float32)
        mask[:n] = 1.0
        out_xyz.append(padded)
        out_mask.append(mask)
    out_kp, out_esrc, out_edst = [], [], []
    for li in range(num_levels):
        kp, _ = _pad_rows(
            keypoint_levels[li].astype(np.int32), caps_v[li + 1]
        )
        out_kp.append(kp)
        e = edge_levels[li].astype(np.int32)
        ne = e.shape[0]
        cap_e = capacity.edges[li]
        src = np.zeros((cap_e,), np.int32)
        dst = np.full((cap_e,), caps_v[li + 1], np.int32)  # sentinel
        src[:ne] = e[:, 0]
        dst[:ne] = e[:, 1]
        out_esrc.append(src)
        out_edst.append(dst)

    feat, _ = _pad_rows(features.astype(np.float32), caps_v[0])
    k_last = caps_v[-1]
    if has_labels:
        cls_p, _ = _pad_rows(cls_labels.astype(np.int32), k_last)
        box_p, _ = _pad_rows(encoded_boxes.astype(np.float32), k_last)
        val_p, _ = _pad_rows(valid_boxes.astype(np.float32), k_last)
    else:
        cls_p = np.zeros((k_last,), np.int32)
        box_p = np.zeros((k_last, 7), np.float32)
        val_p = np.zeros((k_last,), np.float32)

    return PaddedGraph(
        features=feat,
        vertex_xyz=tuple(out_xyz),
        vertex_mask=tuple(out_mask),
        keypoint_indices=tuple(out_kp),
        edges_src=tuple(out_esrc),
        edges_dst=tuple(out_edst),
        cls_labels=cls_p,
        encoded_boxes=box_p,
        valid_boxes=val_p,
    )
