"""On-device multi-level graph construction (pure jnp, static shapes).

The host builder (:mod:`pointgnn_tpu.graph.builder`) runs per frame on
CPU and its output — ~20MB of padded edge/vertex arrays — must cross to
the device every call.  For inference that transfer dominates end-to-end
latency, so this module moves the whole graph construction into the
jitted program: the device receives only the raw padded point cloud
(~0.2MB) and builds voxel keypoints + radius-neighbor edges itself.

Same geometry as the reference pipeline (graph_gen.py:155-220): one
voxel-downsampling level (one representative point per occupied voxel)
followed by per-level fixed-radius neighbor search; identical-scale
levels share vertices with identity keypoints.

Algorithms (all static-shape, XLA-friendly):
- voxel select: pack integer cell coords into one key, sort, take each
  group's first point, compact with ``nonzero(size=K)``;
- radius search (:func:`radius_edges`): scatter sources into a dense
  2D (x, z) grid of ``cell_cap``-slot cell tables, row-gather each
  center's 3x3 neighboring cell tables (contiguous 128-lane-friendly
  rows), distance-test the candidates, and compact to
  ``per_center_cap`` neighbors with one ``top_k`` per center over a
  slot-rank key.  Edges come out grouped by center with src-sentinel
  padding — exactly the PaddedGraph layout;
- slab mode (:func:`slab_metadata` + nn/pallas_kernels): no edge list
  at all — cell-sorted candidate order + per-cell row offsets let the
  kernel walk the exact uncapped radius graph.

Determinism: the voxel representative is the lowest-index point per
voxel (or uniform-random under ``rnd_key`` — the reference's
train-time stochasticity); when a center saturates
``per_center_cap``, the kept neighbors follow the top_k slot-rank
order, i.e. cell-major then lowest-rank-within-cell — NOT
nearest-first.  Slab mode has no cap, so the question disappears on
the production path.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointgnn_tpu.graph.pad import PaddedGraph

# static packing dims for cell keys: supports grids up to 1024 x 128 x
# 1024 cells (at the smallest shipped cell size, 0.4m, that is a
# 409m x 51m x 409m volume — beyond any KITTI frame)
_DX, _DY, _DZ = 1024, 128, 1024


class LevelSpec(NamedTuple):
    radius: float
    cell_cap: int        # max candidates stored per grid cell (M)
    per_center_cap: int  # max neighbors kept per center (edge budget/K)
    grid_xz: int = 256   # dense 2D grid extent (cells per side)
    # slab-kernel grid: cell size is decoupled from the radius — the
    # kernel walks a (2*halo+1)^2 cell window with halo =
    # ceil(radius / cell).  Cells LARGER than the radius keep the
    # [slab_grid^2+1] offsets table inside SMEM (~1MB on v5e — radius
    # 0.4 at a 260m extent would need a 650^2 table); cells SMALLER
    # than the radius (halo 2+) tighten the window around the ball
    # (a 3x3 radius-sized window overfetches 9/pi = 2.9x; 5x5 half
    # cells only 2.0x), which pays off when the edge-MLP tables are
    # wide and window MXU compute dominates.  0 means "radius /
    # grid_xz".
    slab_cell: float = 0.0
    slab_grid: int = 0
    slab_halo: int = 1
    # compact candidates with jax.lax.approx_max_k (the TPU PartialReduce
    # instruction) instead of exact top_k: several times faster at these
    # widths, at the cost of dropping ~(1-recall) of the in-radius
    # neighbors per center when more than per_center_cap are available —
    # the same kind of cap the reference itself applies (graph_gen.py:
    # 210-214 randomly subsamples to num_neighbors at train time)
    approx_topk: bool = False
    approx_recall: float = 0.98


class DeviceGraphSpec(NamedTuple):
    """Static configuration of the two-level Point-GNN graph."""

    num_points: int       # P: raw point capacity
    num_keypoints: int    # K: downsampled vertex capacity
    voxel_size: float     # level-0 downsampling voxel
    level0: LevelSpec     # raw -> keypoints edges
    level1: LevelSpec     # keypoints -> keypoints edges
    # level-1 "slab" mode: no edge list at all — keypoints are sorted by
    # radius-grid cell and the GNN layers run the fused radius-search +
    # edge-MLP kernel (nn/pallas_kernels.slab_edge_max) over per-cell
    # row ranges.  Semantics: the UNCAPPED radius graph (the reference's
    # runtime num_neighbors=-1), vs. the per_center_cap approximation of
    # the edge-list path.
    slab_level1: bool = False
    # level-0 slab mode: raw points are sorted by the level-0 radius
    # grid and the set-pooling layer runs the same fused kernel
    # (points → keypoints); keypoints are ordered hierarchically
    # (level-1 cell major, level-0 cell minor) so both slab levels see
    # spatially-local center blocks.
    slab_level0: bool = False


def spec_from_config(
    config: dict,
    num_points: int = 32768,
    num_keypoints: int = 16384,
    runtime: bool = True,
    cell_caps: Tuple[int, int] = (96, 192),
    per_center_caps: Tuple[int, int] = (32, 256),
    world_extent: float = 130.0,
    approx_topk: bool = False,
) -> DeviceGraphSpec:
    """Derive the spec from a reference-format model config.

    ``world_extent`` bounds the dense grid (cells outside are clamped
    into the border cells, where the distance test rejects them).  The
    default covers the KITTI camera frustum (~91m lateral span, ~80m
    forward; grids use a per-frame origin) with margin; oversizing it
    inflates the SMEM-bounded slab cell floor ``extent/256`` and with
    it the small-radius levels' window overfetch (measured: ped_cyl
    fused program 55 -> 50.6 ms going 260 -> 130)."""
    kwargs = config["runtime_graph_gen_kwargs" if runtime else
                    "graph_gen_kwargs"]
    levels = kwargs["level_configs"]
    assert len(levels) == 2, "device builder supports the 2-level family"
    scale0 = levels[0]["graph_scale"]
    scale1 = levels[1]["graph_scale"]
    assert np.isclose(scale0, scale1), (
        "device builder assumes level-1 shares level-0 vertices "
        "(all shipped configs do)"
    )
    voxel = kwargs["base_voxel_size"] * scale0

    def level(i, cell_cap, per_center_cap):
        r = float(levels[i]["graph_gen_kwargs"]["radius"])
        grid = int(np.clip(int(np.ceil(world_extent / r)), 32, 512))
        # slab grid: radius-sized cells (halo 1), floored at 256^2
        # offsets (SMEM).  Finer cells (halo 2, cell = r/2) tighten the
        # candidate window geometrically (9/pi -> 2.0x overfetch) and
        # measured ~12% faster at the isolated-kernel level, but LOSE
        # ~9% end-to-end: the extra columns each pay the zscan +
        # one-tile fixed costs, and block z-spans grow on the finer
        # grid.  The mechanism stays (LevelSpec.slab_halo + the
        # kernels' halo arg, halo-parity tested) for denser workloads
        # where window compute dominates again.
        slab_cell = max(r, world_extent / 256.0)
        slab_halo = int(np.ceil(r / slab_cell - 1e-9))
        slab_grid = int(np.ceil(world_extent / slab_cell))
        return LevelSpec(
            r, cell_cap, per_center_cap, grid_xz=grid,
            slab_cell=slab_cell, slab_grid=slab_grid,
            slab_halo=slab_halo,
            approx_topk=approx_topk,
        )

    return DeviceGraphSpec(
        num_points=num_points,
        num_keypoints=num_keypoints,
        voxel_size=float(voxel),
        level0=level(0, cell_caps[0], per_center_caps[0]),
        level1=level(1, cell_caps[1], per_center_caps[1]),
    )


def _cell_keys(xyz, mask, cell_size, origin):
    """Pack per-point integer cell coordinates into one int32 key.
    Invalid points get the maximal key so they sort to the end."""
    ijk = jnp.floor((xyz - origin) / cell_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.array([_DX - 1, _DY - 1, _DZ - 1]))
    key = ijk[:, 0] + _DX * (ijk[:, 1] + _DY * ijk[:, 2])
    big = _DX * _DY * _DZ
    return jnp.where(mask, key, big)


def _voxel_origin(xyz, mask, voxel_size, key=None):
    """Voxel-grid origin: the masked point minimum, shifted by a random
    sub-voxel offset when ``key`` is given (add_rnd3d semantics).  The
    ONE derivation shared by voxel_select and the overflow counters so
    occupancy accounting sees the same grid the selection used."""
    origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0)
    if key is not None:
        kshift, _ = jax.random.split(key)
        origin = origin - jax.random.uniform(kshift, (3,)) * voxel_size
    return origin


def voxel_select(xyz, mask, voxel_size, num_keypoints, key=None):
    """One representative point index per occupied voxel.

    Returns ``(indices [K] into xyz, kp_mask [K])``; the first
    ``num_keypoints`` voxels in key order are kept (capacity cap).

    ``key`` (a PRNG key) enables the reference's train-time graph
    stochasticity on device: a random sub-voxel shift of the grid
    origin (``add_rnd3d``, graph_gen.py:20-26) and a uniformly random
    representative point per voxel (graph_gen.py:134-150).  Without it
    the selection is deterministic (lowest-index point, grid anchored
    at the point-cloud minimum) — the inference path.  Training MUST
    randomize: a model fit to one frozen keypoint set collapses under
    any other graph construction (docs/PERF_NOTES.md, train/test
    neighbor-cap mismatch).
    """
    p = xyz.shape[0]
    origin = _voxel_origin(xyz, mask, voxel_size, key)
    keys = _cell_keys(xyz, mask, voxel_size, origin)
    if key is not None:
        _, kperm = jax.random.split(key)
        # stable argsort of randomly permuted keys -> the first point
        # of each voxel group in permuted order = uniform random choice
        perm = jax.random.permutation(kperm, p)
        order = perm[jnp.argsort(keys[perm])]
    else:
        order = jnp.argsort(keys)  # stable: lowest index first within voxel
    sorted_keys = keys[order]
    big = _DX * _DY * _DZ
    first = jnp.ones(p, dtype=bool)
    first = first.at[1:].set(sorted_keys[1:] != sorted_keys[:-1])
    first = first & (sorted_keys < big)
    (slots,) = jnp.nonzero(first, size=num_keypoints, fill_value=p)
    kp_mask = slots < p
    indices = order[jnp.minimum(slots, p - 1)]
    return jnp.where(kp_mask, indices, 0), kp_mask


def radius_edges(
    src_xyz, src_mask, ctr_xyz, ctr_mask, level: LevelSpec,
    return_counts=False,
):
    """Fixed-radius neighbors, grouped by center with sentinel padding.

    Returns ``(edges_src [K*S], edges_dst [K*S])`` in the SRC-sentinel
    layout: ``dst`` is always the owning center (globally sorted) and
    padded slots carry ``src == num_sources``.

    TPU-tuned structure (see the module docstring): sources are
    scattered into a dense 2D (x, z) grid of ``cell_cap``-slot cell
    tables (column cells — the camera-frame y extent is a few meters, so
    the distance test prunes the column cheaply); each center row-gathers
    its 3x3 neighboring cell tables (128-lane-friendly contiguous rows,
    ~13GB/s vs ~0.4GB/s for random scalar gathers), distance-tests the
    candidates, and compacts to ``per_center_cap`` neighbors with one
    ``top_k`` per row.
    """
    n = src_xyz.shape[0]
    k = ctr_xyz.shape[0]
    r, m, s = level.radius, level.cell_cap, level.per_center_cap
    g = level.grid_xz
    num_cells = g * g
    origin = jnp.min(jnp.where(src_mask[:, None], src_xyz, jnp.inf), axis=0)

    # 2D cell ids (x, z); invalid sources -> one-past cell
    def cell_xz(xyz):
        cx = jnp.floor((xyz[:, 0] - origin[0]) / r).astype(jnp.int32)
        cz = jnp.floor((xyz[:, 2] - origin[2]) / r).astype(jnp.int32)
        return jnp.clip(cx, 0, g - 1), jnp.clip(cz, 0, g - 1)

    sx, sz = cell_xz(src_xyz)
    src_cell = jnp.where(src_mask, sx * g + sz, num_cells)

    # within-cell rank from one sort of the (small) source array
    order = jnp.argsort(src_cell)
    sorted_cell = src_cell[order]
    first_of_group = jnp.ones(n, dtype=bool)
    first_of_group = first_of_group.at[1:].set(
        sorted_cell[1:] != sorted_cell[:-1]
    )
    group_start = jnp.where(first_of_group, jnp.arange(n), 0)
    group_start = jax.lax.associative_scan(jnp.maximum, group_start)
    rank = jnp.arange(n) - group_start  # rank within cell, sorted order

    # dense cell tables [num_cells * m] built by one small scatter
    table_slot = jnp.where(
        (sorted_cell < num_cells) & (rank < m),
        sorted_cell * m + rank,
        num_cells * m,  # overflow/invalid -> dropped slot
    )

    def to_table(vals, fill):
        t = jnp.full((num_cells * m + 1,), fill, vals.dtype)
        return t.at[table_slot].set(vals)[:-1].reshape(num_cells, m)

    tbl_x = to_table(src_xyz[order, 0], jnp.inf)
    tbl_y = to_table(src_xyz[order, 1], jnp.inf)
    tbl_z = to_table(src_xyz[order, 2], jnp.inf)
    tbl_i = to_table(order.astype(jnp.int32), 0)

    # 3x3 neighbor cells per center -> row-gather the tables
    cxc, czc = cell_xz(ctr_xyz)
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)  # [9, 2]
    ncx = cxc[:, None] + offs[None, :, 0]
    ncz = czc[:, None] + offs[None, :, 1]
    in_grid = (ncx >= 0) & (ncx < g) & (ncz >= 0) & (ncz < g)
    nc = jnp.where(
        in_grid, jnp.clip(ncx, 0, g - 1) * g + jnp.clip(ncz, 0, g - 1), 0
    )  # [K, 9]
    flat = nc.reshape(-1)
    cand_x = tbl_x[flat].reshape(k, 9 * m)
    cand_y = tbl_y[flat].reshape(k, 9 * m)
    cand_z = tbl_z[flat].reshape(k, 9 * m)
    cand_i = tbl_i[flat].reshape(k, 9 * m)

    dx = cand_x - ctr_xyz[:, 0:1]
    dy = cand_y - ctr_xyz[:, 1:2]
    dz = cand_z - ctr_xyz[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz  # inf-filled slots fail the test
    ok = (
        (d2 <= r * r)
        & ctr_mask[:, None]
        & jnp.repeat(in_grid, m, axis=1)
    )

    # compact to the first s hits per center: top_k on a slot-ranked key
    width = 9 * m
    key = jnp.where(ok, width - jnp.arange(width, dtype=jnp.int32), 0)
    if level.approx_topk:
        topv, topi = jax.lax.approx_max_k(
            key.astype(jnp.float32), s,
            recall_target=level.approx_recall,
        )
    else:
        topv, topi = jax.lax.top_k(key, s)  # [K, s]
    slot_valid = topv > 0
    picked = jnp.take_along_axis(cand_i, topi, axis=1)
    # SRC-sentinel convention: dst is always the center (so the edge
    # list is globally dst-sorted — segment reductions may legally use
    # indices_are_sorted=True); invalid slots carry src == n and the
    # consumer masks their contribution to -inf before aggregating.
    # (A dst-sentinel here would interleave sentinels between center
    # blocks, and falsely promising sortedness silently corrupts TPU
    # segment ops at some shapes — see docs/PERF_NOTES.md.)
    edges_src = jnp.where(slot_valid, picked, n).reshape(-1)
    edges_dst = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[:, None], (k, s)
    ).reshape(-1).astype(jnp.int32)
    if return_counts:
        in_radius = ok.sum(axis=1)
        counts = {
            # centers whose true neighborhood exceeded the per-center
            # cap (their neighbor subset is truncated)
            "saturated_centers": jnp.sum(in_radius > s).astype(jnp.int32),
            # valid sources dropped from overfull grid cells (they can
            # never appear as a neighbor of ANY center)
            "cell_overflow_sources": jnp.sum(
                (sorted_cell < num_cells) & (rank >= m)
            ).astype(jnp.int32),
        }
        return edges_src, edges_dst, counts
    return edges_src, edges_dst


def slab_grid_of(level: LevelSpec):
    """(cell_size, grid) of the level's slab grid; cell >= radius so a
    3x3 cell neighborhood covers any radius ball."""
    cell = level.slab_cell or level.radius
    grid = level.slab_grid or level.grid_xz
    return cell, grid


def slab_kernel_wiring(level: LevelSpec) -> dict:
    """The model-side slab kwargs for one level — the ONE derivation of
    {grid_g, radius, halo} shared by training/eval
    (train.device_pipeline.resolve_device_setup) and serving
    (infer.InferencePipeline), so the kernel always walks the same grid
    the graph builder wrote."""
    return {
        "grid_g": slab_grid_of(level)[1],
        "radius": level.radius,
        "halo": level.slab_halo,
        # default for BOTH serving and training: per-(block, column)
        # candidate windows are precomputed on the VPU
        # (pallas_kernels.column_row_windows) instead of the kernels'
        # per-column scalar zscan — outputs and gradients bitwise
        # identical (tested), measured -4.3% (car_T3) / -5.0%
        # (ped_cyl) stream latency and -4.3% train step
        # (docs/PERF_NOTES.md round 5).
        "zscan": "precomp",
    }


def grid_cells(xyz, mask, level: LevelSpec, origin=None):
    """Slab-grid cell id per row (pad rows get ``g*g``).
    Returns ``(cell [N] int32, origin [3])``."""
    r, g = slab_grid_of(level)
    if origin is None:
        origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0)
    cx = jnp.clip(
        jnp.floor((xyz[:, 0] - origin[0]) / r).astype(jnp.int32),
        0, g - 1,
    )
    cz = jnp.clip(
        jnp.floor((xyz[:, 2] - origin[2]) / r).astype(jnp.int32),
        0, g - 1,
    )
    return jnp.where(mask, cx * g + cz, g * g).astype(jnp.int32), origin


def _cell_offsets(sorted_cell, num_cells):
    """``searchsorted(sorted_cell, arange(num_cells + 1))`` without the
    binary search: scatter each cell's first row index into the table
    (unique indices — one per distinct cell), then back-fill empty
    cells with a reverse cummin.  The while-loop binary search costs
    ~6ms on v5e at 65537 queries x 24K keys; this runs in ~0.4ms."""
    n = sorted_cell.shape[0]
    first = jnp.ones((n,), bool).at[1:].set(
        sorted_cell[1:] != sorted_cell[:-1]
    )
    # non-first rows scatter OUT OF BOUNDS (num_cells + 2) so
    # mode="drop" discards them entirely — the surviving indices are
    # genuinely one-per-distinct-cell, which is what makes
    # unique_indices=True a valid promise (an in-bounds shared dump
    # slot would be undefined behavior under that flag)
    idx = jnp.where(first, sorted_cell, num_cells + 2)
    tbl = (
        jnp.full((num_cells + 2,), -1, jnp.int32)
        .at[idx]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop",
             unique_indices=True)[: num_cells + 1]
    )
    filled = jnp.where(tbl >= 0, tbl, n)
    return jax.lax.cummin(filled[::-1])[::-1].astype(jnp.int32)


def slab_metadata(kp_xyz, kp_mask, level: LevelSpec, secondary=None):
    """Cell-sort order + per-cell row offsets for slab-mode level 1.

    Returns ``(order [K], sorted_cell [K], offsets [g*g+1])`` where
    ``order`` permutes keypoints into cell-major order (padding rows,
    cell == g*g, sort last) and ``offsets[c]:offsets[c+1]`` is cell
    ``c``'s row range in that order.  ``secondary`` (an int32 key, e.g.
    the level-0 fine cell) orders rows *within* each cell — the
    level-0 slab kernel's column windows stay tight when center blocks
    are fine-cell-local.
    """
    cell, _ = grid_cells(kp_xyz, kp_mask, level)
    if secondary is None:
        order = jnp.argsort(cell)  # stable
    else:
        o1 = jnp.argsort(secondary)  # stable fine sort...
        order = o1[jnp.argsort(cell[o1], stable=True)]  # ...then coarse
    sorted_cell = cell[order]
    offsets = _cell_offsets(sorted_cell, slab_grid_of(level)[1] ** 2)
    return order, sorted_cell, offsets


def inverse_permutation(order):
    n = order.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )


def build_padded_graph(
    points_xyz,            # [P, 3] float32
    features,              # [P, C] float32
    points_mask,           # [P] bool/float
    spec: DeviceGraphSpec,
    return_counters=False,
    rnd_key=None,
) -> PaddedGraph:
    """Full two-level graph as one device computation.

    With ``return_counters=True``, also returns a dict of int32 scalars
    quantifying capacity truncation (keypoints lost to the voxel cap,
    per-level edge-cap saturation, grid-cell overflow) — the padded
    design's counterpart to the reference's never-drops ragged feed
    (train.py:184-222).  Used by diagnostics/tests; the serving hot path
    keeps the counter-free program (same compiled signature as before).

    ``rnd_key`` randomizes the keypoint selection (see
    :func:`voxel_select`) — required for training so the model never
    sees one frozen graph per frame.
    """
    counters = {}
    points_mask = points_mask.astype(bool)
    kp_idx, kp_mask = voxel_select(
        points_xyz, points_mask, spec.voxel_size, spec.num_keypoints,
        key=rnd_key,
    )
    if return_counters:
        # occupied voxels beyond the keypoint capacity (recompute the
        # first-of-voxel count; cheap next to the sorts that follow).
        # _voxel_origin(rnd_key) reproduces the SAME (possibly
        # randomly shifted) grid the selection above used — an
        # unshifted recount can disagree with what was actually kept
        keys = _cell_keys(
            points_xyz, points_mask, spec.voxel_size,
            _voxel_origin(
                points_xyz, points_mask, spec.voxel_size, rnd_key
            ),
        )
        sk = jnp.sort(keys)
        big = _DX * _DY * _DZ
        first = jnp.ones(points_xyz.shape[0], dtype=bool)
        first = first.at[1:].set(sk[1:] != sk[:-1])
        occupied = jnp.sum(first & (sk < big)).astype(jnp.int32)
        counters["voxels_occupied"] = occupied
        counters["keypoints_dropped"] = jnp.maximum(
            occupied - spec.num_keypoints, 0
        )
    kp_xyz = jnp.where(kp_mask[:, None], points_xyz[kp_idx], 0.0)
    slab_offsets = slab_center_cell = None
    slab0_offsets = slab0_center_cell = None
    kp_fine = None
    if spec.slab_level0:
        # sort raw points into level-0 cell-major order so the level-0
        # slab kernel can DMA contiguous per-cell candidate ranges;
        # kp_idx is remapped through the inverse permutation
        p_cell, p_origin = grid_cells(points_xyz, points_mask, spec.level0)
        p_order = jnp.argsort(p_cell)
        points_xyz = points_xyz[p_order]
        features = features[p_order]
        points_mask = points_mask[p_order]
        slab0_offsets = _cell_offsets(
            p_cell[p_order], slab_grid_of(spec.level0)[1] ** 2
        )
        kp_idx = inverse_permutation(p_order)[kp_idx]
        # keypoint (= center) cells on the POINT grid, same origin
        kp_fine, _ = grid_cells(kp_xyz, kp_mask, spec.level0, p_origin)
    if spec.slab_level1:
        # re-order keypoints into level-1 cell-major order (level-0
        # fine cell minor, keeping level-0 center blocks local) so the
        # slab kernel can DMA contiguous per-cell row ranges; all
        # downstream per-vertex arrays simply follow this order
        order, slab_center_cell, slab_offsets = slab_metadata(
            kp_xyz, kp_mask, spec.level1, secondary=kp_fine
        )
        kp_idx = kp_idx[order]
        kp_mask = kp_mask[order]
        kp_xyz = kp_xyz[order]
        if kp_fine is not None:
            slab0_center_cell = kp_fine[order]
    elif kp_fine is not None:
        slab0_center_cell = kp_fine
    if spec.slab_level0:
        # slab search is exact/uncapped: nothing to saturate
        e0_src = jnp.zeros((1,), jnp.int32)
        e0_dst = jnp.zeros((1,), jnp.int32)
    elif return_counters:
        e0_src, e0_dst, c0 = radius_edges(
            points_xyz, points_mask, kp_xyz, kp_mask, spec.level0,
            return_counts=True,
        )
        counters["l0_saturated_centers"] = c0["saturated_centers"]
        counters["l0_cell_overflow_sources"] = c0["cell_overflow_sources"]
    else:
        e0_src, e0_dst = radius_edges(
            points_xyz, points_mask, kp_xyz, kp_mask, spec.level0
        )
    if spec.slab_level1:
        e1_src = jnp.zeros((1,), jnp.int32)
        e1_dst = jnp.zeros((1,), jnp.int32)
    elif return_counters:
        e1_src, e1_dst, c1 = radius_edges(
            kp_xyz, kp_mask, kp_xyz, kp_mask, spec.level1,
            return_counts=True,
        )
        counters["l1_saturated_centers"] = c1["saturated_centers"]
        counters["l1_cell_overflow_sources"] = c1["cell_overflow_sources"]
    else:
        e1_src, e1_dst = radius_edges(
            kp_xyz, kp_mask, kp_xyz, kp_mask, spec.level1
        )
    k = spec.num_keypoints
    maskf = points_mask.astype(jnp.float32)
    kp_maskf = kp_mask.astype(jnp.float32)
    graph = PaddedGraph(
        features=features * maskf[:, None],
        vertex_xyz=(
            points_xyz * maskf[:, None],
            kp_xyz,
            kp_xyz,
        ),
        vertex_mask=(maskf, kp_maskf, kp_maskf),
        keypoint_indices=(
            kp_idx.astype(jnp.int32),
            jnp.arange(k, dtype=jnp.int32),
        ),
        edges_src=(e0_src, e1_src),
        edges_dst=(e0_dst, e1_dst),
        cls_labels=jnp.zeros((k,), jnp.int32),
        encoded_boxes=jnp.zeros((k, 7), jnp.float32),
        valid_boxes=jnp.zeros((k,), jnp.float32),
        slab_offsets=slab_offsets,
        slab_center_cell=slab_center_cell,
        slab0_offsets=slab0_offsets,
        slab0_center_cell=slab0_center_cell,
    )
    if return_counters:
        return graph, counters
    return graph


def _warn_point_drop(n_in, num_points):
    if n_in > num_points:
        # deferred to the consuming thread when called from the
        # trainer's prefetch worker (utils/thread_warnings)
        from pointgnn_tpu.utils import thread_warnings

        thread_warnings.warn(
            "point overflow: frame has %d points > device capacity %d; "
            "dropping %d (far-field detections may be lost — raise "
            "num_points in the DeviceGraphSpec)"
            % (n_in, num_points, n_in - num_points),
            RuntimeWarning,
            stacklevel=3,
        )


def host_overflow_stats(xyz: np.ndarray, spec: "DeviceGraphSpec"):
    """Host-side overflow accounting for one frame (no device work).

    The device program silently clips to its static capacities (the
    reference feeds ragged arrays and never drops, train.py:184-222), so
    the serving path surfaces the loss here: points beyond
    ``spec.num_points`` and occupied voxels beyond ``spec.num_keypoints``
    (the voxel_select cap).  Edge-cap saturation is a device-side
    quantity — see ``build_padded_graph(return_counters=True)``.
    """
    n = len(xyz)
    kept = np.asarray(xyz[: spec.num_points], np.float32)
    if len(kept):
        # SAME packing as the device _cell_keys (dims + border clip):
        # frames wider than the device grid collapse extra voxels into
        # border cells on device, and the host count must agree or the
        # keypoint-loss warning mis-reports
        ijk = np.floor(
            (kept - kept.min(axis=0)) / spec.voxel_size
        ).astype(np.int64)
        ijk = np.clip(ijk, 0, np.array([_DX - 1, _DY - 1, _DZ - 1]))
        occupied = len(
            np.unique(ijk[:, 0] + _DX * (ijk[:, 1] + _DY * ijk[:, 2]))
        )
    else:
        occupied = 0
    return {
        "points": n,
        "points_dropped": max(0, n - spec.num_points),
        "voxels_occupied": occupied,
        "keypoints_dropped": max(0, occupied - spec.num_keypoints),
    }


def pad_points(xyz: np.ndarray, attr: np.ndarray, num_points: int):
    """Host-side: pad raw points to the spec capacity (the only
    per-frame host->device payload).  Warns when points are dropped."""
    _warn_point_drop(len(xyz), num_points)
    n = min(len(xyz), num_points)
    out_xyz = np.zeros((num_points, 3), np.float32)
    out_attr = np.zeros((num_points, attr.shape[1]), np.float32)
    mask = np.zeros((num_points,), np.float32)
    out_xyz[:n] = xyz[:n]
    out_attr[:n] = attr[:n]
    mask[:n] = 1.0
    return out_xyz, out_attr, mask


# Padding sentinel for the packed single-array payload: any coordinate
# >= PACK_SENTINEL/10 marks a pad row.  On the tunneled TPU backend each
# host->device put pays ~33ms of flat latency regardless of size
# (docs/PERF_NOTES.md), so one packed put beats three small ones.
PACK_SENTINEL = 1e6


def pack_points(xyz: np.ndarray, attr: np.ndarray, num_points: int):
    """Host-side: one [num_points, 3 + C] f32 payload; pad rows carry
    sentinel coordinates (no separate mask array, no separate puts).
    Warns when points beyond the capacity are dropped."""
    _warn_point_drop(len(xyz), num_points)
    n = min(len(xyz), num_points)
    out = np.zeros((num_points, 3 + attr.shape[1]), np.float32)
    out[n:, :3] = PACK_SENTINEL
    out[:n, :3] = xyz[:n]
    out[:n, 3:] = attr[:n]
    return out


def unpack_points(packed):
    """Device-side inverse of :func:`pack_points`:
    ``(xyz [P,3], features [P,C], mask [P])`` with zeroed pad rows."""
    mask = (packed[:, 0] < PACK_SENTINEL / 10).astype(jnp.float32)
    xyz = jnp.where(mask[:, None] > 0, packed[:, :3], 0.0)
    feats = packed[:, 3:] * mask[:, None]
    return xyz, feats, mask
