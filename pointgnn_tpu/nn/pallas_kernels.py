"""Pallas TPU kernels for the GNN hot loop.

``fused_edge_max`` implements the per-layer edge computation of
GraphNetAutoCenter over the device-built blocked graph layout:

    out[c] = max over valid slots s of
        act( act(A[src[c, s]] - B[c]) @ W1 + b1 ) ... (chain)

where ``A``/``B`` are the per-vertex tables of the algebraic fold in
:mod:`pointgnn_tpu.nn.layers` (first edge-MLP layer absorbed into two
vertex projections).  The whole A table lives in VMEM (bf16, ~10MB at
K=16K, H=300), so the per-edge gather is an on-chip row copy instead of
an HBM gather; the remaining dense layers run on the MXU per block, and
the per-center max needs no segment scatter because slots are blocked
by center.

Inference-only (no custom VJP); training keeps the XLA path.

Status: numerically verified (interpret + compiled) but NOT the default
path — on TPU v5e, Mosaic lowers the per-row dynamic-slice gather loop
to ~200+ cycles/row, which loses to XLA's native row-gather for this
shape (measured ~1.0s vs ~0.12s per layer at K=16K, S=256, H=300).
Kept as the starting point for a future run-length (per-cell slab) DMA
formulation; indices must be SMEM-resident and tables f32 (bf16 rows
violate the (16, 128) sublane tile for single-row dynamic slices).
"""

import functools
from typing import Sequence, Tuple

__all__ = ["fused_edge_max", "edge_tail_max"]

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30

# v5e sweep optimum at realistic KITTI density (docs/PERF_NOTES.md
# "Realistic-density re-sweep"); shared with bench.py's host-side walk
# accounting so the published overfetch numbers track what the kernels
# actually execute.
SLAB_DEFAULT_BLOCK_CENTERS = 32
SLAB_DEFAULT_TILE = 32
# Sub-block MLP skip: the [bk, tile] distance mask is computed before
# the edge MLP anyway, so the MLP can run per ``sub``-center sub-block
# and skip sub-blocks with no in-radius pair — same DMA walk, bitwise
# outputs, ~2x fewer L0 pairs computed at KITTI density (counterfactual
# sweep in utils/flops.slab_walk_pairs_subblock).  MEASURED OFF on
# v5e: the per-sub-block scalar branch breaks Mosaic's tile-loop
# pipelining and loses more than the skipped MXU work saves — car_T3
# serving 38-41ms (sub=0) vs 46-48 (sub=8) vs 59-60 (sub=4) in both
# the lax.cond-carry and pl.when-on-scratch formulations; train step
# neutral (docs/PERF_NOTES.md round 4).  The knob stays for far
# sparser workloads; 0 disables (one unconditional block MLP).
SLAB_DEFAULT_SUB = 0


def _kernel(*refs, num_weights: int, num_slots: int,
            block_centers: int, apply_act_first: bool):
    """One program handles ``block_centers`` centers x ``num_slots``.

    Ref order: inputs (edges, valid, table_a, table_b, *weights),
    then the output, then the scratch buffer."""
    edges_ref, valid_ref, table_a_ref, table_b_ref = refs[:4]
    weight_refs = refs[4:4 + num_weights]
    out_ref = refs[4 + num_weights]
    hidden_ref = refs[5 + num_weights]
    bk, s = block_centers, num_slots

    def gather_body(j, _):
        c = j // s
        idx = edges_ref[c, j % s]
        hidden_ref[pl.ds(j, 1), :] = (
            table_a_ref[pl.ds(idx, 1), :] - table_b_ref[pl.ds(c, 1), :]
        )
        return 0

    jax.lax.fori_loop(0, bk * s, gather_body, 0)

    h = hidden_ref[:]
    if apply_act_first:
        h = jnp.maximum(h, 0.0)
    # remaining dense layers (weights prepacked as [H_in, H_out] + [1, H])
    for wi in range(0, len(weight_refs), 2):
        w = weight_refs[wi][:]
        b = weight_refs[wi + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b, 0.0).astype(hidden_ref.dtype)
    # masked max over each center's slot block
    hh = h.reshape(bk, s, h.shape[-1]).astype(jnp.float32)
    mask = valid_ref[:].reshape(bk, s, 1)
    hh = jnp.where(mask > 0, hh, NEG)
    agg = jnp.max(hh, axis=1)
    out_ref[:] = jnp.where(agg > NEG / 2, agg, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("block_centers", "apply_act_first", "interpret"),
)
def fused_edge_max(
    table_a,            # [K, H] (bf16 recommended)
    table_b,            # [K, H]
    edges_src,          # [K, S] int32, blocked by center
    slot_valid,         # [K, S] float32 (1 = real edge)
    weights: Tuple,     # flat (w1, b1, w2, b2, ...) for remaining layers
    block_centers: int = 8,
    apply_act_first: bool = True,
    interpret: bool = False,
):
    """Returns [K, H_out] float32 per-center max-aggregated features."""
    k, h = table_a.shape
    s = edges_src.shape[1]
    assert k % block_centers == 0
    h_out = weights[-2].shape[1] if weights else h
    weight_args = []
    for i, wb in enumerate(weights):
        if i % 2 == 1:
            wb = wb.reshape(1, -1)
        weight_args.append(jnp.asarray(wb))

    grid = (k // block_centers,)
    in_specs = [
        # gather indices must be readable as scalars -> SMEM
        pl.BlockSpec(
            (block_centers, s), lambda i: (i, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec((block_centers, s), lambda i: (i, 0)),        # valid
        pl.BlockSpec(memory_space=pltpu.VMEM),                     # table_a
        pl.BlockSpec((block_centers, h), lambda i: (i, 0)),        # table_b
    ]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args
    ]
    kernel = functools.partial(
        _kernel,
        num_weights=len(weight_args),
        num_slots=s,
        block_centers=block_centers,
        apply_act_first=apply_act_first,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_centers, h_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((k, h_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_centers * s, h), table_a.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(edges_src, slot_valid, table_a, table_b, *weight_args)


# ---------------------------------------------------------------------------
# edge_tail_max: the production inference kernel.
#
# ``fused_edge_max`` above loses because Mosaic's per-row dynamic-slice
# gather runs ~200+ cycles/row.  XLA's native row gather, by contrast,
# moves [E, 300] rows at ~100GB/s on v5e (docs/PERF_NOTES.md).  So the
# winning split is: let XLA do the ONE gather (A[src] -> G), and fuse
# everything after it — subtract the per-center table-B row, ReLU, the
# remaining dense edge-MLP layers, and the masked per-center max — into
# one VMEM-resident kernel.  That removes the three extra [E, H] HBM
# round-trips (gather-out re-read, hidden write+read, max re-read) that
# make each GNN layer ~75ms on the pure-XLA path; only G is ever
# materialized.
#
# Layout contract (the device-built blocked graph, graph/device_builder):
# edge slot (c, s) holds source row ``edges_src[c, s]`` with dst == c;
# ``G = table_a[min(src, K-1)]`` reshaped [K*S, H]; ``valid[c, s] = 1``
# for real edges.  Invalid slots carry clamped-garbage rows that are
# masked to -inf just before the max, exactly like the XLA path.
# ---------------------------------------------------------------------------


def _tail_kernel(*refs, num_weights: int, num_slots: int,
                 block_centers: int, apply_act_first: bool):
    """One program: ``block_centers`` centers x ``num_slots`` slots.

    Ref order: (gathered, valid, table_b, *weights), output."""
    g_ref, valid_ref, b_ref = refs[:3]
    weight_refs = refs[3:3 + num_weights]
    out_ref = refs[3 + num_weights]
    bk, s = block_centers, num_slots
    hd = g_ref.shape[-1]

    # per-center B row repeated over the center's slot rows (2D ops
    # only: Mosaic rejects the [bk, 1, hd] broadcast shape cast)
    b = b_ref[:]
    b_rows = jnp.concatenate(
        [jnp.broadcast_to(b[c:c + 1, :], (s, hd)) for c in range(bk)],
        axis=0,
    )
    x = g_ref[:] - b_rows
    if apply_act_first:
        x = jnp.maximum(x, 0.0)
    # remaining dense edge-MLP layers (all activated, gnn.py:86-104)
    for wi in range(0, num_weights, 2):
        w = weight_refs[wi][:]
        b = weight_refs[wi + 1][:]
        x = jnp.dot(x, w, preferred_element_type=jnp.float32)
        x = jnp.maximum(x + b, 0.0).astype(g_ref.dtype)
    hh = x.reshape(bk, s, x.shape[-1]).astype(jnp.float32)
    hh = jnp.where(valid_ref[:].reshape(bk, s, 1) > 0, hh, NEG)
    agg = jnp.max(hh, axis=1)
    out_ref[:] = jnp.where(agg > NEG / 2, agg, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("block_centers", "apply_act_first", "interpret"),
)
def edge_tail_max(
    gathered,           # [K*S, H] = table_a[clamped src] (compute dtype)
    table_b,            # [K, H]
    slot_valid,         # [K, S] float32 (1 = real edge)
    weights: Tuple,     # flat (w1, b1, w2, b2, ...) remaining layers
    block_centers: int = 8,
    apply_act_first: bool = True,
    interpret: bool = False,
):
    """act(gathered - B[dst]) -> dense chain -> masked max over slots.

    Returns [K, H_out] float32 per-center aggregated features."""
    k, h = table_b.shape
    s = gathered.shape[0] // k
    assert gathered.shape[0] == k * s
    while k % block_centers != 0:
        block_centers //= 2
    h_out = weights[-2].shape[1] if weights else h
    weight_args = []
    for i, wb in enumerate(weights):
        if i % 2 == 1:
            wb = wb.reshape(1, -1)
        weight_args.append(jnp.asarray(wb))

    grid = (k // block_centers,)
    in_specs = [
        pl.BlockSpec((block_centers * s, h), lambda i: (i, 0)),  # gathered
        pl.BlockSpec((block_centers, s), lambda i: (i, 0)),      # valid
        pl.BlockSpec((block_centers, h), lambda i: (i, 0)),      # table_b
    ]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args
    ]
    kernel = functools.partial(
        _tail_kernel,
        num_weights=len(weight_args),
        num_slots=s,
        block_centers=block_centers,
        apply_act_first=apply_act_first,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_centers, h_out), lambda i: (i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((k, h_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gathered, slot_valid, table_b, *weight_args)


# ---------------------------------------------------------------------------
# slab_edge_max: fused radius search + edge MLP + max aggregation.
#
# Eliminates the level-1 edge list entirely.  Vertices arrive sorted by
# their radius-grid cell (cell = x*g + z over a 2D (x, z) grid of
# ``radius``-sized cells); ``offsets[c]`` gives each cell's row range in
# that order.  One program handles ``bk`` consecutive centers: it walks
# the 3-column candidate window around the block's cells, DMAs aligned
# ``tile``-row slabs of the (HBM-resident) A table, distance-tests every
# candidate against every center exactly (d^2 = |s|^2 - 2 s.c + |c|^2 on
# the MXU), applies the edge MLP, and max-accumulates per center.
#
# Correctness leans on two properties of max aggregation:
# - any SUPERSET of the in-radius candidates is fine (the exact distance
#   test rejects the rest), so aligned-tile overfetch needs no masking;
# - max is idempotent, so a candidate visited by two column windows
#   contributes once.
# Invalid rows (padding) carry sentinel coordinates (1e6) and fail the
# distance test; there are no validity lanes at all.
#
# Semantics: the UNCAPPED radius graph — exactly the reference's runtime
# graph (graph_gen.py:210-214 with num_neighbors=-1), which the edge-list
# path can only approximate with its per-center cap.
# ---------------------------------------------------------------------------


def _slab_kernel(offsets_ref, ccell_ref, table_b_ref, ctr_xyz_ref,
                 *rest, num_weights: int, bk: int, tile: int, h: int,
                 h_pad: int, grid_g: int, radius: float, halo: int = 1,
                 compute_dtype: str = "bfloat16",
                 clamp_out: bool = True, sub: int = 0,
                 zscan: str = "col"):
    cdt = jnp.dtype(compute_dtype)
    weight_refs = rest[:num_weights]
    table_a_ref = rest[num_weights]   # fused [P+tile, h_pad]: features
    #                                   in lanes [:h], xyz in [h:h+3]
    # zscan="precomp": per-(block, column) candidate row windows
    # arrive precomputed (XLA-side column_row_windows) as two extra
    # SMEM inputs, replacing the in-kernel per-column bk-scan
    extra = 2 if zscan == "precomp" else 0
    if extra:
        win_lo_ref, win_hi_ref = rest[num_weights + 1:num_weights + 3]
    out_ref = rest[num_weights + 1 + extra]
    # scratch: double-buffered (2, tile, h_pad) DMA tiles, the [bk,
    # h_out] max accumulator (VMEM-resident so the sub-block skip can
    # update it in place under pl.when — a lax.cond carry would copy
    # the accumulator through every miss), DMA semaphores
    a_tiles, acc_buf, sems = rest[num_weights + 2 + extra:]
    ncells = grid_g * grid_g
    i = pl.program_id(0)
    row = i % 8  # cells arrive as (8, bk) SMEM blocks (sublane rule)
    r2 = radius * radius

    # min/max over the block's VALID cells — center cells need not be
    # sorted within a block (the level-0 hierarchical order resets the
    # fine cell at every coarse-cell boundary)
    def minmax_body(j, carry):
        cm, cM = carry
        c = ccell_ref[row, j]
        valid = c < ncells
        return (
            jnp.where(valid, jnp.minimum(cm, c), cm),
            jnp.where(valid, jnp.maximum(cM, c), cM),
        )

    cmin, cmax = jax.lax.fori_loop(
        0, bk, minmax_body, (jnp.int32(2 ** 30), jnp.int32(-1))
    )

    # per-program precompute: B rows repeated over each center's slots
    # (hoisted — one [bk*tile, h] build per program, not per tile), and
    # the unit-row matrix that extracts candidate coordinates from the
    # fused tile
    b = table_b_ref[:]
    b_rows = jnp.concatenate(
        [jnp.broadcast_to(b[c:c + 1, :], (tile, h)) for c in range(bk)],
        axis=0,
    ).astype(cdt)
    ctr3 = ctr_xyz_ref[:][:, :3]
    lane_hp = jax.lax.broadcasted_iota(jnp.int32, (8, h_pad), 1)
    sub_hp = jax.lax.broadcasted_iota(jnp.int32, (8, h_pad), 0)
    unit3 = (lane_hp == (h + sub_hp)).astype(jnp.float32)

    n_sub = (bk // sub) if sub else 1
    sub_rows = bk // n_sub  # == sub when enabled, bk when disabled
    h_out = weight_refs[-2].shape[1] if num_weights else h
    # per-program init: the scratch accumulator persists across grid
    # programs on TPU, so every program must reset its block
    acc_buf[:] = jnp.full((bk, h_out), NEG, jnp.float32)

    def _mlp_agg(a_rep, b_sub, mask_sub):
        """Edge-MLP chain + masked max for one ``sub_rows``-center
        sub-block: [sub_rows, h_out].  Row-wise identical to the
        full-block formulation (matmuls are row-independent), so
        outputs are bitwise equal whether or not the block is split."""
        x = jnp.maximum(a_rep - b_sub, 0.0)
        for wi in range(0, num_weights, 2):
            w = weight_refs[wi][:]
            bb = weight_refs[wi + 1][:]
            x = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = jnp.maximum(x + bb, 0.0)
            if wi + 2 < num_weights:
                x = x.astype(cdt)
        x3d = x.astype(jnp.float32).reshape(sub_rows, tile, x.shape[-1])
        maskf = mask_sub.astype(jnp.float32).reshape(sub_rows, tile, 1)
        x3d = jnp.where(maskf > 0, x3d, NEG)
        return jnp.max(x3d, axis=1)

    def tile_compute(a_full):
        # d^2 in [bk, tile] layout, no transposes: candidate coordinate
        # ROWS are extracted from the fused table's xyz lanes with ONE
        # unit-matrix MXU dot (row ax picks lane h+ax; Precision.HIGHEST
        # — the default bf16 matmul precision puts ~0.3% error on
        # coordinates, flipping the radius test near the boundary), then
        # differenced exactly against the center coordinate COLUMNS
        # [bk, 1].  No |s|^2-2sc+|c|^2 cancellation.
        rows = jax.lax.dot_general(
            unit3, a_full, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [8, tile]; rows 0..2 are x, y, z
        d2 = jnp.zeros((bk, tile), jnp.float32)
        for ax in range(3):
            diff = rows[ax:ax + 1, :] - ctr3[:, ax:ax + 1]
            d2 = d2 + diff * diff
        mask = d2 <= r2  # sentinel coords (1e6) and padding auto-fail

        # pltpu.repeat is Mosaic's native whole-array repeat — the
        # jnp.concatenate([a_cd] * bk) it replaces emitted bk separate
        # VMEM copies per tile (~2.5GB of traffic per layer)
        a_cd = a_full[:, :h].astype(cdt)
        a_rep = pltpu.repeat(a_cd, sub_rows, axis=0)  # [sub*tile, h]
        # sub-block MLP skip: the mask above is free information — run
        # the chain only for sub-blocks with at least one in-radius
        # pair (at KITTI density most (sub-block, tile) windows are
        # empty at level 0; utils/flops.slab_walk_pairs_subblock).
        # pl.when on the VMEM accumulator, NOT lax.cond on a loop
        # carry: the cond's miss branch would copy the accumulator
        # through every empty window, which A/B'd slower than no skip
        # at all (docs/PERF_NOTES.md round 4).
        for si in range(n_sub):
            lo_r, hi_r = si * sub_rows, (si + 1) * sub_rows

            def _do(si=si, lo_r=lo_r, hi_r=hi_r):
                agg = _mlp_agg(
                    a_rep,
                    b_rows[lo_r * tile:hi_r * tile],
                    mask[lo_r:hi_r],
                )
                acc_buf[lo_r:hi_r, :] = jnp.maximum(
                    acc_buf[lo_r:hi_r, :], agg
                )

            if n_sub == 1:
                _do()
            else:
                pl.when(jnp.min(d2[lo_r:hi_r]) <= r2)(_do)

    if zscan == "block":
        # hoisted z-window: one bk-scan per PROGRAM over all valid
        # cells (no per-column x-filter) instead of one per column.
        # Superset window -> exact under max aggregation; walked tiles
        # grow where a block's x-columns have distinct z-ranges
        # (measured: +6% L1, +26% L0 at bench density — a net LOSS,
        # kept only as the experiment knob; see PERF_NOTES round 5)
        def blk_zscan(j, zcarry):
            zlo, zhi = zcarry
            cc = ccell_ref[row, j]
            zj = cc % grid_g
            use = cc < ncells
            return (
                jnp.where(use, jnp.minimum(zlo, zj), zlo),
                jnp.where(use, jnp.maximum(zhi, zj), zhi),
            )

        bzlo, bzhi = jax.lax.fori_loop(
            0, bk, blk_zscan, (jnp.int32(grid_g), jnp.int32(-1))
        )

    def col_body(col, carry):
        x0 = jnp.maximum(cmin // grid_g - halo, 0)
        xc = x0 + col

        def col_zscan(j, zcarry):
            zlo, zhi = zcarry
            cc = ccell_ref[row, j]
            xj = cc // grid_g
            zj = cc % grid_g
            use = (cc < ncells) & (jnp.abs(xj - xc) <= halo)
            return (
                jnp.where(use, jnp.minimum(zlo, zj), zlo),
                jnp.where(use, jnp.maximum(zhi, zj), zhi),
            )

        if zscan == "precomp":
            lo = win_lo_ref[row, xc]
            hi = win_hi_ref[row, xc]
        else:
            if zscan == "block":
                zlo, zhi = bzlo, bzhi
            else:
                zlo, zhi = jax.lax.fori_loop(
                    0, bk, col_zscan, (jnp.int32(grid_g), jnp.int32(-1))
                )
            zlo_c = jnp.maximum(zlo - halo, 0)
            zhi_c = jnp.minimum(zhi + halo, grid_g - 1)
            lo = offsets_ref[xc * grid_g + zlo_c]
            hi_raw = offsets_ref[xc * grid_g + zhi_c + 1]
            hi = jnp.where(zhi >= 0, hi_raw, lo)
        base = (lo // tile) * tile
        span = hi - base
        nt = jnp.where(span > 0, (span + tile - 1) // tile, 0)

        def get_dma(slot, t):
            return pltpu.make_async_copy(
                table_a_ref.at[pl.ds(base + t * tile, tile), :],
                a_tiles.at[slot], sems.at[slot],
            )

        @pl.when(nt > 0)
        def _warm():
            get_dma(0, 0).start()

        def t_body(t, tcarry):
            slot = jax.lax.rem(t, 2)
            # prefetch the next tile into the other buffer while this
            # one computes (the grid runs sequentially on the one core;
            # un-hidden DMA waits are pure stall)
            @pl.when(t + 1 < nt)
            def _prefetch():
                get_dma(jax.lax.rem(t + 1, 2), t + 1).start()

            get_dma(slot, t).wait()
            tile_compute(a_tiles[slot])
            return tcarry

        return jax.lax.fori_loop(0, nt, t_body, carry)

    x0 = jnp.maximum(cmin // grid_g - halo, 0)
    x1 = jnp.minimum(cmax // grid_g + halo, grid_g - 1)
    ncols = jnp.where(cmax >= 0, x1 - x0 + 1, 0)
    jax.lax.fori_loop(0, ncols, col_body, jnp.int32(0))
    acc = acc_buf[:]
    if clamp_out:
        out_ref[:] = jnp.where(acc > NEG / 2, acc, 0.0)
    else:
        # raw max (NEG for centers with no in-radius candidate) — the
        # training path saves this as the VJP residual so the backward
        # kernel can detect per-channel winners by exact equality
        out_ref[:] = acc


def column_row_windows(offsets, center_cell, grid_g, bk, halo):
    """XLA-side replica of the kernel's per-(block, column) zscan.

    For every center block and every grid column, the candidate row
    window [lo, hi) the kernel would derive in its bk-long scalar scan
    — computed once per frame on the VPU instead of per column on the
    Mosaic scalar core, and handed to the kernel as two SMEM inputs
    (``zscan="precomp"``).  Bit-exact with the in-kernel derivation
    including the empty-column ``hi == lo`` sentinel collapse.

    Returns ``(win_lo, win_hi)`` int32 [ceil(nb/8)*8, grid_g] (padded
    to the (8, grid_g) SMEM sublane blocking).
    """
    ncells = grid_g * grid_g
    cells = center_cell.reshape(-1, bk)
    valid = cells < ncells
    xs = cells // grid_g
    zs = cells % grid_g
    xc = jnp.arange(grid_g, dtype=jnp.int32)
    use = valid[:, :, None] & (
        jnp.abs(xs[:, :, None] - xc[None, None, :]) <= halo
    )
    zlo = jnp.min(
        jnp.where(use, zs[:, :, None], grid_g), axis=1
    )  # [nb, G]
    zhi = jnp.max(jnp.where(use, zs[:, :, None], -1), axis=1)
    zlo_c = jnp.maximum(zlo - halo, 0)
    zhi_c = jnp.minimum(zhi + halo, grid_g - 1)
    lo = offsets[xc[None, :] * grid_g + zlo_c]
    hi = jnp.where(
        zhi >= 0, offsets[xc[None, :] * grid_g + zhi_c + 1], lo
    )
    pad = (-lo.shape[0]) % 8
    if pad:
        lo = jnp.pad(lo, ((0, pad), (0, 0)))
        hi = jnp.pad(hi, ((0, pad), (0, 0)))
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_g", "radius", "block_centers", "tile", "interpret",
        "compute_dtype", "halo", "sub", "zscan",
    ),
)
def slab_edge_max(
    table_a,        # [P, H] float32 candidate table A (cell-sorted order)
    src_xyz,        # [P, 4] float32, xyz + pad lane; invalid rows +1e6
    table_b,        # [K, H] float32 per-center table B
    ctr_xyz,        # [K, 4] float32 center coords; invalid rows -1e6
    #                 (distinct sentinels so pad-center x pad-source
    #                  pairs cannot pass the distance test)
    offsets,        # [grid_g*grid_g + 1] int32 cell row offsets into P
    center_cell,    # [K] int32 cell id per center (pad = ncells); NOT
    #                 required sorted — any spatially-local blocking
    #                 works (the column window spans [min, max] cells
    #                 per block, and overfetch is distance-filtered)
    weights: Tuple,  # flat (w1, b1, ...) remaining edge-MLP layers
    grid_g: int,
    radius: float,
    block_centers: int = SLAB_DEFAULT_BLOCK_CENTERS,
    tile: int = SLAB_DEFAULT_TILE,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    halo: int = 1,
    sub: int = SLAB_DEFAULT_SUB,
    zscan: str = "col",
):
    """Fused uncapped radius search + edge MLP + per-center max.

    ``halo`` = ceil(radius / cell): the window walk spans +/-halo
    cells.  halo 1 is the classic cell >= radius grid; halo 2 (half
    cells) tightens the window around the radius ball — worth ~12% on
    the wide L1 tables (window MXU compute dominates there).

    Defaults (bk=32, tile=32) are the v5e sweep optimum on the
    realistic-density car workload (P=24K/K=12K, 90m extent): small
    tiles minimize aligned-window overfetch compute, and the
    double-buffered single-DMA tile loop hides the per-tile copy
    latency that used to penalize them (59.1 -> 48.3 ms full program).

    ``sub``: the edge MLP runs per ``sub``-center sub-block, skipped
    when the sub-block's distance mask (computed anyway) has no hit —
    same DMA walk, bitwise-identical outputs, far fewer pairs computed
    at KITTI density (see SLAB_DEFAULT_SUB).  0 disables.

    Candidates (``table_a``/``src_xyz``, P rows in ``offsets``' cell
    order) and centers (``table_b``/``ctr_xyz``, K rows) may be
    different point sets — the GNN layers use the same keypoints for
    both, set pooling pools raw points into keypoints.  Returns
    [K, H_out] float32."""
    return _slab_forward(
        table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
        weights, grid_g, radius, block_centers, tile, interpret,
        compute_dtype, clamp_out=True, halo=halo, sub=sub,
        zscan=zscan,
    )


def _pick_bk(k, block_centers, what):
    bk = block_centers
    while bk and (k % bk != 0 or (k // bk) % 8 != 0):
        bk //= 2
    if bk == 0:
        # with bk == 1 the conditions reduce to k % 8 == 0, so this is
        # exactly the non-multiple-of-8 case (edge_tail_max bottoms out
        # at 1; here the SMEM cell blocks arrive as (8, bk) rows)
        raise ValueError(
            "%s: num centers (%d) must be a multiple of 8 — pad K "
            "before calling" % (what, k)
        )
    return bk


def _cast_weights(weights, compute_dtype):
    weight_args = []
    for idx, wb in enumerate(weights):
        if idx % 2 == 1:
            wb = wb.reshape(1, -1)
        weight_args.append(jnp.asarray(wb, jnp.dtype(compute_dtype)))
    return weight_args


def _slab_prep_fused(table_a, src_xyz, weights, tile, h, compute_dtype):
    """Forward-path prep: pack xyz into table_a's padding lanes so the
    tile loop issues ONE DMA per tile (h=300 pads to 384 lanes anyway,
    so the xyz columns ride for free).  Pad rows/lanes carry the 1e6
    sentinel — pad-row coordinates must fail the distance test, and the
    sentinel lanes are only ever touched by zero-lanes of the coordinate
    unit-row dots (0 * 1e6 == 0)."""
    h_xyz = h + src_xyz.shape[1]
    h_pad = -(-h_xyz // 128) * 128
    fused = jnp.concatenate(
        [table_a, src_xyz.astype(table_a.dtype)], axis=1
    )
    fused = jnp.pad(
        fused, ((0, tile), (0, h_pad - h_xyz)), constant_values=1e6
    )
    return fused, _cast_weights(weights, compute_dtype), h_pad


def _legal_sub(sub, bk):
    """Largest divisor of ``bk`` that is <= ``sub`` (0 stays 0)."""
    if not sub:
        return 0
    sub = min(sub, bk)
    while bk % sub:
        sub -= 1
    return sub


def _slab_forward(
    table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell, weights,
    grid_g, radius, block_centers, tile, interpret, compute_dtype,
    clamp_out, halo=1, sub=SLAB_DEFAULT_SUB, zscan="col",
):
    k, h = table_b.shape[0], table_a.shape[1]
    bk = _pick_bk(k, block_centers, "slab_edge_max")
    sub = _legal_sub(sub, bk)
    h_out = weights[-2].shape[1] if weights else h
    table_fused, weight_args, h_pad = _slab_prep_fused(
        table_a, src_xyz, weights, tile, h, compute_dtype
    )

    grid = (k // bk,)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # offsets
        pl.BlockSpec((8, bk), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),                    # cells
        pl.BlockSpec((bk, h), lambda i: (i, 0)),                  # table_b
        pl.BlockSpec((bk, 4), lambda i: (i, 0)),                  # ctr_xyz
    ]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args
    ]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),                 # fused table
    ]
    extra_ins = []
    if zscan == "precomp":
        win_lo, win_hi = column_row_windows(
            offsets, center_cell, grid_g, bk, halo
        )
        extra_ins = [win_lo, win_hi]
        in_specs += [
            pl.BlockSpec((8, grid_g), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, grid_g), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
        ]
    kernel = functools.partial(
        _slab_kernel,
        num_weights=len(weight_args),
        bk=bk, tile=tile, h=h, h_pad=h_pad,
        grid_g=grid_g, radius=float(radius), halo=halo,
        compute_dtype=compute_dtype,
        clamp_out=clamp_out, sub=sub, zscan=zscan,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bk, h_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((k, h_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile, h_pad), jnp.float32),
            pltpu.VMEM((bk, h_out), jnp.float32),  # max accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offsets, center_cell.reshape(k // bk, bk), table_b, ctr_xyz,
      *weight_args, table_fused, *extra_ins)


# ---------------------------------------------------------------------------
# Training-path slab: custom VJP for slab_edge_max.
#
# The backward kernel re-walks the same cell-column candidate windows as
# the forward (recompute-in-backward: no per-edge activations are ever
# stored), recomputes each tile's edge-MLP chain BIT-IDENTICALLY (same
# operand dtypes, same dot shapes per row), detects per-channel winners
# by exact equality against the saved raw per-center max, and routes the
# output cotangent through the MLP chain:
#
#     d_table_a[j]  += sum over (center k, channel c) winners of
#                      relu-chain backprop of g[k, c]
#     d_table_b[k]  -= (the same flow, summed over the block's rows)
#     d_w, d_b      += standard dense-layer cotangents
#
# Double-count safety: forward tiles may overfetch rows of NEIGHBORING
# cell columns (harmless under max), so the backward masks each tile to
# the current column's exact [lo, hi) row span — every candidate row is
# visited exactly once per center block.  Accumulation into d_table_a
# (shared across center blocks) and d_w (shared across all programs)
# relies on the TPU grid executing sequentially ("arbitrary" dimension
# semantics).
#
# Tie semantics: every candidate matching the channel max receives the
# full cotangent (jnp.max splits it evenly); exact float ties are
# vanishing for real activations, and either convention is a valid
# subgradient.
#
# Coordinates (src_xyz / ctr_xyz) get zero cotangent: they enter the
# kernel only through the radius indicator (graph structure, non-diff —
# the same convention as the edge-list path, where edges are integer
# indices).  The xyz -> table_a/table_b linear terms remain
# differentiable OUTSIDE the kernel (layers.py algebraic fold).
# ---------------------------------------------------------------------------


def _slab_bwd_kernel(offsets_ref, ccell_ref, table_b_ref, ctr_xyz_ref,
                     g_ref, acc_ref, *rest, num_weights: int, bk: int,
                     tile: int, h: int, h_pad: int, grid_g: int,
                     radius: float, compute_dtype: str, halo: int = 1,
                     sub: int = 0, zscan: str = "col"):
    cdt = jnp.dtype(compute_dtype)
    weight_refs = rest[:num_weights]
    table_a_ref = rest[num_weights]   # fused [P+tile, h_pad], xyz in
    #                                   lanes [h:h+3] (forward layout)
    # rest[num_weights + 1] is the aliased d_table_a INPUT placeholder;
    # read/write goes through the aliased OUTPUT ref below.  With
    # zscan="precomp" two window inputs follow it (same arrays the
    # forward kernel gets — the backward walks identical columns).
    extra = 2 if zscan == "precomp" else 0
    if extra:
        win_lo_ref, win_hi_ref = rest[num_weights + 2:num_weights + 4]
    da_out_ref = rest[num_weights + 2 + extra]
    db_out_ref = rest[num_weights + 3 + extra]
    dw_refs = rest[
        num_weights + 4 + extra:num_weights + 4 + extra + num_weights
    ]
    scratch = rest[num_weights + 4 + extra + num_weights:]
    a_tiles, da_tile, sems = scratch
    ncells = grid_g * grid_g
    i = pl.program_id(0)
    row = i % 8
    r2 = radius * radius
    h_out = acc_ref.shape[1]

    @pl.when(i == 0)
    def _init_shared():
        for ref in dw_refs:
            ref[:] = jnp.zeros_like(ref)

    def minmax_body(j, carry):
        cm, cM = carry
        c = ccell_ref[row, j]
        valid = c < ncells
        return (
            jnp.where(valid, jnp.minimum(cm, c), cm),
            jnp.where(valid, jnp.maximum(cM, c), cM),
        )

    cmin, cmax = jax.lax.fori_loop(
        0, bk, minmax_body, (jnp.int32(2 ** 30), jnp.int32(-1))
    )

    b = table_b_ref[:]
    b_rows = jnp.concatenate(
        [jnp.broadcast_to(b[c:c + 1, :], (tile, h)) for c in range(bk)],
        axis=0,
    ).astype(cdt)
    ctr3 = ctr_xyz_ref[:][:, :3]
    lane_hp = jax.lax.broadcasted_iota(jnp.int32, (8, h_pad), 1)
    sub_hp = jax.lax.broadcasted_iota(jnp.int32, (8, h_pad), 0)
    unit3 = (lane_hp == (h + sub_hp)).astype(jnp.float32)
    acc_rows = acc_ref[:]   # [bk, h_out] raw forward max
    g_rows = g_ref[:]       # [bk, h_out] cotangent

    n_layers = num_weights // 2
    n_sub = (bk // sub) if sub else 1
    sub_rows = bk // n_sub

    def _sub_bwd(a_rep, b_sub, mask_sub, acc_sub, g_sub):
        """Recompute + cotangent routing for one sub-block.

        Returns (da_part [tile, h], db_part [sub_rows, h], dw parts).
        Splitting the block changes only the f32 accumulation ORDER of
        the dw/da row sums (sub-partials added instead of one long
        contraction) — a bounded reassociation, not a semantic change.
        """
        # ---- forward recompute, keeping activations -----------------
        x0 = jnp.maximum(a_rep - b_sub, 0.0)
        acts = [x0]
        x = x0
        for wi in range(0, num_weights, 2):
            w = weight_refs[wi][:]
            bb = weight_refs[wi + 1][:]
            x = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = jnp.maximum(x + bb, 0.0)
            if wi + 2 < num_weights:
                x = x.astype(cdt)
            acts.append(x)
        y = acts[-1].astype(jnp.float32)

        # ---- winner detection + cotangent routing -------------------
        y3 = y.reshape(sub_rows, tile, h_out)
        # Mosaic can't insert a minor dim on i1 vectors — expand the
        # mask in f32 and combine multiplicatively
        maskf3 = mask_sub.astype(jnp.float32)[:, :, None]
        winnerf = (
            (y3 == acc_sub[:, None, :]).astype(jnp.float32) * maskf3
        )
        dy = (
            g_sub[:, None, :] * winnerf
        ).reshape(sub_rows * tile, h_out)
        dw_parts = [None] * num_weights
        for li in range(n_layers - 1, -1, -1):
            wi = 2 * li
            # relu' masks compare in f32 (Mosaic has no bf16 cmpf)
            x_l = acts[li + 1].astype(jnp.float32)
            x_prev = acts[li]
            dz = dy * (x_l > 0).astype(jnp.float32)
            dw = jax.lax.dot_general(
                x_prev.astype(jnp.float32), dz,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db = jnp.sum(dz, axis=0, keepdims=True)
            dw_parts[wi] = dw
            dw_parts[wi + 1] = db
            w = weight_refs[wi][:].astype(jnp.float32)
            dy = jax.lax.dot_general(
                dz, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dab = dy * (
            x0.astype(jnp.float32) > 0
        ).astype(jnp.float32)  # [sub_rows*tile, h] f32
        dab3 = dab.reshape(sub_rows, tile, h)
        da_part = jnp.sum(dab3, axis=0)       # [tile, h]
        db_part = -jnp.sum(dab3, axis=1)      # [sub_rows, h]
        return da_part, db_part, tuple(dw_parts)

    def _zero_sub(*_):
        return (
            jnp.zeros((tile, h), jnp.float32),
            jnp.zeros((sub_rows, h), jnp.float32),
            tuple(
                jnp.zeros(ref.shape, jnp.float32) for ref in dw_refs
            ),
        )

    def tile_compute(off, lo, hi, a_full, carry):
        db_acc, dw_accs = carry
        cp_in = pltpu.make_async_copy(
            da_out_ref.at[pl.ds(off, tile), :], da_tile, sems.at[2]
        )
        if n_sub == 1:
            # start the d_table_a read at tile entry: it is consumed
            # only at the final read-modify-write, so the HBM->VMEM
            # copy overlaps the distance/mask build AND the MLP
            # recompute (the sub-block path below must gate the start
            # on any_hit, which needs the mask first)
            cp_in.start()
        rows = jax.lax.dot_general(
            unit3, a_full, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [8, tile]; rows 0..2 are x, y, z
        d2 = jnp.zeros((bk, tile), jnp.float32)
        for ax in range(3):
            diff = rows[ax:ax + 1, :] - ctr3[:, ax:ax + 1]
            d2 = d2 + diff * diff
        mask = d2 <= r2
        # exact column span: forward overfetch (aligned tiles spilling
        # into neighboring columns) is idempotent under max but would
        # double-route cotangents here
        row_global = off + jax.lax.broadcasted_iota(
            jnp.int32, (1, tile), 1
        )
        in_span = (row_global >= lo) & (row_global < hi)
        mask = mask & in_span
        maskf = mask.astype(jnp.float32)
        if n_sub > 1:
            hits = [
                jnp.max(maskf[s * sub_rows:(s + 1) * sub_rows]) > 0
                for s in range(n_sub)
            ]
            any_hit = jnp.max(maskf) > 0
            # start the d_table_a read early — only needed at the final
            # read-modify-write, so it overlaps the whole recompute —
            # and only when some sub-block will actually contribute
            pl.when(any_hit)(lambda: cp_in.start())

        a_cd = a_full[:, :h].astype(cdt)
        a_rep = pltpu.repeat(a_cd, sub_rows, axis=0)
        da_total = jnp.zeros((tile, h), jnp.float32)
        db_parts = []
        new_dw = list(dw_accs)
        for s in range(n_sub):
            sl = slice(s * sub_rows, (s + 1) * sub_rows)
            args = (
                a_rep,
                b_rows[s * sub_rows * tile:(s + 1) * sub_rows * tile],
                mask[sl], acc_rows[sl], g_rows[sl],
            )
            if n_sub > 1:
                da_p, db_p, dw_p = jax.lax.cond(
                    hits[s], _sub_bwd, _zero_sub, *args
                )
            else:
                da_p, db_p, dw_p = _sub_bwd(*args)
            da_total = da_total + da_p
            db_parts.append(db_p)
            for wi in range(num_weights):
                new_dw[wi] = new_dw[wi] + dw_p[wi]
        db_contrib = (
            db_parts[0] if n_sub == 1
            else jnp.concatenate(db_parts, axis=0)
        )

        # ---- read-modify-write d_table_a tile (sequential grid) -----
        def _rmw():
            cp_in.wait()
            da_tile[:] = da_tile[:] + jnp.pad(
                da_total, ((0, 0), (0, h_pad - h))
            )
            cp_out = pltpu.make_async_copy(
                da_tile, da_out_ref.at[pl.ds(off, tile), :], sems.at[2]
            )
            cp_out.start()
            cp_out.wait()

        if n_sub > 1:
            pl.when(any_hit)(_rmw)
        else:
            _rmw()
        return db_acc + db_contrib, tuple(new_dw)

    def col_body(col, carry):
        x0c = jnp.maximum(cmin // grid_g - halo, 0)
        xc = x0c + col

        def col_zscan(j, zcarry):
            zlo, zhi = zcarry
            cc = ccell_ref[row, j]
            xj = cc // grid_g
            zj = cc % grid_g
            use = (cc < ncells) & (jnp.abs(xj - xc) <= halo)
            return (
                jnp.where(use, jnp.minimum(zlo, zj), zlo),
                jnp.where(use, jnp.maximum(zhi, zj), zhi),
            )

        if zscan == "precomp":
            lo = win_lo_ref[row, xc]
            hi = win_hi_ref[row, xc]
        else:
            zlo, zhi = jax.lax.fori_loop(
                0, bk, col_zscan, (jnp.int32(grid_g), jnp.int32(-1))
            )
            zlo_c = jnp.maximum(zlo - halo, 0)
            zhi_c = jnp.minimum(zhi + halo, grid_g - 1)
            lo = offsets_ref[xc * grid_g + zlo_c]
            hi_raw = offsets_ref[xc * grid_g + zhi_c + 1]
            hi = jnp.where(zhi >= 0, hi_raw, lo)
        base = (lo // tile) * tile
        span = hi - base
        nt = jnp.where(span > 0, (span + tile - 1) // tile, 0)

        def get_a(slot, t):
            return pltpu.make_async_copy(
                table_a_ref.at[pl.ds(base + t * tile, tile), :],
                a_tiles.at[slot], sems.at[slot],
            )

        @pl.when(nt > 0)
        def _warm():
            get_a(0, 0).start()

        def t_body(t, tcarry):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < nt)
            def _prefetch():
                get_a(jax.lax.rem(t + 1, 2), t + 1).start()

            get_a(slot, t).wait()
            return tile_compute(
                base + t * tile, lo, hi, a_tiles[slot], tcarry
            )

        return jax.lax.fori_loop(0, nt, t_body, carry)

    dw0 = tuple(
        jnp.zeros(ref.shape, jnp.float32) for ref in dw_refs
    )
    db0 = jnp.zeros((bk, h), jnp.float32)
    x0c = jnp.maximum(cmin // grid_g - halo, 0)
    x1c = jnp.minimum(cmax // grid_g + halo, grid_g - 1)
    ncols = jnp.where(cmax >= 0, x1c - x0c + 1, 0)
    db_final, dw_final = jax.lax.fori_loop(
        0, ncols, col_body, (db0, dw0)
    )
    db_out_ref[:] = db_final
    for ref, val in zip(dw_refs, dw_final):
        ref[:] = ref[:] + val


def _slab_backward(
    table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell, weights,
    raw_acc, g, grid_g, radius, block_centers, tile, interpret,
    compute_dtype, halo=1, sub=SLAB_DEFAULT_SUB, zscan="col",
):
    k, h = table_b.shape[0], table_a.shape[1]
    p = table_a.shape[0]
    bk = _pick_bk(k, block_centers, "slab_edge_max (backward)")
    sub = _legal_sub(sub, bk)
    table_fused, weight_args, h_pad = _slab_prep_fused(
        table_a, src_xyz, weights, tile, h, compute_dtype
    )
    da_init = jnp.zeros((p + tile, h_pad), jnp.float32)
    extra_ins = []
    if zscan == "precomp":
        extra_ins = list(
            column_row_windows(offsets, center_cell, grid_g, bk, halo)
        )

    grid = (k // bk,)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # offsets
        pl.BlockSpec((8, bk), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM),                    # cells
        pl.BlockSpec((bk, h), lambda i: (i, 0)),                  # table_b
        pl.BlockSpec((bk, 4), lambda i: (i, 0)),                  # ctr_xyz
        pl.BlockSpec((bk, raw_acc.shape[1]), lambda i: (i, 0)),   # g
        pl.BlockSpec((bk, raw_acc.shape[1]), lambda i: (i, 0)),   # acc
    ]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_args
    ]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),                 # fused table
        pl.BlockSpec(memory_space=pl.ANY),                 # da_init
    ]
    in_specs += [
        pl.BlockSpec((8, grid_g), lambda i: (i // 8, 0),
                     memory_space=pltpu.SMEM)
        for _ in extra_ins
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                        # d_table_a
        pl.BlockSpec((bk, h), lambda i: (i, 0)),                  # d_table_b
    ]
    out_specs += [
        pl.BlockSpec(
            wa.shape, lambda i: tuple(0 for _ in wa.shape)
        )
        for wa in weight_args                                     # d_weights
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((p + tile, h_pad), jnp.float32),
        jax.ShapeDtypeStruct((k, h), jnp.float32),
    ] + [
        jax.ShapeDtypeStruct(wa.shape, jnp.float32)
        for wa in weight_args
    ]
    kernel = functools.partial(
        _slab_bwd_kernel,
        num_weights=len(weight_args),
        bk=bk, tile=tile, h=h, h_pad=h_pad, grid_g=grid_g,
        radius=float(radius), compute_dtype=compute_dtype, halo=halo,
        sub=sub, zscan=zscan,
    )
    n_in_before_da = 6 + len(weight_args) + 1
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={n_in_before_da: 0},
        scratch_shapes=[
            pltpu.VMEM((2, tile, h_pad), jnp.float32),
            pltpu.VMEM((tile, h_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(offsets, center_cell.reshape(k // bk, bk), table_b, ctr_xyz,
      g, raw_acc, *weight_args, table_fused, da_init, *extra_ins)
    d_table_a = outs[0][:p, :h]
    d_table_b = outs[1]
    d_weights = []
    for idx, wb in enumerate(weights):
        dwa = outs[2 + idx]
        if idx % 2 == 1:
            dwa = dwa.reshape(wb.shape)
        d_weights.append(dwa.astype(wb.dtype))
    return d_table_a, d_table_b, tuple(d_weights)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15)
)
def _slab_train_p(
    table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell, weights,
    grid_g, radius, block_centers, tile, interpret, compute_dtype,
    halo=1, sub=SLAB_DEFAULT_SUB, zscan="col",
):
    # All array inputs are PRIMALS (never close over tracers in a
    # custom_vjp — it leaks them across the remat/jit trace boundary);
    # only hashable statics ride nondiff_argnums.
    return _slab_forward(
        table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
        weights, grid_g, radius, block_centers, tile, interpret,
        compute_dtype, clamp_out=True, halo=halo, sub=sub, zscan=zscan,
    )


def _slab_train_fwd(
    table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell, weights,
    grid_g, radius, block_centers, tile, interpret, compute_dtype,
    halo=1, sub=SLAB_DEFAULT_SUB, zscan="col",
):
    raw = _slab_forward(
        table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
        weights, grid_g, radius, block_centers, tile, interpret,
        compute_dtype, clamp_out=False, halo=halo, sub=sub, zscan=zscan,
    )
    out = jnp.where(raw > NEG / 2, raw, 0.0)
    res = (table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
           weights, raw)
    return out, res


def _slab_train_bwd(
    grid_g, radius, block_centers, tile, interpret, compute_dtype, halo,
    sub, zscan, res, g,
):
    import numpy as _np

    (table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
     weights, raw) = res
    d_ta, d_tb, d_ws = _slab_backward(
        table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
        weights, raw, g.astype(jnp.float32), grid_g, radius,
        block_centers, tile, interpret, compute_dtype, halo=halo,
        sub=sub, zscan=zscan,
    )
    float0 = jax.dtypes.float0
    return (
        d_ta.astype(table_a.dtype),
        jnp.zeros_like(src_xyz),            # structure only
        d_tb.astype(table_b.dtype),
        jnp.zeros_like(ctr_xyz),            # structure only
        _np.zeros(offsets.shape, float0),   # int32: float0 cotangent
        _np.zeros(center_cell.shape, float0),
        d_ws,
    )


_slab_train_p.defvjp(_slab_train_fwd, _slab_train_bwd)


def slab_edge_max_train(
    table_a,
    src_xyz,
    table_b,
    ctr_xyz,
    offsets,
    center_cell,
    weights: Tuple,
    grid_g: int,
    radius: float,
    block_centers: int = SLAB_DEFAULT_BLOCK_CENTERS,
    tile: int = SLAB_DEFAULT_TILE,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
    halo: int = 1,
    sub: int = SLAB_DEFAULT_SUB,
    zscan: str = "col",
):
    """Differentiable :func:`slab_edge_max` for the training path.

    Same forward semantics (exact uncapped radius graph, fused edge MLP
    + per-center max); gradients flow to ``table_a``/``table_b``/
    ``weights`` via the recompute-in-backward kernel above.  Coordinates
    and cell metadata get zero cotangent (graph structure).  Defaults
    (bk=32, tile=32) match the inference sweep optimum — a same-process
    train-step sweep at realistic car_T3 density measured 113.6 (old
    8/128) -> 79.2 ms/step with bitwise-identical losses; the backward
    keeps per-layer activations for one (bk*tile)-row tile in VMEM,
    which is the same 1024 rows either way.
    """
    if zscan not in ("col", "precomp"):
        # the backward kernel has no "block" walk — silently mixing a
        # block forward with a col backward would corrupt any A/B
        raise ValueError(
            "slab_edge_max_train supports zscan 'col' or 'precomp', "
            "got %r" % (zscan,)
        )
    return _slab_train_p(
        table_a, src_xyz, table_b, ctr_xyz, offsets, center_cell,
        tuple(weights), grid_g, radius, block_centers, tile, interpret,
        compute_dtype, halo, sub, zscan,
    )
