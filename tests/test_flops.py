"""Analytic FLOP accounting (utils/flops.py): pair counting, the
slab-walk replica, and the model-level forward count."""

import numpy as np

from pointgnn_tpu import configs
from pointgnn_tpu.utils import flops


def test_dense_chain_flops():
    assert flops.dense_chain_flops(10, [4, 8]) == 2 * 10 * 32
    assert flops.dense_chain_flops(1, [300, 300]) == 180000


def test_count_inradius_pairs_matches_bruteforce():
    rng = np.random.default_rng(0)
    c = rng.uniform(0, 10, (200, 3)).astype(np.float32)
    s = rng.uniform(0, 10, (300, 3)).astype(np.float32)
    r = 1.5
    d2 = ((c[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    expected = int((d2 <= r * r).sum())
    got = flops.count_inradius_pairs(c, s, r, chunk=64)
    assert got == expected


def test_slab_walk_covers_every_exact_pair():
    """The walk replica mirrors the kernel's window; every in-radius
    pair must fall inside the walked row spans (the kernel's
    correctness precondition), and walked >= span >= 0."""
    rng = np.random.default_rng(1)
    g, cell, r = 16, 2.0, 2.0
    xyz = rng.uniform(0, g * cell, (512, 3)).astype(np.float32)
    xyz[:, 1] = 0.0
    cx = np.clip((xyz[:, 0] // cell).astype(int), 0, g - 1)
    cz = np.clip((xyz[:, 2] // cell).astype(int), 0, g - 1)
    cells = cx * g + cz
    order = np.argsort(cells, kind="stable")
    xyz, cells = xyz[order], cells[order]
    offsets = np.searchsorted(cells, np.arange(g * g + 1))
    bk, tile = 8, 8
    w = flops.slab_walk_pairs(offsets, cells, g, bk, tile, halo=1)
    assert w["walked_pairs"] >= w["span_pairs"] > 0
    exact = flops.count_inradius_pairs(xyz, xyz, r)
    # span covers the 3x3 window around each block, a superset of
    # every center's radius ball -> span_pairs >= exact pairs
    assert w["span_pairs"] >= exact
    # replica-level coverage check: each pair's candidate row lies in
    # its center block's walked span for the candidate's x-column
    ncells = g * g
    for b0 in range(0, len(cells), bk):
        blk = cells[b0:b0 + bk]
        for ci in range(b0, min(b0 + bk, len(cells))):
            d2 = ((xyz - xyz[ci]) ** 2).sum(-1)
            for si in np.flatnonzero(d2 <= r * r):
                xc = cells[si] // g
                use = np.abs(blk // g - xc) <= 1
                assert use.any()
                zlo = max(int((blk[use] % g).min()) - 1, 0)
                zhi = min(int((blk[use] % g).max()) + 1, g - 1)
                lo = offsets[xc * g + zlo]
                hi = offsets[xc * g + zhi + 1]
                assert lo <= si < hi
        break  # one block is enough for the invariant check


def test_forward_flops_scales_with_pairs():
    cfg = configs.model_config("Car", T=3)
    base = flops.pointgnn_forward_flops(cfg, 1, 24000, 12000, 4e5, 1e6)
    more = flops.pointgnn_forward_flops(cfg, 1, 24000, 12000, 4e5, 2e6)
    assert more > base > 0
    # 3 GNN layers x 1e6 extra pairs x 2*300*300 per pair
    assert np.isclose(more - base, 3 * 1e6 * 180000)
    # T=2 model has one fewer GNN layer -> strictly less
    cfg2 = configs.model_config("Car", T=2)
    assert flops.pointgnn_forward_flops(
        cfg2, 1, 24000, 12000, 4e5, 1e6
    ) < base


def test_slab_walk_counts_gap_column_partial_tiles():
    """A block whose x-cells gap more than 2*halo still walks the gap
    columns on device: the kernel's zscan sentinel collapses to
    hi == lo, but unaligned lo DMAs one partial tile
    (_slab_kernel col_body).  The replica must count it."""
    from pointgnn_tpu.utils.flops import slab_walk_pairs

    grid_g, tile, bk, rows_per_cell = 16, 32, 8, 5
    # 8 centers in one block: x-cells 2 and 9 (gap 7 > 2*halo), z=3
    center_cell = np.array([2 * 16 + 3] * 4 + [9 * 16 + 3] * 4)
    offsets = np.arange(grid_g * grid_g + 1) * rows_per_cell
    w = slab_walk_pairs(offsets, center_cell, grid_g, bk=bk,
                        tile=tile, halo=1)
    # hand walk: member columns 1-3 and 8-10 contribute 64+32+64 and
    # 32+64+32 rows; gap columns 4-7 contribute one 32-row partial
    # tile each (lo = offsets[xc*16+15] is never 32-aligned here)
    assert w["walked_pairs"] == (64 + 32 + 64 + 4 * 32 + 32 + 64 + 32) * bk
    assert w["span_pairs"] == 15 * 6 * bk
    assert w["tiles"] == 2 + 1 + 2 + 4 + 1 + 2 + 1


def _subblock_workload(n_cand=200, n_ctr=45, g=8, cell=1.0, seed=3):
    """Cell-sorted candidates + centers on a g x g grid (unit cells)."""
    rng = np.random.default_rng(seed)
    cand = rng.uniform(0, g * cell, (n_cand, 3)).astype(np.float32)
    cand[:, 1] = 0.0
    ctr = rng.uniform(0, g * cell, (n_ctr, 3)).astype(np.float32)
    ctr[:, 1] = 0.0

    def cells_of(xyz):
        cx = np.clip((xyz[:, 0] // cell).astype(int), 0, g - 1)
        cz = np.clip((xyz[:, 2] // cell).astype(int), 0, g - 1)
        return cx * g + cz

    ccells = cells_of(cand)
    order = np.argsort(ccells, kind="stable")
    cand, ccells = cand[order], ccells[order]
    offsets = np.searchsorted(ccells, np.arange(g * g + 1))
    kcells = cells_of(ctr)
    korder = np.argsort(kcells, kind="stable")
    return offsets, kcells[korder], cand, ctr[korder], g


def test_slab_walk_subblock_edge_cases():
    """sub=0 (the kernel's 'disabled' value), non-divisor sub, and a
    center count that is not a multiple of bk must all work; walked
    pairs must agree with slab_walk_pairs on the same workload."""
    from pointgnn_tpu.utils import flops

    offsets, kcells, cand, ctr, g = _subblock_workload(n_ctr=45)
    bk, tile, r = 16, 8, 1.0
    base = flops.slab_walk_pairs(offsets, kcells, g, bk=bk, tile=tile)
    # sub=0 disables the skip: the kernel runs the MLP on every walked
    # (block, tile) pair, so computed == walked (the _legal_sub
    # convention — 0 stays 0)
    w0 = flops.slab_walk_pairs_subblock(
        offsets, kcells, cand, ctr, g, r, bk=bk, tile=tile, sub=0
    )
    assert w0["walked_pairs"] == base["walked_pairs"]
    assert w0["computed_pairs"] == w0["walked_pairs"]
    # sub == bk is whole-block-tile granularity skipping: never MORE
    # than unconditional
    wbk = flops.slab_walk_pairs_subblock(
        offsets, kcells, cand, ctr, g, r, bk=bk, tile=tile, sub=bk
    )
    assert wbk["walked_pairs"] == base["walked_pairs"]
    assert 0 < wbk["computed_pairs"] <= w0["computed_pairs"]
    # non-divisor sub rounds down to the largest divisor (16 % 6 -> 4)
    w6 = flops.slab_walk_pairs_subblock(
        offsets, kcells, cand, ctr, g, r, bk=bk, tile=tile, sub=6
    )
    w4 = flops.slab_walk_pairs_subblock(
        offsets, kcells, cand, ctr, g, r, bk=bk, tile=tile, sub=4
    )
    assert w6 == w4
    # finer skip granularity never computes MORE pairs
    assert w4["computed_pairs"] <= wbk["computed_pairs"]
