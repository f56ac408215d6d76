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
