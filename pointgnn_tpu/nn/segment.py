"""Segment aggregations over padded, sentinel-terminated edge lists.

The reference aggregates edge features per destination vertex with
``tf.math.unsorted_segment_{max,sum,mean}`` (gnn.py:106-119).  Here the
padded edge layout guarantees (see pointgnn_tpu.graph.pad):

- real edges come first, sorted ascending by destination;
- padded edges carry destination == num_centers (one-past sentinel).

So a sorted segment reduction with ``num_segments = num_centers + 1``
routes every padded edge into the dropped last segment — no masks in
the hot loop.  Empty real segments (possible only for padded center
rows or after overflow truncation) are neutralized to 0, which is
also what downstream masking expects.
"""

import jax
import jax.numpy as jnp


def segment_max(edge_features, edges_dst, num_centers: int, sorted=True):
    """[E, C] features, [E] destinations → [num_centers, C].

    Empty segments yield 0 (TF returns dtype.min; every real center has
    at least its self-edge so the difference is only visible on padded
    rows, which are masked downstream either way).

    ``sorted`` asserts non-decreasing destinations.  Host-padded graphs
    satisfy it (sentinels at the end); device-built graphs interleave
    sentinel slots between center blocks and MUST pass ``sorted=False``
    — on TPU a false sortedness promise silently corrupts results at
    some shapes (e.g. E=393216, H=300: ~78%% wrong rows).
    """
    agg = jax.ops.segment_max(
        edge_features,
        edges_dst,
        num_segments=num_centers + 1,
        indices_are_sorted=sorted,
    )[:num_centers]
    return jnp.where(jnp.isfinite(agg), agg, 0.0)


def segment_sum(edge_features, edges_dst, num_centers: int, sorted=True):
    return jax.ops.segment_sum(
        edge_features,
        edges_dst,
        num_segments=num_centers + 1,
        indices_are_sorted=sorted,
    )[:num_centers]


def segment_mean(edge_features, edges_dst, num_centers: int, sorted=True):
    s = jax.ops.segment_sum(
        edge_features,
        edges_dst,
        num_segments=num_centers + 1,
        indices_are_sorted=sorted,
    )
    ones = jnp.ones((edge_features.shape[0], 1), edge_features.dtype)
    c = jax.ops.segment_sum(
        ones, edges_dst, num_segments=num_centers + 1,
        indices_are_sorted=sorted,
    )
    return (s / jnp.maximum(c, 1.0))[:num_centers]


AGGREGATIONS = {
    "max": segment_max,
    "sum": segment_sum,
    "mean": segment_mean,
}


def chunked_aggregate(
    edge_fn,
    edges_src,
    edges_dst,
    num_centers: int,
    out_dim: int,
    aggregation: str,
    num_chunks: int,
    dtype=jnp.float32,
    sorted=True,
):
    """Streaming edge aggregation: ``agg(edge_fn(src, dst))`` computed in
    ``num_chunks`` blocks under ``lax.scan`` with a rematerialized body.

    Peak live memory drops from O(E x width) to O(E/num_chunks x width)
    plus the [num_centers, out_dim] running aggregate — in the backward
    pass too (each chunk's edge activations are recomputed).  This is
    what makes training at multi-million-edge capacities fit in HBM.

    ``edge_fn(src_idx [B], dst_idx [B]) -> [B, out_dim]`` gathers and
    transforms one block (closure over vertex tensors is fine).  Edges
    must be globally dst-sorted with sentinel ``num_centers`` padding —
    every chunk of a sorted list is sorted.
    """
    E = edges_src.shape[0]
    if num_chunks <= 1 or E % num_chunks != 0:
        return AGGREGATIONS[aggregation](
            edge_fn(edges_src, edges_dst), edges_dst, num_centers,
            sorted=sorted,
        )
    src_chunks = edges_src.reshape(num_chunks, -1)
    dst_chunks = edges_dst.reshape(num_chunks, -1)
    n_seg = num_centers + 1

    def _match_vma(init):
        """Give the scan carry the same varying-manual-axes type as the
        body output so this works inside shard_map (the body's output
        varies over the mesh axes of the edge inputs)."""
        vma = getattr(jax.typeof(edges_src), "vma", None)
        if vma:
            return jax.lax.pcast(init, tuple(vma), to="varying")
        return init

    if aggregation == "max":
        init = _match_vma(jnp.full((n_seg, out_dim), -jnp.inf, dtype))

        def body(carry, xs):
            src, dst = xs
            part = jax.ops.segment_max(
                edge_fn(src, dst).astype(dtype), dst,
                num_segments=n_seg, indices_are_sorted=sorted,
            )
            return jnp.maximum(carry, part), None

        agg, _ = jax.lax.scan(
            jax.checkpoint(body), init, (src_chunks, dst_chunks)
        )
        agg = agg[:num_centers]
        return jnp.where(jnp.isfinite(agg), agg, 0.0)

    # sum / mean: accumulate sums (and counts for mean)
    init = (
        _match_vma(jnp.zeros((n_seg, out_dim), dtype)),
        _match_vma(jnp.zeros((n_seg, 1), dtype)),
    )

    def body(carry, xs):
        src, dst = xs
        vals, counts = carry
        ef = edge_fn(src, dst).astype(dtype)
        vals = vals + jax.ops.segment_sum(
            ef, dst, num_segments=n_seg, indices_are_sorted=sorted
        )
        counts = counts + jax.ops.segment_sum(
            jnp.ones((ef.shape[0], 1), dtype), dst,
            num_segments=n_seg, indices_are_sorted=sorted,
        )
        return (vals, counts), None

    (vals, counts), _ = jax.lax.scan(
        jax.checkpoint(body), init, (src_chunks, dst_chunks)
    )
    if aggregation == "sum":
        return vals[:num_centers]
    if aggregation == "mean":
        return (vals / jnp.maximum(counts, 1.0))[:num_centers]
    raise ValueError("unknown aggregation %s" % aggregation)
