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


def segment_max(edge_features, edges_dst, num_centers: int):
    """[E, C] features, [E] destinations → [num_centers, C].

    Empty segments yield 0 (TF returns dtype.min; every real center has
    at least its self-edge so the difference is only visible on padded
    rows, which are masked downstream either way).
    """
    agg = jax.ops.segment_max(
        edge_features,
        edges_dst,
        num_segments=num_centers + 1,
        indices_are_sorted=True,
    )[:num_centers]
    return jnp.where(jnp.isfinite(agg), agg, 0.0)


def segment_sum(edge_features, edges_dst, num_centers: int):
    return jax.ops.segment_sum(
        edge_features,
        edges_dst,
        num_segments=num_centers + 1,
        indices_are_sorted=True,
    )[:num_centers]


def segment_mean(edge_features, edges_dst, num_centers: int):
    s = jax.ops.segment_sum(
        edge_features,
        edges_dst,
        num_segments=num_centers + 1,
        indices_are_sorted=True,
    )
    ones = jnp.ones((edge_features.shape[0], 1), edge_features.dtype)
    c = jax.ops.segment_sum(
        ones, edges_dst, num_segments=num_centers + 1,
        indices_are_sorted=True,
    )
    return (s / jnp.maximum(c, 1.0))[:num_centers]


AGGREGATIONS = {
    "max": segment_max,
    "sum": segment_sum,
    "mean": segment_mean,
}
