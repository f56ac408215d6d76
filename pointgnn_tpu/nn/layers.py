"""Graph neural network layers (functional, static shapes).

Behavioral parity with /root/reference/models/gnn.py:

- :class:`PointSetPooling` (gnn.py:211-283): gather points of each set,
  relative coordinates to the keypoint, point MLP, per-set max, output
  MLP.
- :class:`GraphNetAutoCenter` (gnn.py:285-373): optional learned
  destination-coordinate offset ("auto-registration"), edge MLP over
  [source features ; source − shifted destination], per-destination max,
  linear-output update MLP, residual add.
- :class:`ClassAwarePredictor` / :class:`ClassAwareSeparatedPredictor`
  (gnn.py:121-209): shared classification head, per-class localization
  heads (the separated variant splits the feature vector per class).

Each layer is a pair of pure functions ``init(key, ...) -> params`` /
``apply(params, ...) -> array`` so the whole model jits as one XLA
program.  Edges arrive padded with sentinel destinations (see
pointgnn_tpu.graph.pad), keeping every shape static.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from pointgnn_tpu.nn import mlp
from pointgnn_tpu.nn.segment import AGGREGATIONS, chunked_aggregate


def _apply_sentinel(edge_fn, edge_sentinel, num_src, agg_name, edges_sorted):
    """Adapt an edge function to the graph's padding convention.

    "dst": padded slots carry a one-past destination (host-padded
    graphs) — segment reductions drop them via the extra segment.
    "src": padded slots carry ``src == num_src`` with a VALID (always
    sorted) destination (device-built graphs) — their contribution is
    masked to the aggregation identity here, which legalizes
    ``indices_are_sorted=True``.
    """
    if edge_sentinel == "dst":
        return edge_fn, edges_sorted
    assert edge_sentinel == "src", edge_sentinel
    fill = -jnp.inf if agg_name == "max" else 0.0

    def masked_fn(src, dst, _base=edge_fn):
        h = _base(jnp.minimum(src, num_src - 1), dst)
        return jnp.where(
            (src >= num_src)[:, None], jnp.asarray(fill, h.dtype), h
        )

    return masked_fn, True


class PointSetPooling:
    """Downsampling layer: raw points → keypoint set features."""

    def __init__(self, aggregation: str = "max"):
        self._agg = AGGREGATIONS[aggregation]
        self._agg_name = aggregation

    def init(
        self,
        key,
        in_dim: int,
        point_MLP_depth_list: Sequence[int],
        output_MLP_depth_list: Sequence[int],
        point_MLP_normalization_type: str = "NONE",
        output_MLP_normalization_type: str = "NONE",
        **_unused,
    ):
        k1, k2 = jax.random.split(key)
        return {
            "point_mlp": mlp.init_mlp(
                k1, in_dim + 3, point_MLP_depth_list,
                point_MLP_normalization_type,
            ),
            "output_mlp": mlp.init_mlp(
                k2, point_MLP_depth_list[-1], output_MLP_depth_list,
                output_MLP_normalization_type,
            ),
        }

    def apply(
        self,
        params,
        point_features,     # [P, C]
        point_xyz,          # [P, 3]
        center_xyz,         # [K, 3] == point_xyz[keypoint_indices]
        edges_src,          # [E] -> points
        edges_dst,          # [E] -> centers (sentinel K for padding)
        center_mask=None,   # [K]
        point_mask=None,    # [P] (slab mode only)
        edge_mask=None,     # unused; sentinel routing handles padding
        point_MLP_depth_list=None,
        point_MLP_normalization_type="fused_BN_center",
        point_MLP_activation_type="ReLU",
        output_MLP_depth_list=None,
        output_MLP_normalization_type="fused_BN_center",
        output_MLP_activation_type="ReLU",
        compute_dtype=None,
        edge_chunks=1,
        blocked_edges=None,
        edges_sorted=True,
        edge_sentinel="dst",
        pallas_tail=False,
        slab=None,
        bn_use_stored=False,
        bn_collect=None,
        bn_prefix=(),
    ):
        num_centers = center_xyz.shape[0]
        num_src = point_features.shape[0]
        point_bn = point_MLP_normalization_type in mlp.BN_TYPES
        if point_bn and edge_chunks > 1:
            raise ValueError(
                "BN-family point-MLP normalization requires "
                "edge_chunks=1: chunked streaming would compute batch "
                "statistics per chunk instead of over the full edge "
                "set (PointGNN sets this automatically)"
            )
        # BN statistics must exclude padded edge slots (the reference's
        # ragged feed has none); sentinel src/dst rows are masked out
        edge_bn_mask = (
            ((edges_src < num_src) & (edges_dst < num_centers))
            if point_bn else None
        )

        if slab is not None and not (
            self._agg_name == "max"
            and point_MLP_normalization_type == "NONE"
            and point_MLP_activation_type == "ReLU"
        ):
            # Slab graphs carry no level-0 edge list (build_padded_graph
            # substitutes dummy arrays), so the segment-reduction
            # fallback would silently reduce over garbage edges.
            raise ValueError(
                "slab mode requires max aggregation, NONE point-MLP "
                "normalization, and ReLU activation; got agg=%r norm=%r "
                "act=%r — disable slab for this config"
                % (self._agg_name, point_MLP_normalization_type,
                   point_MLP_activation_type)
            )

        if slab is not None:
            # Slab mode: no level-0 edge list — the fused kernel
            # (nn/pallas_kernels.slab_edge_max) performs the exact
            # uncapped radius search over cell-sorted point rows, the
            # point MLP, and the per-keypoint max.  Same first-layer
            # fold as the pallas_tail path below.
            pp = params["point_mlp"]
            w0, b0 = pp[0]["w"], pp[0]["b"]
            c = point_features.shape[1]
            cd = compute_dtype or point_features.dtype
            w0b = w0[c:]
            # round tables through the compute dtype so slab numerics
            # match the edge-list path bit-for-bit (bf16 re-round in
            # the kernel is then idempotent)
            table_a = (
                point_features @ w0[:c]
                + point_xyz.astype(w0.dtype) @ w0b + b0
            ).astype(cd).astype(jnp.float32)
            table_b = (
                (center_xyz.astype(w0.dtype) @ w0b)
                .astype(cd).astype(jnp.float32)
            )
            from pointgnn_tpu.nn import pallas_kernels as pk

            p_maskb = (
                point_mask.astype(bool)
                if point_mask is not None
                else jnp.ones((num_src,), bool)
            )
            c_maskb = (
                center_mask.astype(bool)
                if center_mask is not None
                else jnp.ones((num_centers,), bool)
            )
            src4 = jnp.concatenate(
                [
                    point_xyz.astype(jnp.float32),
                    jnp.zeros((num_src, 1), jnp.float32),
                ],
                axis=1,
            )
            src4 = jnp.where(p_maskb[:, None], src4, 1e6)
            ctr4 = jnp.concatenate(
                [
                    center_xyz.astype(jnp.float32),
                    jnp.zeros((num_centers, 1), jnp.float32),
                ],
                axis=1,
            )
            ctr4 = jnp.where(c_maskb[:, None], ctr4, -1e6)
            tail_weights = []
            for layer in pp[1:]:
                tail_weights += [layer["w"], layer["b"]]
            slab_fn = (
                pk.slab_edge_max_train if slab.get("train")
                else pk.slab_edge_max
            )
            tuning = {
                k: slab[k]
                for k in ("block_centers", "tile", "sub", "zscan")
                if k in slab
            }
            agg = slab_fn(
                table_a, src4, table_b, ctr4,
                slab["offsets"], slab["center_cell"],
                tuple(tail_weights),
                grid_g=slab["grid_g"], radius=slab["radius"],
                halo=slab.get("halo", 1),
                compute_dtype=jnp.dtype(cd).name,
                interpret=(jax.default_backend() != "tpu"),
                **tuning,
            )
            agg = agg.astype(point_features.dtype)
            out = mlp.apply_mlp(
                params["output_mlp"], agg, is_logits=False,
                normalization_type=output_MLP_normalization_type,
                activation_type=output_MLP_activation_type,
                mask=center_mask, compute_dtype=compute_dtype,
                bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                bn_prefix=bn_prefix + ("output_mlp",),
            )
            if center_mask is not None:
                out = out * center_mask[:, None].astype(out.dtype)
            return out

        if (
            pallas_tail
            and self._agg_name == "max"
            and edge_sentinel == "src"
            and point_MLP_normalization_type == "NONE"
            and point_MLP_activation_type == "ReLU"
            and edges_src.shape[0] % num_centers == 0
        ):
            # Same algebraic fold as the GNN fast path below:
            #   concat(feat, p_xyz - c_xyz) @ W0 + b0 == A[src] - B[dst]
            # with A = feat @ W0a + p_xyz @ W0b + b0, B = c_xyz @ W0b,
            # then the fused Pallas tail (subtract/ReLU/dense/max).
            pp = params["point_mlp"]
            w0, b0 = pp[0]["w"], pp[0]["b"]
            c = point_features.shape[1]
            cd = compute_dtype or point_features.dtype
            w0b = w0[c:]
            table_a = (
                point_features @ w0[:c]
                + point_xyz.astype(w0.dtype) @ w0b + b0
            ).astype(cd)
            table_b = (center_xyz.astype(w0.dtype) @ w0b).astype(cd)
            from pointgnn_tpu.nn import pallas_kernels as pk

            s = edges_src.shape[0] // num_centers
            gathered = table_a[jnp.minimum(edges_src, num_src - 1)]
            slot_valid = (
                (edges_src < num_src)
                .reshape(num_centers, s).astype(jnp.float32)
            )
            tail_weights = []
            for layer in pp[1:]:
                tail_weights += [
                    layer["w"].astype(cd), layer["b"].astype(cd)
                ]
            agg = pk.edge_tail_max(
                gathered, table_b, slot_valid, tuple(tail_weights),
                interpret=(jax.default_backend() != "tpu"),
            )
            agg = agg.astype(point_features.dtype)
            out = mlp.apply_mlp(
                params["output_mlp"], agg, is_logits=False,
                normalization_type=output_MLP_normalization_type,
                activation_type=output_MLP_activation_type,
                mask=center_mask, compute_dtype=compute_dtype,
                bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                bn_prefix=bn_prefix + ("output_mlp",),
            )
            if center_mask is not None:
                out = out * center_mask[:, None].astype(out.dtype)
            return out

        def edge_fn(src, dst_raw):
            sf = point_features[src]
            # relative coordinates to the set's keypoint (gnn.py:256-267)
            dst = jnp.minimum(dst_raw, num_centers - 1)
            rel = point_xyz[src] - center_xyz[dst]
            edge_in = jnp.concatenate([sf, rel.astype(sf.dtype)], axis=-1)
            return mlp.apply_mlp(
                params["point_mlp"], edge_in, is_logits=False,
                normalization_type=point_MLP_normalization_type,
                activation_type=point_MLP_activation_type,
                compute_dtype=compute_dtype,
                # full-length closure mask: with BN edge_chunks==1 is
                # enforced above, so edge_fn sees the whole edge list
                mask=edge_bn_mask,
                bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                bn_prefix=bn_prefix + ("point_mlp",),
            )

        edge_fn, edges_sorted = _apply_sentinel(
            edge_fn, edge_sentinel, num_src, self._agg_name, edges_sorted
        )

        if blocked_edges and self._agg_name == "max":
            s = blocked_edges
            h = edge_fn(edges_src, edges_dst)
            slot_valid = (
                (edges_dst.reshape(num_centers, s) < num_centers)
                & (edges_src.reshape(num_centers, s) < num_src)
            )[:, :, None]
            hh = jnp.where(
                slot_valid,
                h.reshape(num_centers, s, -1),
                jnp.asarray(-jnp.inf, h.dtype),
            )
            agg = jnp.max(hh, axis=1)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        else:
            agg = chunked_aggregate(
                edge_fn, edges_src, edges_dst, num_centers,
                out_dim=point_MLP_depth_list[-1],
                aggregation=self._agg_name,
                num_chunks=edge_chunks,
                dtype=compute_dtype or point_features.dtype,
                sorted=edges_sorted,
            )
        agg = agg.astype(point_features.dtype)
        out = mlp.apply_mlp(
            params["output_mlp"], agg, is_logits=False,
            normalization_type=output_MLP_normalization_type,
            activation_type=output_MLP_activation_type,
            mask=center_mask, compute_dtype=compute_dtype,
            bn_use_stored=bn_use_stored, bn_collect=bn_collect,
            bn_prefix=bn_prefix + ("output_mlp",),
        )
        if center_mask is not None:
            out = out * center_mask[:, None].astype(out.dtype)
        return out


class GraphNetAutoCenter:
    """GNN layer with auto-registration and residual update."""

    def __init__(self, aggregation: str = "max"):
        self._agg = AGGREGATIONS[aggregation]
        self._agg_name = aggregation

    def init(
        self,
        key,
        in_dim: int,
        edge_MLP_depth_list: Sequence[int],
        update_MLP_depth_list: Sequence[int],
        auto_offset: bool = False,
        auto_offset_MLP_depth_list: Optional[Sequence[int]] = None,
        edge_MLP_normalization_type: str = "NONE",
        update_MLP_normalization_type: str = "NONE",
        auto_offset_MLP_normalization_type: str = "NONE",
        **_unused,
    ):
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "edge_mlp": mlp.init_mlp(
                k1, in_dim + 3, edge_MLP_depth_list,
                edge_MLP_normalization_type,
            ),
            "update_mlp": mlp.init_mlp(
                k2, edge_MLP_depth_list[-1], update_MLP_depth_list,
                update_MLP_normalization_type,
            ),
        }
        if auto_offset:
            params["auto_offset_mlp"] = mlp.init_mlp(
                k3, in_dim, auto_offset_MLP_depth_list,
                auto_offset_MLP_normalization_type,
            )
        return params

    def apply(
        self,
        params,
        vertex_features,    # [N, C]
        vertex_xyz,         # [N, 3]
        edges_src,          # [E] -> vertices
        edges_dst,          # [E] -> vertices (sentinel N for padding)
        vertex_mask=None,   # [N]
        edge_MLP_depth_list=None,
        edge_MLP_normalization_type="fused_BN_center",
        edge_MLP_activation_type="ReLU",
        update_MLP_depth_list=None,
        update_MLP_normalization_type="fused_BN_center",
        update_MLP_activation_type="ReLU",
        auto_offset=False,
        auto_offset_MLP_depth_list=None,
        auto_offset_MLP_normalization_type="fused_BN_center",
        auto_offset_MLP_feature_activation_type="ReLU",
        compute_dtype=None,
        edge_chunks=1,
        blocked_edges=None,
        edges_sorted=True,
        edge_sentinel="dst",
        pallas_tail=False,
        slab=None,
        bn_use_stored=False,
        bn_collect=None,
        bn_prefix=(),
    ):
        n = vertex_features.shape[0]
        edge_bn = edge_MLP_normalization_type in mlp.BN_TYPES
        if edge_bn and edge_chunks > 1:
            raise ValueError(
                "BN-family edge-MLP normalization requires "
                "edge_chunks=1: chunked streaming would compute batch "
                "statistics per chunk instead of over the full edge "
                "set (PointGNN sets this automatically)"
            )
        edge_bn_mask = (
            ((edges_src < n) & (edges_dst < n)) if edge_bn else None
        )
        if slab is not None and not (
            self._agg_name == "max"
            and edge_MLP_normalization_type == "NONE"
            and edge_MLP_activation_type == "ReLU"
        ):
            # Slab graphs carry no edge list; the fallback segment path
            # would reduce over the dummy arrays build_padded_graph
            # substitutes in slab mode.
            raise ValueError(
                "slab mode requires max aggregation, NONE edge-MLP "
                "normalization, and ReLU activation; got agg=%r norm=%r "
                "act=%r — disable slab for this config"
                % (self._agg_name, edge_MLP_normalization_type,
                   edge_MLP_activation_type)
            )
        # auto-registration offsets shift only the destination coords
        # (gnn.py:341-348)
        if auto_offset:
            offset = mlp.apply_mlp(
                params["auto_offset_mlp"], vertex_features, is_logits=True,
                normalization_type=auto_offset_MLP_normalization_type,
                activation_type=auto_offset_MLP_feature_activation_type,
                mask=vertex_mask, compute_dtype=compute_dtype,
                bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                bn_prefix=bn_prefix + ("auto_offset_mlp",),
            )
            shifted_xyz = vertex_xyz + offset.astype(vertex_xyz.dtype)
        else:
            shifted_xyz = vertex_xyz

        if edge_MLP_normalization_type == "NONE":
            # Bandwidth-optimized edge path.  The first edge-MLP layer
            # splits as concat(feat, rel) @ W0 == feat @ W0a + rel @ W0b,
            # so feat @ W0a runs ONCE per vertex on the MXU (16K rows)
            # instead of once per edge (millions), the per-edge concat
            # disappears, and the per-edge gather moves the projected
            # features in the compute dtype (bf16 halves the dominant
            # HBM traffic).  Mathematically identical to the reference
            # edge MLP (gnn.py:353-365) for the shipped NONE-norm configs.
            # The relative-coordinate term also enters linearly, so it
            # folds into two per-vertex tables:
            #   hidden = act(concat(feat, s_xyz - d_xyz) @ W0 + b0)
            #          = act(A[src] - B[dst])
            #   A = feat @ W0a + s_xyz @ W0b + b0,  B = shifted_xyz @ W0b
            # leaving ONE gather per edge and no per-edge small matmuls.
            ep = params["edge_mlp"]
            w0, b0 = ep[0]["w"], ep[0]["b"]
            c = vertex_features.shape[1]
            cd = compute_dtype or vertex_features.dtype
            w0b = w0[c:]
            table_a = (
                vertex_features @ w0[:c] + vertex_xyz.astype(w0.dtype) @ w0b
                + b0
            ).astype(cd)
            table_b = (shifted_xyz.astype(w0.dtype) @ w0b).astype(cd)
            act = mlp.ACTIVATIONS[edge_MLP_activation_type]

            if (
                slab is not None
                and self._agg_name == "max"
                and edge_MLP_activation_type == "ReLU"
            ):
                # Slab mode: no edge list exists — the fused kernel
                # (nn/pallas_kernels.slab_edge_max) performs the exact
                # uncapped radius search, the edge MLP, and the
                # per-center max over cell-sorted vertex rows.
                from pointgnn_tpu.nn import pallas_kernels as pk

                maskb = (
                    vertex_mask.astype(bool)
                    if vertex_mask is not None
                    else jnp.ones((n,), bool)
                )
                pad1 = jnp.zeros((n, 1), jnp.float32)
                xyz4 = jnp.concatenate(
                    [vertex_xyz.astype(jnp.float32), pad1], axis=1
                )
                src4 = jnp.where(maskb[:, None], xyz4, 1e6)
                ctr4 = jnp.where(maskb[:, None], xyz4, -1e6)
                tail_weights = []
                for layer in ep[1:]:
                    tail_weights += [layer["w"], layer["b"]]
                slab_fn = (
                    pk.slab_edge_max_train if slab.get("train")
                    else pk.slab_edge_max
                )
                tuning = {
                    k: slab[k]
                    for k in ("block_centers", "tile", "sub",
                              "zscan")
                    if k in slab
                }
                agg = slab_fn(
                    table_a.astype(jnp.float32), src4,
                    table_b.astype(jnp.float32), ctr4,
                    slab["offsets"], slab["center_cell"],
                    tuple(tail_weights),
                    grid_g=slab["grid_g"], radius=slab["radius"],
                    halo=slab.get("halo", 1),
                    compute_dtype=jnp.dtype(cd).name,
                    interpret=(jax.default_backend() != "tpu"),
                    **tuning,
                )
                agg = agg.astype(vertex_features.dtype)
                update = mlp.apply_mlp(
                    params["update_mlp"], agg, is_logits=True,
                    normalization_type=update_MLP_normalization_type,
                    activation_type=update_MLP_activation_type,
                    mask=vertex_mask, compute_dtype=compute_dtype,
                    bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                    bn_prefix=bn_prefix + ("update_mlp",),
                )
                out = update + vertex_features
                if vertex_mask is not None:
                    out = out * vertex_mask[:, None].astype(out.dtype)
                return out

            if (
                pallas_tail
                and self._agg_name == "max"
                and edge_sentinel == "src"
                and edge_MLP_activation_type == "ReLU"
                and edges_src.shape[0] % n == 0
            ):
                # Fused inference tail (nn/pallas_kernels.edge_tail_max):
                # XLA performs the one [E, H] row gather; the kernel
                # fuses subtract/ReLU/dense-chain/masked-max in VMEM so
                # no other [E, H] intermediate touches HBM.  Requires
                # the device builder's blocked src-sentinel layout
                # (dst of slot (c, s) is always center c).
                from pointgnn_tpu.nn import pallas_kernels as pk

                s = edges_src.shape[0] // n
                gathered = table_a[jnp.minimum(edges_src, n - 1)]
                slot_valid = (
                    (edges_src < n).reshape(n, s).astype(jnp.float32)
                )
                tail_weights = []
                for layer in ep[1:]:
                    tail_weights += [
                        layer["w"].astype(cd), layer["b"].astype(cd)
                    ]
                agg = pk.edge_tail_max(
                    gathered, table_b, slot_valid, tuple(tail_weights),
                    interpret=(jax.default_backend() != "tpu"),
                )
                agg = agg.astype(vertex_features.dtype)
                update = mlp.apply_mlp(
                    params["update_mlp"], agg, is_logits=True,
                    normalization_type=update_MLP_normalization_type,
                    activation_type=update_MLP_activation_type,
                    mask=vertex_mask, compute_dtype=compute_dtype,
                    bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                    bn_prefix=bn_prefix + ("update_mlp",),
                )
                out = update + vertex_features  # residual (gnn.py:372)
                if vertex_mask is not None:
                    out = out * vertex_mask[:, None].astype(out.dtype)
                return out

            def edge_fn(src, dst_raw):
                dst = jnp.minimum(dst_raw, n - 1)
                h = table_a[src] - table_b[dst]
                if act is not None:
                    h = act(h)
                for layer in ep[1:]:
                    h = h @ layer["w"].astype(cd) + layer["b"].astype(cd)
                    if act is not None:
                        h = act(h)
                return h

        else:
            def edge_fn(src, dst_raw):
                # source side uses the *unshifted* coordinates
                # (gnn.py:337-339)
                s_feat = vertex_features[src]
                s_xyz = vertex_xyz[src]
                d_xyz = shifted_xyz[jnp.minimum(dst_raw, n - 1)]
                edge_in = jnp.concatenate(
                    [s_feat, (s_xyz - d_xyz).astype(s_feat.dtype)], axis=-1
                )
                return mlp.apply_mlp(
                    params["edge_mlp"], edge_in, is_logits=False,
                    normalization_type=edge_MLP_normalization_type,
                    activation_type=edge_MLP_activation_type,
                    compute_dtype=compute_dtype,
                    # full-length closure mask: BN forces edge_chunks=1
                    # so edge_fn sees the whole edge list in one call
                    mask=edge_bn_mask,
                    bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                    bn_prefix=bn_prefix + ("edge_mlp",),
                )

        edge_fn, edges_sorted = _apply_sentinel(
            edge_fn, edge_sentinel, n, self._agg_name, edges_sorted
        )

        if blocked_edges and self._agg_name == "max":
            # device-built graphs block edges as [n, S] per center: the
            # per-center max is a reshape + reduce, no segment scatter
            s = blocked_edges
            h = edge_fn(edges_src, edges_dst)
            slot_valid = (
                (edges_dst.reshape(n, s) < n)
                & (edges_src.reshape(n, s) < n)
            )[:, :, None]
            hh = jnp.where(
                slot_valid, h.reshape(n, s, -1), jnp.asarray(-jnp.inf, h.dtype)
            )
            agg = jnp.max(hh, axis=1)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        else:
            agg = chunked_aggregate(
                edge_fn, edges_src, edges_dst, n,
                out_dim=edge_MLP_depth_list[-1],
                aggregation=self._agg_name,
                num_chunks=edge_chunks,
                # aggregate in the compute dtype: the [E, width] edge
                # tensor dominates HBM traffic; max-reduction dtype-safe
                dtype=compute_dtype or vertex_features.dtype,
                sorted=edges_sorted,
            )
        agg = agg.astype(vertex_features.dtype)
        update = mlp.apply_mlp(
            params["update_mlp"], agg, is_logits=True,
            normalization_type=update_MLP_normalization_type,
            activation_type=update_MLP_activation_type,
            mask=vertex_mask, compute_dtype=compute_dtype,
            bn_use_stored=bn_use_stored, bn_collect=bn_collect,
            bn_prefix=bn_prefix + ("update_mlp",),
        )
        out = update + vertex_features  # residual (gnn.py:372)
        if vertex_mask is not None:
            out = out * vertex_mask[:, None].astype(out.dtype)
        return out


class ClassAwarePredictor:
    """Shared cls head + per-class loc heads (gnn.py:121-163)."""

    def __init__(self, cls_Ks=(64,), loc_Ks=(64, 64), separated=False):
        self._cls_Ks = tuple(cls_Ks)
        self._loc_Ks = tuple(loc_Ks)
        self._separated = separated

    def init(
        self,
        key,
        in_dim: int,
        num_classes: int,
        box_encoding_len: int,
        normalization_type: str = "NONE",
        **_unused,
    ):
        keys = jax.random.split(key, num_classes + 1)
        loc_in = in_dim // num_classes if self._separated else in_dim
        return {
            "cls": mlp.init_fc(
                keys[0], in_dim, self._cls_Ks, num_classes,
                normalization_type,
            ),
            "loc": [
                mlp.init_fc(
                    keys[i + 1], loc_in, self._loc_Ks, box_encoding_len,
                    normalization_type,
                )
                for i in range(num_classes)
            ],
        }

    def apply(
        self,
        params,
        features,           # [N, C]
        num_classes: int,
        box_encoding_len: int,
        normalization_type="fused_BN_center",
        activation_type="ReLU",
        vertex_mask=None,
        compute_dtype=None,
        bn_use_stored=False,
        bn_collect=None,
        bn_prefix=(),
    ):
        logits = mlp.apply_fc(
            params["cls"], features, is_logits=True,
            normalization_type=normalization_type,
            activation_type=activation_type, mask=vertex_mask,
            compute_dtype=compute_dtype,
            bn_use_stored=bn_use_stored, bn_collect=bn_collect,
            bn_prefix=bn_prefix + ("cls",),
        )
        if self._separated:
            splits = jnp.split(features, num_classes, axis=-1)
        box_parts = []
        for ci in range(num_classes):
            fin = splits[ci] if self._separated else features
            enc = mlp.apply_fc(
                params["loc"][ci], fin, is_logits=True,
                normalization_type=normalization_type,
                activation_type=activation_type, mask=vertex_mask,
                compute_dtype=compute_dtype,
                bn_use_stored=bn_use_stored, bn_collect=bn_collect,
                bn_prefix=bn_prefix + ("loc", ci),
            )
            box_parts.append(enc[:, None, :])
        box_encodings = jnp.concatenate(box_parts, axis=1)
        return logits, box_encodings
