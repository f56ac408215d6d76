"""Config-driven Point-GNN model (the reference's
``multi_layer_fast_local_graph_model_v2``) as one jittable program.

Parity with /root/reference/models/models.py:22-319: the same
``layer_configs`` schema (scope/type/graph_level/kwargs), the same five
layer types, the same loss options, and a registry keyed by the same
model name.  The forward consumes a :class:`~pointgnn_tpu.graph.pad.PaddedGraph`
so the whole predict+loss compiles once for a capacity bucket.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pointgnn_tpu.graph.pad import PaddedGraph
from pointgnn_tpu.model import losses as L
from pointgnn_tpu.nn import mlp
from pointgnn_tpu.nn.layers import (
    ClassAwarePredictor,
    GraphNetAutoCenter,
    PointSetPooling,
)

_POOLING_TYPES = {"scatter_max_point_set_pooling": "max"}
_GNN_TYPES = {"scatter_max_graph_auto_center_net": "max"}
_PREDICTOR_TYPES = {
    "classaware_predictor": dict(cls_Ks=(64,), loc_Ks=(64, 64)),
    "classaware_predictor_128": dict(cls_Ks=(128,), loc_Ks=(128, 128)),
    "classaware_separated_predictor": dict(
        cls_Ks=(64,), loc_Ks=(64, 64), separated=True
    ),
}


class PointGNN:
    """Multi-layer local graph model over padded multi-level graphs."""

    def __init__(
        self,
        num_classes: int,
        box_encoding_len: int,
        layer_configs,
        regularizer_type: Optional[str] = None,
        regularizer_kwargs: Optional[dict] = None,
        mode: str = "train",
        compute_dtype=None,
        remat: Optional[bool] = None,
        edge_chunks: Optional[int] = None,
        blocked_edges=None,
        edges_sorted: bool = True,
        edge_sentinel: str = "dst",
        pallas_tail: bool = False,
        slab_level1: Optional[dict] = None,
        slab_level0: Optional[dict] = None,
    ):
        assert mode in ("train", "eval", "test")
        self.num_classes = num_classes
        self.box_encoding_len = box_encoding_len
        self.layer_configs = list(layer_configs)
        self.mode = mode
        self.compute_dtype = compute_dtype
        # Rematerialize each layer during training: the edge-MLP
        # activations ([E_cap, width] per MLP layer) dominate HBM at
        # full capacity; recomputing them in the backward pass trades a
        # second forward for gigabytes of activation memory.
        self.remat = (mode == "train") if remat is None else remat
        # Stream the edge MLP + segment reduce in chunks under lax.scan:
        # bounds live edge activations to E/edge_chunks rows in forward
        # AND backward (see nn.segment.chunked_aggregate).  Training
        # needs this to fit multi-million-edge capacities in HBM.
        if edge_chunks is None:
            edge_chunks = 16 if mode == "train" else 1
        self.edge_chunks = edge_chunks
        # per-graph-level blocked edge layout ([K, S] per center, from
        # the on-device builder): enables scatter-free blocked max
        self.blocked_edges = blocked_edges
        # device-built graphs interleave sentinel slots between center
        # blocks — their edges are NOT dst-sorted; claiming sortedness
        # silently corrupts TPU segment reductions at some shapes
        self.edges_sorted = edges_sorted
        # padding convention: "dst" (host graphs) or "src" (device)
        self.edge_sentinel = edge_sentinel
        # fused Pallas inference tail over the blocked src-sentinel
        # layout (nn/pallas_kernels.edge_tail_max); inference only
        self.pallas_tail = pallas_tail and mode != "train"
        # slab mode for level-1 GNN layers / the level-0 set-pooling
        # layer: static {"grid_g", "radius"} matching the graph's slab
        # metadata (device_builder); the layers then run the fused
        # radius-search kernel instead of consuming an edge list.  In
        # train mode the layers dispatch to the custom-VJP variant
        # (nn/pallas_kernels.slab_edge_max_train): the backward kernel
        # re-runs the radius search and routes cotangents to the
        # per-channel max winners, so training needs no edge lists
        # either — and trains on the exact UNCAPPED graph (the runtime
        # semantics), removing the train/test neighbor-cap mismatch
        # (docs/PERF_NOTES.md).
        if mode == "train":
            if slab_level1 is not None:
                slab_level1 = dict(slab_level1, train=True)
            if slab_level0 is not None:
                slab_level0 = dict(slab_level0, train=True)
        self.slab_level1 = slab_level1
        self.slab_level0 = slab_level0
        # BN-family normalizations: train mode normalizes with masked
        # BATCH statistics (slim's is_training=True, gnn.py:9-23) and
        # the train step folds the collected statistics into slim-style
        # moving averages stored next to each layer's beta
        # (nn/mlp.init_norm, parallel/step.py); eval/test modes
        # normalize with those stored averages (is_training=False).
        # Every shipped config uses NONE, so this path is latent.
        bn_types = set(mlp.BN_TYPES)
        self._has_bn = any(
            key.endswith("normalization_type") and val in bn_types
            for cfg in self.layer_configs
            for key, val in cfg.get("kwargs", {}).items()
        ) or self.layer_configs[-1]["kwargs"].get(
            "normalization_type", "fused_BN_center"
        ) in bn_types
        if self._has_bn:
            # chunked edge streaming would compute BN statistics per
            # chunk; BN configs run unchunked (more HBM, smaller
            # capacities — acceptable for a non-shipped family)
            self.edge_chunks = 1
        if regularizer_type is None:
            assert not regularizer_kwargs, "No regularizer no kwargs"
            self._reg_fn = None
        else:
            self._reg_fn = mlp.REGULARIZERS[regularizer_type](
                **(regularizer_kwargs or {})
            )

        pred_cfg = self.layer_configs[-1]
        assert pred_cfg["type"] in _PREDICTOR_TYPES, pred_cfg["type"]
        self._predictor = ClassAwarePredictor(
            **_PREDICTOR_TYPES[pred_cfg["type"]]
        )
        self._layers = []
        for cfg in self.layer_configs[:-1]:
            if cfg["type"] in _POOLING_TYPES:
                self._layers.append(
                    PointSetPooling(_POOLING_TYPES[cfg["type"]])
                )
            elif cfg["type"] in _GNN_TYPES:
                self._layers.append(
                    GraphNetAutoCenter(_GNN_TYPES[cfg["type"]])
                )
            else:
                raise ValueError("unknown layer type: %s" % cfg["type"])

    # ------------------------------------------------------------------
    @property
    def output_graph_level(self) -> int:
        """Vertex level carrying the predictor outputs
        (run.py:240-242: last layer's graph_level + 1)."""
        return self.layer_configs[-1]["graph_level"] + 1

    def init(self, key, input_dim: int) -> Dict:
        params = {}
        dim = input_dim
        keys = jax.random.split(key, len(self.layer_configs))
        for i, cfg in enumerate(self.layer_configs[:-1]):
            kw = cfg["kwargs"]
            layer = self._layers[i]
            if isinstance(layer, PointSetPooling):
                params[cfg["scope"]] = layer.init(keys[i], dim, **kw)
                dim = kw["output_MLP_depth_list"][-1]
            else:
                params[cfg["scope"]] = layer.init(keys[i], dim, **kw)
                dim = kw["update_MLP_depth_list"][-1]
        pred_cfg = self.layer_configs[-1]
        params[pred_cfg["scope"]] = self._predictor.init(
            keys[-1], dim, self.num_classes, self.box_encoding_len,
            normalization_type=pred_cfg["kwargs"].get(
                "normalization_type", "fused_BN_center"
            ),
        )
        return params

    def apply(
        self,
        params,
        graph: PaddedGraph,
        is_training: bool = False,
        collect_stats: bool = False,
    ):
        """predict (models.py:79-163): returns
        ``(logits [K, num_classes], box_encodings [K, num_classes, L])``
        on the output vertex level.

        ``collect_stats=True`` (train mode, BN configs) additionally
        returns a dict of per-BN-site sufficient statistics
        ``{path: (sum, sum_sq, count)}`` keyed by the path into
        ``params`` — the train step folds them into the stored moving
        averages (mlp.update_bn_ema).  In eval/test modes BN layers
        normalize with the stored averages instead of batch statistics
        (slim's is_training=False semantics)."""
        del is_training  # mode fixed at construction
        bn_use_stored = self._has_bn and self.mode in ("eval", "test")
        collect_stats = collect_stats and self._has_bn
        all_stats = {}
        # accept host (numpy) graphs captured as jit constants
        graph = jax.tree_util.tree_map(jnp.asarray, graph)
        features = graph.features
        for i, cfg in enumerate(self.layer_configs[:-1]):
            g = cfg["graph_level"]
            kw = dict(cfg["kwargs"])
            kw["compute_dtype"] = self.compute_dtype
            kw["edge_chunks"] = self.edge_chunks
            if self.blocked_edges is not None:
                kw["blocked_edges"] = self.blocked_edges[g]
            kw["edges_sorted"] = self.edges_sorted
            kw["edge_sentinel"] = self.edge_sentinel
            kw["pallas_tail"] = self.pallas_tail
            layer = self._layers[i]
            p = params[cfg["scope"]]
            if isinstance(layer, PointSetPooling):
                if (
                    self.slab_level0 is not None
                    and g == 0
                    and graph.slab0_offsets is not None
                ):
                    kw["slab"] = dict(
                        self.slab_level0,
                        offsets=graph.slab0_offsets,
                        center_cell=graph.slab0_center_cell,
                    )
                    kw["point_mask"] = graph.vertex_mask[g]

                def run(p, features, layer=layer, g=g, kw=kw,
                        scope=cfg["scope"]):
                    stats = {}
                    out = layer.apply(
                        p,
                        features,
                        graph.vertex_xyz[g],
                        graph.vertex_xyz[g + 1],
                        graph.edges_src[g],
                        graph.edges_dst[g],
                        center_mask=graph.vertex_mask[g + 1],
                        bn_use_stored=bn_use_stored,
                        bn_collect=stats if collect_stats else None,
                        bn_prefix=(scope,),
                        **kw,
                    )
                    return out, stats
            else:
                if (
                    self.slab_level1 is not None
                    and g == 1
                    and graph.slab_offsets is not None
                ):
                    kw["slab"] = dict(
                        self.slab_level1,
                        offsets=graph.slab_offsets,
                        center_cell=graph.slab_center_cell,
                    )

                def run(p, features, layer=layer, g=g, kw=kw,
                        scope=cfg["scope"]):
                    stats = {}
                    out = layer.apply(
                        p,
                        features,
                        graph.vertex_xyz[g],
                        graph.edges_src[g],
                        graph.edges_dst[g],
                        vertex_mask=graph.vertex_mask[g],
                        bn_use_stored=bn_use_stored,
                        bn_collect=stats if collect_stats else None,
                        bn_prefix=(scope,),
                        **kw,
                    )
                    return out, stats

            # Slab-kernel layers skip remat: their custom VJP already
            # bounds residual memory (it saves only the layer INPUTS
            # and recomputes the walked-window forward inside the bwd
            # kernel), so jax.checkpoint would add a full extra forward
            # recompute to the backward for no HBM win — measured
            # ~17 ms of the 75 ms device train step
            # (docs/PERF_NOTES.md round 4).  Edge-list layers keep it:
            # their [E, H] materialized edge activations are what remat
            # + chunked streaming exist to keep out of HBM.
            if self.remat and "slab" not in kw:
                run = jax.checkpoint(run)
            features, layer_stats = run(p, features)
            all_stats.update(layer_stats)
        pred_cfg = self.layer_configs[-1]
        logits, box_encodings = self._predictor.apply(
            params[pred_cfg["scope"]],
            features,
            self.num_classes,
            self.box_encoding_len,
            vertex_mask=graph.vertex_mask[self.output_graph_level],
            compute_dtype=self.compute_dtype,
            bn_use_stored=bn_use_stored,
            bn_collect=all_stats if collect_stats else None,
            bn_prefix=(pred_cfg["scope"],),
            **pred_cfg["kwargs"],
        )
        if collect_stats:
            return logits, box_encodings, all_stats
        return logits, box_encodings

    def postprocess(self, logits):
        """models.py:165-168."""
        return jax.nn.softmax(logits, axis=-1)

    # ------------------------------------------------------------------
    def loss(
        self,
        params,
        logits,            # [K, C]
        labels,            # [K] int32
        pred_box,          # [K, C, L]
        gt_box,            # [K, L]
        valid_box,         # [K]
        endpoint_mask,     # [K]
        cls_loss_type="focal_sigmoid",
        cls_loss_kwargs=None,
        loc_loss_type="huber_loss",
        loc_loss_kwargs=None,
        loc_loss_weight=1.0,
        cls_loss_weight=1.0,
    ):
        """models.py:170-311 parity; returns the same loss_dict keys."""
        mode = self.mode

        def _select(v):
            return v[mode] if isinstance(v, dict) else v

        loc_loss_weight = _select(loc_loss_weight)
        cls_loss_weight = _select(cls_loss_weight)
        if isinstance(cls_loss_type, dict):
            cls_loss_kwargs = (cls_loss_kwargs or {})[mode]
            cls_loss_type = cls_loss_type[mode]
        if isinstance(loc_loss_type, dict):
            loc_loss_kwargs = (loc_loss_kwargs or {})[mode]
            loc_loss_type = loc_loss_type[mode]

        cls_mean, _ = L.classification_loss(
            cls_loss_type, labels, logits, endpoint_mask, cls_loss_kwargs
        )
        cls_loss = cls_loss_weight * cls_mean

        # gather the predicted encoding of each vertex's labeled class
        # (models.py:230-234 gather_nd)
        pred_sel = jnp.take_along_axis(
            pred_box, labels[:, None, None].astype(jnp.int32), axis=1
        )[:, 0, :]
        loc_loss, classwise, num_valid = L.localization_loss(
            loc_loss_type,
            pred_sel,
            gt_box,
            valid_box,
            labels,
            self.num_classes,
            loc_loss_weight=loc_loss_weight,
            loc_loss_kwargs=loc_loss_kwargs,
            apply_classwise_weight=(mode == "train"),
        )
        if self._reg_fn is not None:
            reg_loss = mlp.regularization_loss(params, self._reg_fn)
        else:
            reg_loss = jnp.zeros(())
        num_endpoint = jnp.sum(endpoint_mask)
        return {
            "cls_loss": cls_loss,
            "loc_loss": loc_loss,
            "reg_loss": reg_loss,
            "classwise_loc_loss": classwise,
            "num_endpoint": num_endpoint,
            "num_valid_endpoint": num_valid,
        }


def get_model(model_name: str):
    """models.py:313-319 registry parity."""
    models = {"multi_layer_fast_local_graph_model_v2": PointGNN}
    return models[model_name]
