"""Reference (TF1/slim) checkpoint -> pointgnn_tpu parameter tree.

The reference trains with TF 1.15 slim layers; its checkpoints
(e.g. /root/reference/checkpoints/car_auto_T3_train) store variables
named by the nesting of ``tf.variable_scope`` calls:

- each layer config wraps its variables in ``layer_config['scope']``
  (models.py:128, 156);
- PointSetPooling builds the point MLP under
  ``extract_vertex_features`` and the output MLP under
  ``combined_features`` (gnn.py:258, 268);
- GraphNetAutoCenter builds the auto-offset MLP directly in the layer
  scope (gnn.py:341-346, before any inner scope), the edge MLP under
  ``extract_vertex_features`` (gnn.py:353) and the update MLP under
  ``combined_features`` (gnn.py:367);
- predictors nest ``predictor/cls`` and ``predictor/loc/cls_<i>``
  (gnn.py:146-163);
- within one scope, slim names consecutive dense layers
  ``fully_connected``, ``fully_connected_1``, ... with variables
  ``weights`` [in, out] and ``biases`` [out] — the same orientation as
  our ``{"w", "b"}`` dense params, so no transposes are needed.

Because TF 1.x is not a dependency of this framework, the converter
consumes a plain ``.npz`` mapping variable names to arrays.  Dump one
from a reference checkpoint on any machine with TF installed:

    import numpy as np, tensorflow as tf
    r = tf.train.NewCheckpointReader("checkpoints/car_auto_T3_train/model-1400000")
    np.savez("car_T3.npz", **{k: r.get_tensor(k)
                              for k in r.get_variable_to_shape_map()})

then convert with ``tools/convert_reference_checkpoint.py``.

Only NONE-normalization configs are supported (all seven shipped
reference checkpoints use NONE).  BN configs now have slots for slim's
beta/moving_mean/moving_variance (nn/mlp.init_norm) — extend
``reference_name_map`` with the ``BatchNorm/*`` variable names if a BN
reference checkpoint ever needs converting.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np

_POOLING_TYPES = ("scatter_max_point_set_pooling",)
_GNN_TYPES = ("scatter_max_graph_auto_center_net",)
_PREDICTOR_TYPES = (
    "classaware_predictor",
    "classaware_predictor_128",
    "classaware_separated_predictor",
)


def _fc_name(prefix: str, j: int, var: str) -> str:
    fc = "fully_connected" if j == 0 else "fully_connected_%d" % j
    return "/".join(p for p in (prefix, fc, var) if p)


def _mlp_names(prefix: str, n_layers: int) -> List[Tuple[str, str]]:
    """(weights, biases) names of an n-layer dense stack under prefix."""
    return [
        (_fc_name(prefix, j, "weights"), _fc_name(prefix, j, "biases"))
        for j in range(n_layers)
    ]


def reference_name_map(
    layer_configs: Sequence[dict], num_classes: int
) -> Dict[str, List[List[Tuple[str, str]]]]:
    """Map our param tree onto reference variable names.

    Returns ``{scope: {mlp_key: [(w_name, b_name), ...]}}`` with the
    predictor's per-class loc heads under ``("loc", class_idx)``.
    """
    out = {}
    for cfg in layer_configs:
        scope, typ, kw = cfg["scope"], cfg["type"], cfg["kwargs"]
        entry = {}
        if typ in _POOLING_TYPES:
            entry["point_mlp"] = _mlp_names(
                scope + "/extract_vertex_features",
                len(kw["point_MLP_depth_list"]),
            )
            entry["output_mlp"] = _mlp_names(
                scope + "/combined_features",
                len(kw["output_MLP_depth_list"]),
            )
        elif typ in _GNN_TYPES:
            if kw.get("auto_offset", False):
                entry["auto_offset_mlp"] = _mlp_names(
                    scope, len(kw["auto_offset_MLP_depth_list"])
                )
            entry["edge_mlp"] = _mlp_names(
                scope + "/extract_vertex_features",
                len(kw["edge_MLP_depth_list"]),
            )
            entry["update_mlp"] = _mlp_names(
                scope + "/combined_features",
                len(kw["update_MLP_depth_list"]),
            )
        elif typ in _PREDICTOR_TYPES:
            # multi_layer_fc_fn: len(Ks) hidden + 1 output layer
            # cls head: Ks=(64,) or (128,) -> 2 dense layers
            entry["cls"] = _mlp_names(scope + "/predictor/cls", 2)
            # loc heads: Ks=(64, 64) or (128, 128) -> 3 dense layers
            entry[("loc",)] = [
                _mlp_names(scope + "/predictor/loc/cls_%d" % ci, 3)
                for ci in range(num_classes)
            ]
        else:
            raise ValueError("unknown layer type: %s" % typ)
        out[scope] = entry
    return out


def convert_reference_weights(
    tf_vars: Dict[str, np.ndarray],
    layer_configs: Sequence[dict],
    num_classes: int,
) -> Dict:
    """Build our parameter pytree from reference checkpoint arrays.

    ``tf_vars`` maps TF variable names (no ``:0`` suffix) to numpy
    arrays; optimizer slots / global_step are ignored.  Raises KeyError
    listing any missing variable.
    """
    name_map = reference_name_map(layer_configs, num_classes)
    missing = []

    def fetch(name):
        if name not in tf_vars:
            missing.append(name)
            return None
        return np.asarray(tf_vars[name], np.float32)

    def stack(pairs):
        return [
            {"w": fetch(wn), "b": fetch(bn), "norm": None}
            for wn, bn in pairs
        ]

    params = {}
    for scope, entry in name_map.items():
        p = {}
        for key, pairs in entry.items():
            if key == ("loc",):
                p["loc"] = [stack(ps) for ps in pairs]
            else:
                p[key] = stack(pairs)
        params[scope] = p
    if missing:
        raise KeyError(
            "reference checkpoint is missing %d expected variables, "
            "e.g. %s" % (len(missing), missing[:5])
        )
    return params


def used_variable_names(
    layer_configs: Sequence[dict], num_classes: int
) -> List[str]:
    """Every TF variable name the converter consumes (for audits)."""
    names = []
    for entry in reference_name_map(layer_configs, num_classes).values():
        for key, pairs in entry.items():
            groups = pairs if key == ("loc",) else [pairs]
            for g in groups:
                for wn, bn in g:
                    names += [wn, bn]
    return names
