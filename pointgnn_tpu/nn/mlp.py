"""MLP building blocks with the reference's registry semantics.

Functional parity with /root/reference/models/gnn.py:9-104:

- ``multi_layer_neural_network_fn`` ≡ :func:`apply_mlp` with
  ``is_logits`` controlling whether the last layer is linear;
- ``multi_layer_fc_fn`` ≡ :func:`apply_fc` (hidden widths + output
  width, last layer linear when ``is_logits``);
- normalization registry {fused_BN_center, BN, BN_center, IN, NONE} and
  activation registry {ReLU, ReLU6, LeakyReLU, ELU, NONE, Sigmoid,
  Tanh}.

TPU notes: parameters are plain pytrees (lists of ``{"w", "b"}``);
matmuls run through :func:`dense` which casts to a configurable compute
dtype (bfloat16 on TPU) while accumulating in float32
(``preferred_element_type``).  All normalizations accept a row validity
mask so padded rows never contaminate batch statistics.
"""

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# activations (gnn.py:24-32 registry parity)
# ---------------------------------------------------------------------------

ACTIVATIONS = {
    "ReLU": jax.nn.relu,
    "ReLU6": lambda x: jnp.clip(x, 0.0, 6.0),
    "LeakyReLU": partial(jax.nn.leaky_relu, negative_slope=0.01),
    "ELU": jax.nn.elu,
    "NONE": None,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
}

NORMALIZATIONS = ("fused_BN_center", "BN", "BN_center", "IN", "NONE")


def glorot_uniform(key, shape, dtype=jnp.float32):
    """TF-slim fully_connected default initializer (xavier uniform)."""
    fan_in, fan_out = shape[0], shape[1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_dense(key, in_dim: int, out_dim: int) -> dict:
    return {
        "w": glorot_uniform(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def dense(params, x, compute_dtype=None):
    """x @ w + b with optional low-precision compute, f32 accumulation."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


# ---------------------------------------------------------------------------
# masked normalizations
# ---------------------------------------------------------------------------

def _masked_moments(x, mask):
    """Mean/variance over axis 0 counting only rows where mask==1."""
    if mask is None:
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
        return mean, var
    m = mask.reshape(-1, 1).astype(x.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=0, keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=0, keepdims=True) / count
    return mean, var


def instance_norm(x, mask=None, eps=1e-12):
    """Feature-axis-0 normalization without learned affine
    (gnn.py:9-15 'IN': zero-mean unit-variance per channel)."""
    mean, var = _masked_moments(x, mask)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def batch_norm(
    x, norm_params, mask=None, center=True, eps=1e-3,
    use_stored=False, collect=None, collect_key=None,
):
    """BN over the vertex axis with optional learned center/scale.

    The reference uses slim.batch_norm (center=True, scale=False by
    default; 'BN' disables center; epsilon 1e-3, slim defaults).

    - ``use_stored=False`` (training): normalize with masked BATCH
      statistics — slim's ``is_training=True``.
    - ``use_stored=True`` (eval/test): normalize with the moving
      averages stored in ``norm_params["ema_mean"/"ema_var"]`` —
      slim's ``is_training=False``.  Initialized (0, 1) like slim's
      ``moving_mean``/``moving_variance``; updated by the train step
      (parallel/step.py) from stats collected here.
    - ``collect``: a dict; when given (train), stop-gradient sufficient
      statistics ``(sum, sum_sq, count)`` of the masked rows are
      recorded under ``collect_key`` — exact to combine across devices
      (psum) and convert to (mean, var) for the EMA update.
    """
    if use_stored:
        mean = norm_params["ema_mean"][None, :]
        var = norm_params["ema_var"][None, :]
    else:
        mean, var = _masked_moments(x, mask)
        if collect is not None:
            if mask is None:
                s1 = jnp.sum(x, axis=0)
                s2 = jnp.sum(jnp.square(x), axis=0)
                n = jnp.asarray(float(x.shape[0]), x.dtype)
            else:
                m = mask.reshape(-1, 1).astype(x.dtype)
                s1 = jnp.sum(x * m, axis=0)
                s2 = jnp.sum(jnp.square(x) * m, axis=0)
                n = jnp.sum(m)
            collect[collect_key] = jax.lax.stop_gradient((s1, s2, n))
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if center and norm_params is not None:
        y = y + norm_params["beta"]
    return y


BN_TYPES = ("fused_BN_center", "BN_center", "BN")


def init_norm(norm_type: str, dim: int):
    """Per-layer normalization state.  BN-family layers carry slim-style
    moving averages (moving_mean 0 / moving_variance 1) next to the
    learned center; they are updated by the training loop, not the
    optimizer (zero gradient; regularizers only touch ``"w"`` leaves)."""
    if norm_type in ("fused_BN_center", "BN_center"):
        return {
            "beta": jnp.zeros((dim,), jnp.float32),
            "ema_mean": jnp.zeros((dim,), jnp.float32),
            "ema_var": jnp.ones((dim,), jnp.float32),
        }
    if norm_type == "BN":
        return {
            "ema_mean": jnp.zeros((dim,), jnp.float32),
            "ema_var": jnp.ones((dim,), jnp.float32),
        }
    return None


def apply_norm(
    norm_type, norm_params, x, mask=None,
    use_stored=False, collect=None, collect_key=None,
):
    if norm_type == "NONE":
        return x
    if norm_type == "IN":
        return instance_norm(x, mask)
    if norm_type in ("fused_BN_center", "BN_center"):
        return batch_norm(
            x, norm_params, mask, center=True,
            use_stored=use_stored, collect=collect,
            collect_key=collect_key,
        )
    if norm_type == "BN":
        return batch_norm(
            x, norm_params, mask, center=False,
            use_stored=use_stored, collect=collect,
            collect_key=collect_key,
        )
    raise ValueError("unknown normalization: %s" % norm_type)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

def init_mlp(key, in_dim: int, Ks: Sequence[int], normalization_type="NONE"):
    """Parameters for a stack of dense layers with widths ``Ks``."""
    params = []
    dims = [in_dim] + list(Ks)
    keys = jax.random.split(key, len(Ks))
    for i, k in enumerate(keys):
        layer = init_dense(k, dims[i], dims[i + 1])
        layer["norm"] = init_norm(normalization_type, dims[i + 1])
        params.append(layer)
    return params


def apply_mlp(
    params: List[dict],
    x,
    is_logits: bool = False,
    normalization_type: str = "NONE",
    activation_type: str = "ReLU",
    mask=None,
    compute_dtype=None,
    bn_use_stored: bool = False,
    bn_collect=None,
    bn_prefix=(),
):
    """``multi_layer_neural_network_fn`` parity (gnn.py:86-104).

    ``is_logits=True`` leaves the final layer linear (no act/norm).
    ``bn_use_stored``/``bn_collect``/``bn_prefix``: BN moving-average
    plumbing (see :func:`batch_norm`); stats are keyed
    ``bn_prefix + (layer_index,)``.
    """
    act = ACTIVATIONS[activation_type]
    n = len(params)
    for i, layer in enumerate(params):
        x = dense(layer, x, compute_dtype)
        last = i == n - 1
        if not (is_logits and last):
            x = apply_norm(
                normalization_type, layer["norm"], x, mask,
                use_stored=bn_use_stored, collect=bn_collect,
                collect_key=bn_prefix + (i,),
            )
            if act is not None:
                x = act(x)
    return x


def init_fc(
    key, in_dim: int, Ks: Sequence[int], out_dim: int,
    normalization_type="NONE",
):
    """Parameters for ``multi_layer_fc_fn``: hidden widths + output."""
    return init_mlp(
        key, in_dim, list(Ks) + [out_dim], normalization_type
    )


def apply_fc(
    params, x, is_logits=True, normalization_type="NONE",
    activation_type="ReLU", mask=None, compute_dtype=None,
    bn_use_stored=False, bn_collect=None, bn_prefix=(),
):
    """``multi_layer_fc_fn`` parity (gnn.py:34-84): hidden layers always
    act+norm; output layer linear iff ``is_logits``."""
    return apply_mlp(
        params, x, is_logits=is_logits,
        normalization_type=normalization_type,
        activation_type=activation_type, mask=mask,
        compute_dtype=compute_dtype,
        bn_use_stored=bn_use_stored, bn_collect=bn_collect,
        bn_prefix=bn_prefix,
    )


def _updated_at(tree, path, fn):
    """Functional update: replace ``tree[path[0]]...[path[-1]]`` with
    ``fn(leaf)``, shallow-copying only the nodes along the path."""
    if not path:
        return fn(tree)
    head = path[0]
    if isinstance(tree, dict):
        new = dict(tree)
        new[head] = _updated_at(tree[head], path[1:], fn)
        return new
    if isinstance(tree, (list, tuple)):
        new = list(tree)
        new[head] = _updated_at(tree[head], path[1:], fn)
        return tuple(new) if isinstance(tree, tuple) else new
    raise TypeError("cannot index %r with %r" % (type(tree), head))


def update_bn_ema(params, stats, decay=0.999):
    """Fold collected BN sufficient statistics into the moving averages.

    ``stats``: ``{path: (sum, sum_sq, count)}`` where ``path`` indexes
    ``params`` down to the dense-layer dict whose ``["norm"]`` carries
    ``ema_mean``/``ema_var``.  Counts may be summed across devices
    first (psum) — the statistics are exact under addition.  Matches
    slim's ``moving_mean/var`` assign_moving_average (decay default
    0.999, zero_debias=False).
    """
    for path, (s1, s2, n) in stats.items():

        def upd(layer, s1=s1, s2=s2, n=n):
            cnt = jnp.maximum(n, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            norm = dict(layer["norm"])
            norm["ema_mean"] = (
                decay * norm["ema_mean"] + (1.0 - decay) * mean
            )
            norm["ema_var"] = (
                decay * norm["ema_var"] + (1.0 - decay) * var
            )
            out = dict(layer)
            out["norm"] = norm
            return out

        params = _updated_at(params, tuple(path), upd)
    return params


def l1_regularizer(scale):
    return lambda w: scale * jnp.sum(jnp.abs(w))


def l2_regularizer(scale):
    return lambda w: scale * 0.5 * jnp.sum(jnp.square(w))


def l1_l2_regularizer(scale_l1=1.0, scale_l2=1.0):
    return lambda w: scale_l1 * jnp.sum(jnp.abs(w)) + scale_l2 * 0.5 * jnp.sum(
        jnp.square(w)
    )


REGULARIZERS = {
    "l1": l1_regularizer,
    "l2": l2_regularizer,
    "l1_l2": l1_l2_regularizer,
}


def regularization_loss(params_tree, reg_fn):
    """Sum ``reg_fn`` over every dense kernel (slim regularizes weights,
    not biases: models.py:113-115 arg_scope)."""
    total = 0.0
    for leaf_path, leaf in jax.tree_util.tree_leaves_with_path(params_tree):
        if leaf_path and getattr(leaf_path[-1], "key", None) == "w":
            total = total + reg_fn(leaf)
    return total
