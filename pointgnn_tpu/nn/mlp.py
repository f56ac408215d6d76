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


def batch_norm(x, norm_params, mask=None, center=True, eps=1e-3):
    """BN over the vertex axis with optional learned center/scale.

    The reference uses slim.batch_norm (center=True, scale=False by
    default; 'BN' disables center).  Statistics here are ALWAYS batch
    statistics masked to valid rows — the reference's training-time
    behavior.  No moving averages are maintained anywhere, so test-mode
    evaluation under BN would diverge from slim's eval semantics;
    PointGNN refuses BN configs at mode="test" for that reason.  The
    shipped configs all use normalization 'NONE'.
    """
    mean, var = _masked_moments(x, mask)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if center and norm_params is not None:
        y = y + norm_params["beta"]
    return y


def init_norm(norm_type: str, dim: int):
    if norm_type in ("fused_BN_center", "BN_center"):
        return {"beta": jnp.zeros((dim,), jnp.float32)}
    return None


def apply_norm(norm_type, norm_params, x, mask=None):
    if norm_type == "NONE":
        return x
    if norm_type == "IN":
        return instance_norm(x, mask)
    if norm_type in ("fused_BN_center", "BN_center"):
        return batch_norm(x, norm_params, mask, center=True)
    if norm_type == "BN":
        return batch_norm(x, None, mask, center=False)
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
):
    """``multi_layer_neural_network_fn`` parity (gnn.py:86-104).

    ``is_logits=True`` leaves the final layer linear (no act/norm).
    """
    act = ACTIVATIONS[activation_type]
    n = len(params)
    for i, layer in enumerate(params):
        x = dense(layer, x, compute_dtype)
        last = i == n - 1
        if not (is_logits and last):
            x = apply_norm(normalization_type, layer["norm"], x, mask)
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
):
    """``multi_layer_fc_fn`` parity (gnn.py:34-84): hidden layers always
    act+norm; output layer linear iff ``is_logits``."""
    return apply_mlp(
        params, x, is_logits=is_logits,
        normalization_type=normalization_type,
        activation_type=activation_type, mask=mask,
        compute_dtype=compute_dtype,
    )


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
