"""Classification / localization losses (jnp, mask-aware).

Parity targets: /root/reference/models/loss.py (focal losses) and the
loss assembly in /root/reference/models/models.py:170-311 (softmax /
top-k softmax / focal variants for classification; huber / top-k huber
for localization, with class-wise weighting and break-down).

Padding: every reduction that the reference takes over "all endpoints"
is taken here over valid endpoints via an explicit ``endpoint_mask``;
padded rows carry zero loss by construction.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def sparse_softmax_cross_entropy(labels, logits):
    """labels [N] int, logits [N, C] → [N]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def sigmoid_cross_entropy(labels_onehot, logits):
    """Elementwise binary CE with logits, TF semantics."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels_onehot
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def focal_loss_sigmoid(labels, logits, alpha=0.5, gamma=2.0):
    """loss.py:5-29 parity: labels [N] int, logits [N, C] → [N, C]."""
    num_classes = logits.shape[1]
    prob = jax.nn.sigmoid(logits)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    ce = sigmoid_cross_entropy(onehot, logits)
    prob_t = onehot * prob + (1.0 - onehot) * (1.0 - prob)
    modulating = jnp.power(1.0 - prob_t, gamma)
    alpha_weight = onehot * alpha + (1.0 - onehot) * (1.0 - alpha)
    return modulating * alpha_weight * ce


def focal_loss_softmax(labels, logits, gamma=2.0):
    """loss.py:31-48 parity: labels [N] int, logits [N, C] → [N]."""
    probs = jax.nn.softmax(logits, axis=-1)
    ce = sparse_softmax_cross_entropy(labels, logits)
    p_t = jnp.take_along_axis(probs, labels[:, None], axis=1)[:, 0]
    return jnp.power(1.0 - p_t, gamma) * ce


def huber(x, delta=1.0):
    """tf.losses.huber_loss elementwise: quadratic below delta."""
    absx = jnp.abs(x)
    quad = jnp.minimum(absx, delta)
    lin = absx - quad
    return 0.5 * quad * quad + delta * lin


def masked_mean(values, mask):
    """Mean over entries where mask==1 (0 if empty, like div_no_nan)."""
    m = mask.astype(values.dtype)
    while m.ndim < values.ndim:
        m = m[..., None]
    denom = jnp.sum(m) * (values.size / mask.size)
    s = jnp.sum(values * m)
    return jnp.where(denom > 0, s / jnp.maximum(denom, 1.0), 0.0)


def classification_loss(
    cls_loss_type: str,
    labels,            # [N] int32
    logits,            # [N, C]
    endpoint_mask,     # [N] 1=valid
    cls_loss_kwargs: Optional[dict] = None,
):
    """Returns (scalar mean loss over valid endpoints, per-point loss)."""
    cls_loss_kwargs = dict(cls_loss_kwargs or {})
    if cls_loss_type in ("softmax", "top_k_softmax"):
        point_loss = sparse_softmax_cross_entropy(labels, logits)
    elif cls_loss_type == "focal_sigmoid":
        point_loss = focal_loss_sigmoid(
            labels, logits,
            alpha=cls_loss_kwargs.pop("alpha", 0.5),
            gamma=cls_loss_kwargs.pop("gamma", 2.0),
        )
    elif cls_loss_type == "focal_softmax":
        point_loss = focal_loss_softmax(
            labels, logits, gamma=cls_loss_kwargs.pop("gamma", 2.0)
        )
    else:
        raise ValueError("unknown cls_loss_type: %s" % cls_loss_type)

    mask = endpoint_mask.astype(logits.dtype)
    if point_loss.ndim == 2:
        point_loss = point_loss * mask[:, None]
    else:
        point_loss = point_loss * mask

    if cls_loss_type == "top_k_softmax":
        k = int(cls_loss_kwargs["k"])
        top_vals, _ = jax.lax.top_k(point_loss, k)
        mean = jnp.mean(top_vals)
    else:
        mean = masked_mean(point_loss, mask)
    return mean, point_loss


def localization_loss(
    loc_loss_type: str,
    pred_box,          # [N, 7] — the predicted encoding of the gt class
    gt_box,            # [N, 7]
    valid_box,         # [N] 1 = vertex belongs to a real object
    labels,            # [N] int32 (for classwise breakdown)
    num_classes: int,
    loc_loss_weight: float = 1.0,
    loc_loss_kwargs: Optional[dict] = None,
    delta: float = 1.0,
    apply_classwise_weight: bool = True,
):
    """Returns (loc_loss scalar, classwise [num_classes, 7], num_valid).

    Mirrors models.py:236-303: huber per box dim weighted by validity,
    optional per-class loss weights, top-k variant selecting the
    hardest vertices.
    """
    loc_loss_kwargs = dict(loc_loss_kwargs or {})
    valid = valid_box.astype(pred_box.dtype)
    all_loc = loc_loss_weight * huber(gt_box - pred_box, delta) * valid[:, None]
    if (
        "classwise_loc_loss_weight" in loc_loss_kwargs
        and apply_classwise_weight
    ):
        w = jnp.asarray(
            loc_loss_kwargs["classwise_loc_loss_weight"], pred_box.dtype
        )
        all_loc = all_loc * w[labels][:, None]

    per_vertex = jnp.mean(all_loc, axis=1)  # [N]

    if loc_loss_type == "huber_loss":
        num_valid = jnp.sum(valid)
        loc = jnp.where(
            num_valid > 0,
            jnp.sum(per_vertex) / jnp.maximum(num_valid, 1.0),
            0.0,
        )
        sel_loc, sel_labels = all_loc, labels
    elif loc_loss_type == "top_k_huber_loss":
        k = int(loc_loss_kwargs["k"])
        top_vals, top_idx = jax.lax.top_k(per_vertex, k)
        top_valid = valid[top_idx]
        num_valid = jnp.sum(top_valid)
        loc = jnp.where(
            num_valid > 0,
            jnp.sum(top_vals) / jnp.maximum(num_valid, 1.0),
            0.0,
        )
        sel_loc, sel_labels = all_loc[top_idx], labels[top_idx]
    else:
        raise ValueError("unknown loc_loss_type: %s" % loc_loss_type)

    onehot = jax.nn.one_hot(sel_labels, num_classes, dtype=sel_loc.dtype)
    classwise = onehot.T @ sel_loc  # [num_classes, 7]
    return loc, classwise, num_valid
