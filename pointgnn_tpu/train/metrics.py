"""Streaming training/eval metrics.

Same metric set as the reference (/root/reference/train.py:303-372):
per-epoch mean losses, per-class recall/precision, per-class PR-AUC with
200 thresholds and careful (Davis-Goadrich) interpolation, and per-class
per-box-dimension localization loss.

TPU-first split: the per-step *update* runs on device inside the jitted
train step (``device_updates`` — emits only small count tensors:
[C, 3] confusion counts and [C, B] probability histograms, psum-able
across the mesh), while accumulation and the final PR-AUC interpolation
(``StreamingMetrics``) run on host.  This replaces TF's streaming metric
variables without shipping per-vertex tensors off the device.
"""

from typing import Dict

import numpy as np

NUM_THRESHOLDS = 200
_KEPSILON = 1e-7


def thresholds(num: int = NUM_THRESHOLDS) -> np.ndarray:
    """tf.metrics.auc threshold grid: interior points plus +/-epsilon
    sentinels (train.py:340-349 uses num_thresholds=200)."""
    inner = [(i + 1) * 1.0 / (num - 1) for i in range(num - 2)]
    return np.array([0.0 - _KEPSILON] + inner + [1.0 + _KEPSILON])


def device_updates(logits, labels, mask, num_classes: int):
    """Per-step metric counts, jit/pmap-safe (all outputs tiny).

    Args:
      logits: [K, C]; labels: [K] int; mask: [K] 1.0 = real vertex.
    Returns dict of:
      confusion: [C, 3] float — TP, pred-positive, label-positive
      pr_pos_hist / pr_neg_hist: [C, B-1] histograms of class prob for
        positive / negative vertices over the threshold bins.
    """
    import jax
    import jax.numpy as jnp

    probs = jax.nn.softmax(logits, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    mask = mask.astype(jnp.float32)
    edges = jnp.asarray(thresholds(), jnp.float32)

    confusion = []
    pos_hists = []
    neg_hists = []
    for c in range(num_classes):
        is_label = (labels == c).astype(jnp.float32) * mask
        is_pred = (preds == c).astype(jnp.float32) * mask
        tp = jnp.sum(is_label * is_pred)
        confusion.append(jnp.stack([tp, jnp.sum(is_pred), jnp.sum(is_label)]))
        p = probs[:, c]
        # histogram over threshold bins: bin b counts p in
        # (edges[b], edges[b+1]]
        bin_idx = jnp.clip(
            jnp.searchsorted(edges, p, side="left") - 1, 0, len(edges) - 2
        )
        one_hot = jax.nn.one_hot(bin_idx, len(edges) - 1, dtype=jnp.float32)
        pos_hists.append(jnp.sum(one_hot * is_label[:, None], axis=0))
        neg_hists.append(
            jnp.sum(one_hot * ((1.0 - is_label) * mask)[:, None], axis=0)
        )
    return {
        "confusion": jnp.stack(confusion),
        "pr_pos_hist": jnp.stack(pos_hists),
        "pr_neg_hist": jnp.stack(neg_hists),
    }


def interpolated_pr_auc(tp, fp, fn) -> float:
    """Careful-interpolation PR-AUC from cumulative counts at each
    threshold (the 'careful_interpolation' summation of tf.metrics.auc)."""
    tp, fp, fn = (np.asarray(a, np.float64) for a in (tp, fp, fn))
    dtp = tp[:-1] - tp[1:]
    p = tp + fp
    dp = p[:-1] - p[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        prec_slope = np.where(np.maximum(dp, 0) > 0, dtp / np.maximum(dp, 1e-12), 0.0)
        intercept = tp[1:] - prec_slope * p[1:]
        safe_p_ratio = np.where(
            (p[:-1] > 0) & (p[1:] > 0), p[:-1] / np.maximum(p[1:], 1e-12), 1.0
        )
        denom = np.maximum(tp[1:] + fn[1:], 0)
        increment = np.where(
            denom > 0,
            prec_slope * (dtp + intercept * np.log(safe_p_ratio))
            / np.maximum(denom, 1e-12),
            0.0,
        )
    return float(np.sum(increment))


class StreamingMetrics:
    """Host-side accumulator, re-initialized per epoch
    (train.py:518-521)."""

    def __init__(self, num_classes: int, encoding_len: int = 7):
        self.num_classes = num_classes
        self.encoding_len = encoding_len
        self.reset()

    def reset(self):
        self._scalar_sums: Dict[str, float] = {}
        self._steps = 0
        self._confusion = np.zeros((self.num_classes, 3))
        self._pos_hist = np.zeros((self.num_classes, NUM_THRESHOLDS - 1))
        self._neg_hist = np.zeros((self.num_classes, NUM_THRESHOLDS - 1))
        self._classwise_loc = np.zeros((self.num_classes, self.encoding_len))

    def update(self, aux: Dict):
        """Consume one step's aux dict (host numpy after device_get)."""
        self._steps += 1
        for key in ("cls_loss", "loc_loss", "reg_loss", "total_loss"):
            if key in aux:
                self._scalar_sums[key] = self._scalar_sums.get(key, 0.0) + (
                    float(np.asarray(aux[key]))
                )
        if "confusion" in aux:
            # [D, C, 3] per-device or [C, 3] already summed
            conf = np.asarray(aux["confusion"], np.float64)
            self._confusion += conf.sum(0) if conf.ndim == 3 else conf
            pos = np.asarray(aux["pr_pos_hist"], np.float64)
            neg = np.asarray(aux["pr_neg_hist"], np.float64)
            self._pos_hist += pos.sum(0) if pos.ndim == 3 else pos
            self._neg_hist += neg.sum(0) if neg.ndim == 3 else neg
        if "classwise_loc_loss" in aux:
            cw = np.asarray(aux["classwise_loc_loss"], np.float64)
            self._classwise_loc += cw.sum(0) if cw.ndim == 3 else cw

    def results(self) -> Dict[str, float]:
        """Snapshot with the reference's metric names (train.py:594-616)."""
        steps = max(self._steps, 1)
        out = {k: v / steps for k, v in self._scalar_sums.items()}
        for c in range(self.num_classes):
            tp, pred_pos, label_pos = self._confusion[c]
            out["recall_%d" % c] = tp / label_pos if label_pos > 0 else 0.0
            out["precision_%d" % c] = tp / pred_pos if pred_pos > 0 else 0.0
            # cumulative-from-the-top counts at each threshold
            pos_above = np.concatenate(
                [np.cumsum(self._pos_hist[c][::-1])[::-1], [0.0]]
            )
            neg_above = np.concatenate(
                [np.cumsum(self._neg_hist[c][::-1])[::-1], [0.0]]
            )
            total_pos = self._pos_hist[c].sum()
            out["mAP_%d" % c] = interpolated_pr_auc(
                tp=pos_above, fp=neg_above, fn=total_pos - pos_above
            )
            out["loc_loss_cls_%d" % c] = self._classwise_loc[c].sum() / steps
            for bi in range(self.encoding_len):
                out["loc_loss_cls_%d_box_%d" % (c, bi)] = (
                    self._classwise_loc[c, bi] / steps
                )
        return out

    def print_epoch(self, step: int, epoch: int, lr: float, seconds: float):
        r = self.results()
        print(
            "STEP: %d, epoch_idx: %d, lr: %f, time cost: %f"
            % (step, epoch, lr, seconds)
        )
        print(
            "cls:%f, loc:%f, reg:%f, loss: %f"
            % (
                r.get("cls_loss", 0.0),
                r.get("loc_loss", 0.0),
                r.get("reg_loss", 0.0),
                r.get("total_loss", 0.0),
            )
        )
        for c in range(self.num_classes):
            print(
                "Class_%d: recall=%f, prec=%f, mAP=%f, loc=%f"
                % (
                    c,
                    r["recall_%d" % c],
                    r["precision_%d" % c],
                    r["mAP_%d" % c],
                    r["loc_loss_cls_%d" % c],
                )
            )
        return r
