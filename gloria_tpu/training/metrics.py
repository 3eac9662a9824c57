"""Metrics: batched on-device AUROC/AP + host sklearn wrappers + dice.

The reference computes localization metrics per sentence with torchmetrics in
a python loop (``/root/reference/gloria/lightning/callbacks.py:26-70``) and
classification epoch metrics with sklearn
(``classification_model.py:89-105``).  Here:

- ``binary_auroc`` / ``binary_average_precision`` are *row-batched* jax
  implementations (tie-exact, matching sklearn) so whole evaluation sets of
  attention maps are scored in one XLA call;
- ``classification_metrics`` delegates to sklearn on host (bit-identical to
  the reference, including its NaN→0 guard);
- ``dice_score`` reproduces ``SegmentationModel.get_dice``
  (``segmentation_model.py:125-148``) with its empty-mask convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rankdata_row(scores: jnp.ndarray) -> jnp.ndarray:
    """Average ranks (1-based) with tie handling, one row."""
    order = jnp.sort(scores)
    left = jnp.searchsorted(order, scores, side="left")
    right = jnp.searchsorted(order, scores, side="right")
    return (left + right + 1) / 2.0


def binary_auroc(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """AUROC per row. scores/labels: [..., P]. Tie-exact (average ranks).
    Rows with a single class return NaN (caller decides policy)."""

    def row(s, l):
        ranks = _rankdata_row(s)
        npos = l.sum()
        nneg = l.shape[0] - npos
        pos_rank_sum = (ranks * l).sum()
        auc = (pos_rank_sum - npos * (npos + 1) / 2.0) / (npos * nneg)
        return jnp.where((npos > 0) & (nneg > 0), auc, jnp.nan)

    flat_s = scores.reshape(-1, scores.shape[-1]).astype(jnp.float32)
    flat_l = labels.reshape(-1, labels.shape[-1]).astype(jnp.float32)
    return jax.vmap(row)(flat_s, flat_l).reshape(scores.shape[:-1])


def binary_average_precision(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """sklearn ``average_precision_score`` per row (tie-exact):
    AP = Σ_{i: y=1} precision-at-its-tie-group-end / n_pos."""

    def row(s, l):
        n = s.shape[0]
        desc = jnp.sort(-s)  # ascending of negated = descending scores
        # count_ge(s_i): number of scores >= s_i; tp_ge: positives >= s_i
        count_ge = jnp.searchsorted(desc, -s, side="right")
        order = jnp.argsort(-s, stable=True)
        cum_tp = jnp.cumsum(l[order])
        tp_ge = cum_tp[jnp.clip(count_ge - 1, 0, n - 1)]
        prec = tp_ge / jnp.maximum(count_ge, 1)
        npos = l.sum()
        ap = (prec * l).sum() / jnp.maximum(npos, 1)
        return jnp.where(npos > 0, ap, jnp.nan)

    flat_s = scores.reshape(-1, scores.shape[-1]).astype(jnp.float32)
    flat_l = labels.reshape(-1, labels.shape[-1]).astype(jnp.float32)
    return jax.vmap(row)(flat_s, flat_l).reshape(scores.shape[:-1])


def topk_overlap_metrics(scores: jnp.ndarray, labels: jnp.ndarray, fraction: float,
                         *, sorted_desc: jnp.ndarray | None = None) -> dict:
    """Threshold at the top-``fraction`` of pixels per row → precision /
    recall / F1 / IoU (the callback's P@k/R@k/F1@k/IoU@k family,
    callbacks.py:26-70).

    Reference semantics exactly (callbacks.py:53-60): ``k = int(P·fraction)``
    (floor — k=0 predicts NOTHING, not one pixel), threshold = the (k+1)-th
    largest score (``topk(total-k, largest=False).max()``), prediction =
    strictly ``>`` threshold (the reference's own IoU line; under ties at the
    threshold this selects FEWER than k, never more — torchmetrics' ``>=``
    binarization in its pr/re call is the reference's internal inconsistency,
    and the strict form is the one its source spells out)."""
    P = scores.shape[-1]
    k = int(P * fraction)
    flat_s = scores.reshape(-1, P)
    flat_l = labels.reshape(-1, P).astype(jnp.float32)
    if sorted_desc is None:  # callers with several fractions pass one sort
        sorted_desc = -jnp.sort(-flat_s, axis=-1)
    thresh = sorted_desc[:, k : k + 1]
    pred = (flat_s > thresh).astype(jnp.float32)
    tp = (pred * flat_l).sum(-1)
    fp = (pred * (1 - flat_l)).sum(-1)
    fn = ((1 - pred) * flat_l).sum(-1)
    precision = tp / jnp.maximum(tp + fp, 1e-12)
    recall = tp / jnp.maximum(tp + fn, 1e-12)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    iou = tp / jnp.maximum(tp + fp + fn, 1e-12)
    shape = scores.shape[:-1]
    return {
        "precision": precision.reshape(shape),
        "recall": recall.reshape(shape),
        "f1": f1.reshape(shape),
        "iou": iou.reshape(shape),
    }


def classification_metrics(y: np.ndarray, prob: np.ndarray) -> dict:
    """Mean per-class AUROC/AUPRC with the reference's NaN→0 guard
    (classification_model.py:89-105).

    One documented deviation: a single-class column (all-positive or
    all-negative labels) CRASHES the reference inside ``roc_auc_score``
    (its guard only checks NaN probabilities). Here AUROC falls back to 0
    for such a column instead of raising, while AUPRC stays the sklearn
    value (``average_precision_score`` is well-defined for single-class
    input — 1.0 all-positive, 0.0 all-negative — and matches what the
    reference would report had it survived the AUROC call)."""
    from sklearn.metrics import average_precision_score, roc_auc_score

    auroc_list, auprc_list = [], []
    for i in range(y.shape[1]):
        y_cls, prob_cls = y[:, i], prob[:, i]
        if np.isnan(prob_cls).any():
            auprc_list.append(0)
            auroc_list.append(0)
        else:
            auprc_list.append(average_precision_score(y_cls, prob_cls))
            auroc_list.append(roc_auc_score(y_cls, prob_cls)
                              if len(np.unique(y_cls)) > 1 else 0)
    return {"auroc": float(np.mean(auroc_list)), "auprc": float(np.mean(auprc_list))}


def dice_score(probability: np.ndarray, truth: np.ndarray, threshold: float = 0.5) -> float:
    """Reference ``get_dice``: empty-truth rows score 1 iff prediction is
    also empty; positive rows score 2·|p∩t|/(|p|+|t|)."""
    b = len(truth)
    p = (np.asarray(probability).reshape(b, -1) > threshold).astype(np.float32)
    t = (np.asarray(truth).reshape(b, -1) > 0.5).astype(np.float32)
    t_sum, p_sum = t.sum(-1), p.sum(-1)
    neg = t_sum == 0
    dice_neg = (p_sum == 0).astype(np.float32)[neg]
    pos = t_sum >= 1
    denom = (p + t).sum(-1)[pos]
    dice_pos = 2 * (p * t).sum(-1)[pos] / np.maximum(denom, 1e-12)
    return float(np.concatenate([dice_pos, dice_neg]).mean()) if b else 0.0


def attention_entropy_np(attn: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    p = np.maximum(attn, eps)
    return -(p * np.log(p)).sum(-1)
