"""Segmentation losses: Dice / Focal / Mixed.

Functional equivalents of ``/root/reference/gloria/loss/segmentation_loss.py``
(numerics preserved, including the quirks):

- ``dice_coefficient`` applies sigmoid and returns the *score* over the whole
  batch flattened (reference ``dice_loss``, :7-24 — despite the name);
- ``dice_loss`` is the per-sample class with NO sigmoid (reference
  ``DiceLoss.forward``, :34-51);
- ``focal_loss`` is the numerically-stabilized BCE-with-logits focal form
  (:54-75);
- ``mixed_loss = α·focal − log(dice_coefficient)`` (:78-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_coefficient(logits: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    pred = jax.nn.sigmoid(logits).reshape(-1)
    t = target.reshape(-1)
    intersection = (pred * t).sum()
    return (2.0 * intersection + smooth) / (pred.sum() + t.sum() + smooth)


def dice_loss(predict: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0,
              p: float = 2.0, reduction: str = "mean") -> jnp.ndarray:
    b = predict.shape[0]
    pred = predict.reshape(b, -1)
    t = target.reshape(b, -1)
    num = (pred * t).sum(-1) + smooth
    den = (pred**p + t**p).sum(-1) + smooth
    loss = 1 - num / den
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"unexpected reduction {reduction}")


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    max_val = jnp.clip(-logits, 0, None)
    loss = (
        logits - logits * target + max_val
        + jnp.log(jnp.exp(-max_val) + jnp.exp(-logits - max_val))
    )
    invprobs = jax.nn.log_sigmoid(-logits * (target * 2.0 - 1.0))
    return (jnp.exp(invprobs * gamma) * loss).mean()


def mixed_loss(logits: jnp.ndarray, target: jnp.ndarray, alpha: float = 10.0,
               gamma: float = 2.0) -> jnp.ndarray:
    return alpha * focal_loss(logits, target, gamma) - jnp.log(dice_coefficient(logits, target))


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray,
                    pos_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch ``BCEWithLogitsLoss`` (mean reduction, optional pos_weight)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is None:
        loss = -(target * log_p + (1.0 - target) * log_not_p)
    else:
        loss = -(pos_weight * target * log_p + (1.0 - target) * log_not_p)
    return loss.mean()
