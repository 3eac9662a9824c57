"""Margin-based (VSE-style) contrastive losses.

Equivalents of ``/root/reference/gloria/loss/contrastive_loss.py`` (kept for
API completeness — the reference's main path never uses them):
``contrastive_loss`` (:6-45) and ``hard_negative_contrastive_loss`` (:48-82).
"""

from __future__ import annotations

import jax.numpy as jnp


def contrastive_loss(im: jnp.ndarray, s: jnp.ndarray, margin: float = 0.0,
                     max_violation: bool = False) -> jnp.ndarray:
    scores = im @ s.T
    diagonal = jnp.diagonal(scores)
    cost_s = jnp.clip(margin + scores - diagonal[:, None], 0, None)   # caption retrieval
    cost_im = jnp.clip(margin + scores - diagonal[None, :], 0, None)  # image retrieval
    off = 1.0 - jnp.eye(scores.shape[0])
    cost_s = cost_s * off
    cost_im = cost_im * off
    if max_violation:
        cost_s = cost_s.max(axis=1)
        cost_im = cost_im.max(axis=0)
    return cost_s.sum() + cost_im.sum()


def hard_negative_contrastive_loss(imgs: jnp.ndarray, caps: jnp.ndarray,
                                   nmax: int = 1, margin: float = 0.2) -> jnp.ndarray:
    scores = imgs @ caps.T
    diag = jnp.diagonal(scores)
    scores = scores - 2 * jnp.diag(diag)  # exclude positives from hard-negative pick
    sorted_cap = -jnp.sort(-scores, axis=0)[:nmax, :]
    sorted_img = -jnp.sort(-scores, axis=1)[:, :nmax]
    neg_cap = jnp.clip(sorted_cap + (margin - diag)[None, :], 0, None).sum()
    neg_img = jnp.clip(sorted_img + (margin - diag)[:, None], 0, None).sum()
    return neg_cap + neg_img
