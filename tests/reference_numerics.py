"""NumPy oracle for the GLoRIA matching math.

Independent loop-based re-derivation of the reference semantics
(`/root/reference/gloria/loss/gloria_loss.py:19-201`,
`gloria/models/gloria_model.py:171-207`) used to validate the vectorized
TPU formulation in ``gloria_tpu.ops.gloria_loss``.  Written against the
*math*, per caption, exactly as the reference slices and aggregates.
"""

from __future__ import annotations

import numpy as np


def _softmax(x: np.ndarray, axis: int) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_attention(word: np.ndarray, context: np.ndarray, temp1: float, sink: np.ndarray | None):
    """word: [B, D, Q] (one caption repeated across images); context: [B, D, R].

    Returns (weighted_context [B, D, Q], attn [B, Q, R]) with the sink column
    (prepended at source index 0) removed from attn.
    """
    B = word.shape[0]
    ctx = context
    if sink is not None:
        ctx = np.concatenate([np.tile(sink[None, :, None], (B, 1, 1)), ctx], axis=2)
    raw = np.einsum("bds,bdq->bsq", ctx, word)  # [B, S, Q]
    a1 = _softmax(raw, axis=-1)  # softmax over words, per region
    a2 = _softmax(temp1 * np.swapaxes(a1, 1, 2), axis=-1)  # [B, Q, S] over regions
    weighted = np.einsum("bds,bqs->bdq", ctx, a2)
    attn = a2[:, :, 1:] if sink is not None else a2
    return weighted, attn


def np_cosine_rows(a: np.ndarray, b: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Row-wise cosine with the reference's clamp on the norm product."""
    num = (a * b).sum(-1)
    den = np.maximum(np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), eps)
    return num / den


def np_local_loss(
    img_regions: np.ndarray,  # [B, R, D]
    words: np.ndarray,  # [B, W, D]
    cap_lens: np.ndarray,
    temp1: float = 4.0,
    temp2: float = 5.0,
    temp3: float = 10.0,
    agg: str = "sum",
    sink: np.ndarray | None = None,
    eval_slice: bool = False,
):
    """Per-caption loop mirroring the reference's control flow.

    Returns dict with similarities [B_img, B_text], per-caption attn maps
    (list of [B_img, L, R]), per-pair sink mass [B_img, B_text], flattened
    word-mean attention [B_img, B_text, R'(+1 if sink)].
    """
    B = img_regions.shape[0]
    context = np.swapaxes(img_regions, 1, 2)  # [B, D, R]
    sims, attn_maps, sink_masses, flats = [], [], [], []
    for i in range(words.shape[0]):
        L = int(cap_lens[i])
        if eval_slice:
            w = words[i, 1 : L + 1]  # [L, D]
        else:
            w = words[i, :L]
        word = np.tile(np.swapaxes(w, 0, 1)[None], (B, 1, 1))  # [B, D, L]
        weighted, attn = np_attention(word, context, temp1, sink)
        attn_maps.append(attn)
        region_mass = attn.sum(-1)  # [B, L]
        sink_masses.append(1.0 - region_mass.mean(-1))
        flat = attn.mean(1)  # [B, R]
        if sink is not None:
            flat = np.concatenate([1 - flat.sum(-1, keepdims=True), flat], -1)
        flats.append(flat)
        row_sim = np_cosine_rows(
            np.swapaxes(word, 1, 2).reshape(B * L, -1),
            np.swapaxes(weighted, 1, 2).reshape(B * L, -1),
        ).reshape(B, L)
        e = np.exp(temp2 * row_sim)
        if agg == "sum":
            s = np.log(e.sum(-1))
        elif agg == "mean":
            s = np.log(e.mean(-1))
        elif agg == "max":
            s = np.log(e.max(-1))
        else:
            raise ValueError(agg)
        sims.append(s)
    similarities = np.stack(sims, axis=1)  # [B_img, B_text]

    logits = similarities * temp3
    labels = np.arange(B)

    def ce(mat):
        lz = np.log(np.exp(mat - mat.max(-1, keepdims=True)).sum(-1)) + mat.max(-1)
        return float(np.mean(lz - mat[labels, labels]))

    loss0 = ce(logits)
    loss1 = ce(logits.T)

    # ablation losses (train convention)
    sink_mass = np.stack(sink_masses, axis=1)  # [B_img, B_text]
    no_attn = float(np.mean(np.log(np.diag(sink_mass))))
    flat_attn = np.stack(flats, axis=1)  # [B_img, B_text, R']
    ent = float(np.mean(-(flat_attn * np.log(flat_attn)).sum(-1)))
    kls = []
    for b in range(B):
        p = flat_attn[b]  # [B_text, R']
        cur = p[b]
        sym = 0.5 * ((cur * np.log(cur / p)).sum(-1) + (p * np.log(p / cur)).sum(-1))
        kls.append(sym)
    klmat = np.stack(kls, axis=1)  # [B_text, B_img]
    off = ~np.eye(B, dtype=bool)
    kl = float(-klmat[off].mean())

    return {
        "similarities": similarities,
        "loss0": loss0,
        "loss1": loss1,
        "attn_maps": attn_maps,
        "no_attn": no_attn,
        "kl": kl,
        "entropy": ent,
    }


def np_global_loss(img: np.ndarray, txt: np.ndarray, temp3: float = 10.0, eps: float = 1e-8):
    norms = np.linalg.norm(img, axis=-1)[:, None] * np.linalg.norm(txt, axis=-1)[None, :]
    logits = img @ txt.T / np.maximum(norms, eps) * temp3
    n = img.shape[0]
    labels = np.arange(n)

    def ce(mat):
        lz = np.log(np.exp(mat - mat.max(-1, keepdims=True)).sum(-1)) + mat.max(-1)
        return float(np.mean(lz - mat[labels, labels]))

    return ce(logits), ce(logits.T)
