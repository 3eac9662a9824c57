"""GLoRIA global/local contrastive matching — TPU-native formulation.

This module subsumes the reference's ``gloria/loss/gloria_loss.py`` (the
per-caption python loop over ``attention_fn`` + cosine aggregation,
``/root/reference/gloria/loss/gloria_loss.py:19-201``), its eval twin
``GLoRIA.get_local_similarities`` (``gloria/models/gloria_model.py:171-207``)
and ``GLoRIA.get_attn_maps`` — as one fixed-shape batched program:

- The reference loops over captions, repeating each caption's words across the
  image batch and calling ``bmm`` twice per caption (O(B) kernel launches and
  an effectively serial schedule). Here the full pairwise tensor
  ``[T_text, B_img, S_regions, W_words]`` is computed by batched einsums that
  XLA tiles directly onto the MXU.  ``chunk > 0`` opts into a ``lax.scan`` +
  rematerialization over the text axis to bound HBM footprint — needed for
  large batches (the pairwise tensors grow O(B²)); at the reference's B=48
  the unchunked no-remat program is fastest (638 vs 625 pairs/s on v5e) and
  is the default.
- Variable caption lengths become *masks* over a static word axis: a masked
  softmax over valid words is numerically identical to the reference's sliced
  softmax (invalid logits → -inf → exactly zero probability).
- The weighted-context norm needed for the cosine is computed via the region
  Gram matrix ``G_b = C_b C_bᵀ`` (one [S,S] matmul per image, reused by every
  caption) instead of materializing the [T,B,W,D] weighted-context tensor:
  ``‖attn·C‖² = attn·G·attnᵀ``.  This removes the largest intermediate from
  the pairwise loop entirely.

Numerical-parity notes (warts preserved deliberately):
- double softmax: first over *words per region*, then (×temp1) over *regions
  per word* — same order as reference ``attention_fn``.
- train slice = words ``[0:cap_len]`` (includes [CLS], excludes [SEP]);
  eval slice = ``[1:cap_len+1]`` (excludes [CLS], includes [SEP]) — the
  reference's off-by-one asymmetry (``gloria_loss.py:122`` vs
  ``gloria_model.py:179``).
- cosine denominator clamped at 1e-8 *after* the norm product.
- the optional no-attn sink column is *prepended* to the region axis and
  stripped from returned attention maps.
- the attention-entropy ablation loss is returned **unweighted** (the
  reference's weight only gates computation, ``gloria_loss.py:195-199``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8


def make_word_mask(cap_lens: jnp.ndarray, num_words: int, convention: str) -> jnp.ndarray:
    """Boolean [T, W] mask of word positions that participate in matching.

    ``cap_lens`` follows the reference's definition: number of real
    (non-special) aggregated words + 1 (``gloria_model.py:107-109``).

    convention='train': positions [0, cap_len)   — [CLS] + words
    convention='eval':  positions [1, cap_len]   — words + [SEP]
    """
    idx = jnp.arange(num_words)[None, :]
    lens = cap_lens[:, None]
    if convention == "train":
        return idx < lens
    if convention == "eval":
        return (idx >= 1) & (idx <= lens)
    raise ValueError(f"unknown word-slice convention: {convention}")


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(mask, logits, neg)
    out = jax.nn.softmax(logits, axis=axis)
    return jnp.where(mask, out, 0.0)


def _softmax_f32(logits: jnp.ndarray, axis: int, out_dtype) -> jnp.ndarray:
    """Softmax computed in f32 element math, stored in ``out_dtype``.

    When the surrounding program keeps its large intermediates in bf16 for
    HBM bandwidth, the upcast/downcast converts fuse into the elementwise
    chain: traffic stays bf16-sized while exp/sum run in f32 registers."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis).astype(out_dtype)


def _masked_softmax_f32(logits: jnp.ndarray, mask: jnp.ndarray, axis: int, out_dtype) -> jnp.ndarray:
    x = jnp.where(mask, logits.astype(jnp.float32), jnp.finfo(jnp.float32).min)
    out = jax.nn.softmax(x, axis=axis)
    return jnp.where(mask, out, 0.0).astype(out_dtype)


def _prepend_sink(regions: jnp.ndarray, sink: jnp.ndarray) -> jnp.ndarray:
    """Prepend the learnable no-attention vector as source position 0 of
    every batch row: [B, R, D] → [B, 1+R, D] (one definition — the sink
    semantics must stay identical across the attention/matching paths)."""
    row = jnp.broadcast_to(sink[None, None, :].astype(regions.dtype),
                           (regions.shape[0], 1, regions.shape[2]))
    return jnp.concatenate([row, regions], axis=1)


def attention_fn(
    words: jnp.ndarray,
    regions: jnp.ndarray,
    temp1: float,
    word_mask: jnp.ndarray | None = None,
    sink: jnp.ndarray | None = None,
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pair (aligned-batch) double-softmax attention.

    words:   [B, W, D]  word queries
    regions: [B, R, D]  region contexts (row-major h*w flattening)
    sink:    [D] optional learnable no-attention vector, prepended as an
             extra source position (region index 0 after prepend).
    Returns (weighted_context [B, W, D], attn [B, W, R]) — attn excludes the
    sink column, matching reference ``attention_fn`` output.
    """
    ctx = _prepend_sink(regions, sink) if sink is not None else regions
    raw = jnp.einsum("bsd,bwd->bsw", ctx, words,
                     preferred_element_type=jnp.float32, precision=precision)
    if word_mask is not None:
        a1 = masked_softmax(raw, word_mask[:, None, :], axis=-1)
    else:
        a1 = jax.nn.softmax(raw, axis=-1)
    a2 = jax.nn.softmax(temp1 * jnp.swapaxes(a1, 1, 2), axis=-1)  # [B, W, S]
    weighted = jnp.einsum("bws,bsd->bwd", a2, ctx,
                          preferred_element_type=jnp.float32, precision=precision)
    attn = a2[:, :, 1:] if sink is not None else a2
    return weighted, attn


class LocalMatch(NamedTuple):
    """Outputs of the pairwise local matching program."""

    similarities: jnp.ndarray  # [B_img, T_text] log-aggregated word-region sims
    attn_diag: jnp.ndarray | None  # [B, W, R] attention of pair (i, i); None if T != B
    flat_attn: jnp.ndarray | None  # [T, B, R(+1)] word-mean attention (ablation losses)
    sink_mass: jnp.ndarray | None  # [T, B] mean-over-words sink mass (no-attn loss)


def local_matching(
    words: jnp.ndarray,
    regions: jnp.ndarray,
    word_mask: jnp.ndarray,
    *,
    temp1: float,
    temp2: float,
    agg: str = "sum",
    sink: jnp.ndarray | None = None,
    chunk: int = 0,
    need_diag_attn: bool = True,
    need_flat_attn: bool = False,
    need_sink_mass: bool = False,
    precision=None,
    compute_dtype=None,
) -> LocalMatch:
    """All-pairs word-region matching.

    words:     [T, W, D]   per-caption word embeddings (static word axis)
    regions:   [B, R, D]   per-image region embeddings
    word_mask: [T, W] bool valid-word mask (see :func:`make_word_mask`)

    similarities[b, t] = log( Σ_w∈valid(t) exp(temp2 · cos(word_tw, ctx_tbw)) )
    (or log-mean for agg='mean'), matching reference ``local_loss`` lines
    144-160 but evaluated for every (t, b) pair at once.

    ``compute_dtype`` (default f32) is the *storage* dtype of the large
    ``[C, B, S, W]`` pairwise intermediates, which dominate HBM traffic.
    Passing bf16 halves that traffic while keeping every softmax's element
    math and every matmul accumulation in f32 — the same reduced-precision
    envelope as the reference's fp16 AMP training (Lightning ``precision: 16``
    runs the attention ``bmm``s in fp16, ``configs/*.yaml:12``).  Similarity
    logits change by O(3e-3); use the default for eval/parity paths.
    """
    T, W, D = words.shape
    B, R, _ = regions.shape
    f32 = jnp.float32
    cd = f32 if compute_dtype is None else compute_dtype
    if need_diag_attn and T != B:
        raise ValueError(
            f"diagonal (t, t) attention is only defined for aligned batches; "
            f"got {T} texts vs {B} images — pass need_diag_attn=False for "
            f"rectangular matching")
    words = words.astype(f32)
    ctx = regions.astype(f32)
    if sink is not None:
        ctx = _prepend_sink(ctx, sink.astype(f32))
    S = ctx.shape[1]
    ctx_cd = ctx.astype(cd)

    # Region Gram matrix, computed once per image and reused by every caption.
    gram = jnp.einsum("bsd,bud->bsu", ctx, ctx, preferred_element_type=f32, precision=precision)  # [B, S, S]
    # safe norm: padded word rows are exactly zero and linalg.norm's backward
    # is 0/0 there (NaN); sqrt(max(·, tiny)) keeps the cotangent finite while
    # leaving the forward (masked anyway) unchanged for real words
    word_norm = jnp.sqrt(jnp.maximum(jnp.sum(words * words, axis=-1), 1e-12))  # [T, W]

    if chunk <= 0 or chunk > T:
        chunk = T
    pad = (-T) % chunk
    if pad:
        words_p = jnp.pad(words, ((0, pad), (0, 0), (0, 0)))
        mask_p = jnp.pad(word_mask, ((0, pad), (0, 0)))
        norm_p = jnp.pad(word_norm, ((0, pad), (0, 0)))
    else:
        words_p, mask_p, norm_p = words, word_mask, word_norm
    n_chunks = words_p.shape[0] // chunk

    def chunk_body(words_c, mask_c, norm_c, start):
        # words_c: [C, W, D]; mask_c: [C, W]
        raw = jnp.einsum("bsd,cwd->cbsw", ctx_cd, words_c.astype(cd),
                         preferred_element_type=cd, precision=precision)
        a1 = _masked_softmax_f32(raw, mask_c[:, None, None, :], -1, cd)
        # temp1 is a power of two in the reference configs, so the pre-upcast
        # scalar multiply is exact even in bf16; the upcast fuses into softmax
        a2 = _softmax_f32(temp1 * jnp.swapaxes(a1, 2, 3), -1, cd)  # [C, B, W, S]
        # cos numerator: word · (attn @ ctx) = Σ_s a2[w,s] raw[s,w]
        # (outputs in cd — the MXU accumulates f32 internally either way, and
        # bf16-in/f32-out dots are unsupported on the CPU test backend)
        dot = jnp.einsum("cbws,cbsw->cbw", a2, raw,
                         preferred_element_type=cd, precision=precision).astype(f32)
        # ‖attn @ ctx‖² via the Gram matrix; clamp ≥0 — reduced-precision
        # matmuls can round tiny values negative, and sqrt(neg) is NaN
        wctx_norm2 = jnp.einsum("cbws,bsu,cbwu->cbw", a2, gram.astype(cd), a2,
                                preferred_element_type=cd, precision=precision).astype(f32)
        # clamp strictly above 0: sqrt'(0)=inf would turn the clamp's zero
        # cotangent into 0*inf=NaN when reduced-precision matmuls round ≤0
        denom = jnp.maximum(norm_c[:, None, :] * jnp.sqrt(jnp.maximum(wctx_norm2, 1e-12)), EPS)
        # zero masked positions BEFORE exp: NaN/garbage there would otherwise
        # poison gradients through where (0 * NaN = NaN in the cotangent)
        row_sim = jnp.where(mask_c[:, None, :], dot / denom, 0.0)  # [C, B, W]
        e = jnp.where(mask_c[:, None, :], jnp.exp(temp2 * row_sim), 0.0)
        if agg == "sum":
            sims = jnp.log(jnp.maximum(e.sum(-1), EPS))  # [C, B]
        elif agg == "mean":
            n_valid = jnp.maximum(mask_c.sum(-1), 1)[:, None]
            sims = jnp.log(jnp.maximum(e.sum(-1) / n_valid, EPS))
        elif agg == "max":
            # eval convention (get_local_similarities): log(max_w exp(.)) over
            # valid words — e is already zeroed at masked positions above
            sims = jnp.log(jnp.maximum(e.max(-1), EPS))
        else:
            raise ValueError(f"unknown aggregation: {agg}")

        attn_region = a2[..., 1:] if sink is not None else a2  # [C, B, W, R]
        diag = None
        if need_diag_attn:
            # pair (t, t) for global text index t = start + c
            gidx = jnp.clip(start + jnp.arange(chunk), 0, B - 1)
            diag = jax.vmap(lambda a, i: a[i])(attn_region, gidx).astype(f32)  # [C, W, R]
        flat = None
        if need_flat_attn:
            m = mask_c[:, None, :, None]
            n_valid = jnp.maximum(mask_c.sum(-1), 1)[:, None, None]
            flat = jnp.where(m, attn_region.astype(f32), 0.0).sum(2) / n_valid  # [C, B, R]
            if sink is not None:
                flat = jnp.concatenate([1.0 - flat.sum(-1, keepdims=True), flat], axis=-1)
        smass = None
        if need_sink_mass:
            m = mask_c[:, None, :]
            n_valid = jnp.maximum(mask_c.sum(-1), 1)[:, None]
            region_mass = jnp.where(m, attn_region.astype(f32).sum(-1), 0.0).sum(-1) / n_valid  # [C, B]
            smass = 1.0 - region_mass
        return sims, diag, flat, smass

    if n_chunks == 1:
        # no scan → no remat: keep the (bounded, single-chunk) intermediates
        # alive for backward instead of recomputing the whole forward
        sims, diag, flat, smass = chunk_body(words_p, mask_p, norm_p, 0)
    else:
        chunk_body = jax.checkpoint(chunk_body, static_argnums=())
        xs = (
            words_p.reshape(n_chunks, chunk, W, D),
            mask_p.reshape(n_chunks, chunk, W),
            norm_p.reshape(n_chunks, chunk, W),
            jnp.arange(n_chunks) * chunk,
        )
        def scan_body(_, x):
            return None, chunk_body(*x)
        _, (sims, diag, flat, smass) = jax.lax.scan(scan_body, None, xs)
        sims = sims.reshape(n_chunks * chunk, B)
        diag = diag.reshape(n_chunks * chunk, W, -1) if need_diag_attn else None
        flat = flat.reshape(n_chunks * chunk, B, -1) if need_flat_attn else None
        smass = smass.reshape(n_chunks * chunk, B) if need_sink_mass else None
    if pad:
        sims = sims[:T]
        diag = diag[:T] if diag is not None else None
        flat = flat[:T] if flat is not None else None
        smass = smass[:T] if smass is not None else None

    return LocalMatch(
        similarities=sims.T,  # reference layout: rows=images, cols=texts
        attn_diag=diag if need_diag_attn else None,
        flat_attn=flat if need_flat_attn else None,
        sink_mass=smass if need_sink_mass else None,
    )


def _diag_cross_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean CE with labels = arange(n) (both contrastive directions use it)."""
    n = logits.shape[0]
    logz = jax.nn.logsumexp(logits, axis=-1)
    correct = jnp.diagonal(logits)
    return jnp.mean(logz - correct)


def local_loss(
    img_regions: jnp.ndarray,
    words: jnp.ndarray,
    cap_lens: jnp.ndarray,
    *,
    temp1: float = 4.0,
    temp2: float = 5.0,
    temp3: float = 10.0,
    agg: str = "sum",
    sink: jnp.ndarray | None = None,
    no_attn_loss_weight: float | None = None,
    attention_divergence_loss_weight: float | None = None,
    attention_entropy_loss_weight: float | None = None,
    chunk: int = 0,
    precision=None,
    use_fused: bool = False,
    compute_dtype=None,
):
    """Local InfoNCE over the batch similarity matrix + ablation losses.

    img_regions: [B, R, D]; words: [B, W, D]; cap_lens: [B] int.
    Returns (loss0, loss1, no_attn_loss, kl_loss, entropy_loss, attn_diag)
    mirroring reference ``local_loss`` (``gloria_loss.py:99-201``); attn_diag
    is [B, W, R] (the reference's list of per-caption [W_i, h, w] maps, here
    fixed-shape with the word mask implicit).

    ``use_fused`` routes the O(B²) similarity matrix through the Pallas
    kernel (:mod:`gloria_tpu.ops.pallas.local_sim`, custom VJP); the
    diagonal attention maps (and the diagonal sink mass for the no-attn
    loss) come from the cheap O(B) aligned :func:`attention_fn` — they are
    the same (i, i) pairs the pairwise program computes.  The flat-attention
    ablations (divergence/entropy) genuinely need all T×B attention maps,
    so those configs fall back to the XLA path.
    """
    B, W, _ = words.shape
    mask = make_word_mask(cap_lens, W, "train")
    need_flat = (attention_divergence_loss_weight is not None) or (attention_entropy_loss_weight is not None)

    diag_mass = None
    if use_fused and not need_flat:
        from .pallas.local_sim import fused_local_similarities

        ctx = _prepend_sink(img_regions, sink) if sink is not None else img_regions
        sims = fused_local_similarities(
            words, ctx, mask, float(temp1), float(temp2), agg, 8, 8, False)
        _, attn = attention_fn(words, img_regions, temp1, word_mask=mask, sink=sink)
        if no_attn_loss_weight is not None:
            region_mass = jnp.where(mask, attn.sum(-1), 0.0).sum(-1) / jnp.maximum(mask.sum(-1), 1)
            diag_mass = 1.0 - region_mass
        m = LocalMatch(similarities=sims, attn_diag=attn, flat_attn=None, sink_mass=None)
    else:
        m = local_matching(
            words,
            img_regions,
            mask,
            temp1=temp1,
            temp2=temp2,
            agg=agg,
            sink=sink,
            chunk=chunk,
            need_diag_attn=True,
            need_flat_attn=need_flat,
            need_sink_mass=no_attn_loss_weight is not None,
            precision=precision,
            compute_dtype=compute_dtype,
        )
        if no_attn_loss_weight is not None:
            diag_mass = jnp.diagonal(m.sink_mass.T)  # sink_mass is [T, B]
    logits = m.similarities * temp3  # [B_img, B_text]
    loss0 = _diag_cross_entropy(logits)       # image -> text
    loss1 = _diag_cross_entropy(logits.T)     # text -> image

    no_attn_loss = 0.0
    if no_attn_loss_weight is not None:
        # mean over diagonal pairs of log(mean-over-words sink mass)
        no_attn_loss = no_attn_loss_weight * jnp.mean(jnp.log(jnp.maximum(diag_mass, EPS)))

    kl_loss = 0.0
    if attention_divergence_loss_weight is not None:
        flat = m.flat_attn  # [T, B, R']
        p = jnp.maximum(flat, EPS)
        # klmat[j, b] = symKL( p[b, b, :], p[j, b, :] )  (see reference loop)
        anchor = jnp.diagonal(p, axis1=0, axis2=1).T[None, :, :]  # [1, B, R'] with p[b,b]
        anchor = jnp.broadcast_to(anchor, p.shape)
        other = jnp.swapaxes(p, 0, 1)  # other[b, j] = p[j, b]
        anchor_b = jnp.swapaxes(anchor, 0, 1)
        kl_ab = jnp.sum(anchor_b * jnp.log(anchor_b / other), axis=-1)
        kl_ba = jnp.sum(other * jnp.log(other / anchor_b), axis=-1)
        sym = 0.5 * (kl_ab + kl_ba)  # [B, T] indexed [b, j]
        off = 1.0 - jnp.eye(B)
        kl_loss = attention_divergence_loss_weight * (-(sym * off).sum() / off.sum())

    entropy_loss = 0.0
    if attention_entropy_loss_weight is not None:
        p = jnp.maximum(m.flat_attn, EPS)
        # NOTE: unweighted on purpose — reference gloria_loss.py:195-199.
        entropy_loss = jnp.mean(-jnp.sum(p * jnp.log(p), axis=-1))

    return loss0, loss1, no_attn_loss, kl_loss, entropy_loss, m.attn_diag


def global_loss(img_emb: jnp.ndarray, txt_emb: jnp.ndarray, temp3: float = 10.0, eps: float = EPS):
    """Symmetric InfoNCE over the global cosine-similarity matrix.

    Mirrors reference ``global_loss`` (``gloria_loss.py:66-88``): rows=images.
    """
    img = img_emb.astype(jnp.float32)
    txt = txt_emb.astype(jnp.float32)
    scores = jnp.einsum("id,td->it", img, txt, preferred_element_type=jnp.float32)
    norms = jnp.linalg.norm(img, axis=-1)[:, None] * jnp.linalg.norm(txt, axis=-1)[None, :]
    logits = scores / jnp.maximum(norms, eps) * temp3
    return _diag_cross_entropy(logits), _diag_cross_entropy(logits.T)


def global_similarities(img_emb: jnp.ndarray, txt_emb: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine similarity [B_img, B_text] (reference computes this on
    host with sklearn, ``gloria_model.py:164-169``; identical math)."""
    img = img_emb / jnp.maximum(jnp.linalg.norm(img_emb, axis=-1, keepdims=True), EPS)
    txt = txt_emb / jnp.maximum(jnp.linalg.norm(txt_emb, axis=-1, keepdims=True), EPS)
    return img @ txt.T


def local_similarities_eval_diag(
    img_regions: jnp.ndarray,
    words: jnp.ndarray,
    cap_lens: jnp.ndarray,
    *,
    temp1: float = 4.0,
    temp2: float = 5.0,
    sink: jnp.ndarray | None = None,
    precision="highest",
) -> jnp.ndarray:
    """diagonal(:func:`local_similarities_eval`) as an O(B) aligned program.

    The localization callbacks persist only the (i, i) pair similarities
    (reference ``callbacks.py:385-408`` takes ``diagonal(...)``); computing
    the full [B, B] pairwise matrix for its diagonal costs a second
    local-matching program per step.  This computes just the aligned pairs
    with one :func:`attention_fn` pass: identical math, 1/B the FLOPs.
    ``precision`` defaults to "highest" like :func:`local_similarities_eval`
    — at the TPU default matmul precision the persisted sims drift ~4e-3
    from the eval path instead of ~6e-5.
    """
    W = words.shape[1]
    mask = make_word_mask(cap_lens, W, "eval")
    words = words.astype(jnp.float32)
    weighted, _ = attention_fn(
        words, img_regions.astype(jnp.float32), temp1, word_mask=mask,
        sink=sink, precision=precision)
    dot = jnp.sum(words * weighted, axis=-1)  # [B, W]
    wn = jnp.sqrt(jnp.maximum(jnp.sum(words * words, axis=-1), 1e-12))
    cn = jnp.sqrt(jnp.maximum(jnp.sum(weighted * weighted, axis=-1), 1e-12))
    cos = jnp.where(mask, dot / jnp.maximum(wn * cn, EPS), 0.0)
    e = jnp.where(mask, jnp.exp(temp2 * cos), 0.0)
    return jnp.log(jnp.maximum(e.max(-1), EPS))


def fused_eval_default() -> bool:
    """Auto policy for the eval similarity path: the Pallas kernel
    (:mod:`gloria_tpu.ops.pallas.local_sim`) wins 2.42× over XLA on TPU at
    the 5×200 zero-shot shape; elsewhere the XLA program is used (the
    kernel's off-TPU interpret fallback exists but is far slower than XLA,
    so auto only picks the kernel on real TPU)."""
    import jax

    return jax.default_backend() == "tpu"


def local_similarities_eval(
    img_regions: jnp.ndarray,
    words: jnp.ndarray,
    cap_lens: jnp.ndarray,
    *,
    temp1: float = 4.0,
    temp2: float = 5.0,
    sink: jnp.ndarray | None = None,
    chunk: int = 0,
    precision="highest",
    use_fused: bool = False,
) -> jnp.ndarray:
    """Eval-path local similarities [B_img, T_text].

    Matches ``GLoRIA.get_local_similarities`` (``gloria_model.py:171-207``):
    word slice ``[1:cap_len+1]`` and **max** over words instead of sum.
    ``use_fused`` routes through the Pallas kernel (measured 2.4× faster at
    the 5×200 eval shape; bf16-tolerance numerics vs this path).
    """
    if use_fused:
        from .pallas.local_sim import local_similarities_fused

        return local_similarities_fused(
            img_regions, words, cap_lens, temp1=temp1, temp2=temp2,
            agg="max", convention="eval", sink=sink)
    W = words.shape[1]
    mask = make_word_mask(cap_lens, W, "eval")
    m = local_matching(
        words, img_regions, mask,
        temp1=temp1, temp2=temp2, agg="max", sink=sink, chunk=chunk,
        need_diag_attn=False, precision=precision,
    )
    return m.similarities


# jitted entry point for the per-batch eval hot path (api.GloriaModel.
# get_local_similarities → evaluate_zero_shot runs it B/batch × C times):
# one executable per shape instead of eager per-op dispatch — through an
# execution tunnel the eager path pays a round-trip per op
local_similarities_eval_jit = jax.jit(
    local_similarities_eval,
    static_argnames=("temp1", "temp2", "chunk", "precision", "use_fused"))


def local_similarities_eval_sharded(
    img_regions: jnp.ndarray,
    words: jnp.ndarray,
    cap_lens: jnp.ndarray,
    *,
    mesh,
    temp1: float = 4.0,
    temp2: float = 5.0,
    sink: jnp.ndarray | None = None,
    use_fused: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mesh-sharded eval similarities [B_img, T_text] over the ``data`` axis.

    Rows of the similarity matrix are independent given replicated text
    embeddings, so each device computes its row block of the matrix with the
    full (fused Pallas or XLA) program under ``jax.shard_map`` — the manual
    SPMD escape hatch for ``pallas_call``, which has no GSPMD partitioning
    rule.  Image batches that don't divide the data axis are padded with
    repeated rows and sliced back (same policy as the sharded image tower,
    ``api.GloriaModel.encode_images``).  Matches the reference's
    single-device ``get_local_similarities``
    (``gloria/models/gloria_model.py:171-207``) numerically.

    The jitted shard_map program is memoized per (mesh, temps, paths): a
    fresh ``jax.shard_map`` closure per call has no executable-cache
    identity, so every eval batch would re-trace and re-lower — measured
    1.5 s/call (fused) / 12.4 s/call (XLA) at the 5x200 shape through the
    execution tunnel before memoization (docs/DESIGN.md round 5).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["data"]
    B = img_regions.shape[0]
    pad = (-B) % n
    if pad:
        img_regions = jnp.concatenate(
            [img_regions, jnp.repeat(img_regions[-1:], pad, axis=0)], axis=0)

    cap_lens = jnp.asarray(cap_lens)
    has_sink = sink is not None
    row_spec = P("data", None, None)
    rep = P()

    sharded = _sharded_eval_program(
        mesh, float(temp1), float(temp2), has_sink, bool(use_fused),
        bool(interpret))
    # replicate the small operands explicitly so shard_map sees committed
    # shardings (host arrays would otherwise be re-committed per trace)
    words = jax.device_put(words, NamedSharding(mesh, rep))
    cap_lens = jax.device_put(cap_lens, NamedSharding(mesh, rep))
    sink_arg = (jax.device_put(sink, NamedSharding(mesh, rep)) if has_sink
                else jnp.zeros((words.shape[-1],), words.dtype))
    img_regions = jax.device_put(img_regions, NamedSharding(mesh, row_spec))
    out = sharded(img_regions, words, cap_lens, sink_arg)
    return out[:B] if pad else out


_SHARDED_EVAL_CACHE: dict = {}


def _sharded_eval_program(mesh, temp1: float, temp2: float, has_sink: bool,
                          use_fused: bool, interpret: bool):
    """Memoized ``jit(shard_map(...))`` row-block similarity program, keyed
    on the mesh and every trace-affecting flag; jit handles shape dispatch,
    so repeated eval batches reuse one executable."""
    from jax.sharding import PartitionSpec as P

    key = (mesh, temp1, temp2, has_sink, use_fused, interpret)
    fn = _SHARDED_EVAL_CACHE.get(key)
    if fn is not None:
        return fn

    def block(regions_blk, words_rep, lens_rep, sink_rep):
        s = sink_rep if has_sink else None
        if use_fused:
            from .pallas.local_sim import local_similarities_fused

            return local_similarities_fused(
                regions_blk, words_rep, lens_rep, temp1=temp1, temp2=temp2,
                agg="max", convention="eval", sink=s, interpret=interpret)
        return local_similarities_eval(
            regions_blk, words_rep, lens_rep, temp1=temp1, temp2=temp2, sink=s)

    fn = jax.jit(jax.shard_map(
        block, mesh=mesh,
        in_specs=(P("data", None, None), P(), P(), P()),
        out_specs=P("data", None),
        check_vma=False,  # pallas_call defeats replication inference
    ))
    _SHARDED_EVAL_CACHE[key] = fn
    return fn


def attention_entropy(attn: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    p = jnp.maximum(attn, eps)
    return -jnp.sum(p * jnp.log(p), axis=-1)
