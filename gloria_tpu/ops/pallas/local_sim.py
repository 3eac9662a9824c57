"""Fused pairwise word-region similarity as Pallas TPU kernels (fwd + bwd).

The local-matching program (``gloria_tpu.ops.gloria_loss.local_matching``)
materializes the pairwise tensors ``raw/a1/a2 ∈ [T, B, S, W]`` in HBM between
XLA fusions — at the reference pretrain shape (B=T=48, S=361, W=97) that is
hundreds of MB of HBM traffic per call.  These kernels keep the entire chain
— region⋅word logits, the double softmax (words per region, then ×temp1
regions per word), the cosine against the attention-weighted context, and
the exp/aggregate reduction — in VMEM, writing only the [B, T] similarity
matrix (and, in backward, the input gradients) to HBM.

Design notes (TPU/Mosaic-shaped):
- one grid cell = (image tile × text tile); the whole text tile is batched
  into ONE MXU matmul per image tile (``[TB, S, D] × [D, TT·W]``), then the
  softmax chain runs on the ``[TB, S, TT, W]`` view — no per-caption loop
  (the round-1 kernel looped texts with a ``fori_loop`` and lost 3.4× to
  XLA; this formulation wins — measurements below);
- the weighted-context norm uses the region Gram matrix
  (``‖a2ᵀC‖² = Σ_s a2·(G a2)``), computed once per image tile and reused by
  every caption — no [W, D] weighted-context tensor is ever materialized;
- operand blocks are bf16 (the MXU input precision XLA uses for f32 inputs
  anyway), accumulation f32;
- per-cell results land in the 128-wide output row block via a one-hot
  selection matmul (Mosaic requires lane-dim stores to be 128-aligned);
- backward recomputes the forward per tile (flash-attention-style remat)
  and emits ``dctx`` accumulated over the inner text sweep plus per-image-
  tile partial ``dwords`` (summed outside — accumulating both in one kernel
  would need conflicting grid orders).

Numerics match ``local_matching`` to bf16 tolerance; padded words/regions
are masked before their softmaxes so they carry exactly zero probability.

Measured on TPU v5e (1 chip) at the pretrain shape (T=B=48, S=361(+1 sink),
W=97, D=768), median of 3×20 steps, value-materialized, standalone:

    eval similarities (fwd only):   XLA 10.67 ms · this kernel 4.41 ms (2.42×)
    train sims fwd+bwd:             XLA chunked-remat path 13.23 ms
                                    · this kernel 12.55 ms (1.05×)

The forward win comes from fusing the whole chain in VMEM; the backward is
VPU-bound (the softmax-chain recompute makes ~7 elementwise passes over the
[TB,S,TT·W] tensors per cell), so casting its matmul operands to bf16 moved
nothing and the margin over XLA is small — kept because it also halves the
backward's HBM traffic and wins more as S·W grow.

Production wiring: ``cfg.model.gloria.fused_kernel`` routes the O(B²) sims
matrix of ``local_loss`` / ``local_similarities_eval`` through these kernels
(diagonal attention maps and the ablation extras keep the XLA path — they
are O(B) or ablation-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _forward_tile(ctx, gram, words, wvec, *, temp1, s_valid):
    """Shared fwd math on one (image tile, text tile) cell.

    ctx:   [TB, S, D]  bf16     gram: [TB, S, S] f32
    words: [TT, W, D]  bf16     wvec: [TT, W]    f32 (1.0 = valid word)
    Returns (raw [TB,S,TT,W] f32, a1, a2, dot [TB,TT,W], cn2 [TB,TT,W],
             wn [TT,W]).
    """
    TB, S, D = ctx.shape
    TT, W, _ = words.shape
    words_flat = words.reshape(TT * W, D)
    raw = jax.lax.dot_general(  # [TB, S, TT*W]
        ctx, words_flat, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TB, S, TT, W)
    wmask = (wvec > 0)[None, None, :, :]                      # [1,1,TT,W]
    region_ok = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1, 1), 1) < s_valid

    l1 = jnp.where(wmask, raw, NEG)
    m1 = jnp.max(l1, axis=3, keepdims=True)
    e1 = jnp.exp(l1 - m1)
    a1 = e1 / jnp.sum(e1, axis=3, keepdims=True)
    a1 = jnp.where(wmask, a1, 0.0)

    l2 = jnp.where(region_ok, temp1 * a1, NEG)
    m2 = jnp.max(l2, axis=1, keepdims=True)
    e2 = jnp.exp(l2 - m2)
    a2 = e2 / jnp.sum(e2, axis=1, keepdims=True)              # [TB,S,TT,W]

    dot = jnp.sum(a2 * raw, axis=1)                           # [TB,TT,W]
    # bf16 operands keep the MXU at full rate (f32 matmuls lower to 4-8
    # slower multi-pass emulation in Mosaic); accumulation stays f32
    ga2 = jax.lax.dot_general(  # G @ a2 over S: [TB, S, TT*W]
        gram.astype(jnp.bfloat16), a2.reshape(TB, S, TT * W).astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(TB, S, TT, W)
    cn2 = jnp.maximum(jnp.sum(a2 * ga2, axis=1), 1e-12)       # [TB,TT,W]
    wf = words.astype(jnp.float32)
    wn = jnp.sqrt(jnp.maximum(jnp.sum(wf * wf, axis=-1), 1e-12))  # [TT,W]
    return raw, a1, a2, dot, cn2, wn, ga2


def _sims_from_tile(dot, cn2, wn, wvec, *, temp2, agg):
    """[TB,TT,W] pieces → per-pair similarity [TB,TT]."""
    denom = jnp.maximum(wn[None] * jnp.sqrt(cn2), EPS)
    valid = wvec[None] > 0
    row_sim = jnp.where(valid, dot / denom, 0.0)
    e = jnp.where(valid, jnp.exp(temp2 * row_sim), 0.0)
    if agg == "sum":
        return jnp.log(jnp.maximum(jnp.sum(e, axis=-1), EPS)), row_sim, e
    if agg == "max":
        return jnp.log(jnp.maximum(jnp.max(e, axis=-1), EPS)), row_sim, e
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32), axis=-1), 1.0)
    return jnp.log(jnp.maximum(jnp.sum(e, axis=-1) / n_valid, EPS)), row_sim, e


def _fwd_kernel(words_ref, ctx_ref, mask_ref, out_ref, gram_ref, *,
                temp1, temp2, agg, tile_t, s_valid):
    j = pl.program_id(1)
    ctx = ctx_ref[...]

    @pl.when(j == 0)
    def _():
        gram_ref[...] = jax.lax.dot_general(
            ctx, ctx, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    words = words_ref[...]
    wvec = mask_ref[...]
    raw, a1, a2, dot, cn2, wn, _ = _forward_tile(
        ctx, gram_ref[...], words, wvec, temp1=temp1, s_valid=s_valid)
    vals, _, _ = _sims_from_tile(dot, cn2, wn, wvec, temp2=temp2, agg=agg)  # [TB,TT]

    # scatter the text tile's columns into the 128-wide row block with a
    # one-hot selection matmul (lane-aligned store)
    Tp = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_t, Tp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_t, Tp), 0)
    onehot = (col == j * tile_t + row).astype(jnp.float32)     # [TT, Tp]
    block = jax.lax.dot_general(
        vals, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        out_ref[...] = block

    @pl.when(j != 0)
    def _():
        out_ref[...] += block


def _bwd_kernel(words_ref, ctx_ref, mask_ref, g_ref,
                dctx_ref, dwords_ref, gram_ref, *,
                temp1, temp2, agg, tile_t, tile_b, s_valid):
    """Recompute fwd for the cell, then chain-rule back to dctx/dwords.

    g_ref: the FULL [Bp, Tp] upstream dL/dsims matrix (it is tiny; keeping
    it un-tiled lets the image tile drop below the 8-sublane block minimum
    — the backward holds ~7 live [TB,S,TT,W] f32 tensors, so tile_b=4 is
    what fits the 128 MB VMEM).  dctx_ref accumulates across the inner j
    sweep; dwords_ref holds this (i, j) cell's words-gradient (summed over
    image tiles outside).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    ctx = ctx_ref[...]

    @pl.when(j == 0)
    def _():
        gram_ref[...] = jax.lax.dot_general(
            ctx, ctx, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dctx_ref[...] = jnp.zeros_like(dctx_ref)

    words = words_ref[...]
    wvec = mask_ref[...]
    TB, S, D = ctx.shape
    TT, W, _ = words.shape
    gram = gram_ref[...]

    raw, a1, a2, dot, cn2, wn, ga2 = _forward_tile(
        ctx, gram, words, wvec, temp1=temp1, s_valid=s_valid)
    sims, row_sim, e = _sims_from_tile(dot, cn2, wn, wvec, temp2=temp2, agg=agg)

    # upstream for this cell: rows [i·TB, (i+1)·TB), columns [j·TT, (j+1)·TT).
    # Row selection is a one-hot matmul, not pl.ds: tile_b=4 starts are not
    # 8-sublane-aligned, and at Tp>128 Mosaic rejects the dynamic slice
    # ("cannot statically prove that index in dimension 0 is a multiple of 8").
    Bp, Tp = g_ref.shape
    rcol = jax.lax.broadcasted_iota(jnp.int32, (tile_b, Bp), 1)
    rrow = jax.lax.broadcasted_iota(jnp.int32, (tile_b, Bp), 0)
    rowsel = (rcol == i * tile_b + rrow).astype(jnp.float32)    # [TB, Bp]
    g_rows = jax.lax.dot_general(  # [TB, Tp]
        rowsel, g_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_t, Tp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_t, Tp), 0)
    onehot = (col == j * tile_t + row).astype(jnp.float32)      # [TT, Tp]
    g = jax.lax.dot_general(  # [TB, TT]
        g_rows, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    valid = wvec[None] > 0
    if agg in ("sum", "mean"):
        # sims = log(sum_w e / n); d/drow_sim = temp2 * e / sum_w e
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), EPS)
    else:  # max: subgradient at the argmax
        mx = jnp.max(e, axis=-1, keepdims=True)
        hit = jnp.where(valid, (e == mx).astype(jnp.float32), 0.0)
        p = hit / jnp.maximum(jnp.sum(hit, axis=-1, keepdims=True), 1.0)
    drow = g[:, :, None] * temp2 * p                            # [TB,TT,W]
    drow = jnp.where(valid, drow, 0.0)

    cn = jnp.sqrt(cn2)
    denom = jnp.maximum(wn[None] * cn, EPS)
    ddot = drow / denom                                         # [TB,TT,W]
    ddenom = -drow * dot / (denom * denom)
    dcn = ddenom * wn[None]
    dwn_pair = ddenom * cn                                      # [TB,TT,W]
    dcn2 = dcn / (2.0 * cn)

    # da2 = ddot·raw + dcn2·2·(G a2);    dG = dcn2 · a2 a2ᵀ (via dctx below)
    da2 = ddot[:, None] * raw + (2.0 * dcn2)[:, None] * ga2     # [TB,S,TT,W]
    # softmax_S backward: dl2 = a2 ⊙ (da2 − Σ_S a2·da2)
    dl2 = a2 * (da2 - jnp.sum(a2 * da2, axis=1, keepdims=True))
    da1 = temp1 * dl2
    # softmax_W backward: draw = a1 ⊙ (da1 − Σ_W a1·da1)
    draw = a1 * (da1 - jnp.sum(a1 * da1, axis=3, keepdims=True))
    draw = draw + ddot[:, None] * a2                            # d(dot)/d(raw)

    # --- dctx ------------------------------------------------------------
    # raw[b,s,(t,w)] = ctx[b,s,:]·words[(t,w),:] → dctx += draw @ words
    # (bf16 matmul operands, f32 accumulation — full-rate MXU)
    draw_flat = draw.reshape(TB, S, TT * W).astype(jnp.bfloat16)
    words_flat = words.reshape(TT * W, D)
    dctx = jax.lax.dot_general(  # [TB, S, D]
        draw_flat, words_flat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Gram term: dL/dG[b,s,u] = Σ_tw dcn2·a2[s]·a2[u]  → dctx += (dG+dGᵀ)·ctx
    # (dG + dGᵀ)·ctx = 2·Σ_tw dcn2 · a2 (a2ᵀ ctx) computed as two matmuls
    wa2 = (dcn2[:, None] * a2).reshape(TB, S, TT * W).astype(jnp.bfloat16)
    a2c = jax.lax.dot_general(  # a2ᵀ ctx: [TB, TT*W, D]
        a2.reshape(TB, S, TT * W).astype(jnp.bfloat16), ctx,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dctx += 2.0 * jax.lax.dot_general(  # [TB, S, D]
        wa2, a2c.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        dctx_ref[...] = dctx

    @pl.when(j != 0)
    def _():
        dctx_ref[...] += dctx

    # --- dwords (this image tile's partial) --------------------------------
    # Mosaic matmuls contract ONE dim: batch over TB, contract S, reduce TB
    dwords = jnp.sum(jax.lax.dot_general(
        draw_flat, ctx,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ), axis=0).reshape(TT, W, D)
    # + wn chain: dwn → words · (Σ_b dwn_pair)/wn
    dwn = jnp.sum(dwn_pair, axis=0)                             # [TT, W]
    dwords += (dwn / jnp.maximum(wn, 1e-12))[:, :, None] * words.astype(jnp.float32)
    dwords_ref[...] = dwords[None]


def _pad_operands(words, regions, word_mask, tile_t, tile_b):
    """Pad text rows only to the GRID granularity (Tg); the output row block
    is 128-lane padded (Tp) but the grid must not sweep the padding — at
    T=48, tile_t=8 that would be 16 text tiles where only 6 hold real texts
    (a 2.7× slowdown, measured)."""
    T, W, D = words.shape
    B, S, _ = regions.shape
    Wp = _round_up(W, 128)
    Sp = _round_up(S, 8)
    Dp = _round_up(D, 128)
    Tg = _round_up(T, tile_t)             # grid extent (real texts only)
    Tp = _round_up(Tg, 128)               # lane-aligned output width
    Bp = _round_up(B, tile_b)
    words_p = jnp.zeros((Tg, Wp, Dp), jnp.bfloat16).at[:T, :W, :D].set(words.astype(jnp.bfloat16))
    ctx_p = jnp.zeros((Bp, Sp, Dp), jnp.bfloat16).at[:B, :S, :D].set(regions.astype(jnp.bfloat16))
    mask_p = jnp.zeros((Tg, Wp), jnp.float32).at[:T, :W].set(word_mask.astype(jnp.float32))
    return words_p, ctx_p, mask_p, (Tg, Tp, Bp, Wp, Sp, Dp)


@functools.partial(
    jax.jit,
    static_argnames=("temp1", "temp2", "agg", "tile_t", "tile_b", "interpret"),
)
def pallas_local_similarities(
    words: jnp.ndarray,       # [T, W, D] float
    regions: jnp.ndarray,     # [B, S, D] float (sink already concatenated)
    word_mask: jnp.ndarray,   # [T, W] bool
    *,
    temp1: float = 4.0,
    temp2: float = 5.0,
    agg: str = "sum",
    tile_t: int = 8,
    tile_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Similarities [B, T] (reference layout: rows = images). Forward only."""
    interpret = interpret or jax.default_backend() != "tpu"  # CPU: emulate
    T, W, D = words.shape
    B, S, _ = regions.shape
    words_p, ctx_p, mask_p, (Tg, Tp, Bp, Wp, Sp, Dp) = _pad_operands(
        words, regions, word_mask, tile_t, tile_b)

    kernel = functools.partial(
        _fwd_kernel, temp1=float(temp1), temp2=float(temp2), agg=agg,
        tile_t=tile_t, s_valid=S,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile_b, Tg // tile_t),
        in_specs=[
            pl.BlockSpec((tile_t, Wp, Dp), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, Sp, Dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, Wp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, Tp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, Sp, Sp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(words_p, ctx_p, mask_p)
    return out[:B, :T]


def _sims_bwd_impl(words, regions, word_mask, g, *, temp1, temp2, agg,
                   tile_t, tile_b, interpret):
    interpret = interpret or jax.default_backend() != "tpu"  # CPU: emulate
    # the backward holds ~7 live [TB,S,TT·W] f32 intermediates; tile_b=4
    # fits v5e's 128 MB VMEM (8 needs ~164 MB, measured OOM)
    tile_b = min(tile_b, 4)
    T, W, D = words.shape
    B, S, _ = regions.shape
    words_p, ctx_p, mask_p, (Tg, Tp, Bp, Wp, Sp, Dp) = _pad_operands(
        words, regions, word_mask, tile_t, tile_b)
    g_p = jnp.zeros((Bp, Tp), jnp.float32).at[:B, :T].set(g.astype(jnp.float32))

    kernel = functools.partial(
        _bwd_kernel, temp1=float(temp1), temp2=float(temp2), agg=agg,
        tile_t=tile_t, tile_b=tile_b, s_valid=S,
    )
    n_btiles = Bp // tile_b
    dctx, dwords_part = pl.pallas_call(
        kernel,
        grid=(n_btiles, Tg // tile_t),
        in_specs=[
            pl.BlockSpec((tile_t, Wp, Dp), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, Sp, Dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, Wp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Tp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, Sp, Dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, Wp, Dp), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Sp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, Tg, Wp, Dp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, Sp, Sp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(words_p, ctx_p, mask_p, g_p)
    dwords = dwords_part.sum(0)[:T, :W, :D]
    return dwords, dctx[:B, :S, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_local_similarities(words, regions, word_mask,
                             temp1=4.0, temp2=5.0, agg="sum",
                             tile_t=8, tile_b=8, interpret=False):
    """Differentiable fused similarities [B, T] (custom VJP → bwd kernel).

    words [T, W, D] / regions [B, S, D] (sink pre-concatenated) /
    word_mask [T, W] bool.  Gradients flow to words and regions.
    """
    return pallas_local_similarities(
        words, regions, word_mask, temp1=temp1, temp2=temp2, agg=agg,
        tile_t=tile_t, tile_b=tile_b, interpret=interpret)


def _fused_fwd(words, regions, word_mask, temp1, temp2, agg, tile_t, tile_b, interpret):
    sims = pallas_local_similarities(
        words, regions, word_mask, temp1=temp1, temp2=temp2, agg=agg,
        tile_t=tile_t, tile_b=tile_b, interpret=interpret)
    return sims, (words, regions, word_mask)


def _fused_bwd(temp1, temp2, agg, tile_t, tile_b, interpret, res, g):
    words, regions, word_mask = res
    dwords, dregions = _sims_bwd_impl(
        words, regions, word_mask, g, temp1=temp1, temp2=temp2, agg=agg,
        tile_t=tile_t, tile_b=tile_b, interpret=interpret)
    return (dwords.astype(words.dtype), dregions.astype(regions.dtype), None)


fused_local_similarities.defvjp(_fused_fwd, _fused_bwd)


def local_similarities_fused(
    img_regions: jnp.ndarray,
    words: jnp.ndarray,
    cap_lens: jnp.ndarray,
    *,
    temp1: float = 4.0,
    temp2: float = 5.0,
    agg: str = "max",
    convention: str = "eval",
    sink: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``gloria_loss.local_similarities_eval`` backed by the
    Pallas kernel. Returns [B_img, T_text]."""
    from ..gloria_loss import make_word_mask

    ctx = img_regions
    if sink is not None:
        B, _, D = img_regions.shape
        ctx = jnp.concatenate(
            [jnp.broadcast_to(sink[None, None, :], (B, 1, D)), img_regions], axis=1
        )
    mask = make_word_mask(cap_lens, words.shape[1], convention)
    return fused_local_similarities(
        words, ctx, mask, temp1, temp2, agg, 8, 8, interpret
    )
