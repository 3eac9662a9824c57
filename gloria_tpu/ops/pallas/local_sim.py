"""Fused pairwise word-region similarity as a Pallas TPU kernel.

The local-matching program (``gloria_tpu.ops.gloria_loss.local_matching``)
materializes the pairwise tensors ``raw/a1/a2 ∈ [T, B, S, W]`` in HBM between
XLA fusions — at the reference pretrain shape (B=T=48, S=361, W=97) that is
~3 × 325 MB of HBM traffic per call.  This kernel keeps the entire chain —
region⋅word logits, the double softmax (words per region, then ×temp1
regions per word), the cosine against the attention-weighted context, and
the exp/aggregate reduction — in VMEM, writing only the [T, B] similarity
matrix back to HBM.

Design notes (TPU/Mosaic-shaped):
- one grid cell = (text tile × image tile); per *text* the kernel batches
  ALL images of the tile into single MXU matmuls
  (``[TB, S, D] × [D, W] → [TB, S, W]``) instead of per-pair small dots;
- the weighted-context norm uses the region Gram matrix
  (``‖a2ᵀC‖² = Σ_s a2·(G a2)``), computed once per image tile and reused by
  every caption — no [W, D] weighted-context tensor is ever materialized;
- operand blocks are bf16 (the MXU input precision XLA uses for f32 inputs
  anyway), accumulation f32;
- output stores go through a full-width row block with an iota-mask
  accumulate (Mosaic requires lane-dim stores to be 128-aligned).

Numerics match ``local_matching`` to bf16 tolerance; padded words/regions are
masked to -inf before their softmaxes so they carry exactly zero probability.

Measured on TPU v5e (1 chip), vs the XLA einsum path of ``local_matching``:

    shape (T=B=48,  S=361, W=97, D=768):  XLA 5.2 ms · this kernel 17.6 ms
    shape (T=B=200, chunked scan XLA):    XLA 75 ms  · this kernel 148 ms
    rel. error vs XLA path: ~3e-5

XLA's fused batched einsums win at these shapes — the sequential
text loop (required to keep Mosaic compile time sane; the fully unrolled
variant compiles for >10 min) leaves the MXU underfed between softmax
chains.  The XLA path therefore remains the production default; this kernel
is kept as a validated alternative and a base for future tuning (it becomes
attractive if HBM pressure grows, e.g. much larger region/word counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(words_ref, ctx_ref, mask_ref, out_ref, gram_ref, *, temp1, temp2, agg,
            tile_t, tile_b, s_valid):
    # words_ref: [TILE_T, W, D] bf16 (streamed over the inner grid dim)
    # ctx_ref:   [TILE_B, S, D] bf16 (resident per outer image tile)
    # mask_ref:  [TILE_T, W] f32;  out_ref: [TILE_B, T_padded] f32
    # gram_ref:  [TILE_B, S, S] f32 scratch, persists across the inner sweep
    S = ctx_ref.shape[1]
    neg = jnp.float32(-1e30)
    j = pl.program_id(1)

    ctx = ctx_ref[...]  # [TB, S, D]

    @pl.when(j == 0)
    def _():
        # region Gram matrices, once per image tile, reused by every caption
        gram_ref[...] = jax.lax.dot_general(
            ctx, ctx, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, :] = jnp.zeros_like(out_ref)

    gram = gram_ref[...]
    region_ok = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) < s_valid

    def one_text(t):
        words = words_ref[pl.ds(t, 1), :, :][0]       # [W, D] bf16
        wvec = mask_ref[pl.ds(t, 1), :][0]            # [W] f32
        wmask = (wvec > 0)[None, None, :]             # [1, 1, W]
        # logits for ALL images of the tile at once: [TB, S, W]
        raw = jax.lax.dot_general(
            ctx, words, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # softmax over words per region (masked)
        l1 = jnp.where(wmask, raw, neg)
        m1 = jnp.max(l1, axis=-1, keepdims=True)
        e1 = jnp.exp(l1 - m1)
        a1 = e1 / jnp.sum(e1, axis=-1, keepdims=True)
        a1 = jnp.where(wmask, a1, 0.0)
        # softmax over regions per word (×temp1, padded regions masked)
        l2 = jnp.where(region_ok, temp1 * a1, neg)
        m2 = jnp.max(l2, axis=1, keepdims=True)
        e2 = jnp.exp(l2 - m2)
        a2 = e2 / jnp.sum(e2, axis=1, keepdims=True)  # [TB, S, W]
        # cosine numerator: Σ_s a2[s,w]·raw[s,w]
        dot = jnp.sum(a2 * raw, axis=1)               # [TB, W]
        # ‖a2ᵀC‖² via the Gram matrix: Σ_s a2 · (G a2)
        ga2 = jax.lax.dot_general(
            gram, a2, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # [TB, S, W]
        cn2 = jnp.maximum(jnp.sum(a2 * ga2, axis=1), 1e-12)
        words_f = words.astype(jnp.float32)
        wn = jnp.sqrt(jnp.maximum(jnp.sum(words_f * words_f, axis=-1), 1e-12))  # [W]
        denom = jnp.maximum(wn[None, :] * jnp.sqrt(cn2), EPS)
        row_sim = jnp.where(wvec[None, :] > 0, dot / denom, 0.0)  # [TB, W]
        e = jnp.where(wvec[None, :] > 0, jnp.exp(temp2 * row_sim), 0.0)
        if agg == "sum":
            vals = jnp.log(jnp.maximum(jnp.sum(e, axis=-1), EPS))
        elif agg == "max":
            vals = jnp.log(jnp.maximum(jnp.max(e, axis=-1), EPS))
        else:  # mean
            n_valid = jnp.maximum(jnp.sum((wvec > 0).astype(jnp.float32)), 1.0)
            vals = jnp.log(jnp.maximum(jnp.sum(e, axis=-1) / n_valid, EPS))
        return vals  # [TB]

    # Mosaic requires lane-dim stores to be 128-aligned; scatter each text's
    # [TB] image-column values into the full-width [TB, Tp] row block with an
    # iota mask and accumulate (the block stays resident across the j sweep).
    Tp = out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_b, Tp), 1)

    def body(t, acc):
        vals = one_text(t)  # [TB]
        return acc + jnp.where(col == j * tile_t + t, vals[:, None], 0.0)

    acc = jax.lax.fori_loop(0, tile_t, body, jnp.zeros((tile_b, Tp), jnp.float32))
    out_ref[:, :] += acc


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
    """Returns similarities [B, T] (reference layout: rows = images)."""
    T, W, D = words.shape
    B, S, _ = regions.shape
    Wp = _round_up(W, 128)
    Sp = _round_up(S, 8)
    Dp = _round_up(D, 128)
    Tp = _round_up(_round_up(T, tile_t), 128)  # lane-aligned output columns
    Bp = _round_up(B, tile_b)

    # bf16 operand blocks: halves VMEM and feeds the MXU natively (the XLA
    # path's default f32 matmul precision also rounds inputs to bf16)
    words_p = jnp.zeros((Tp, Wp, Dp), jnp.bfloat16).at[:T, :W, :D].set(words.astype(jnp.bfloat16))
    ctx_p = jnp.zeros((Bp, Sp, Dp), jnp.bfloat16).at[:B, :S, :D].set(regions.astype(jnp.bfloat16))
    mask_p = jnp.zeros((Tp, Wp), jnp.float32).at[:T, :W].set(word_mask.astype(jnp.float32))

    kernel = functools.partial(
        _kernel, temp1=float(temp1), temp2=float(temp2), agg=agg,
        tile_t=tile_t, tile_b=tile_b, s_valid=S,
    )
    # grid: image tiles outer (ctx + Gram resident), text tiles streamed inner
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile_b, Tp // tile_t),
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
    return pallas_local_similarities(
        words, ctx, mask, temp1=temp1, temp2=temp2, agg=agg, interpret=interpret
    )
