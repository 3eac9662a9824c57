"""ARCHIVED EXPERIMENT — fused bottleneck tail (bn2-apply + relu + 1x1 conv3
+ bn3 batch stats).

Removed from the product model in round 4: measured −56% end-to-end on the
v5e image tower (docs/DESIGN.md, "Round-3 roofline + the fused-BN
experiment"), and it only applies in train mode — eval BN is a frozen affine
XLA already fuses into the convolutions, so no inference regime rescues it.
Kept here with its tests (test_fused_bn.py) and bench scripts as the record
of why per-block Pallas fusion loses to XLA's program-level fusion at these
shapes.

Why this op exists (TPU roofline, not reference structure): the ResNet-50
train step is HBM-bandwidth-bound in its BatchNorm traffic — the op-level
trace (docs/DESIGN.md) shows ~11 ms of a 75 ms step in convert+reduce
fusions that re-read every activation for BN batch stats and BN/grad
reductions.  XLA cannot fuse a reduction into a convolution, so per
bottleneck block (reference topology ``gloria/models/cnn_backbones.py`` /
torchvision Bottleneck) the chain

    y2 = conv2(...)                      # 3x3, stays XLA
    z2 = relu(bn2(y2))                   # materializes z2 (write + read)
    y3 = conv3(z2)                       # 1x1 -> a pure [M,K]x[K,N] matmul
    mu3, var3 = batch_stats(y3)          # separate full read of y3

costs three extra full passes over HBM.  This Pallas op computes the whole
tail in ONE pass: the bn2-apply+relu runs in-register as the matmul
prologue (z2 is never materialized), and the per-channel sum / sum-of-
squares of y3 accumulate in VMEM as the epilogue (no separate stats read).

The custom VJP fuses the backward the same way: one kernel produces dy2
(through the relu/bn2-scale mask), the bn2 scale/shift reductions, and the
conv3 weight gradient, without materializing the intermediate cotangents
XLA would round-trip through HBM.

Numerics: matmuls run bf16xbf16 with f32 accumulation (the same envelope as
the XLA path); stats are taken on the bf16-rounded y3 exactly like the
unfused path's reduce over the materialized bf16 tensor.  Weight gradients
are accumulated and returned in f32 (the unfused path rounds them through
bf16 — the fused path is strictly tighter).

``bottleneck_tail`` dispatches to the Pallas kernels on TPU and to the
jnp reference implementation elsewhere; both are exercised against each
other and against jax.grad of the reference in tests/test_fused_bn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# reference implementation (the contract; also the CPU path)
# ---------------------------------------------------------------------------

def bottleneck_tail_reference(y2, scale, shift, w):
    """y2 [M, K] bf16, scale/shift [K] f32, w [K, N] f32 ->
    (y3 [M, N] bf16, s1 [N] f32 = sum(y3), s2 [N] f32 = sum(y3^2))."""
    z = jnp.maximum(y2.astype(jnp.float32) * scale + shift, 0.0)
    y3 = jax.lax.dot_general(
        z.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    y3f = y3.astype(jnp.float32)
    return y3, jnp.sum(y3f, axis=0), jnp.sum(y3f * y3f, axis=0)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _tile_m(m: int, k: int, n: int, bwd: bool = False) -> int:
    """Largest row-tile that (a) divides M exactly — a non-divisor tile
    forces a full pad copy on the way in and a slice copy on the way out,
    several extra HBM passes — (b) is sublane-aligned (×16 for bf16), and
    (c) keeps (w + tiles + f32 accumulators) comfortably inside VMEM."""
    cap = 256 if max(k, n) >= 2048 else 512
    if bwd:
        # the backward kernel additionally holds the f32 [K, N] dW
        # accumulator and the f32 G tile — halve the row tile at the widest
        # shapes to stay under the 16 MB VMEM budget
        cap //= 2
    if m % 16 == 0:
        for tm in range(cap, 0, -16):
            if m % tm == 0:
                return tm
    return cap  # fall back to padding


def _fwd_kernel(m_valid, y2_ref, scale_ref, shift_ref, w_ref,
                y3_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    tm = y2_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + i * tm
    valid = (row < m_valid).astype(jnp.float32)

    a = y2_ref[:].astype(jnp.float32) * scale_ref[:] + shift_ref[:]
    z = jnp.maximum(a, 0.0) * valid  # zero padded rows out of the stats
    y3 = jax.lax.dot_general(
        z.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    y3_ref[:] = y3
    y3f = y3.astype(jnp.float32)
    part1 = jnp.sum(y3f, axis=0, keepdims=True)
    part2 = jnp.sum(y3f * y3f, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        s1_ref[:] = part1
        s2_ref[:] = part2

    @pl.when(i > 0)
    def _():
        s1_ref[:] = s1_ref[:] + part1
        s2_ref[:] = s2_ref[:] + part2


def _bwd_kernel(m_valid, y2_ref, scale_ref, shift_ref, w_ref,
                y3_ref, gy3_ref, gs1_ref, gs2_ref,
                dy2_ref, dsc_ref, dsh_ref, dw_ref):
    i = pl.program_id(0)
    tm = y2_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + i * tm
    valid = (row < m_valid).astype(jnp.float32)

    # G = d(loss)/d(y3 f32 accum): upstream cotangent + the stat outputs'
    # contributions (d s1 -> 1, d s2 -> 2*y3)
    y3f = y3_ref[:].astype(jnp.float32)
    g = (gy3_ref[:].astype(jnp.float32) + gs1_ref[:] + 2.0 * y3f * gs2_ref[:]) * valid
    g_bf = g.astype(jnp.bfloat16)

    # dz = G @ W^T  (contract N)
    dz = jax.lax.dot_general(
        g_bf, w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y2f = y2_ref[:].astype(jnp.float32)
    a = y2f * scale_ref[:] + shift_ref[:]
    mask = (a > 0.0).astype(jnp.float32) * valid
    dzm = dz * mask
    dy2_ref[:] = (dzm * scale_ref[:]).astype(dy2_ref.dtype)

    part_sc = jnp.sum(dzm * y2f, axis=0, keepdims=True)
    part_sh = jnp.sum(dzm, axis=0, keepdims=True)
    # dW = z^T @ G
    z = jnp.maximum(a, 0.0) * valid
    part_dw = jax.lax.dot_general(
        z.astype(jnp.bfloat16), g_bf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dsc_ref[:] = part_sc
        dsh_ref[:] = part_sh
        dw_ref[:] = part_dw

    @pl.when(i > 0)
    def _():
        dsc_ref[:] = dsc_ref[:] + part_sc
        dsh_ref[:] = dsh_ref[:] + part_sh
        dw_ref[:] = dw_ref[:] + part_dw


try:  # pallas import is deferred so CPU-only environments never need it
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _pad_rows(x, tm):
    m = x.shape[0]
    pad = (-m) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _fwd_pallas(y2, scale, shift, w, interpret=False):
    m, k = y2.shape
    n = w.shape[1]
    tm = _tile_m(m, k, n)
    y2p = _pad_rows(y2, tm)
    grid = y2p.shape[0] // tm
    y3p, s1, s2 = pl.pallas_call(
        functools.partial(_fwd_kernel, m),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((y2p.shape[0], n), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(y2p, scale[None, :], shift[None, :], w)
    return y3p[:m], s1[0], s2[0]


def _bwd_pallas(y2, scale, shift, w, y3, gy3, gs1, gs2, interpret=False):
    m, k = y2.shape
    n = w.shape[1]
    tm = _tile_m(m, k, n, bwd=True)
    y2p = _pad_rows(y2, tm)
    y3p = _pad_rows(y3, tm)
    gy3p = _pad_rows(gy3.astype(jnp.bfloat16), tm)
    grid = y2p.shape[0] // tm
    dy2p, dsc, dsh, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, m),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((y2p.shape[0], k), y2.dtype),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
        ],
        interpret=interpret,
    )(y2p, scale[None, :], shift[None, :], w, y3p, gy3p,
      gs1[None, :], gs2[None, :])
    return dy2p[:m], dsc[0], dsh[0], dw


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return _HAVE_PALLAS and jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bottleneck_tail(y2, scale, shift, w, impl: str = "auto"):
    """relu(y2*scale + shift) @ w, plus per-channel sum / sum-of-squares of
    the bf16 result — one HBM pass on TPU.

    y2 [M, K] bf16; scale/shift [K] f32 (folded bn2: scale = gamma*rsqrt(var
    +eps), shift = beta - mean*scale); w [K, N] f32 (the 1x1 conv3 kernel).
    Returns (y3 [M, N] bf16, s1 [N] f32, s2 [N] f32).

    impl: 'auto' (pallas on TPU, reference elsewhere) | 'pallas' |
    'interpret' (pallas interpreter, for CPU tests) | 'reference'.
    """
    y3, s1, s2, _ = _fwd_dispatch(y2, scale, shift, w, impl)
    return y3, s1, s2


def _fwd_dispatch(y2, scale, shift, w, impl):
    use_pallas = impl in ("pallas", "interpret") or (impl == "auto" and _use_pallas())
    if use_pallas:
        y3, s1, s2 = _fwd_pallas(y2, scale, shift, w, interpret=(impl == "interpret"))
    else:
        y3, s1, s2 = bottleneck_tail_reference(y2, scale, shift, w)
    return y3, s1, s2, use_pallas


def _tail_fwd(y2, scale, shift, w, impl):
    y3, s1, s2, _ = _fwd_dispatch(y2, scale, shift, w, impl)
    return (y3, s1, s2), (y2, scale, shift, w, y3)


def _tail_bwd(impl, res, cts):
    y2, scale, shift, w, y3 = res
    gy3, gs1, gs2 = cts
    use_pallas = impl in ("pallas", "interpret") or (impl == "auto" and _use_pallas())
    if use_pallas:
        dy2, dsc, dsh, dw = _bwd_pallas(y2, scale, shift, w, y3, gy3, gs1, gs2,
                                        interpret=(impl == "interpret"))
    else:
        y2f = y2.astype(jnp.float32)
        y3f = y3.astype(jnp.float32)
        g = gy3.astype(jnp.float32) + gs1[None, :] + 2.0 * y3f * gs2[None, :]
        g_bf = g.astype(jnp.bfloat16)
        dz = jax.lax.dot_general(
            g_bf, w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a = y2f * scale[None, :] + shift[None, :]
        mask = (a > 0.0).astype(jnp.float32)
        dzm = dz * mask
        dy2 = (dzm * scale[None, :]).astype(y2.dtype)
        dsc = jnp.sum(dzm * y2f, axis=0)
        dsh = jnp.sum(dzm, axis=0)
        z = jnp.maximum(a, 0.0)
        dw = jax.lax.dot_general(
            z.astype(jnp.bfloat16), g_bf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return dy2, dsc, dsh, dw.astype(jnp.float32)


bottleneck_tail.defvjp(_tail_fwd, _tail_bwd)
