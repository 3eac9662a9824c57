"""Pallas fused local-similarity kernel vs the reference JAX path (interpret mode on CPU).

Tolerances are bf16-level: the kernel stores its big operands in bf16
(matching the MXU input precision the XLA path uses on TPU)."""

import numpy as np

import jax.numpy as jnp

from gloria_tpu.ops import gloria_loss as gl
from gloria_tpu.ops.pallas.local_sim import local_similarities_fused, pallas_local_similarities


def test_kernel_matches_jax_path_eval():
    rng = np.random.RandomState(0)
    T, B, W, R, D = 5, 7, 13, 25, 32
    words = rng.randn(T, W, D).astype(np.float32)
    regions = rng.randn(B, R, D).astype(np.float32)
    cap_lens = rng.randint(3, W - 2, size=T).astype(np.int32)

    ref = gl.local_similarities_eval(jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens))
    got = local_similarities_fused(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens),
        agg="max", convention="eval", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_kernel_matches_jax_path_train_sum_with_sink():
    rng = np.random.RandomState(1)
    T, B, W, R, D = 4, 6, 10, 16, 24
    words = rng.randn(T, W, D).astype(np.float32)
    regions = rng.randn(B, R, D).astype(np.float32)
    sink = rng.randn(D).astype(np.float32)
    cap_lens = rng.randint(3, W - 2, size=T).astype(np.int32)
    mask = gl.make_word_mask(jnp.asarray(cap_lens), W, "train")

    ref = gl.local_matching(
        jnp.asarray(words), jnp.asarray(regions), mask,
        temp1=4.0, temp2=5.0, agg="sum", sink=jnp.asarray(sink), chunk=0,
        need_diag_attn=False,
    ).similarities
    got = local_similarities_fused(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens),
        agg="sum", convention="train", sink=jnp.asarray(sink), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_kernel_padding_safety():
    # shapes that are NOT multiples of the tiles exercise the padding path
    rng = np.random.RandomState(2)
    T, B, W, R, D = 3, 5, 97, 361, 48
    words = rng.randn(T, W, D).astype(np.float32)
    regions = rng.randn(B, R, D).astype(np.float32)
    cap_lens = np.asarray([96, 1, 40], np.int32)
    mask = gl.make_word_mask(jnp.asarray(cap_lens), W, "train")
    ref = gl.local_matching(jnp.asarray(words), jnp.asarray(regions), mask,
                             temp1=4.0, temp2=5.0, chunk=0,
                             need_diag_attn=False).similarities
    got = pallas_local_similarities(jnp.asarray(words), jnp.asarray(regions),
                                     mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_fused_custom_vjp_matches_xla_grads():
    import jax

    from gloria_tpu.ops.pallas.local_sim import fused_local_similarities

    rng = np.random.RandomState(3)
    T, B, W, R, D = 10, 6, 13, 21, 32
    words = jnp.asarray(rng.randn(T, W, D).astype(np.float32))
    regions = jnp.asarray(rng.randn(B, R, D).astype(np.float32))
    cap_lens = jnp.asarray(rng.randint(2, W - 2, T))
    mask = gl.make_word_mask(cap_lens, W, "train")
    gmat = jnp.asarray(rng.randn(B, T).astype(np.float32))

    def xla_loss(w, c):
        sims = gl.local_matching(w, c, mask, temp1=4.0, temp2=5.0, agg="sum",
                                 chunk=0, need_diag_attn=False).similarities
        return jnp.sum(sims * gmat)

    def fused_loss(w, c):
        sims = fused_local_similarities(w, c, mask, 4.0, 5.0, "sum", 8, 8, True)
        return jnp.sum(sims * gmat)

    gw_ref, gc_ref = jax.grad(xla_loss, argnums=(0, 1))(words, regions)
    gw, gc = jax.grad(fused_loss, argnums=(0, 1))(words, regions)
    scale_w = float(jnp.max(jnp.abs(gw_ref)))
    scale_c = float(jnp.max(jnp.abs(gc_ref)))
    assert float(jnp.max(jnp.abs(gw - gw_ref))) < 0.03 * scale_w + 1e-4
    assert float(jnp.max(jnp.abs(gc - gc_ref))) < 0.03 * scale_c + 1e-4


def test_local_loss_use_fused_matches_xla():
    """The production flag path: identical loss terms + diagonal attention
    (the fused route recomputes attn via the aligned attention_fn)."""
    import jax

    rng = np.random.RandomState(4)
    B, W, R, D = 6, 12, 16, 24
    words = jnp.asarray(rng.randn(B, W, D).astype(np.float32))
    regions = jnp.asarray(rng.randn(B, R, D).astype(np.float32))
    sink = jnp.asarray(rng.randn(D).astype(np.float32))
    cap_lens = jnp.asarray(rng.randint(3, W - 2, B))

    ref = gl.local_loss(regions, words, cap_lens, sink=sink,
                        no_attn_loss_weight=0.1, chunk=0)
    got = gl.local_loss(regions, words, cap_lens, sink=sink,
                        no_attn_loss_weight=0.1, use_fused=True)
    for a, b in zip(ref[:3], got[:3]):  # loss0, loss1, no_attn
        np.testing.assert_allclose(float(a), float(b), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got[5]), np.asarray(ref[5]),
                               rtol=1e-4, atol=1e-5)  # attn_diag: same math
