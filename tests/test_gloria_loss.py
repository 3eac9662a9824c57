"""Numeric parity of the vectorized matching program vs the loop oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gloria_tpu.ops import gloria_loss as gl
from reference_numerics import np_global_loss, np_local_loss

jax.config.update("jax_default_matmul_precision", "highest")


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def make_inputs(B=6, W=13, R=9, D=16, seed=0):
    rng = np.random.RandomState(seed)
    regions = rng.randn(B, R, D).astype(np.float32)
    words = rng.randn(B, W, D).astype(np.float32)
    cap_lens = rng.randint(3, W - 1, size=B).astype(np.int32)
    return regions, words, cap_lens


@pytest.mark.parametrize("agg", ["sum", "mean"])
@pytest.mark.parametrize("chunk", [0, 2, 4])
def test_local_similarities_match_oracle(agg, chunk):
    regions, words, cap_lens = make_inputs()
    ref = np_local_loss(regions, words, cap_lens, agg=agg)
    m = gl.local_matching(
        jnp.asarray(words), jnp.asarray(regions),
        gl.make_word_mask(jnp.asarray(cap_lens), words.shape[1], "train"),
        temp1=4.0, temp2=5.0, agg=agg, chunk=chunk,
    )
    np.testing.assert_allclose(np.asarray(m.similarities), ref["similarities"], rtol=8e-5, atol=8e-5)


def test_local_loss_matches_oracle():
    regions, words, cap_lens = make_inputs(seed=1)
    ref = np_local_loss(regions, words, cap_lens)
    l0, l1, na, kl, ent, attn = gl.local_loss(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens), chunk=3,
    )
    np.testing.assert_allclose(float(l0), ref["loss0"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l1), ref["loss1"], rtol=1e-4, atol=1e-5)
    # diagonal attention maps match on valid words
    for i, ref_attn in enumerate(ref["attn_maps"]):
        L = int(cap_lens[i])
        np.testing.assert_allclose(
            np.asarray(attn)[i, :L], ref_attn[i][:L], rtol=8e-5, atol=8e-5
        )


def test_ablation_losses_match_oracle():
    regions, words, cap_lens = make_inputs(seed=2)
    rng = np.random.RandomState(3)
    sink = rng.randn(regions.shape[-1]).astype(np.float32)
    ref = np_local_loss(regions, words, cap_lens, sink=sink)
    l0, l1, na, kl, ent, _ = gl.local_loss(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens),
        sink=jnp.asarray(sink),
        no_attn_loss_weight=0.7,
        attention_divergence_loss_weight=0.3,
        attention_entropy_loss_weight=1.0,  # gates only; loss is unweighted (reference wart)
        chunk=0,
    )
    np.testing.assert_allclose(float(l0), ref["loss0"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(na), 0.7 * ref["no_attn"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(kl), 0.3 * ref["kl"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ent), ref["entropy"], rtol=1e-4, atol=1e-5)


def test_sink_similarities_match_oracle():
    regions, words, cap_lens = make_inputs(seed=4)
    rng = np.random.RandomState(5)
    sink = rng.randn(regions.shape[-1]).astype(np.float32)
    ref = np_local_loss(regions, words, cap_lens, sink=sink)
    m = gl.local_matching(
        jnp.asarray(words), jnp.asarray(regions),
        gl.make_word_mask(jnp.asarray(cap_lens), words.shape[1], "train"),
        temp1=4.0, temp2=5.0, sink=jnp.asarray(sink), chunk=2,
    )
    np.testing.assert_allclose(np.asarray(m.similarities), ref["similarities"], rtol=8e-5, atol=8e-5)


def test_eval_similarities_match_oracle():
    # eval path: slice [1:L+1], max aggregation (gloria_model.py:171-207)
    regions, words, cap_lens = make_inputs(seed=6)
    ref = np_local_loss(regions, words, cap_lens, agg="max", eval_slice=True)
    sims = gl.local_similarities_eval(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens)
    )
    np.testing.assert_allclose(np.asarray(sims), ref["similarities"], rtol=8e-5, atol=8e-5)


@pytest.mark.parametrize("with_sink", [False, True])
def test_eval_diag_matches_pairwise_diagonal(with_sink):
    # O(B) aligned diagonal ≡ diagonal of the O(B²) pairwise eval matrix
    regions, words, cap_lens = make_inputs(seed=7)
    sink = (jnp.asarray(np.random.RandomState(8).randn(regions.shape[2]),
                        jnp.float32) if with_sink else None)
    full = gl.local_similarities_eval(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens), sink=sink)
    diag = gl.local_similarities_eval_diag(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens), sink=sink)
    np.testing.assert_allclose(np.asarray(diag), np.diagonal(np.asarray(full)),
                               rtol=5e-5, atol=5e-5)


def test_global_loss_matches_oracle():
    rng = np.random.RandomState(7)
    img = rng.randn(8, 32).astype(np.float32)
    txt = rng.randn(8, 32).astype(np.float32)
    ref0, ref1 = np_global_loss(img, txt)
    l0, l1 = gl.global_loss(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(float(l0), ref0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l1), ref1, rtol=1e-4, atol=1e-5)


def test_global_similarities_cosine():
    rng = np.random.RandomState(8)
    img = rng.randn(4, 16).astype(np.float32)
    txt = rng.randn(6, 16).astype(np.float32)
    got = np.asarray(gl.global_similarities(jnp.asarray(img), jnp.asarray(txt)))
    ref = (img / np.linalg.norm(img, axis=-1, keepdims=True)) @ (
        txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    ).T
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_attention_fn_matches_oracle():
    from reference_numerics import np_attention

    rng = np.random.RandomState(9)
    B, D, Q, R = 3, 8, 5, 7
    word = rng.randn(B, D, Q).astype(np.float32)
    ctx = rng.randn(B, D, R).astype(np.float32)
    ref_w, ref_a = np_attention(word, ctx, 4.0, None)
    got_w, got_a = gl.attention_fn(
        jnp.asarray(np.swapaxes(word, 1, 2)), jnp.asarray(np.swapaxes(ctx, 1, 2)), 4.0
    )
    np.testing.assert_allclose(np.asarray(got_a), ref_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.swapaxes(ref_w, 1, 2), rtol=1e-5, atol=1e-5)


def test_local_loss_grads_finite():
    regions, words, cap_lens = make_inputs(seed=10)

    def f(r, w):
        l0, l1, *_ = gl.local_loss(r, w, jnp.asarray(cap_lens), chunk=2)
        return l0 + l1

    g_r, g_w = jax.grad(f, argnums=(0, 1))(jnp.asarray(regions), jnp.asarray(words))
    assert np.isfinite(np.asarray(g_r)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    # padded/masked word positions must receive zero gradient
    for i in range(len(cap_lens)):
        assert np.abs(np.asarray(g_w)[i, int(cap_lens[i]):]).max() == 0.0


def test_grads_finite_with_zero_padded_word_rows():
    # real batches have exactly-zero embeddings at padded word positions
    # (segment aggregation emits zero rows); backward must stay finite
    regions, words, cap_lens = make_inputs(seed=11)
    for i, L in enumerate(cap_lens):
        words[i, int(L):] = 0.0

    def f(r, w):
        l0, l1, *_ = gl.local_loss(r, w, jnp.asarray(cap_lens), chunk=4)
        return l0 + l1

    g_r, g_w = jax.grad(f, argnums=(0, 1))(jnp.asarray(regions), jnp.asarray(words))
    assert np.isfinite(np.asarray(g_r)).all()
    assert np.isfinite(np.asarray(g_w)).all()


def test_bf16_storage_path_close_to_f32():
    # train-path knob: large pairwise intermediates stored bf16 (softmax math
    # and matmul accumulation stay f32) — the reference's fp16-AMP envelope.
    # f32 path must be bit-identical with compute_dtype unset or f32.
    regions, words, cap_lens = make_inputs(seed=12, B=8, W=17, R=11, D=32)
    args = (jnp.asarray(regions), jnp.asarray(words), jnp.asarray(cap_lens))

    l0_f, l1_f, *_, attn_f = gl.local_loss(*args, chunk=3)
    l0_e, l1_e, *_, attn_e = gl.local_loss(*args, chunk=3, compute_dtype=jnp.float32)
    assert float(l0_f) == float(l0_e) and float(l1_f) == float(l1_e)
    np.testing.assert_array_equal(np.asarray(attn_f), np.asarray(attn_e))

    l0_b, l1_b, *_, attn_b = gl.local_loss(*args, chunk=3, compute_dtype=jnp.bfloat16)
    assert attn_b.dtype == jnp.float32
    np.testing.assert_allclose(float(l0_b), float(l0_f), rtol=0.02, atol=0.02)
    np.testing.assert_allclose(float(l1_b), float(l1_f), rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.asarray(attn_b), np.asarray(attn_f), atol=0.02)

    def f(r, w):
        l0, l1, *_ = gl.local_loss(r, w, args[2], chunk=3, compute_dtype=jnp.bfloat16)
        return l0 + l1

    g_r, g_w = jax.grad(f, argnums=(0, 1))(args[0], args[1])
    assert np.isfinite(np.asarray(g_r)).all()
    assert np.isfinite(np.asarray(g_w)).all()
    # masked word positions still get exactly zero gradient through bf16 buffers
    for i in range(len(cap_lens)):
        assert np.abs(np.asarray(g_w)[i, int(cap_lens[i]):]).max() == 0.0
