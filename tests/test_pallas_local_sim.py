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
                             temp1=4.0, temp2=5.0, chunk=0).similarities
    got = pallas_local_similarities(jnp.asarray(words), jnp.asarray(regions),
                                     mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)
