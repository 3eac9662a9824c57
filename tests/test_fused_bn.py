"""Fused bottleneck-tail kernel: numerics vs flax and vs autodiff.

Covers (CPU; the Pallas kernels run in interpreter mode):
- SplitBatchNorm == flax nn.BatchNorm (train + eval: outputs and running
  stats), and its folded affine == its normal apply;
- bottleneck_tail reference forward == plain composed ops, custom-VJP
  gradients == jax.grad of the composed ops;
- Pallas kernels (interpret) == reference impl, fwd + bwd, padded tails;
- fused ResNet-50 Bottleneck == unfused (outputs, gradients, batch_stats).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gloria_tpu.models.norm import SplitBatchNorm
from gloria_tpu.models.resnet import Bottleneck
from gloria_tpu.ops.pallas.fused_bn import (
    bottleneck_tail, bottleneck_tail_reference,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("train", [True, False])
def test_split_batch_norm_matches_flax(dtype, train):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 5, 5, 8) * 2 + 1, dtype)
    ours = SplitBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    v0 = ref.init(jax.random.PRNGKey(0), x)
    # non-trivial params + running stats
    v0 = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.rand(*a.shape), a.dtype) * 0.3, v0)
    y_ref, m_ref = ref.apply(v0, x, mutable=["batch_stats"])
    y_ours, m_ours = ours.apply(v0, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours, np.float32),
                               np.asarray(y_ref, np.float32), rtol=1e-6, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m_ours["batch_stats"][k]),
                                   np.asarray(m_ref["batch_stats"][k]),
                                   rtol=1e-6, atol=1e-6)


def test_split_batch_norm_fold_equals_apply():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 8), jnp.float32)
    bn = SplitBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.rand(*a.shape), a.dtype) * 0.3, v)
    y, m1 = bn.apply(v, x, mutable=["batch_stats"])
    (scale, shift), m2 = bn.apply(v, x, fold=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(x * scale + shift), np.asarray(y),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        m1, m2)


def test_split_batch_norm_from_sums():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(64, 8), jnp.float32)
    bn = SplitBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x)
    (sc_a, sh_a), m_a = bn.apply(v, x, fold=True, mutable=["batch_stats"])
    s1 = jnp.sum(x, axis=0)
    s2 = jnp.sum(x * x, axis=0)
    (sc_b, sh_b), m_b = bn.apply(v, sums=(s1, s2), count=x.shape[0],
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_a), np.asarray(sh_b), rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        m_a, m_b)


def _composed(y2, scale, shift, w):
    """The op's contract, written with plain jnp for autodiff comparison."""
    z = jnp.maximum(y2.astype(jnp.float32) * scale + shift, 0.0)
    y3 = jax.lax.dot_general(
        z.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    y3f = y3.astype(jnp.float32)
    return y3, jnp.sum(y3f, axis=0), jnp.sum(y3f * y3f, axis=0)


def _rand_inputs(m=48, k=16, n=32, seed=0):
    rng = np.random.RandomState(seed)
    y2 = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    scale = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(k) * 0.2, jnp.float32)
    w = jnp.asarray(rng.randn(k, n) * 0.1, jnp.float32)
    return y2, scale, shift, w


def test_reference_forward_matches_composed():
    args = _rand_inputs()
    outs_a = bottleneck_tail_reference(*args)
    outs_b = _composed(*args)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=1e-6)


def test_custom_vjp_matches_autodiff():
    y2, scale, shift, w = _rand_inputs()
    cot_seed = np.random.RandomState(3)

    def scalarize(fn):
        def s(sc, sh, ww, yy):
            y3, s1, s2 = fn(yy, sc, sh, ww)
            # weight every output so all three cotangent paths are exercised
            return (jnp.sum(y3.astype(jnp.float32) * c3) + jnp.sum(s1 * c1)
                    + jnp.sum(s2 * c2))
        return s

    c3 = jnp.asarray(cot_seed.randn(*(y2.shape[0], w.shape[1])), jnp.float32)
    c1 = jnp.asarray(cot_seed.randn(w.shape[1]), jnp.float32)
    c2 = jnp.asarray(cot_seed.randn(w.shape[1]) * 0.1, jnp.float32)

    g_ref = jax.grad(scalarize(_composed), argnums=(0, 1, 2, 3))(scale, shift, w, y2)
    g_op = jax.grad(scalarize(lambda yy, sc, sh, ww: bottleneck_tail(
        yy, sc, sh, ww, "reference")), argnums=(0, 1, 2, 3))(scale, shift, w, y2)
    names = ("dscale", "dshift", "dw", "dy2")
    for name, a, b in zip(names, g_op, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-2, err_msg=name)


@pytest.mark.parametrize("m", [48, 512, 600])  # 600 exercises the padded tail
def test_pallas_interpret_matches_reference(m):
    y2, scale, shift, w = _rand_inputs(m=m, k=128, n=128, seed=4)
    outs_ref = bottleneck_tail(y2, scale, shift, w, "reference")
    outs_pl = bottleneck_tail(y2, scale, shift, w, "interpret")
    for name, a, b in zip(("y3", "s1", "s2"), outs_pl, outs_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=1e-2 * max(1, m / 100), err_msg=name)

    def loss(impl):
        def f(yy, sc, sh, ww):
            y3, s1, s2 = bottleneck_tail(yy, sc, sh, ww, impl)
            return (jnp.sum(y3.astype(jnp.float32) ** 2) * 0.01 + jnp.sum(s1)
                    + 0.01 * jnp.sum(s2))
        return f

    g_ref = jax.grad(loss("reference"), argnums=(0, 1, 2, 3))(y2, scale, shift, w)
    g_pl = jax.grad(loss("interpret"), argnums=(0, 1, 2, 3))(y2, scale, shift, w)
    for name, a, b in zip(("dy2", "dscale", "dshift", "dw"), g_pl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-1, err_msg=name)


def test_fused_bottleneck_matches_unfused():
    # bf16 compute in BOTH paths (the fused kernel's native regime) so the
    # only divergence is fold-order rounding, not f32-vs-bf16
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 64) * 0.5, jnp.bfloat16)

    def run(fused):
        from functools import partial

        block = Bottleneck(planes=16, downsample=True, fused=fused,
                           conv=partial(nn.Conv, dtype=jnp.bfloat16,
                                        param_dtype=jnp.float32),
                           norm=partial(SplitBatchNorm, use_running_average=False,
                                        dtype=jnp.bfloat16))
        v = block.init(jax.random.PRNGKey(0), x)

        def loss(params, stats):
            out, muts = block.apply({"params": params, "batch_stats": stats}, x,
                                    mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2), (out, muts)

        (val, (out, muts)), grads = jax.value_and_grad(
            loss, has_aux=True)(v["params"], v["batch_stats"])
        return out, muts["batch_stats"], grads

    out_a, stats_a, grads_a = run(False)
    out_b, stats_b, grads_b = run(True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=5e-2, atol=5e-2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                                rtol=5e-2, atol=5e-2),
        stats_a, stats_b)
    flat_a = jax.tree_util.tree_leaves_with_path(grads_a)
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(grads_b)}
    assert set(flat_b) == {jax.tree_util.keystr(k) for k, v in flat_a}
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        # bf16 fold-order rounding: tight in relative terms except where a
        # near-cancellation leaves a small-magnitude element
        np.testing.assert_allclose(
            np.asarray(vb, np.float32), np.asarray(va, np.float32),
            rtol=1e-1, atol=8e-1, err_msg=jax.tree_util.keystr(k))
