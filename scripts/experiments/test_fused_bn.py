"""Tests for the ARCHIVED fused bottleneck-tail kernel (see fused_bn.py).

The kernel was removed from the product model in round 4 (it lost 56%
end-to-end on the v5e train step, docs/DESIGN.md) and lives here as a
documented negative result.  Run directly:

    python -m pytest scripts/experiments/test_fused_bn.py -q

Covers (CPU; the Pallas kernels run in interpreter mode):
- bottleneck_tail reference forward == plain composed ops, custom-VJP
  gradients == jax.grad of the composed ops;
- Pallas kernels (interpret) == reference impl, fwd + bwd, padded tails.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fused_bn import bottleneck_tail, bottleneck_tail_reference  # noqa: E402


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
