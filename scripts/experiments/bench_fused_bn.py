"""Per-shape micro-bench: fused bottleneck-tail kernel vs the XLA chain.

For each ResNet-50 bottleneck tail shape (M = B*H*W at B=48, K = width,
N = 4*width), times forward and fwd+bwd of:
  - the Pallas fused op  (bottleneck_tail impl='pallas')
  - the XLA composition  (bn-apply+relu -> 1x1 matmul -> stats)

    python scripts/experiments/bench_fused_bn.py [--layers 1 2 3 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # scripts/ for _timing
sys.path.insert(0, str(Path(__file__).resolve().parent))  # archived kernel

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit_ms

# (layer, M=B*H*W for B=48 input 299, K, N)
SHAPES = {
    1: (48 * 75 * 75, 64, 256),
    2: (48 * 38 * 38, 128, 512),
    3: (48 * 19 * 19, 256, 1024),
    4: (48 * 10 * 10, 512, 2048),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, nargs="*", default=[1, 2, 3, 4])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from fused_bn import bottleneck_tail

    for layer in args.layers:
        m, k, n = SHAPES[layer]
        rng = np.random.RandomState(layer)
        y2 = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        scale = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
        shift = jnp.asarray(rng.randn(k) * 0.2, jnp.float32)
        w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)

        def xla_tail(yy, sc, sh, ww):
            z = jnp.maximum(yy.astype(jnp.float32) * sc + sh, 0.0).astype(jnp.bfloat16)
            y3 = jax.lax.dot_general(
                z, ww.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            y3f = y3.astype(jnp.float32)
            return y3, jnp.sum(y3f, axis=0), jnp.sum(y3f * y3f, axis=0)

        for name, fn in (("pallas", lambda *a: bottleneck_tail(*a, "pallas")),
                         ("xla", xla_tail)):
            fwd = jax.jit(fn)
            ms = timeit_ms(fwd, (y2, scale, shift, w), steps=args.steps,
                           sink=lambda o: o[1])
            print(f"L{layer} M={m} K={k} N={n} {name:6s} fwd     {ms:7.3f} ms", flush=True)

            def loss(yy, sc, sh, ww, _fn=fn):
                y3, s1, s2 = _fn(yy, sc, sh, ww)
                return jnp.sum(y3.astype(jnp.float32) ** 2) * 1e-3 + jnp.sum(s1) + 1e-3 * jnp.sum(s2)

            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            ms = timeit_ms(grad, (y2, scale, shift, w), steps=args.steps,
                           sink=lambda o: o[1])
            print(f"L{layer} M={m} K={k} N={n} {name:6s} fwd+bwd {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
