"""In-jit micro-bench: fused bottleneck-tail kernel vs the XLA chain.

Unlike bench_fused_bn.py (one dispatch per call — polluted by the remote
tunnel's ~2 ms per-call latency at these 0.2-2 ms op sizes), this wraps K
iterations in ONE jitted ``lax.scan`` with a feedback dependency (y2 is
perturbed by the previous y3 so nothing hoists), giving clean per-op device
time.  Also sweeps the Pallas row-tile size via the ``_tile_m`` hook.

    python scripts/experiments/bench_fused_bn_injit.py [--layers 1 2 3 4] [--tms 0 1024 2048]
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

SHAPES = {
    1: (48 * 75 * 75, 64, 256),
    2: (48 * 38 * 38, 128, 512),
    3: (48 * 19 * 19, 256, 1024),
    4: (48 * 10 * 10, 512, 2048),
}
K_ITERS = 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, nargs="*", default=[1, 2, 3, 4])
    ap.add_argument("--tms", type=int, nargs="*", default=[0],
                    help="pallas row-tile overrides; 0 = the kernel's default")
    ap.add_argument("--bwd", action="store_true", help="also time fwd+bwd")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import fused_bn

    default_tile_m = fused_bn._tile_m

    def xla_tail(yy, sc, sh, ww):
        z = jnp.maximum(yy.astype(jnp.float32) * sc + sh, 0.0).astype(jnp.bfloat16)
        y3 = jax.lax.dot_general(
            z, ww.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y3f = y3.astype(jnp.float32)
        return y3, jnp.sum(y3f, axis=0), jnp.sum(y3f * y3f, axis=0)

    for layer in args.layers:
        m, k, n = SHAPES[layer]
        rng = np.random.RandomState(layer)
        y2 = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        scale = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
        shift = jnp.asarray(rng.randn(k) * 0.2, jnp.float32)
        w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)
        # bytes the tail must move at minimum: read y2, write y3 (bf16)
        min_gb = (m * k * 2 + m * n * 2) / 1e9
        xla_gb = min_gb + m * (k + n) * 2 / 1e9  # + write z2, re-read y3 stats

        variants = [("xla", None, xla_tail)]
        for tm in args.tms:
            label = f"pallas tm={tm or 'auto'}"
            variants.append((label, tm, lambda *a: fused_bn.bottleneck_tail(*a, "pallas")))

        for name, tm, fn in variants:
            if tm:
                fused_bn._tile_m = lambda m_, k_, n_, bwd=False, _t=tm: _t
            else:
                fused_bn._tile_m = default_tile_m

            def k_loop(yy, sc, sh, ww, _fn=fn):
                def body(carry, _):
                    yy_c = carry
                    y3, s1, s2 = _fn(yy_c, sc, sh, ww)
                    # feedback: cheap [M,K] update depending on y3
                    yy_next = yy_c + (s1[:k].astype(jnp.bfloat16) * 0)
                    yy_next = yy_next + y3[:, :k] * jnp.bfloat16(1e-6)
                    return yy_next, (s1[0], s2[0])
                carry, outs = jax.lax.scan(body, yy, None, length=K_ITERS)
                return carry[0, 0], outs

            jitted = jax.jit(k_loop)
            try:
                ms = timeit_ms(jitted, (y2, scale, shift, w), steps=2,
                               sink=lambda o: o[0]) / K_ITERS
            except Exception as e:  # VMEM overflow at big tiles
                print(f"L{layer} {name:16s} fwd  FAILED: {type(e).__name__}", flush=True)
                continue
            gbs = min_gb / (ms / 1000)
            print(f"L{layer} M={m} K={k} N={n} {name:16s} fwd {ms:7.3f} ms "
                  f"({gbs:5.0f} GB/s vs min-traffic)", flush=True)

            if args.bwd:
                def loss_k(yy, sc, sh, ww, _fn=fn):
                    def body(carry, _):
                        yy_c = carry
                        y3, s1, s2 = _fn(yy_c, sc, sh, ww)
                        yy_next = yy_c + y3[:, :k] * jnp.bfloat16(1e-6)
                        return yy_next, jnp.sum(s1) + 1e-3 * jnp.sum(s2) + 1e-6 * jnp.sum(y3.astype(jnp.float32) ** 2)
                    carry, losses = jax.lax.scan(body, yy, None, length=K_ITERS)
                    return jnp.sum(losses) + carry.astype(jnp.float32)[0, 0]

                grad = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))
                try:
                    ms = timeit_ms(grad, (y2, scale, shift, w), steps=2,
                                   sink=lambda o: o[1]) / K_ITERS
                except Exception as e:
                    print(f"L{layer} {name:16s} f+b  FAILED: {type(e).__name__}", flush=True)
                    continue
                print(f"L{layer} M={m} K={k} N={n} {name:16s} f+b {ms:7.3f} ms", flush=True)

    fused_bn._tile_m = default_tile_m


if __name__ == "__main__":
    main()
