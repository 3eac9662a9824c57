"""Microbench the BN-backward reduction pattern at ResNet-50 hot shapes.

The op-level profile (profile_img_ops.py at 299^2) shows convert_reduce
fusions — per-channel reductions of g and g*xhat over [B,H,W] with f32
accumulation — running at ~260 GB/s, 40% of the 649 GB/s triad ceiling.
This bench isolates that pattern and sweeps layout/accumulation variants to
find a shape XLA reduces at full bandwidth.

    python scripts/bench_bn_reduce.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # scripts/ for _timing
sys.path.insert(0, str(Path(__file__).resolve().parent))  # archived kernel

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit_ms

# (label, B, H, W, C) — the stem/layer1/layer2 activations at 299^2 input
SHAPES = [
    ("stem 150x150x64", 48, 150, 150, 64),
    ("l1 75x75x256", 48, 75, 75, 256),
]


def run(label, fn, args, nbytes):
    ms = timeit_ms(fn, args, steps=15)
    gbs = nbytes / (ms / 1000) / 1e9
    print(f"  {label:34s} {ms:7.3f} ms  {gbs:7.1f} GB/s", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.RandomState(0)
    for label, b, h, w, c in SHAPES:
        x = jnp.asarray(rng.rand(b, h, w, c), jnp.bfloat16)
        g = jnp.asarray(rng.rand(b, h, w, c), jnp.bfloat16)
        nbytes = 2 * x.size * 2  # read both arrays once
        print(f"{label}: [{b},{h},{w},{c}] bf16, {nbytes/1e6:.0f} MB/pass-pair")

        @jax.jit
        def bn_bwd_4d(x, g):
            xf = x.astype(jnp.float32)
            gf = g.astype(jnp.float32)
            return jnp.stack([(gf * xf).sum((0, 1, 2)), gf.sum((0, 1, 2))])

        run("4d axes(0,1,2) f32", bn_bwd_4d, (x, g), nbytes)

        @jax.jit
        def bn_bwd_2d(x, g):
            cc = x.shape[-1]
            xf = x.reshape(-1, cc).astype(jnp.float32)
            gf = g.reshape(-1, cc).astype(jnp.float32)
            return jnp.stack([(gf * xf).sum(0), gf.sum(0)])

        run("2d reshape [N,C] f32", bn_bwd_2d, (x, g), nbytes)

        @jax.jit
        def bn_bwd_dot(x, g):
            cc = x.shape[-1]
            xf = x.reshape(-1, cc)
            gf = g.reshape(-1, cc)
            ones = jnp.ones((1, xf.shape[0]), jnp.bfloat16)
            prod = (gf.astype(jnp.float32) * xf.astype(jnp.float32)).astype(jnp.bfloat16)
            a = jax.lax.dot_general(ones, prod, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            bsum = jax.lax.dot_general(ones, gf, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            return jnp.stack([a[0], bsum[0]])

        run("ones-dot (MXU reduce)", bn_bwd_dot, (x, g), nbytes)

        @jax.jit
        def bn_bwd_bf16acc(x, g):
            # two-stage: reduce spatial in f32 per batch row, then batch
            xf = x.astype(jnp.float32)
            gf = g.astype(jnp.float32)
            p1 = (gf * xf).sum((1, 2))  # [B,C]
            p2 = gf.sum((1, 2))
            return jnp.stack([p1.sum(0), p2.sum(0)])

        run("two-stage (spatial,batch)", bn_bwd_bf16acc, (x, g), nbytes)

        # single-array triad-style control: just read both, no product
        @jax.jit
        def control(x, g):
            return x.astype(jnp.float32).sum() + g.astype(jnp.float32).sum()

        run("control: full-sum to scalar", control, (x, g), nbytes)
        print()


if __name__ == "__main__":
    main()
