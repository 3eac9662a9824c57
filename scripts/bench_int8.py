"""Probe: does XLA on this TPU lower int8 conv/matmul to the MXU int8 path?

v5e peak: 197 TF/s bf16, 394 TOP/s int8.  If int8 convs measure ~2x bf16,
a post-training-quantized serving mode is worth building; if they fall back
to slow paths, it is not.  Ten independent-weight convs are summed per call
so device time dominates the ~3 ms dispatch latency of this environment's
tunnel.

    python scripts/bench_int8.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _timing import timeit_ms

N_CONV = 10


def conv(x, w, out_t):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_t)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.RandomState(0)
    B, H, C = 48, 56, 256
    x8 = jnp.asarray(rng.randint(-127, 127, (B, H, H, C)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, (N_CONV, 3, 3, C, C)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    flops = 2.0 * B * H * H * C * C * 9 * N_CONV

    @jax.jit
    def run_i8(x, w):
        acc = jnp.zeros((), jnp.int64)
        out = sum(conv(x, w[i], jnp.int32).astype(jnp.int64).sum() for i in range(N_CONV))
        return acc + out

    @jax.jit
    def run_bf16(x, w):
        return sum(conv(x, w[i], jnp.float32).sum() for i in range(N_CONV))

    ms_b = timeit_ms(run_bf16, (xb, wb), steps=15, sink=lambda o: o)
    print(f"bf16 conv x{N_CONV}: {ms_b:7.3f} ms  {flops/ms_b/1e12:7.1f} TF/s")
    try:
        ms_i = timeit_ms(run_i8, (x8, w8), steps=15, sink=lambda o: o)
        print(f"int8 conv x{N_CONV}: {ms_i:7.3f} ms  {flops/ms_i/1e12:7.1f} TOP/s "
              f"({ms_b/ms_i:.2f}x vs bf16)")
    except Exception as e:
        print(f"int8 conv unsupported: {type(e).__name__}: {e}")

    # matmul probe at the text-tower shape
    M, K, N = 48 * 97, 768, 3072
    a8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (N_CONV, K, N)), jnp.int8)
    mf = 2.0 * M * K * N * N_CONV

    @jax.jit
    def mm_i8(a, b):
        return sum(lax.dot_general(a, b[i], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32).astype(jnp.int64).sum()
                   for i in range(N_CONV))

    @jax.jit
    def mm_bf16(a, b):
        return sum(lax.dot_general(a, b[i], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).sum()
                   for i in range(N_CONV))

    ms_mb = timeit_ms(mm_bf16, (a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16)),
                      steps=15, sink=lambda o: o)
    print(f"bf16 mm  x{N_CONV}: {ms_mb:7.3f} ms  {mf/ms_mb/1e12:7.1f} TF/s")
    try:
        ms_mi = timeit_ms(mm_i8, (a8, b8), steps=15, sink=lambda o: o)
        print(f"int8 mm  x{N_CONV}: {ms_mi:7.3f} ms  {mf/ms_mi/1e12:7.1f} TOP/s "
              f"({ms_mb/ms_mi:.2f}x vs bf16)")
    except Exception as e:
        print(f"int8 mm unsupported: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
