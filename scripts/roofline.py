"""Roofline analysis of the flagship train step on the current device.

Prints, for the B=48 ResNet-50 + BERT-base pretrain step:
  - XLA's own cost analysis of the compiled step (FLOPs, bytes accessed),
  - measured achievable HBM bandwidth (triad microbenchmark, several sizes),
  - the implied compute-bound and bandwidth-bound step-time floors vs the
    measured step time.

    python scripts/roofline.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit_ms


def measure_bandwidth():
    """Streaming triad c = c*2 + b (reads 2 arrays, writes 1) iterated K
    times inside ONE jitted fori_loop — a single dispatch, so the remote
    tunnel's per-call latency doesn't pollute the measurement (docs/DESIGN.md
    "measurement trap").  Returns best GB/s."""
    best = 0.0
    K = 50
    for mb in (256, 1024):
        n = mb * 1024 * 1024 // 4
        c0 = jnp.ones((n,), jnp.float32)
        b = jnp.full((n,), 0.5, jnp.float32)

        @jax.jit
        def triad_k(c, y):
            return jax.lax.fori_loop(0, K, lambda i, acc: acc * 0.99 + y, c)

        ms = timeit_ms(triad_k, (c0, b), steps=3, sink=lambda o: o[0]) / K
        gbs = 3 * n * 4 / (ms / 1000) / 1e9
        print(f"triad {mb} MB/array x{K} in-jit: {ms:.3f} ms/iter -> {gbs:.0f} GB/s")
        best = max(best, gbs)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.synthetic import make_synthetic_batch

    cfg = default_pretrain_config()
    cfg.model.text.bert_config = {
        "vocab_size": 28996, "hidden_size": 768, "num_layers": 12, "num_heads": 12,
        "intermediate_size": 3072, "max_position_embeddings": 512,
    }
    raw = make_synthetic_batch(batch_size=48, num_tokens=97, imsize=224, vocab_size=28996)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, state, train_step, _ = init_gloria(cfg, raw, dtype=jnp.bfloat16)

    comp = train_step.lower(state, batch).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0))
    byte_keys = {k: v for k, v in ca.items() if "bytes" in k}
    print("cost_analysis:", {k: f"{v/1e9:.2f} GB" if v > 1e6 else v
                             for k, v in byte_keys.items()})
    bytes_accessed = float(ca.get("bytes accessed", 0))

    # measured step time (median of 3x20, value-materialized).  train_step
    # donates state, so thread st continuously — never rewind to a donated
    # buffer.
    st, m = train_step(state, batch)
    float(m["loss"])
    times = []
    for _ in range(3):
        acc = []
        t0 = time.perf_counter()
        for _ in range(20):
            st, m = train_step(st, batch)
            acc.append(m["loss"])
        float(jnp.stack(acc).sum())
        times.append((time.perf_counter() - t0) / 20 * 1000)
    times.sort()
    step_ms = times[1]

    bw = measure_bandwidth()
    peak_tf = 197.0  # v5e bf16
    t_compute = flops / (peak_tf * 1e12) * 1000
    t_bytes = bytes_accessed / (bw * 1e9) * 1000
    print(f"\nstep measured: {step_ms:.2f} ms  ({48/step_ms*1000:.0f} pairs/s)")
    print(f"XLA flops: {flops/1e12:.2f} TF -> compute floor {t_compute:.2f} ms "
          f"(MFU {t_compute/step_ms*100:.1f}%)")
    print(f"XLA bytes accessed: {bytes_accessed/1e9:.2f} GB -> bandwidth floor "
          f"at {bw:.0f} GB/s = {t_bytes:.2f} ms ({t_bytes/step_ms*100:.1f}% of step)")
    print(f"roofline floor max(compute, bytes): {max(t_compute, t_bytes):.2f} ms "
          f"-> step is within {step_ms/max(t_compute, t_bytes):.2f}x of the floor")


if __name__ == "__main__":
    main()
