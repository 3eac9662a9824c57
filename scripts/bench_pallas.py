"""Pallas fused local-sim kernel vs the XLA path, on the current device.

    python scripts/bench_pallas.py [--tile-t 8 --tile-b 8]

Times (median of 3×20, value-materialized):
  - eval similarities forward (agg=max, eval mask) at (48, 361+sink, 97, 768)
  - train sims fwd+bwd (agg=sum) vs the chunked-remat XLA local_loss-style path
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


from _timing import timeit_ms as timeit  # noqa: E402  (median-of-3, value-materialized)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-t", type=int, default=8)
    ap.add_argument("--tile-b", type=int, default=8)
    ap.add_argument("--bwd-tile-b", type=int, default=None)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gloria_tpu.ops import gloria_loss as gl
    from gloria_tpu.ops.pallas import local_sim as ps

    T = B = 48
    S, W, D = 362, 97, 768  # sink already concatenated
    rng = np.random.RandomState(0)
    words = jnp.asarray(rng.randn(T, W, D).astype(np.float32) * 0.3)
    ctx = jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.3)
    cap_lens = jnp.asarray(rng.randint(5, W - 2, T))
    mask_eval = gl.make_word_mask(cap_lens, W, "eval")
    mask_train = gl.make_word_mask(cap_lens, W, "train")

    # ---- eval forward ---------------------------------------------------------
    @jax.jit
    def xla_eval():
        return gl.local_matching(words, ctx, mask_eval, temp1=4.0, temp2=5.0,
                                 agg="max", chunk=0, need_diag_attn=False,
                                 precision="highest").similarities

    @jax.jit
    def pls_eval():
        return ps.pallas_local_similarities(
            words, ctx, mask_eval, temp1=4.0, temp2=5.0, agg="max",
            tile_t=args.tile_t, tile_b=args.tile_b)

    t_xla = timeit(xla_eval)
    print(f"eval fwd: XLA {t_xla:.2f} ms", flush=True)
    t_pls = timeit(pls_eval)
    print(f"eval fwd: pallas {t_pls:.2f} ms ({t_xla / t_pls:.2f}x)", flush=True)
    err = float(jnp.max(jnp.abs(xla_eval() - pls_eval())))
    print(f"eval fwd err {err:.2e}", flush=True)

    # ---- train fwd+bwd ---------------------------------------------------------
    gmat = jnp.asarray(rng.randn(B, T).astype(np.float32))

    @jax.jit
    def xla_train():
        def loss(wc):
            w, c = wc
            sims = gl.local_matching(w, c, mask_train, temp1=4.0, temp2=5.0,
                                     agg="sum", chunk=8,
                                     need_diag_attn=False).similarities
            return jnp.sum(sims * gmat)
        val, grads = jax.value_and_grad(loss)((words, ctx))
        return (val, grads)

    bwd_tb = args.bwd_tile_b or args.tile_b

    @jax.jit
    def pls_train():
        def loss(wc):
            w, c = wc
            sims = ps.fused_local_similarities(
                w, c, mask_train, 4.0, 5.0, "sum", args.tile_t, bwd_tb, False)
            return jnp.sum(sims * gmat)
        val, grads = jax.value_and_grad(loss)((words, ctx))
        return (val, grads)

    t_xla_t = timeit(xla_train)
    print(f"train fwd+bwd: XLA {t_xla_t:.2f} ms", flush=True)
    t_pls_t = timeit(pls_train)
    print(f"train fwd+bwd: pallas {t_pls_t:.2f} ms ({t_xla_t / t_pls_t:.2f}x)", flush=True)
    vx, gx = xla_train()
    vp, gp = pls_train()
    ew = float(jnp.max(jnp.abs(gx[0] - gp[0])))
    ec = float(jnp.max(jnp.abs(gx[1] - gp[1])))
    print(f"grad err words {ew:.2e} ctx {ec:.2e}", flush=True)


if __name__ == "__main__":
    main()
