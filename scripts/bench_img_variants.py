"""Time the standalone image-encoder train step (fwd+bwd) at B=48.

One number per invocation (value-materialized ms/step) so XLA_FLAGS /
LIBTPU_INIT_ARGS experiments can be swept from the shell:

    XLA_FLAGS="--xla_tpu_..." python scripts/bench_img_variants.py
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=48)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gloria_tpu.models.vision_model import ImageEncoder

    enc = ImageEncoder(model_name="resnet_50", output_dim=768, dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).rand(args.batch_size, 224, 224, 3),
                       jnp.bfloat16)
    v = enc.init(jax.random.PRNGKey(0), imgs, train=False)

    if args.fwd_only:
        @jax.jit
        def step(params, stats, x):
            (g, l, _), _ = ImageEncoder(
                model_name="resnet_50", output_dim=768, dtype=jnp.bfloat16,
            ).apply({"params": params, "batch_stats": stats}, x,
                    train=True, mutable=["batch_stats"])
            return jnp.sum(g.astype(jnp.float32)), g
    else:
        @jax.jit
        def step(params, stats, x):
            def loss(p):
                (g, l, _), muts = enc.apply({"params": p, "batch_stats": stats}, x,
                                            train=True, mutable=["batch_stats"])
                return (jnp.sum(g.astype(jnp.float32) ** 2)
                        + jnp.sum(l.astype(jnp.float32) ** 2), muts)
            (val, _), grads = jax.value_and_grad(loss, has_aux=True)(params)
            return val, grads

    ms = timeit_ms(step, (v["params"], v["batch_stats"], imgs), steps=args.steps,
                   sink=lambda out: out[0])
    mode = "fwd" if args.fwd_only else "fwd+bwd"
    print(f"img_{mode}_B{args.batch_size}: {ms:.2f} ms/step")


if __name__ == "__main__":
    main()
