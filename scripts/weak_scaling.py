"""Weak-scaling analysis of the O(B²) pairwise loss under data parallelism.

The framework's own hot spot (SURVEY §7, reference ``gloria_loss.py:116-162``)
is the batch-pairwise local loss: every caption attends to every image, so at
fixed PER-CHIP batch b the global batch B = b·n grows with device count n and
the per-chip loss cost grows ~linearly with n while the tower cost stays
flat.  This script measures that, with XLA's own cost model, on a virtual
CPU mesh — compile-only, no execution, so it runs anywhere:

  for n in {1, 2, 4, 8}:  global B = 48·n, mesh data=n
      compile the sharded train step -> per-chip FLOPs (SPMD module)
      compile the towers-only step   -> per-chip FLOPs without the loss
      loss share = 1 - towers/total

Prints the table recorded in docs/MULTIHOST.md ("Weak scaling of the
pairwise loss").

    python scripts/weak_scaling.py [--per-chip 48] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-chip", type=int, default=48)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--tokens", type=int, default=97)
    ap.add_argument("--imsize", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=48)
    args = ap.parse_args()

    n_max = max(args.devices)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_max}"
        ).strip()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.synthetic import make_synthetic_batch
    from gloria_tpu.parallel import mesh as meshlib

    def per_chip_flops(n: int) -> tuple[float, float]:
        B = args.per_chip * n
        cfg = default_pretrain_config()
        cfg.model.vision.model_name = "resnet_50"
        cfg.set_path("model.vision.encoder_input_size", 0)
        cfg.model.text.embedding_dim = 768
        cfg.model.text.bert_config = {
            "vocab_size": 28996, "hidden_size": 768, "num_layers": 4,
            "num_heads": 12, "intermediate_size": 3072,
            "max_position_embeddings": 512,
        }
        raw = make_synthetic_batch(batch_size=B, num_tokens=args.tokens,
                                   imsize=args.imsize, vocab_size=28996)
        mesh = meshlib.create_mesh(
            n_devices=n, fsdp=1, tp=1,
            devices=jax.devices()[:n])
        with mesh:
            model, state, train_step, _ = init_gloria(
                cfg, raw, dtype=jnp.float32, loss_chunk=args.chunk)
            state = state.replace(
                params=meshlib.shard_params(state.params, mesh),
                batch_stats=meshlib.replicate(state.batch_stats, mesh),
                opt_state=meshlib.shard_params(state.opt_state, mesh),
            )
            batch = meshlib.shard_batch(
                {k: jnp.asarray(v) for k, v in raw.items()}, mesh)
            comp = train_step.lower(state, batch).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            total = float(ca.get("flops", 0))

            # towers-only: same program with the pairwise-loss weights zeroed
            # is still traced through the loss, so instead cost the towers
            # directly: forward+backward of both encoders under the same
            # sharding, no similarity term.
            import gloria_tpu.training.train as trainlib

            def towers_loss(params, st):
                out = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    {k: v for k, v in batch.items()
                     if k not in ("cap_lens", "segmentation_labels")},
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)},
                )
                (img_l, img_g, txt_l, txt_g, *_), _ = out
                return (jnp.sum(img_l.astype(jnp.float32) ** 2)
                        + jnp.sum(img_g.astype(jnp.float32) ** 2)
                        + jnp.sum(txt_l.astype(jnp.float32) ** 2)
                        + jnp.sum(txt_g.astype(jnp.float32) ** 2))

            towers_step = jax.jit(jax.grad(towers_loss), static_argnums=())
            ca_t = towers_step.lower(state.params, state).compile().cost_analysis()
            if isinstance(ca_t, (list, tuple)):
                ca_t = ca_t[0]
            towers = float(ca_t.get("flops", 0))
        return total, towers

    print(f"per-chip batch {args.per_chip}, tokens {args.tokens}, "
          f"imsize {args.imsize} (no 299 upsample), chunk {args.chunk}")
    print(f"{'n':>3} {'B':>5} {'total TF/chip':>14} {'towers TF/chip':>15} "
          f"{'loss TF/chip':>13} {'loss share':>10}")
    rows = []
    for n in args.devices:
        total, towers = per_chip_flops(n)
        loss = max(total - towers, 0.0)
        rows.append((n, args.per_chip * n, total, towers, loss))
        print(f"{n:>3} {args.per_chip * n:>5} {total/1e12:>14.3f} "
              f"{towers/1e12:>15.3f} {loss/1e12:>13.3f} {loss/total:>9.1%}")

    # linear-fit loss(n) = a + b·n -> device count where loss = towers
    if len(rows) >= 2:
        import numpy as np

        ns = np.array([r[0] for r in rows], float)
        losses = np.array([r[4] for r in rows], float)
        towers = float(np.median([r[3] for r in rows]))
        b, a = np.polyfit(ns, losses, 1)
        if b > 0:
            n_cross = (towers - a) / b
            print(f"\nloss/chip ≈ {a/1e12:.3f} + {b/1e12:.3f}·n TF; towers "
                  f"≈ {towers/1e12:.3f} TF -> loss overtakes the towers at "
                  f"n ≈ {n_cross:.0f} devices (global B ≈ "
                  f"{args.per_chip * n_cross:.0f})")


if __name__ == "__main__":
    main()
