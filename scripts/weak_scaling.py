"""Weak-scaling analysis of the O(B²) pairwise loss under data parallelism.

The framework's own hot spot (SURVEY §7, reference ``gloria_loss.py:116-162``)
is the batch-pairwise local loss: every caption attends to every image, so at
fixed PER-CHIP batch b the global batch B = b·n grows with device count n and
the per-chip loss cost grows ~linearly with n while the tower cost stays
flat.

Measuring this directly from the SPMD-partitioned module's
``cost_analysis()`` is unreliable: per-partition vs global FLOP reporting
differs between programs, and the chunked loss lives inside a ``lax.scan``
whose body XLA costs ONCE regardless of trip count.  So instead this script
compiles the UNCHUNKED single-device step at several global batch sizes
(compile-only, runs anywhere), fits

    F(B) = c0 + c1·B + c2·B²        (towers linear, pairwise loss quadratic)

and derives the per-chip weak-scaling table analytically:

    towers/chip  = c1·b            (flat in n)
    loss/chip    = c2·(b·n)²/n = c2·b²·n   (linear in n)
    crossover    n* = c1/(c2·b)

Prints the table recorded in docs/MULTIHOST.md ("Weak scaling of the
pairwise loss").

    python scripts/weak_scaling.py [--per-chip 48] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-chip", type=int, default=48)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8, 16, 32])
    ap.add_argument("--fit-batches", type=int, nargs="*", default=[24, 48, 96, 192])
    ap.add_argument("--tokens", type=int, default=97)
    ap.add_argument("--imsize", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.synthetic import make_synthetic_batch

    def total_flops(B: int) -> float:
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
        # loss_chunk=0 -> UNCHUNKED: no scan, so cost_analysis sees every
        # loss FLOP (compile-only; the [B,B,T,R] intermediate is never
        # materialized on a device).
        model, state, train_step, _ = init_gloria(
            cfg, raw, dtype=jnp.float32, loss_chunk=0)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        ca = train_step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0))

    import numpy as np

    print(f"fit batches {args.fit_batches}, tokens {args.tokens}, "
          f"imsize {args.imsize} (no 299 upsample), unchunked loss")
    Bs, Fs = [], []
    for B in args.fit_batches:
        f = total_flops(B)
        Bs.append(B)
        Fs.append(f)
        print(f"  B={B:>4}: {f/1e12:.3f} TF")

    # F(B) = c0 + c1*B + c2*B^2
    c2, c1, c0 = np.polyfit(np.array(Bs, float), np.array(Fs, float), 2)
    resid = np.polyval([c2, c1, c0], Bs) - np.array(Fs)
    rel = float(np.max(np.abs(resid)) / np.max(Fs))
    print(f"fit: F(B) = {c0/1e9:.2f} GF + {c1/1e9:.3f} GF·B + "
          f"{c2/1e6:.3f} MF·B²   (max rel. residual {rel:.2%})")

    b = args.per_chip
    towers = c1 * b + c0  # per-chip, flat in n
    print(f"\nper-chip batch {b}: towers/chip = {towers/1e12:.3f} TF (flat)")
    print(f"{'n':>3} {'B':>5} {'loss TF/chip':>13} {'total TF/chip':>14} "
          f"{'loss share':>10}")
    for n in args.devices:
        loss = c2 * (b * n) ** 2 / n
        total = towers + loss
        print(f"{n:>3} {b * n:>5} {loss/1e12:>13.3f} {total/1e12:>14.3f} "
              f"{loss/total:>9.1%}")

    n_cross = c1 / (c2 * b) if c2 > 0 else float("inf")
    print(f"\nloss/chip = towers/chip at n* ≈ {n_cross:.0f} devices "
          f"(global B ≈ {b * n_cross:.0f})")


if __name__ == "__main__":
    main()
