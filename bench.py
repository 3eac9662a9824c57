"""Pretrain-throughput benchmark.

Measures steady-state image-text pairs/sec of the full jitted GLoRIA pretrain
step (ResNet-50 + BERT-base, batch 48, 224 px, 97 tokens — the reference's
pinned training setup, BASELINE.md) on the default JAX device, and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

``vs_baseline`` is the speedup over the CPU baseline of this same program
(measured in this repo with ``--cpu-baseline``; see CPU_BASELINE_PAIRS_PER_SEC).

Flags:
  --smoke          tiny model/batch on CPU; fast correctness check
  --cpu-baseline   measure the full config on CPU and print it (slow)
  --steps N        timed steps per repeat (default 30)
  --repeats N      timing repeats; the median is reported (default 3)
  --loss-chunk N   text-axis remat chunk of the local matching (default 0 =
                   unchunked/no-remat, fastest at B=48; chunk for big batches)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


# Full-config train-step throughput on this image's CPU (measured 2026-08-16
# via `python bench.py --cpu-baseline`: 0.077 pairs/sec); the reference torch
# pipeline has no published numbers (BASELINE.md), so the north-star ratio is
# computed against this CPU run of the identical program.  The TPU v5e run of
# the round-2 build measured 644 pairs/sec (value-materialized); the real
# perf bar is the "mfu" field below, not this trivially-cleared CPU ratio.
CPU_BASELINE_PAIRS_PER_SEC = 0.077

# bf16 peak TFLOP/s by device kind (jax.devices()[0].device_kind prefix);
# used only for the diagnostic "mfu" field
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6": 918.0,  # trillium
}


def step_flops(train_step, state, batch) -> float | None:
    """XLA's own FLOP count for one compiled train step (not an estimate)."""
    try:
        comp = train_step.lower(state, batch).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def device_peak_flops() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, tf in PEAK_TFLOPS.items():
        if kind.startswith(prefix):
            return tf * 1e12
    return None


def build(smoke: bool, batch_override: int | None = None, loss_chunk: int = 0,
          fused: bool = False, flatten_opt: bool = False,
          input_size: int | None = None, accum: int = 1, spd: int = 1):
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeated bench invocations skip the
    # multi-minute first compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.synthetic import make_synthetic_batch

    cfg = default_pretrain_config()
    if smoke:
        cfg.model.vision.model_name = "resnet_18"
        cfg.model.text.embedding_dim = 64
        cfg.model.text.bert_config = {
            "vocab_size": 512, "hidden_size": 64, "num_layers": 2, "num_heads": 4,
            "intermediate_size": 128, "max_position_embeddings": 64,
        }
        batch_size, tokens, imsize = 8, 24, 64
    else:
        cfg.model.text.bert_config = {
            "vocab_size": 28996, "hidden_size": 768, "num_layers": 12, "num_heads": 12,
            "intermediate_size": 3072, "max_position_embeddings": 512,
        }
        batch_size, tokens, imsize = 48, 97, 224
    if batch_override:
        batch_size = batch_override
    if fused:
        cfg.model.gloria.fused_kernel = True
    if flatten_opt:
        cfg.set_path("train.flatten_optimizer", True)
    if input_size:
        cfg.set_path("model.vision.encoder_input_size", input_size)

    if accum > 1:
        cfg.set_path("lightning.trainer.accumulate_grad_batches", accum)
    if spd > 1:
        cfg.set_path("train.steps_per_dispatch", spd)

    raw = make_synthetic_batch(batch_size=batch_size, num_tokens=tokens, imsize=imsize,
                               vocab_size=cfg.model.text.bert_config["vocab_size"])
    dtype = jnp.float32 if smoke else jnp.bfloat16
    model, state, train_step, _ = init_gloria(cfg, raw, dtype=dtype, loss_chunk=loss_chunk)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    window = max(accum, spd)  # accum: [G,b] micro-batches, one update;
    # spd: [K,b] full batches, K updates (device-resident loop)
    if window > 1:
        batch = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)
        batch_size *= window
    return state, batch, train_step, batch_size


def measure(state, batch, train_step, batch_size: int, steps: int, warmup: int = 3,
            repeats: int = 3):
    """Median-of-``repeats`` steady-state throughput over ``steps`` timed steps
    each (single-sample timing is exposed to transient contention on this
    box — the round-1 10-step single run recorded 330 pairs/s where the
    steady state is ~536)."""
    import jax
    import jax.numpy as jnp

    for _ in range(warmup):
        state, metrics = train_step(state, batch)
    # IMPORTANT: through remote-execution tunnels (axon), block_until_ready
    # can return before the computation finishes; only materializing a value
    # derived from EVERY step gives honest wall-clock (measured: 4.97 ms/step
    # "blocked" vs 88.6 ms/step materialized at B=48 on v5e).
    float(metrics["loss"])
    rates, mean_loss = [], 0.0
    for _ in range(max(1, repeats)):
        losses = []
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = train_step(state, batch)
            losses.append(metrics["loss"])
        total = float(jnp.stack(losses).sum())
        dt = time.perf_counter() - t0
        rates.append(batch_size * steps / dt)
        mean_loss = total / steps
    rates.sort()
    return rates[len(rates) // 2], mean_loss


def run_sustained(args) -> int:
    """Overlapped host-loader + device steady state (VERDICT r3 item 5):
    a raw uint8-image/report-text corpus flows through the production path —
    GloriaCollate (native C++ fused ingest when built) on the PrefetchLoader
    thread, device_put, jitted train step — and the measured rate is the
    slower of the two planes plus whatever overlap hides.  The headline
    bench times a pre-staged device batch (device plane only); this mode
    turns the 'a real run on this 1-core box is host-bound' caveat into a
    number."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.collate import GloriaCollate, device_batch
    from gloria_tpu.data.loader import PrefetchLoader
    from gloria_tpu.data.synthetic import make_synthetic_batch
    from gloria_tpu.data.tokenizer import WordPieceTokenizer

    cfg = default_pretrain_config()
    cfg.set_path("data.native_ingest", True)  # fused letterbox+crop+flip+norm
    # ship single-channel uint8 and normalize inside the jitted step: 12×
    # smaller host→device transfers (2.4 vs 28.9 MB/batch) via the native
    # *_u8_batch ingest kernels — the production transfer-lean path
    # (host-pipeline-equal by test_data.py::test_device_normalize_uint8...).
    # --no-device-normalize prices that win: full float32 RGB host batches.
    cfg.set_path("data.device_normalize", not args.no_device_normalize)
    batch_size = args.batch_size or 48

    # raw corpus: distinct uint8 images + short reports (tokenized for real)
    rng = np.random.RandomState(0)
    vocab_words = ["opacity", "effusion", "lung", "left", "right", "base",
                   "clear", "consolidation", "pleural", "cardiac", "normal",
                   "silhouette", "focal", "airspace", "unremarkable"]
    n_items = max(8 * batch_size, 256)
    corpus = []
    for i in range(n_items):
        words = [vocab_words[j] for j in rng.randint(0, len(vocab_words), size=rng.randint(8, 24))]
        corpus.append({
            "image": rng.randint(0, 256, (320, 300), dtype=np.uint8),
            "report": " ".join(words) + ".",
            "id": i,
        })
    tok = WordPieceTokenizer.from_corpus([c["report"] for c in corpus])
    collate = GloriaCollate(cfg, "train", tok, seed=0)

    # init/compile from one host-collated batch (identical shapes)
    first = collate(corpus[:batch_size])
    raw = {k: v for k, v in first.items() if not k.startswith("_")}
    model, state, train_step, _ = init_gloria(cfg, raw, dtype=jnp.bfloat16,
                                              loss_chunk=args.loss_chunk)

    def to_device(b):
        return {k: jnp.asarray(v) for k, v in device_batch(b).items()}

    loader = PrefetchLoader(corpus, lambda items: collate(items),
                            batch_size=batch_size, shuffle=True, seed=1,
                            num_workers=4, prefetch=2, to_device=to_device)

    def stream():
        while True:
            yield from loader

    it = stream()
    for _ in range(3):  # compile + warm (loader thread starts filling)
        state, metrics = train_step(state, next(it))
    float(metrics["loss"])

    steps = args.steps
    losses = []
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, next(it))
        losses.append(metrics["loss"])
    total = float(jnp.stack(losses).sum())  # honest wall: every step's value
    dt = time.perf_counter() - t0
    pairs_per_sec = batch_size * steps / dt
    record = {
        "metric": "pretrain_pairs_per_sec_sustained",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / CPU_BASELINE_PAIRS_PER_SEC, 3),
        "native_ingest": bool(collate.native_ingest),
        "device_normalize": not args.no_device_normalize,
        "batch": batch_size,
    }
    print(json.dumps(record))
    # stamp the figure so the headline bench line can carry it as provenance
    notes_path = Path(__file__).parent / "docs" / "BENCH_NOTES.json"
    try:
        notes = json.load(open(notes_path)) if notes_path.exists() else {}
        key = ("sustained_pairs_per_sec" if record["device_normalize"]
               else "sustained_pairs_per_sec_f32_ingest")
        notes[key] = record["value"]
        notes[key + "_batch"] = batch_size
        json.dump(notes, open(notes_path, "w"), indent=2)
    except Exception as exc:
        print(f"note stamp failed: {exc}", file=sys.stderr)
    return 0 if (total / steps) == (total / steps) else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu-baseline", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--loss-chunk", type=int, default=0)
    ap.add_argument("--fused", action="store_true",
                    help="route the local-matching sims through the Pallas kernel")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override batch size (default: 48, the reference's; "
                         "peak v5e throughput measured at 96)")
    ap.add_argument("--flatten-opt", action="store_true",
                    help="run the optimizer elementwise math over one raveled "
                         "vector (optax.flatten) instead of ~320 per-leaf kernels")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation window G: each step consumes G "
                         "stacked micro-batches of --batch-size and applies one "
                         "update (reported pairs/s counts all G·b pairs)")
    ap.add_argument("--input-size", type=int, default=None,
                    help="override the encoder upsample size (reference: 299; "
                         "304 keeps the 19x19 attention grid on tile-aligned "
                         "spatial dims; 224 skips the upsample, 14x14 grid)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="device-resident loop K: run K FULL train steps "
                         "(K optimizer updates — reference semantics, unlike "
                         "--accum) per dispatch from K stacked batches")
    ap.add_argument("--no-device-normalize", action="store_true",
                    help="(with --sustained) ship full float32 RGB batches "
                         "instead of single-channel uint8 + on-device "
                         "normalize — prices the 12x-smaller-transfer path")
    ap.add_argument("--sustained", action="store_true",
                    help="measure the overlapped steady state: host loader "
                         "(collate + prefetch thread) feeding the device step, "
                         "instead of a pre-staged device batch")
    args = ap.parse_args()

    import os

    if args.cpu_baseline or args.smoke or os.environ.get("JAX_PLATFORMS") == "cpu":
        # --smoke is a CPU correctness check; also honor an explicit
        # JAX_PLATFORMS=cpu, which the axon TPU plugin otherwise overrides
        # at registration (the config knob outranks the env var)
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.sustained:
        return run_sustained(args)

    state, batch, train_step, bs = build(args.smoke, args.batch_size, args.loss_chunk,
                                         args.fused, args.flatten_opt,
                                         args.input_size, args.accum,
                                         args.steps_per_dispatch)
    window = max(args.accum, args.steps_per_dispatch)
    flops = (None if (args.smoke or args.cpu_baseline)
             else step_flops(train_step, state, batch))
    steps = args.steps if not args.cpu_baseline else 2
    warmup = 1 if (args.cpu_baseline or args.smoke) else 3
    repeats = 1 if (args.cpu_baseline or args.smoke) else args.repeats
    pairs_per_sec, loss = measure(state, batch, train_step, bs, steps, warmup, repeats)

    name = "pretrain_pairs_per_sec_per_chip"
    if args.smoke:
        name += "_smoke"
    if args.cpu_baseline:
        name += "_cpu_baseline"
    record = {
        "metric": name,
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / CPU_BASELINE_PAIRS_PER_SEC, 3),
    }
    if not (args.smoke or args.cpu_baseline):
        # config provenance for the recorded line: the headline is the plain
        # reference-semantics step (K-step measured +2% at K=8, below the 3%
        # switch bar — docs/DESIGN.md round-5 table); the sustained
        # (host-loader-overlapped) figure is recorded alongside when a run of
        # `bench.py --sustained` has stamped it into docs/BENCH_NOTES.json
        record["steps_per_dispatch"] = args.steps_per_dispatch
        record["accum"] = args.accum
        try:
            notes = json.load(open(Path(__file__).parent / "docs" / "BENCH_NOTES.json"))
            record.update({k: v for k, v in notes.items()
                           if k.startswith("sustained")})
        except Exception:
            pass
    peak = None if flops is None else device_peak_flops()
    if flops and peak:
        # model FLOPs utilization: XLA-counted FLOPs of the compiled step ×
        # measured dispatches/sec over the device's bf16 peak.  Under a
        # window (--accum G / --steps-per-dispatch K) XLA counts the scan
        # body ONCE, so the analytic per-dispatch FLOPs are ×window (the
        # once-counted optimizer tail is ~0.1% of body FLOPs — negligible)
        record["mfu"] = round(flops * window * (pairs_per_sec / bs) / peak, 4)
    print(json.dumps(record))
    if not (loss == loss):  # NaN guard
        print(f"non-finite loss: {loss}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
