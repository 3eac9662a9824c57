"""Time the 5x200 zero-shot protocol end-to-end on the default device.

The north-star eval protocol (reference ``gloria/gloria.py:240-275`` via
``python -m gloria_tpu.evaluation``): load a FULL-SCALE checkpoint
(ResNet-50 + BERT-base) from an orbax dir, then run 1000 images x 5 classes
through process_img -> encoders -> similarities -> z-norm.  Parity of this
path is proven against live torch at full scale (tests/test_full_scale_
parity.py, tests/test_zero_shot_parity.py); this script records its
THROUGHPUT on real hardware — cold (incl. jit of both towers + the
similarity programs) and warm (steady-state images/sec).

    python scripts/bench_zero_shot.py [--n 1000] [--devices 1] [--out d]

Fabricates the checkpoint (random weights — timing is weight-independent)
and a 5x200-shaped benchmark corpus (grayscale jpgs + competition CSV) under
--out, then times ``evaluate_chexpert_5x200`` exactly as the CLI runs it.
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def fabricate_corpus(root: Path, n: int) -> Path:
    """n grayscale jpgs + a competition-format CSV (one-hot over the 5
    CHEXPERT_COMPETITION_TASKS, n/5 images per class, absolute paths)."""
    import cv2
    import pandas as pd

    from gloria_tpu import constants

    img_dir = root / "imgs"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    classes = constants.CHEXPERT_COMPETITION_TASKS
    rows = []
    for i in range(n):
        p = img_dir / f"img_{i:05d}.jpg"
        if not p.exists():
            cv2.imwrite(str(p), rng.randint(0, 256, (320, 300), dtype=np.uint8))
        onehot = {c: float(j == i % len(classes)) for j, c in enumerate(classes)}
        rows.append({constants.CHEXPERT_PATH_COL: str(p), **onehot})
    csv = root / "bench_5x200.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


def fabricate_checkpoint(root: Path):
    """Random-weight full-scale GLoRIA (ResNet-50 + BERT-base) saved through
    the production orbax path; returns the checkpoint dir."""
    import jax.numpy as jnp

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.synthetic import make_synthetic_batch
    from gloria_tpu.training.checkpoints import save_checkpoint

    ckpt_dir = root / "ckpt"
    if ckpt_dir.exists() and any(ckpt_dir.iterdir()):
        return ckpt_dir  # reuse across runs (weights are timing-irrelevant)
    cfg = default_pretrain_config()
    cfg.model.text.bert_config = {
        "vocab_size": 28996, "hidden_size": 768, "num_layers": 12,
        "num_heads": 12, "intermediate_size": 3072,
        "max_position_embeddings": 512,
    }
    raw = make_synthetic_batch(batch_size=2, num_tokens=97, imsize=224,
                               vocab_size=28996)
    _, state, _, _ = init_gloria(cfg, raw, dtype=jnp.float32)
    save_checkpoint(ckpt_dir, {"params": state.params,
                               "batch_stats": state.batch_stats}, cfg)
    return ckpt_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--devices", type=int, default=None,
                    help="shard inference over an N-device mesh (shard_map "
                         "similarities path, api.py:183-191)")
    ap.add_argument("--out", default="/tmp/zero_shot_bench")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    root = Path(args.out)
    csv = fabricate_corpus(root, args.n)
    ckpt = fabricate_checkpoint(root)

    from gloria_tpu.api import load_gloria
    from gloria_tpu.evaluation import evaluate_chexpert_5x200

    t0 = time.perf_counter()
    model = load_gloria(str(ckpt))
    if args.devices:
        from gloria_tpu.parallel.mesh import create_mesh

        model.shard(create_mesh(n_devices=args.devices))
    t_load = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = evaluate_chexpert_5x200(model, csv_path=csv, batch_size=args.batch_size)
    t_cold = time.perf_counter() - t0  # incl. jit of towers + similarity programs

    t0 = time.perf_counter()
    res = evaluate_chexpert_5x200(model, csv_path=csv, batch_size=args.batch_size)
    t_warm = time.perf_counter() - t0  # steady state: host decode+letterbox + device

    record = {
        "metric": "zero_shot_5x200_images_per_sec",
        "value": round(args.n / t_warm, 3),
        "unit": "images/sec",
        "n_images": args.n,
        "batch_size": args.batch_size,
        "devices": args.devices or 1,
        "load_s": round(t_load, 2),
        "cold_s": round(t_cold, 2),
        "warm_s": round(t_warm, 2),
        "accuracy_random_weights": res["accuracy"],  # ~0.2 sanity floor
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
