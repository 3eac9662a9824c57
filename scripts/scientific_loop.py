"""Scientific-loop demo: the reference's "Wrong Lung!" result, end-to-end.

Drives this framework's own machinery (run.py, the localization callback, the
public zero-shot API) through the full scientific loop of the reference paper
on the grounded synthetic corpus — the strongest end-to-end validation this
environment (no medical data, no egress) permits:

  A. contrastive pretrain to convergence (``run.py --train --test`` with the
     localization-eval callback; reference ``gloria/lightning/callbacks.py:26-70``)
  B. zero-shot condition classification through the public API prompt grammar
     (reference ``gloria/gloria.py`` zero-shot path)
  C. attention-supervised finetune from A's best checkpoint
     (``--segmentation_loss_weight``; reference
     ``gloria/models/gloria_model.py:143-147`` — the NLL that pulls word
     attention inside the annotated bbox union)
  D. localization re-eval → before/after table; the claim under test is the
     paper's: attention supervision improves localization AUROC over the
     contrastive-only baseline.

Usage:
    python scripts/scientific_loop.py --out /tmp/sci_loop [--epochs 12]

Prints ONE JSON line with the before/after metrics and writes
``summary.json`` + the driven run directories under ``--out``.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def base_config(seed: int, epochs: int, lr: float) -> dict:
    return {
        "experiment_name": "sci_loop",
        "phase": "pretrain",
        "random_seed": seed,
        "lightning": {
            "trainer": {"max_epochs": epochs, "gradient_clip_val": 0.25,
                        "lr": lr, "precision": "bf16"},
            "checkpoint_callback": {"monitor": "val_loss", "save_last": True,
                                    "mode": "min", "save_top_k": 1},
            "evaluate_localization": {"eval_attn_overlay_mode": "upsample",
                                      "plot_attn_overlay_mode": "upsample",
                                      "log_train_every": 50},
        },
        "model": {
            "gloria": {"local_loss_weight": 1.0, "global_loss_weight": 1.0,
                       "temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
            "vision": {"model_name": "resnet_18"},
            "text": {"embedding_dim": 128, "last_n_layers": 4, "agg_tokens": True,
                     "aggregate_method": "sum",
                     "bert_config": {"vocab_size": 512, "hidden_size": 128,
                                     "num_layers": 4, "num_heads": 4,
                                     "intermediate_size": 256,
                                     "max_position_embeddings": 64}},
        },
        "data": {"dataset": "synthetic", "synthetic_size": 384,
                 "text": {"word_num": 40}, "image": {"imsize": 256}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 224}},
        "train": {"update_interval": 8, "batch_size": 24, "num_workers": 2,
                  "optimizer": {"name": "Adam", "weight_decay": 1e-6},
                  "scheduler": {"name": "plateau", "monitor": "val_loss"}},
    }


def run_phase(cfg: dict, out_dir: Path, extra: list[str]) -> Path:
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg_path = out_dir / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    cmd = [sys.executable, "run.py", "-c", str(cfg_path), "--train", "--test",
           "--output_dir", str(out_dir), *extra]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"phase failed ({' '.join(extra)}):\n{proc.stderr[-4000:]}")
    runs = sorted(out_dir.glob("sci_loop_*"))
    if not runs:
        raise RuntimeError(f"no run dir under {out_dir}")
    return runs[-1]


def localization_means(run_dir: Path, split: str = "test") -> dict:
    import pandas as pd

    csv = run_dir / "localization" / split / "sentences.csv"
    df = pd.read_csv(csv)
    cols = ["auroc", "avg_precision", "attn_entropy"]
    cols += [c for c in df.columns if c.startswith(("iou_at_", "f1_at_"))]
    return {c: float(np.nanmean(df[c])) for c in cols if c in df.columns}


def best_ckpt(out_dir: Path) -> str:
    return next(iter(yaml.safe_load((out_dir / "best_ckpts.yaml").read_text()).values()))


def zero_shot_accuracy(ckpt: str, cfg: dict, n_items: int = 96) -> float:
    """Zero-shot condition classification on a held-out synthetic split,
    prompts built from the corpus grammar (one per severity x location is
    overkill; 6 prompts/class mirrors the reference's 5-prompt CheXpert
    protocol, ``gloria/gloria.py`` generate_chexpert_class_prompts)."""
    from gloria_tpu.api import load_gloria
    from gloria_tpu.configs import Config
    from gloria_tpu.data.data_module import build_data_module
    from gloria_tpu.data.pretraining_dataset import (
        _CONDITIONS, _LOCATIONS, _SEVERITIES, SyntheticPretrainingDataset,
    )

    # identical tokenizer to the training run: rebuilt by the data module
    # from the same first-64-report corpus
    dm = build_data_module(Config(cfg))
    model = load_gloria(ckpt, tokenizer=dm.tokenizer)

    rng = np.random.RandomState(0)
    prompts = {
        cond: [f"{_SEVERITIES[rng.randint(len(_SEVERITIES))]} {cond} "
               f"{_LOCATIONS[rng.randint(len(_LOCATIONS))]}" for _ in range(6)]
        for cond in _CONDITIONS
    }
    ds = SyntheticPretrainingDataset(size=n_items, imsize=int(cfg["data"]["image"]["imsize"]),
                                     seed=7)  # unseen split
    imgs, gts = [], []
    for i in range(n_items):
        item = ds[i]
        first = item["report"].split(".")[0].lower()
        gt = max((c for c in _CONDITIONS if c in first), key=len, default=None)
        if gt is None:
            continue
        imgs.append(item["image"])
        gts.append(gt)
    processed = model.process_img(imgs)
    cls_prompts = {c: model.process_text(p) for c, p in prompts.items()}
    scores = model.zero_shot_classification(processed, cls_prompts)
    classes = list(scores.columns) if hasattr(scores, "columns") else list(prompts)
    arr = scores.to_numpy() if hasattr(scores, "to_numpy") else np.asarray(scores)
    pred = [classes[j] for j in arr.argmax(1)]
    return float(np.mean([p == g for p, g in zip(pred, gts)]))


def main() -> int:
    # honor JAX_PLATFORMS for the in-process zero-shot phases too (the axon
    # TPU plugin overrides the env var at import; run.py subprocesses carry
    # the same pin) — `JAX_PLATFORMS=cpu` makes the whole loop hermetic
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sci_loop")
    ap.add_argument("--epochs", type=int, default=12)
    # 4 measured sufficient: train-split localization AUROC saturates >=0.91
    # within 2 supervised epochs (docs/scientific_loop_r5_summary.json)
    ap.add_argument("--finetune_epochs", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = Path(args.out)

    # A: contrastive pretrain (+ test-split localization eval)
    cfg_a = base_config(args.seed, args.epochs, lr=5e-4)
    run_a = run_phase(cfg_a, out / "pretrain", [])
    loc_a = localization_means(run_a)
    ckpt_a = best_ckpt(out / "pretrain")

    # B: zero-shot through the public API
    zs_a = zero_shot_accuracy(ckpt_a, cfg_a)

    # C: attention-supervised finetune from A's best checkpoint
    cfg_c = base_config(args.seed, args.finetune_epochs, lr=1e-4)
    run_c = run_phase(cfg_c, out / "finetune",
                      ["--ckpt", ckpt_a, "--segmentation_loss_weight", "1.0"])
    loc_c = localization_means(run_c)
    ckpt_c = best_ckpt(out / "finetune")
    zs_c = zero_shot_accuracy(ckpt_c, cfg_c)

    summary = {
        "pretrain": {"localization": loc_a, "zero_shot_acc": zs_a,
                     "run_dir": str(run_a), "ckpt": ckpt_a},
        "attn_finetune": {"localization": loc_c, "zero_shot_acc": zs_c,
                          "run_dir": str(run_c), "ckpt": ckpt_c},
        "auroc_delta": loc_c["auroc"] - loc_a["auroc"],
        "improved": bool(loc_c["auroc"] > loc_a["auroc"]),
        "zero_shot_chance": 0.1,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    return 0 if summary["improved"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
