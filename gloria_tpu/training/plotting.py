"""Periodic attention-map image dumps during pretraining.

Equivalent of the reference's ``PretrainModel.training_step`` plotting branch
(``/root/reference/gloria/lightning/pretrain_model.py:30-36`` →
``GLoRIA.plot_attn_maps``): every ``update_interval`` train batches, render
the per-word attention grid for the first ``nvis`` samples and save it under
``<output_dir>/attention_maps_step<k>.png``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..configs import Config
from ..utils.viz import build_attention_images
from .trainer import Callback


class AttentionPlotCallback(Callback):
    def __init__(self, cfg: Config, output_dir: str | None = None):
        self.every = int(cfg.train.update_interval or 1000) if cfg.train else 1000
        self.nvis = int(cfg.train.nvis or 8) if cfg.train else 8
        self.rand_vis = bool(cfg.train.rand_vis) if cfg.train else False
        self.output_dir = Path(output_dir or cfg.output_dir or ".")

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
        if batch_idx % self.every or "_attn" not in metrics:
            return
        attn = np.asarray(metrics["_attn"])
        B, W, R = attn.shape
        side = int(round(R ** 0.5))
        words = batch.get("_words") or [["?"] * W] * B
        img_set = build_attention_images(
            np.asarray(batch["imgs"]), attn.reshape(B, W, side, side),
            words, np.asarray(batch["cap_lens"]),
            nvis=min(self.nvis, B), rand_vis=self.rand_vis,
        )
        self.output_dir.mkdir(parents=True, exist_ok=True)
        try:
            from PIL import Image

            Image.fromarray(img_set).save(
                self.output_dir / f"attention_maps_step{trainer.global_step}.png"
            )
        except Exception:
            pass
