"""Word-region localization evaluation + instance reweighting.

Equivalents of the reference callbacks
(``/root/reference/gloria/lightning/callbacks.py``):

- ``EvaluateLocalization`` (:154-520): per-sentence attention maps are
  upsampled to image resolution ('upsample' | 'pyramid' | 'windows') and
  scored against ImaGenome bbox-union masks — AUROC, average precision,
  ROC/PR curves, precision/recall/F1/IoU at top-{5,10,20,30}% pixels,
  attention entropy and no-attn weight; rows persist to ``sentences.csv``
  with npy/npz artifact folders, means go to the metric logger.
  TPU-native difference: the reference loops sentences through torchmetrics
  one at a time; here a whole batch of overlays is scored in ONE jitted call
  (``gloria_tpu.training.metrics``), with only the optional curve artifacts
  computed on host.
- ``WeightInstancesByLocalization`` (:523-568): tracks a per-instance
  localization score (attention entropy or no-attn weight) during training
  and re-weights the next epoch's sampler with softmax(score / temp).
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..configs import Config
from ..ops.gloria_loss import make_word_mask
from ..training import metrics as M
from ..utils.viz import get_attn_overlay
from .trainer import Callback

PERCENTILE_THRESHOLDS = (0.05, 0.1, 0.2, 0.3)


def sent_bboxes_to_segmentation_label(shape, bboxes) -> np.ndarray:
    label = np.zeros(shape, np.float32)
    for bbox in bboxes:
        x1, y1, x2, y2 = (int(round(v)) for v in bbox)
        label[y1 : y2 + 1, x1 : x2 + 1] = 1.0
    return label


def sentence_attention(attn: np.ndarray, cap_lens, grid: tuple[int, int]) -> np.ndarray:
    """[B, W, R] word attention → [B, h, w] masked word-mean maps."""
    attn = np.asarray(attn)
    B, W, R = attn.shape
    mask = np.asarray(make_word_mask(jnp.asarray(cap_lens), W, "train"))[..., None]
    mean = (attn * mask).sum(1) / np.maximum(mask.sum(1), 1)
    return mean.reshape(B, *grid)


def batch_localization_metrics(
    overlays: np.ndarray,        # [B, H, W] upsampled attention
    labels: np.ndarray,          # [B, H, W] bbox-union masks
    grid_attn: np.ndarray,       # [B, h, w] raw sentence attention (entropy basis)
    thresholds=PERCENTILE_THRESHOLDS,
) -> dict[str, np.ndarray]:
    B = overlays.shape[0]
    s = jnp.asarray(overlays.reshape(B, -1))
    l = jnp.asarray(labels.reshape(B, -1))
    flat_attn = grid_attn.reshape(B, -1)
    no_attn_weight = 1.0 - flat_attn.sum(-1)
    ent_dist = np.concatenate([no_attn_weight[:, None], flat_attn], axis=1)
    out = {
        "auroc": np.asarray(M.binary_auroc(s, l)),
        "avg_precision": np.asarray(M.binary_average_precision(s, l)),
        "attn_entropy": M.attention_entropy_np(ent_dist),
        "no_attn_weight": no_attn_weight,
    }
    sorted_desc = -jnp.sort(-s, axis=-1)  # one sort shared by all thresholds
    for p in thresholds:
        tk = M.topk_overlap_metrics(s, l, p, sorted_desc=sorted_desc)
        out[f"precision_at_{p:f}"] = np.asarray(tk["precision"])
        out[f"recall_at_{p:f}"] = np.asarray(tk["recall"])
        out[f"f1_at_{p:f}"] = np.asarray(tk["f1"])
        out[f"iou_at_{p:f}"] = np.asarray(tk["iou"])
    # degenerate labels (no positive pixels) → None-equivalent NaN, as the
    # reference stores None (callbacks.py:43-48)
    empty = np.asarray(l.sum(-1) == 0)
    for k in out:
        if k not in ("attn_entropy", "no_attn_weight"):
            out[k] = np.where(empty, np.nan, out[k])
    return out


class EvaluateLocalization(Callback):
    def __init__(self, cfg: Config, save_dir: str | None = None,
                 eval_attn_overlay_mode: str = "upsample",
                 plot_attn_overlay_mode: str = "upsample",
                 log_train_every: int = 100,
                 save_full_data: bool = False,
                 thresholds=PERCENTILE_THRESHOLDS):
        self.cfg = cfg
        self.save_dir = Path(save_dir) if save_dir else None
        self.eval_mode = eval_attn_overlay_mode
        self.plot_mode = plot_attn_overlay_mode
        self.log_train_every = log_train_every
        self.save_full_data = save_full_data
        self.thresholds = thresholds
        self._rows: list[dict] = []
        self._artifacts: dict[str, dict] = defaultdict(dict)

    # -- core ------------------------------------------------------------------
    def evaluate_batch(self, attn, batch, sims: dict | None = None) -> dict:
        """attn: [B, W, R] diagonal attention from the loss/eval step."""
        labels = np.asarray(batch["segmentation_labels"])
        B = labels.shape[0]
        R = np.asarray(attn).shape[-1]
        side = int(round(R ** 0.5))
        grid_attn = sentence_attention(attn, np.asarray(batch["cap_lens"]), (side, side))
        overlays = np.stack([
            get_attn_overlay(grid_attn[i], labels.shape[1:3], self.eval_mode) for i in range(B)
        ])
        result = batch_localization_metrics(overlays, labels, grid_attn, self.thresholds)
        ids = batch.get("_ids") or [f"instance_{i}" for i in range(B)]
        sents = [" ".join(w for w in words if not w.startswith("["))
                 for words in (batch.get("_words") or [[]] * B)]
        for i in range(B):
            row = {"dicom_sent_id": str(ids[i]).replace("/", "_"), "sentence": sents[i] if i < len(sents) else ""}
            row.update({k: float(v[i]) for k, v in result.items()})
            if sims:
                row["local_sims"] = float(np.asarray(sims["local"])[i]) if "local" in sims else None
                row["global_sims"] = float(np.asarray(sims["global"])[i]) if "global" in sims else None
            self._rows.append(row)
            if self.save_full_data:
                self._artifacts["attn"][row["dicom_sent_id"]] = grid_attn[i]
                self._artifacts["image"][row["dicom_sent_id"]] = np.asarray(batch["imgs"][i])
                self._artifacts["label"][row["dicom_sent_id"]] = labels[i]
                self._curves(row["dicom_sent_id"], overlays[i], labels[i])
        means = {k: float(np.nanmean(v)) for k, v in result.items()}
        return means

    def _curves(self, sid: str, overlay: np.ndarray, label: np.ndarray) -> None:
        from sklearn.metrics import precision_recall_curve, roc_curve

        if label.sum() == 0:
            self._artifacts["roc_curve"][sid] = ()
            self._artifacts["pr_curve"][sid] = ()
            return
        fpr, tpr, thr = roc_curve(label.reshape(-1), overlay.reshape(-1))
        pr, re, thr2 = precision_recall_curve(label.reshape(-1), overlay.reshape(-1))
        self._artifacts["roc_curve"][sid] = (fpr, tpr, thr)
        self._artifacts["pr_curve"][sid] = (pr, re, thr2)

    # -- Trainer hooks --------------------------------------------------------
    def _maybe_eval(self, trainer, state, metrics, batch, split):
        if "segmentation_labels" not in batch or "_attn" not in metrics:
            return
        sims = None
        if "_local_sims" in metrics or "_global_sims" in metrics:
            sims = {}
            if "_local_sims" in metrics:
                sims["local"] = metrics["_local_sims"]
            if "_global_sims" in metrics:
                sims["global"] = metrics["_global_sims"]
        means = self.evaluate_batch(metrics["_attn"], batch, sims=sims)
        trainer.logger.log({f"localization/{k}": v for k, v in means.items()},
                           trainer.global_step, split)

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
        if batch_idx % self.log_train_every == 0:
            self._maybe_eval(trainer, state, metrics, batch, "train")

    def on_validation_batch_end(self, trainer, state, metrics, batch, batch_idx):
        self._maybe_eval(trainer, state, metrics, batch, "val")

    def on_test_batch_end(self, trainer, state, metrics, batch, batch_idx):
        self._maybe_eval(trainer, state, metrics, batch, "test")

    def on_epoch_end(self, trainer, state, split, epoch_metrics):
        self.flush(split)

    # -- persistence ------------------------------------------------------------
    def flush(self, split: str) -> str | None:
        if not self._rows or self.save_dir is None:
            self._rows = []
            return None
        import pandas as pd

        out_dir = self.save_dir / split
        out_dir.mkdir(parents=True, exist_ok=True)
        df = pd.DataFrame(self._rows)
        csv_path = out_dir / "sentences.csv"
        df.to_csv(csv_path, index=False)
        for folder, items in self._artifacts.items():
            folder_dir = out_dir / folder
            folder_dir.mkdir(exist_ok=True)
            for sid, arr in items.items():
                if folder.endswith("_curve"):
                    np.savez(folder_dir / sid, *arr)
                else:
                    np.save(folder_dir / sid, arr)
        self._rows = []
        self._artifacts = defaultdict(dict)
        return str(csv_path)


class WeightInstancesByLocalization(Callback):
    """Curriculum reweighting (callbacks.py:523-568): per-instance scores →
    softmax sampler weights for the train loader next epoch."""

    def __init__(self, loader, dataset_size: int, weight_mode: str = "attn_entropy",
                 temp: float = 0.2):
        assert weight_mode in ("attn_entropy", "no_attn_score")
        self.loader = loader
        self.weight_mode = weight_mode
        self.temp = temp
        self.scores = np.zeros(dataset_size, np.float64)
        self.seen = np.zeros(dataset_size, bool)

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
        if "_attn" not in metrics or "_indices" not in batch:
            return
        attn = np.asarray(metrics["_attn"])
        B, W, R = attn.shape
        side = int(round(R ** 0.5))
        grid = sentence_attention(attn, np.asarray(batch["cap_lens"]), (side, side))
        flat = grid.reshape(B, -1)
        if self.weight_mode == "no_attn_score":
            score = 1.0 - flat.sum(-1)
        else:
            dist = np.concatenate([(1.0 - flat.sum(-1))[:, None], flat], 1)
            score = M.attention_entropy_np(dist)
        for i, idx in enumerate(np.asarray(batch["_indices"])):
            self.scores[int(idx)] = score[i]
            self.seen[int(idx)] = True

    def on_epoch_end(self, trainer, state, split, epoch_metrics):
        if split != "train" or not self.seen.any():
            return
        s = self.scores.copy()
        s[~self.seen] = s[self.seen].mean()
        z = np.exp((s - s.max()) / self.temp)
        weights = z / z.sum()
        self.loader.sample_weights = weights
        # reference logs the raw + softmaxed weight distributions
        # (callbacks.py:563-568: wandb.Histogram of both)
        logger = getattr(trainer, "logger", None)
        if logger is not None and hasattr(logger, "log_histogram"):
            logger.log_histogram("train/weights_hist", s, trainer.global_step)
            logger.log_histogram("train/weights_softmax_hist", weights, trainer.global_step)
            logger.log({"train/weights_mean": float(s.mean())}, trainer.global_step, split)
