"""Metric logging: console + CSV + optional W&B.

Replaces the reference's Lightning ``self.log`` + WandbLogger wiring
(``/root/reference/run.py:136-144``) with a pluggable logger that always
persists locally (csv per split) and mirrors to wandb when the package and
an API key are present (it is not baked into this image — gated import).
"""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Any


class MetricLogger:
    def __init__(self, output_dir: str | Path | None, project: str | None = None,
                 experiment: str | None = None, use_wandb: bool = False):
        # single-writer under multi-host: only process 0 persists metric
        # files (values are replicated SPMD outputs, identical on all hosts)
        import jax

        if jax.process_index() != 0:
            output_dir = None
            use_wandb = False
        self.output_dir = Path(output_dir) if output_dir else None
        if self.output_dir:
            self.output_dir.mkdir(parents=True, exist_ok=True)
        self._csv_files: dict[str, Any] = {}
        self._csv_writers: dict[str, Any] = {}
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=experiment, dir=str(self.output_dir))
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: int, split: str = "train") -> None:
        metrics = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        if self.output_dir:
            if split not in self._csv_writers:
                fh = open(self.output_dir / f"metrics_{split}.csv", "a", newline="")
                writer = None
                self._csv_files[split] = fh
                self._csv_writers[split] = writer
            if self._csv_writers[split] is None:
                writer = csv.DictWriter(self._csv_files[split], fieldnames=["step", "time"] + sorted(metrics))
                writer.writeheader()
                self._csv_writers[split] = writer
            fieldnames = self._csv_writers[split].fieldnames
            row = {"step": step, "time": round(time.time(), 3)}
            row.update({k: metrics.get(k) for k in fieldnames if k not in ("step", "time")})
            if any(v is not None for k, v in row.items() if k not in ("step", "time")):
                self._csv_writers[split].writerow(row)
                self._csv_files[split].flush()
            # keys not in the csv header (e.g. val metrics appearing after the
            # first epoch) must not be silently dropped: mirror the full row
            # to json-lines
            extra = set(metrics) - set(fieldnames)
            if extra:
                with open(self.output_dir / f"metrics_{split}.jsonl", "a") as jf:
                    jf.write(json.dumps({"step": step, **metrics}) + "\n")
        if self._wandb is not None:
            self._wandb.log({f"{split}/{k}": v for k, v in metrics.items()}, step=step)

    def log_histogram(self, name: str, values, step: int) -> None:
        """Histogram sink (reference logs wandb.Histogram of instance weights,
        ``callbacks.py:563-568``).  Locally the summary + bin counts go to a
        json-lines file; with wandb active a native Histogram is mirrored."""
        import numpy as np

        arr = np.asarray(values, dtype=np.float64).reshape(-1)
        if self.output_dir is not None and arr.size:
            counts, edges = np.histogram(arr, bins=min(64, max(1, arr.size)))
            with open(self.output_dir / "histograms.jsonl", "a") as fh:
                fh.write(json.dumps({
                    "name": name, "step": step,
                    "mean": float(arr.mean()), "std": float(arr.std()),
                    "min": float(arr.min()), "max": float(arr.max()),
                    "counts": counts.tolist(), "edges": edges.tolist(),
                }) + "\n")
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Histogram(arr)}, step=step)

    def log_image(self, name: str, image, step: int) -> None:
        if self.output_dir is not None:
            try:
                from PIL import Image
                import numpy as np

                arr = np.asarray(image)
                if arr.dtype != "uint8":
                    arr = (np.clip(arr, 0, 1) * 255).astype("uint8")
                Image.fromarray(arr).save(self.output_dir / f"{name}_step{step}.png")
            except Exception:
                pass
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(image)}, step=step)

    def close(self) -> None:
        for fh in self._csv_files.values():
            fh.close()
        if self._wandb is not None:
            self._wandb.finish()
