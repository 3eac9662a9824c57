"""MetricLogger: CSV/jsonl persistence + the optional wandb mirror.

The wandb path (reference ``run.py:137-144`` WandbLogger selection,
``segmentation_model.py:84-91`` image logging, ``callbacks.py:563-568``
histograms) is exercised against a stub ``wandb`` module — the real package
is not in this image and must never be a hard dependency.
"""

import pytest

import json
import sys
import types

import numpy as np

from gloria_tpu.utils.logging import MetricLogger


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


class _Recorder:
    def __init__(self):
        self.rows = []
        self.finished = False

    def log(self, payload, step=None):
        self.rows.append((step, payload))

    def finish(self):
        self.finished = True


def _install_wandb_stub(monkeypatch):
    rec = _Recorder()
    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: rec
    stub.Image = lambda img, caption=None: ("Image", np.asarray(img).shape)
    stub.Histogram = lambda arr: ("Histogram", len(np.asarray(arr)))
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return rec


def test_csv_and_jsonl_persistence(tmp_path):
    lg = MetricLogger(tmp_path)
    lg.log({"loss": 1.5}, step=0, split="train")
    lg.log({"loss": 1.0, "new_key": 2.0}, step=1, split="train")  # header miss → jsonl
    lg.close()
    csv_text = (tmp_path / "metrics_train.csv").read_text()
    assert "loss" in csv_text and "1.5" in csv_text
    extra = [json.loads(l) for l in (tmp_path / "metrics_train.jsonl").read_text().splitlines()]
    assert extra[0]["new_key"] == 2.0


def test_wandb_mirror_scalars_images_histograms(tmp_path, monkeypatch):
    rec = _install_wandb_stub(monkeypatch)
    lg = MetricLogger(tmp_path, project="p", experiment="e", use_wandb=True)
    assert lg._wandb is rec

    lg.log({"loss": 0.5, "auroc": 0.9}, step=3, split="val")
    lg.log_image("pred", np.zeros((8, 8), np.float32), step=3)
    lg.log_histogram("weights", np.arange(10, dtype=np.float64), step=3)
    lg.close()

    payloads = {k: v for _, p in rec.rows for k, v in p.items()}
    assert payloads["val/loss"] == 0.5 and payloads["val/auroc"] == 0.9
    assert payloads["pred"][0] == "Image"
    assert payloads["weights"] == ("Histogram", 10)
    assert rec.finished

    # local sinks still written alongside the mirror
    hist = json.loads((tmp_path / "histograms.jsonl").read_text().splitlines()[0])
    assert hist["name"] == "weights" and hist["mean"] == 4.5
    assert sum(hist["counts"]) == 10


def test_wandb_absent_is_harmless(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import raises ImportError
    lg = MetricLogger(tmp_path, use_wandb=True)
    assert lg._wandb is None
    lg.log({"loss": 1.0}, step=0, split="train")  # must not raise
    lg.log_histogram("w", [1.0, 2.0], step=0)
    lg.close()


def test_histogram_local_only(tmp_path):
    lg = MetricLogger(tmp_path)
    lg.log_histogram("scores", np.array([0.1, 0.2, 0.7]), step=5)
    lg.close()
    row = json.loads((tmp_path / "histograms.jsonl").read_text().splitlines()[0])
    assert row["step"] == 5 and row["min"] == 0.1 and row["max"] == 0.7


def test_profile_trace_callback(tmp_path):
    """--profile: skips warmup batches, traces N steps, writes an XPlane
    artifact, and never re-arms after the window."""
    import jax.numpy as jnp

    from gloria_tpu.training.trainer import ProfileTrace

    cb = ProfileTrace(tmp_path / "prof", steps=2, skip=1)
    loss = jnp.zeros(())
    for i in range(6):
        cb.on_train_batch_end(None, None, {"loss": loss}, None, i)
    assert cb._done and not cb._active
    files = list((tmp_path / "prof").rglob("*.xplane.pb"))
    assert files, "no profiler trace written"
