"""Localization evaluation + instance reweighting callbacks."""

import pytest

import numpy as np

import jax.numpy as jnp

from gloria_tpu.training.localization import (
    EvaluateLocalization, WeightInstancesByLocalization,
    batch_localization_metrics, sent_bboxes_to_segmentation_label, sentence_attention,
)
from gloria_tpu.configs import Config


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def test_segmentation_label_from_bboxes():
    label = sent_bboxes_to_segmentation_label((10, 10), [[1, 2, 3, 4], [5, 5, 6, 6]])
    assert label[2, 1] == 1 and label[4, 3] == 1 and label[5, 5] == 1
    assert label.sum() == 3 * 3 + 2 * 2


def test_batch_localization_metrics_perfect_attention():
    # attention exactly on the box → auroc 1, high precision
    grid = np.zeros((2, 4, 4), np.float32)
    grid[0, 1, 1] = 1.0
    grid[1] = 1.0 / 16  # uniform
    overlays = np.repeat(np.repeat(grid, 4, axis=1), 4, axis=2)  # 16x16
    labels = np.zeros((2, 16, 16), np.float32)
    labels[0, 4:8, 4:8] = 1.0
    labels[1, 0:4, 0:4] = 1.0
    out = batch_localization_metrics(overlays, labels, grid)
    assert out["auroc"][0] == 1.0
    assert 0.4 < out["auroc"][1] < 0.6 or np.isnan(out["auroc"][1]) is False
    assert out["attn_entropy"][1] > out["attn_entropy"][0]
    assert np.isfinite(out["avg_precision"]).all()
    # degenerate (empty) label → NaN
    labels2 = np.zeros_like(labels)
    out2 = batch_localization_metrics(overlays, labels2, grid)
    assert np.isnan(out2["auroc"]).all()


def test_sentence_attention_masks_words():
    attn = np.ones((1, 5, 16), np.float32)
    attn[0, 3:] = 100.0  # padded words must not contribute
    out = sentence_attention(attn, np.asarray([3]), (4, 4))
    np.testing.assert_allclose(out, np.ones((1, 4, 4)))


def test_evaluate_localization_callback(tmp_path):
    cb = EvaluateLocalization(Config(), save_dir=tmp_path, save_full_data=True)
    rng = np.random.RandomState(0)
    B, W, R = 3, 6, 16
    attn = jnp.asarray(rng.dirichlet(np.ones(R), size=(B, W)).astype(np.float32))
    labels = np.zeros((B, 32, 32), np.float32)
    labels[:, 8:16, 8:16] = 1
    batch = {
        "segmentation_labels": labels,
        "cap_lens": np.asarray([4, 5, 3]),
        "imgs": rng.rand(B, 32, 32, 3).astype(np.float32),
        "_ids": ["a/x", "b/y", "c/z"],
        "_words": [["[CLS]", "left", "lung", "[SEP]"]] * B,
    }
    sims = {"local": rng.randn(B).astype(np.float32),
            "global": rng.randn(B).astype(np.float32)}
    means = cb.evaluate_batch(attn, batch, sims=sims)
    assert set(means) >= {"auroc", "avg_precision", "attn_entropy", "no_attn_weight",
                          "precision_at_0.050000", "iou_at_0.300000"}
    csv_path = cb.flush("test")
    assert csv_path is not None
    import pandas as pd

    df = pd.read_csv(csv_path)
    assert len(df) == 3 and "auroc" in df.columns
    # per-sentence similarities persist (reference callbacks.py:385-408)
    np.testing.assert_allclose(df["local_sims"].to_numpy(), sims["local"], rtol=1e-6)
    np.testing.assert_allclose(df["global_sims"].to_numpy(), sims["global"], rtol=1e-6)
    assert (tmp_path / "test" / "attn" / "a_x.npy").exists()
    assert (tmp_path / "test" / "label" / "a_x.npy").exists()
    assert (tmp_path / "test" / "roc_curve" / "a_x.npz").exists()

    # the plot_info renderer consumes this exact artifact layout
    # (reference visualization_utils.py:478-544 five-panel figure)
    from gloria_tpu.utils.viz import load_localization_artifacts, plot_info

    info = load_localization_artifacts(tmp_path / "test")
    assert info["image"][0].shape == (32, 32, 3)
    assert info["roc_curve"][0] is not None and len(info["roc_curve"][0]) == 3
    written = plot_info(tmp_path / "test", mode="upsample", add_no_attn_bar=True)
    assert len(written) == 3
    for sub in ("sentence_figures", "image_with_bboxes", "attention_with_bboxes"):
        assert (tmp_path / "test" / sub / "a_x.jpg").exists()
    import cv2

    img = cv2.imread(str(tmp_path / "test" / "image_with_bboxes" / "a_x.jpg"))
    assert img is not None and img.shape[:2] == (32, 32)


def test_weight_instances_callback():
    class FakeLoader:
        sample_weights = None

    loader = FakeLoader()
    cb = WeightInstancesByLocalization(loader, dataset_size=8, weight_mode="attn_entropy", temp=0.5)
    rng = np.random.RandomState(1)
    B, W, R = 4, 5, 16
    # instance 0: peaked attention (low entropy); instance 1: uniform (high)
    attn = np.full((B, W, R), 1.0 / R, np.float32)
    attn[0] = 0.0
    attn[0, :, 0] = 1.0
    batch = {"cap_lens": np.asarray([4] * B), "_indices": np.asarray([0, 1, 2, 3])}

    class FakeTrainer:
        pass

    cb.on_train_batch_end(FakeTrainer(), None, {"_attn": attn}, batch, 0)
    cb.on_epoch_end(FakeTrainer(), None, "train", {})
    w = loader.sample_weights
    assert w is not None and abs(w.sum() - 1) < 1e-6
    assert w[1] > w[0]  # high-entropy instance upweighted
