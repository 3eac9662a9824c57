"""Attention visualization and overlay utilities.

Equivalents of the reference's ``gloria/utils/utils.py`` (similarity
normalizer ``normalize:12-21``, attention grid renderer
``build_attention_images:171-312``) and the live half of
``gloria/datasets/visualization_utils.py`` (bbox↔mask, ``to_rgb``,
``draw_bounding_boxes``, the per-sentence 5-panel figure
``plot_info:478-544`` + its artifact reloader
``path_and_rows_to_info:551-570``, ``pyramid_attn_overlay:577-584``).

``plot_info`` here renders straight from an ``EvaluateLocalization``
artifact directory (``sentences.csv`` + image/attn/label/roc_curve/pr_curve
folders written with ``save_full_data=True``); CLI entry:
``python -m gloria_tpu.utils.analysis plot-info <artifact_dir>``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import cv2


def normalize(similarities: np.ndarray, method: str = "norm") -> np.ndarray:
    if method == "norm":
        return (similarities - similarities.mean(axis=0)) / similarities.std(axis=0)
    if method == "standardize":
        return (similarities - similarities.min(axis=0)) / (
            similarities.max(axis=0) - similarities.min(axis=0)
        )
    raise ValueError("normalizing method not implemented")


def pyramid_attn_overlay(attn: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Smooth pyramid expansion of a [h, w] attention grid to image size
    (reference visualization_utils.py:577-584, skimage.pyramid_expand with a
    large sigma ≈ heavy Gaussian blur after upsampling)."""
    attn = np.asarray(attn, np.float32)
    upscale = max(1, image_shape[0] // attn.shape[0])
    big = cv2.resize(attn, (attn.shape[1] * upscale, attn.shape[0] * upscale),
                     interpolation=cv2.INTER_LINEAR)
    sigma = 20.0
    k = int(sigma * 4) | 1
    big = cv2.GaussianBlur(big, (k, k), sigma)
    return cv2.resize(big, image_shape[::-1], interpolation=cv2.INTER_LINEAR)


def upsample_attn_overlay(attn: np.ndarray, image_shape: tuple[int, int]) -> np.ndarray:
    """Plain bilinear upsample ('upsample' eval mode, callbacks.py:309-320)."""
    return cv2.resize(np.asarray(attn, np.float32), image_shape[::-1],
                      interpolation=cv2.INTER_LINEAR)


def windows_attn_overlay(attn: np.ndarray, image_shape: tuple[int, int],
                         windows: np.ndarray | None = None) -> np.ndarray:
    """'windows' mode: spread each cell's weight uniformly over its receptive
    window; without explicit windows, falls back to nearest-cell assignment."""
    if windows is None:
        return cv2.resize(np.asarray(attn, np.float32), image_shape[::-1],
                          interpolation=cv2.INTER_NEAREST)
    out = np.zeros(image_shape, np.float32)
    counts = np.zeros(image_shape, np.float32)
    flat = np.asarray(attn, np.float32).reshape(-1)
    for weight, (y1, x1, y2, x2) in zip(flat, windows.reshape(-1, 4)):
        out[y1:y2, x1:x2] += weight
        counts[y1:y2, x1:x2] += 1
    return out / np.maximum(counts, 1)


ATTN_OVERLAY_MODES = {
    "upsample": upsample_attn_overlay,
    "pyramid": pyramid_attn_overlay,
    "windows": windows_attn_overlay,
}


def get_attn_overlay(attn: np.ndarray, image_shape: tuple[int, int],
                     mode: str = "upsample", **kw) -> np.ndarray:
    return ATTN_OVERLAY_MODES[mode](attn, image_shape, **kw)


def to_rgb(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.dtype != np.uint8:
        lo, hi = img.min(), img.max()
        img = ((img - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8)
    return img


def draw_bounding_boxes(img: np.ndarray, bboxes, color=(255, 0, 0), thickness: int = 2) -> np.ndarray:
    out = to_rgb(img).copy()
    for bbox in bboxes:
        x1, y1, x2, y2 = (int(round(v)) for v in bbox)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
    return out


def heatmap_overlay(img: np.ndarray, attn: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Blend a normalized attention map over an image (jet colormap)."""
    img = to_rgb(img)
    a = np.asarray(attn, np.float32)
    a = (a - a.min()) / (a.max() - a.min() + 1e-8)
    heat = cv2.applyColorMap((a * 255).astype(np.uint8), cv2.COLORMAP_JET)[:, :, ::-1]
    if heat.shape[:2] != img.shape[:2]:
        heat = cv2.resize(heat, img.shape[:2][::-1])
    return (alpha * heat + (1 - alpha) * img).astype(np.uint8)


def mask_component_bboxes(mask: np.ndarray) -> list[list[int]]:
    """Per-connected-component [x1, y1, x2, y2] boxes of a binary mask —
    recovers the per-bbox view from the persisted bbox-union label."""
    m = (np.asarray(mask) > 0).astype(np.uint8)
    n, comp = cv2.connectedComponents(m)
    boxes = []
    for c in range(1, n):
        ys, xs = np.nonzero(comp == c)
        boxes.append([int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())])
    return boxes


def load_localization_artifacts(path) -> dict[str, list]:
    """Reload an ``EvaluateLocalization`` artifact dir into columnar form
    (reference ``path_and_rows_to_info``, visualization_utils.py:551-570).

    Returns the sentences.csv columns plus per-sentence ``image``, ``attn``,
    ``label``, ``roc_curve``, ``pr_curve`` arrays (None when the artifact is
    absent or the curve was degenerate)."""
    import pandas as pd

    path = Path(path)
    rows = pd.read_csv(path / "sentences.csv")
    info: dict[str, list] = {k: rows[k].tolist() for k in rows.keys()}
    for folder in ("image", "attn", "label", "roc_curve", "pr_curve"):
        items = []
        for sid in info["dicom_sent_id"]:
            ext = ".npz" if folder.endswith("_curve") else ".npy"
            f = path / folder / f"{sid}{ext}"
            if not f.exists():
                items.append(None)
            elif folder.endswith("_curve"):
                with np.load(f, allow_pickle=True) as z:
                    items.append(tuple(z[k] for k in z.files) if z.files else None)
            else:
                items.append(np.load(f, allow_pickle=True))
        info[folder] = items
    return info


def plot_sentence_info(image, attn, label, roc_curve, pr_curve, sentence: str,
                       auroc=None, avg_precision=None, mode: str = "upsample",
                       add_no_attn_bar: bool = False):
    """One per-sentence diagnostic figure (reference ``plot_info`` panel
    content, visualization_utils.py:478-544): top row = sentence text +
    scalar metrics; bottom row = image with gold bboxes, attention overlay
    with bboxes, ROC curve, PR curve.

    Returns (fig, image_with_bboxes, attention_with_bboxes)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    image = np.asarray(image)
    bboxes = mask_component_bboxes(label) if label is not None else []
    image_with_bboxes = draw_bounding_boxes(to_rgb(image), bboxes)

    overlay = get_attn_overlay(np.asarray(attn, np.float32), image.shape[:2], mode)
    if add_no_attn_bar:
        # reference: append a bar encoding the learnable no-attn sink weight
        gap = np.zeros((max(int(overlay.shape[0] * 0.01), 1), overlay.shape[1]), overlay.dtype)
        bar = np.full((max(int(overlay.shape[0] * 0.05), 1), overlay.shape[1]),
                      1.0 - float(np.asarray(attn).sum()), overlay.dtype)
        overlay = np.concatenate([overlay, gap, bar], axis=0)
    attention_with_bboxes = draw_bounding_boxes(to_rgb(overlay), bboxes)

    fig = plt.figure(figsize=(15, 5), tight_layout=True)
    text_ax = plt.subplot2grid((2, 5), (0, 0), colspan=3)
    text_ax.text(0.0, 0.5, f"sentence: {sentence}", ha="left", va="bottom", wrap=True)
    text_ax.set_axis_off()
    for col, (name, value) in enumerate(
            [("auroc", auroc), ("avg_precision", avg_precision)], start=3):
        ax = plt.subplot2grid((2, 5), (0, col))
        if value is not None and value == value:  # skip NaN (degenerate label)
            ax.text(0.5, 0.5, f"{name}: {value:f}", ha="center", va="bottom")
        ax.set_axis_off()
    ax_img = plt.subplot2grid((2, 5), (1, 1))
    ax_img.imshow(image_with_bboxes)
    ax_img.set_axis_off()
    ax_attn = plt.subplot2grid((2, 5), (1, 2))
    ax_attn.imshow(attention_with_bboxes)
    ax_attn.set_axis_off()
    ax_roc = plt.subplot2grid((2, 5), (1, 3))
    if roc_curve is not None:
        ax_roc.plot(roc_curve[0], roc_curve[1])
    ax_roc.set_xlabel("1-Specificity")
    ax_roc.set_ylabel("Sensitivity/Recall")
    ax_pr = plt.subplot2grid((2, 5), (1, 4))
    if pr_curve is not None:
        ax_pr.plot(pr_curve[1], pr_curve[0])
        ax_pr.set(xlim=(0, 1), ylim=(0, 1))
    ax_pr.set_xlabel("Sensitivity/Recall")
    ax_pr.set_ylabel("Precision")
    return fig, image_with_bboxes, attention_with_bboxes


def plot_info(artifact_dir, out_dir=None, mode: str = "upsample",
              add_no_attn_bar: bool = False, limit: int | None = None) -> list:
    """Render every sentence in an ``EvaluateLocalization`` artifact dir.

    Writes ``sentence_figures/``, ``image_with_bboxes/`` and
    ``attention_with_bboxes/`` jpgs under ``out_dir`` (defaults to the
    artifact dir itself), mirroring the reference's output layout."""
    import matplotlib.pyplot as plt

    info = load_localization_artifacts(artifact_dir)
    out = Path(out_dir) if out_dir else Path(artifact_dir)
    for sub in ("sentence_figures", "image_with_bboxes", "attention_with_bboxes"):
        (out / sub).mkdir(parents=True, exist_ok=True)
    written = []
    n = len(info["dicom_sent_id"]) if limit is None else min(limit, len(info["dicom_sent_id"]))
    for i in range(n):
        sid = info["dicom_sent_id"][i]
        if info["image"][i] is None or info["attn"][i] is None:
            continue
        fig, img_b, attn_b = plot_sentence_info(
            info["image"][i], info["attn"][i], info["label"][i],
            info["roc_curve"][i], info["pr_curve"][i],
            sentence=str(info.get("sentence", [""] * n)[i]),
            auroc=info.get("auroc", [None] * n)[i],
            avg_precision=info.get("avg_precision", [None] * n)[i],
            mode=mode, add_no_attn_bar=add_no_attn_bar,
        )
        cv2.imwrite(str(out / "image_with_bboxes" / f"{sid}.jpg"), img_b[:, :, ::-1])
        cv2.imwrite(str(out / "attention_with_bboxes" / f"{sid}.jpg"), attn_b[:, :, ::-1])
        fig_path = out / "sentence_figures" / f"{sid}.jpg"
        fig.savefig(fig_path)
        plt.close(fig)
        written.append(str(fig_path))
    return written


FONT_MAX = 50


def build_attention_images(
    imgs: np.ndarray,           # [B, H, W, 3] normalized or uint8
    attn_maps: np.ndarray,      # [B, W_words, h, w]
    words: list[list[str]],
    cap_lens,
    nvis: int = 8,
    rand_vis: bool = False,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """Per-sample rows of per-word attention-overlay tiles with the word
    rendered above each tile (reference ``build_attention_images:171-312``)."""
    from PIL import Image, ImageDraw

    B = len(imgs)
    nvis = min(nvis, B)
    idxs = ((rng or np.random.RandomState(0)).choice(B, nvis, replace=False)
            if rand_vis else np.arange(nvis))
    max_words = int(max(cap_lens[i] for i in idxs))
    tile = 112
    canvas = np.zeros((nvis * (tile + FONT_MAX), max_words * (tile + 2), 3), np.uint8)
    pil = Image.fromarray(canvas)
    draw = ImageDraw.Draw(pil)
    for r, i in enumerate(idxs):
        img = cv2.resize(to_rgb(imgs[i]), (tile, tile))
        L = int(cap_lens[i])
        for wpos in range(min(L, max_words)):
            attn = get_attn_overlay(attn_maps[i][wpos], (tile, tile), "upsample")
            tile_img = heatmap_overlay(img, attn)
            y0 = r * (tile + FONT_MAX) + FONT_MAX
            x0 = wpos * (tile + 2)
            pil.paste(Image.fromarray(tile_img), (x0, y0))
            word = words[i][wpos] if wpos < len(words[i]) else ""
            draw.text((x0 + 2, y0 - FONT_MAX + 10), word.strip("#"), fill=(255, 255, 255))
    return np.asarray(pil)
