"""Attention visualization and overlay utilities.

Equivalents of the reference's ``gloria/utils/utils.py`` (similarity
normalizer ``normalize:12-21``, attention grid renderer
``build_attention_images:171-312``) and the live half of
``gloria/datasets/visualization_utils.py`` (bbox↔mask, ``to_rgb``,
``draw_bounding_boxes``, ``plot_info:478-544``,
``pyramid_attn_overlay:577-584``).
"""

from __future__ import annotations

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
