"""Device-side image resizing with exact PyTorch semantics.

The reference relies on two torch resizes whose index math differs from
``jax.image.resize``:

- ``nn.Upsample(size=(299, 299), mode='bilinear', align_corners=True)`` on the
  encoder input (``/root/reference/gloria/models/vision_model.py:70``),
- ``nn.functional.interpolate(...)`` with the default **nearest** mode on
  attention maps (``gloria/models/gloria_model.py:145``).

Both are separable; we express them as two small dense interpolation-matrix
contractions (built host-side at trace time from the static shapes) so XLA
lowers them to MXU matmuls fused with the surrounding program, instead of
gather ops.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool = True) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    if align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.clip((np.arange(out_size) + 0.5) * scale - 0.5, 0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0).astype(np.float32)
    m[np.arange(out_size), i0] += 1.0 - w
    m[np.arange(out_size), i1] += w
    return m


@functools.lru_cache(maxsize=64)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest': src = floor(i * in / out)
    src = np.minimum((np.arange(out_size) * in_size) // out_size, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), src] = 1.0
    return m


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray,
                     compute_dtype=None) -> jnp.ndarray:
    """x: [..., H, W, C] → [..., H', W', C] via separable row/col matrices.

    Contract in channels-first layout so the lane dimension is spatial, not
    C: with C=3 images, lanes padded 3→128 made the NHWC contraction 31×
    slower on v5e (65 ms vs 2 ms for 48×224²→299²).

    ``compute_dtype`` defaults to float32 (exact torch semantics for eval
    parity); the training path passes bf16 — the reference trains under
    Lightning AMP (precision: 16), so its upsample runs reduced-precision
    there too."""
    dtype = x.dtype
    cd = jnp.float32 if compute_dtype is None else compute_dtype
    xf = jnp.moveaxis(x.astype(cd), -1, -3)  # [..., C, H, W]
    y = jnp.einsum("oh,...hw->...ow", jnp.asarray(mh).astype(cd), xf)
    y = jnp.einsum("pw,...ow->...op", jnp.asarray(mw).astype(cd), y)
    return jnp.moveaxis(y, -3, -1).astype(dtype)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int], align_corners: bool = True,
                    compute_dtype=None) -> jnp.ndarray:
    """Bilinear resize of NHWC (or [..., H, W, C]) with torch semantics."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _bilinear_matrix(h, size[0], align_corners),
                            _bilinear_matrix(w, size[1], align_corners), compute_dtype)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of [..., H, W, C] with torch semantics."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _nearest_matrix(h, size[0]), _nearest_matrix(w, size[1]))


def resize_maps_nearest(maps: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of channel-less maps [..., H, W] (attention maps)."""
    return resize_nearest(maps[..., None], size)[..., 0]


def resize_maps_bilinear(maps: jnp.ndarray, size: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    return resize_bilinear(maps[..., None], size, align_corners)[..., 0]
