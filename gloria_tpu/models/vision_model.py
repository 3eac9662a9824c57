"""Image encoder and classifier heads.

Equivalents of the reference ``ImageEncoder`` / ``PretrainedImageClassifier``
/ ``ImageClassifier`` (``/root/reference/gloria/models/vision_model.py``):
ResNet backbone with the layer3 local-feature tap, the fixed bilinear
299×299 upsample (align_corners=True, ``vision_model.py:70``), a linear
global embedder and a 1×1-conv local embedder to the shared text dimension.

TPU-native details: NHWC throughout; the local embedding is returned
flattened to ``[B, R, D]`` (R = h·w, row-major) — the layout the matching
kernels consume — alongside the spatial dims.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .resnet import BACKBONES, make_backbone


class ImageEncoder(nn.Module):
    model_name: str = "resnet_50"
    output_dim: int = 768
    norm: bool = False
    # the reference hardwires a bilinear 299x299 upsample before the backbone
    # (vision_model.py:70), costing 1.78x the conv FLOPs of 224 inputs; keep
    # 299 for parity, set to the crop size (or None to skip) for throughput
    input_size: int | None = 299
    dtype: Any = jnp.float32

    @property
    def feature_dims(self) -> tuple[int, int]:
        _, feature_dim, interm_dim = BACKBONES[self.model_name]
        return feature_dim, interm_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, get_embeddings: bool = True):
        """x: [B, H, W, 3] normalized images.

        Returns (global_emb [B, D], local_emb [B, R, D], (h, w)) when
        ``get_embeddings``; otherwise the raw (pooled_feat, local_feat_map).
        """
        backbone, _, _ = make_backbone(self.model_name, dtype=self.dtype)
        if self.input_size and x.shape[1] != self.input_size:
            x = resize_bilinear(x, (self.input_size, self.input_size), align_corners=True,
                                compute_dtype=self.dtype)
        global_ft, local_ft = backbone(x, train=train)
        if not get_embeddings:
            return global_ft, local_ft

        global_emb = nn.Dense(self.output_dim, param_dtype=jnp.float32, name="global_embedder")(global_ft)
        local_emb = nn.Conv(
            self.output_dim, (1, 1), use_bias=False, param_dtype=jnp.float32, name="local_embedder"
        )(local_ft)

        if self.norm:
            local_emb = local_emb / jnp.linalg.norm(local_emb, axis=-1, keepdims=True)
            global_emb = global_emb / jnp.linalg.norm(global_emb, axis=-1, keepdims=True)

        b, h, w, d = local_emb.shape
        return global_emb, local_emb.reshape(b, h * w, d), (h, w)


class ImageClassifier(nn.Module):
    """Backbone + linear head trained from scratch (reference ``ImageClassifier``)."""

    model_name: str = "resnet_50"
    num_classes: int = 5
    dtype: Any = jnp.float32

    input_size: int | None = 299

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        backbone, _, _ = make_backbone(self.model_name, dtype=self.dtype)
        if self.input_size and x.shape[1] != self.input_size:
            x = resize_bilinear(x, (self.input_size, self.input_size), align_corners=True,
                                compute_dtype=self.dtype)
        pooled, _ = backbone(x, train=train)
        return nn.Dense(self.num_classes, param_dtype=jnp.float32, name="classifier")(pooled)


class PretrainedImageClassifier(nn.Module):
    """Linear head over a (frozen or finetuned) pretrained ``ImageEncoder``.

    Reference ``PretrainedImageClassifier`` (``vision_model.py:97-115``): the
    head consumes the backbone's pooled feature (2048-d for ResNet-50), not
    the 768-d projection.  Freezing is handled by the optimizer partition
    (``gloria_tpu.training.optim.partition_trainable``), not by the module.
    """

    model_name: str = "resnet_50"
    output_dim: int = 768
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        encoder = ImageEncoder(self.model_name, self.output_dim, dtype=self.dtype, name="img_encoder")
        pooled, _ = encoder(x, train=train, get_embeddings=False)
        return nn.Dense(self.num_classes, param_dtype=jnp.float32, name="classifier")(pooled)
