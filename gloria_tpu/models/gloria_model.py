"""GLoRIA core model: dual encoders + optional grounding extras + loss.

Equivalent of the reference ``GLoRIA`` module
(``/root/reference/gloria/models/gloria_model.py:45-162``):

- text encoder (BERT, last-4-layer aggregation) and image encoder (ResNet
  with local-feature tap),
- optional 2-D factorized position embeddings added to the local image
  features (``gloria_model.py:17-42,94-97``),
- optional transformer encoder over the flattened local features
  (``gloria_model.py:55-59,98-101``),
- optional learnable no-attention sink vector (``gloria_model.py:60-61``),
- the weighted multi-term loss (``calc_loss``, ``gloria_model.py:132-150``)
  including the attention-supervision NLL against bbox-union masks.

Host-side preprocessing (``process_text``/``process_img``) lives in
``gloria_tpu.data``; similarity APIs built on the model outputs live in
``gloria_tpu.api``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..configs import Config
from ..ops import gloria_loss
from ..ops.resize import resize_maps_nearest
from .bert import BertConfig
from .text_model import TextEncoder
from .vision_model import ImageEncoder


class PositionEmbeddings2D(nn.Module):
    """Factorized 2-D position table: per-axis embeddings concatenated
    (+ zero pad to hidden), reference ``PositionEmbeddings``
    (``gloria_model.py:17-42``)."""

    num_positions: int
    hidden_size: int
    num_spatial_dims: int = 2

    @nn.compact
    def __call__(self, spatial_shape: tuple[int, int]) -> jnp.ndarray:
        pos_dim = self.hidden_size // self.num_spatial_dims
        table = nn.Embed(self.num_positions, pos_dim, param_dtype=jnp.float32, name="table")
        h, w = spatial_shape
        row = jnp.broadcast_to(table(jnp.arange(h))[:, None, :], (h, w, pos_dim))
        col = jnp.broadcast_to(table(jnp.arange(w))[None, :, :], (h, w, pos_dim))
        parts = [row, col]
        pad = self.hidden_size - self.num_spatial_dims * pos_dim
        if pad:
            parts.append(jnp.zeros((h, w, pad)))
        return jnp.concatenate(parts, axis=-1)  # [h, w, hidden]


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer layer matching torch ``nn.TransformerEncoderLayer``
    defaults (dim_feedforward=2048, relu, dropout=0.1)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            name="self_attn",
        )(x, x)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(param_dtype=jnp.float32, name="norm1")(x + attn)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout_rate)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(ff)
        ff = nn.Dropout(self.dropout_rate)(ff, deterministic=deterministic)
        return nn.LayerNorm(param_dtype=jnp.float32, name="norm2")(x + ff)


def bert_config_from_cfg(cfg: Config) -> BertConfig:
    """Build the BERT architecture config from an experiment config."""
    overrides = (cfg.model.text.bert_config or {}) if cfg.model and cfg.model.text else {}
    return BertConfig(**{k: v for k, v in dict(overrides).items()})


class GLoRIA(nn.Module):
    """cfg mirrors the reference experiment-yaml schema (``configs/*.yaml``)."""

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        # flax freezes dict fields into FrozenDict; re-wrap for dot access
        cfg = Config(self.cfg)
        if cfg.model is None:
            cfg.model = Config()
        for node in ("text", "vision", "gloria"):
            if cfg.model[node] is None:
                cfg.model[node] = Config()
        self.text_encoder = TextEncoder(
            bert_config=bert_config_from_cfg(cfg),
            last_n_layers=cfg.model.text.last_n_layers or 4,
            aggregate_method=cfg.model.text.aggregate_method or "sum",
            embedding_dim=cfg.model.text.embedding_dim or 768,
            norm=bool(cfg.model.text.norm),
            agg_tokens=bool(cfg.model.text.agg_tokens),
            dtype=self.dtype,
        )
        self.img_encoder = ImageEncoder(
            model_name=cfg.model.vision.model_name or "resnet_50",
            output_dim=cfg.model.text.embedding_dim or 768,
            norm=bool(cfg.model.norm),
            input_size=299 if cfg.model.vision.encoder_input_size is None
            else (cfg.model.vision.encoder_input_size or None),
            dtype=self.dtype,
        )
        if cfg.model.image_position_embeddings:
            self.position_embeddings = PositionEmbeddings2D(
                num_positions=cfg.model.image_position_embeddings.num,
                hidden_size=cfg.model.text.embedding_dim or 768,
            )
        else:
            self.position_embeddings = None
        if cfg.model.image_transformer:
            self.image_transformer = [
                TransformerEncoderLayer(
                    d_model=cfg.model.text.embedding_dim or 768,
                    num_heads=cfg.model.image_transformer.num_heads,
                    dtype=self.dtype,
                    name=f"image_transformer_{i}",
                )
                for i in range(cfg.model.image_transformer.num_layers)
            ]
        else:
            self.image_transformer = None
        if cfg.model.gloria.no_attn_vec:
            self.no_attn_vec = self.param(
                "no_attn_vec", nn.initializers.normal(1.0), (cfg.model.text.embedding_dim or 768,)
            )
        else:
            self.no_attn_vec = None
        # uint8-batch support: ToTensor+Normalize on device (the
        # device_normalize ingest path ships uint8 for 4× smaller transfers);
        # shares the host pipeline's mode table (raises on unknown modes)
        from ..data.transforms import norm_constants

        self._norm_mean, self._norm_std = norm_constants(
            cfg.transforms.norm if cfg.transforms else None)

    # -- encoder branches ---------------------------------------------------
    def image_encoder_forward(self, imgs: jnp.ndarray, train: bool = False, deterministic: bool = True):
        """imgs [B, H, W, 3] float (host-normalized) or uint8 (raw pixels,
        C=3 or C=1 — grayscale ingest ships one channel for 3× smaller
        transfers; broadcast then normalized here in f32, identically to the
        host pipeline) → (img_emb_l [B, R, D], img_emb_g [B, D], (h, w))."""
        if imgs.dtype == jnp.uint8:
            x = imgs.astype(jnp.float32)
            if x.shape[-1] == 1:  # grayscale: replicate like the host's to_rgb
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            mean = jnp.asarray(self._norm_mean, jnp.float32)
            std = jnp.asarray(self._norm_std, jnp.float32)
            imgs = (x / 255.0 - mean) / std
        img_emb_g, img_emb_l, (h, w) = self.img_encoder(imgs, train=train)
        if self.position_embeddings is not None:
            img_emb_l = img_emb_l + self.position_embeddings((h, w)).reshape(1, h * w, -1)
        if self.image_transformer is not None:
            for layer in self.image_transformer:
                img_emb_l = layer(img_emb_l, deterministic=deterministic)
        return img_emb_l, img_emb_g, (h, w)

    def text_encoder_forward(self, caption_ids, attention_mask, token_type_ids, word_assignment, deterministic: bool = True):
        return self.text_encoder(
            caption_ids, attention_mask, token_type_ids, word_assignment, deterministic=deterministic
        )

    def __call__(self, batch: dict, train: bool = False):
        """batch keys: imgs [B,H,W,3], caption_ids/attention_mask/token_type_ids
        [B,T], word_assignment [B,W,T].  Returns the embedding 4-tuple + grid."""
        deterministic = not train
        img_emb_l, img_emb_g, grid = self.image_encoder_forward(
            batch["imgs"], train=train, deterministic=deterministic
        )
        text_emb_l, text_emb_g = self.text_encoder_forward(
            batch["caption_ids"], batch["attention_mask"], batch["token_type_ids"],
            batch.get("word_assignment"), deterministic=deterministic,
        )
        return img_emb_l, img_emb_g, text_emb_l, text_emb_g, grid

    # -- loss -----------------------------------------------------------------
    def calc_loss(
        self,
        img_emb_l, img_emb_g, text_emb_l, text_emb_g,
        cap_lens: jnp.ndarray,
        grid: tuple[int, int],
        segmentation_labels: jnp.ndarray | None = None,
        chunk: int = 0,
    ):
        """Weighted multi-term loss (reference ``calc_loss``,
        ``gloria_model.py:132-150``). Returns (loss, metrics dict, attn [B,W,R])."""
        g = (Config(self.cfg).model or Config()).gloria or Config()
        local_w = 1.0 if g.local_loss_weight is None else g.local_loss_weight
        global_w = 1.0 if g.global_loss_weight is None else g.global_loss_weight

        l0, l1, no_attn_l, kl_l, ent_l, attn = gloria_loss.local_loss(
            img_emb_l, text_emb_l, cap_lens,
            temp1=g.temp1 or 4.0, temp2=g.temp2 or 5.0, temp3=g.temp3 or 10.0,
            sink=self.no_attn_vec,
            no_attn_loss_weight=g.no_attn_loss_weight,
            attention_divergence_loss_weight=g.attention_divergence_loss_weight,
            attention_entropy_loss_weight=g.attention_entropy_loss_weight,
            chunk=chunk,
            use_fused=bool(g.fused_kernel),
            # large pairwise intermediates follow the module compute policy
            # (bf16 under the flagship config) — the same reduced-precision
            # envelope as the reference's fp16 AMP; softmax element math and
            # matmul accumulation stay f32 (see ops/gloria_loss.py)
            compute_dtype=self.dtype,
        )
        loss = 0.0
        metrics = {"local_loss0": l0, "local_loss1": l1}
        if local_w != 0:
            loss += (l0 + l1) * local_w
        if global_w != 0:
            g0, g1 = gloria_loss.global_loss(img_emb_g, text_emb_g, temp3=g.temp3 or 10.0)
            metrics.update(global_loss0=g0, global_loss1=g1)
            loss += (g0 + g1) * global_w
        if segmentation_labels is not None and g.segmentation_loss_weight:
            # attention-supervision NLL: mean attn map upsampled (nearest, the
            # torch F.interpolate default) to label size, normalized to a
            # distribution; -log of mass inside the bbox-union mask.
            h, w = grid
            B, W, R = attn.shape
            mask = gloria_loss.make_word_mask(cap_lens, W, "train")[..., None]
            mean_maps = jnp.where(mask, attn, 0.0).sum(1) / jnp.maximum(mask.sum(1), 1)
            mean_maps = mean_maps.reshape(B, h, w)
            up = resize_maps_nearest(mean_maps, segmentation_labels.shape[1:3])
            up = up / jnp.maximum(up.sum(axis=(-1, -2), keepdims=True), 1e-12)
            inside = (segmentation_labels * up).sum(axis=(-1, -2))
            seg_loss = -jnp.log(jnp.maximum(inside, 1e-12)).mean() * g.segmentation_loss_weight
            metrics["attn_seg_loss"] = seg_loss
            loss += seg_loss
        if g.no_attn_loss_weight is not None:
            metrics["no_attn_loss"] = no_attn_l
        if g.attention_divergence_loss_weight is not None:
            metrics["attention_divergence_loss"] = kl_l
        if g.attention_entropy_loss_weight is not None:
            metrics["attention_entropy_loss"] = ent_l
        loss = loss + no_attn_l + kl_l + ent_l
        metrics["loss"] = loss
        return loss, metrics, attn
