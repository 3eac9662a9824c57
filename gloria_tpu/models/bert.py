"""BERT encoder in Flax (BioClinicalBERT-compatible architecture).

TPU-native reimplementation of the HF ``BertModel`` the reference loads via
``AutoModel.from_pretrained(..., output_hidden_states=True)``
(``/root/reference/gloria/models/text_model.py:18-20``).  Same tensor
topology and parameter shapes as HF BERT so torch checkpoints map onto the
tree (``gloria_tpu.utils.torch_import``), but with static shapes, bf16-ready
compute, and all layers' hidden states returned in one stacked array instead
of a python tuple (so the last-n-layer aggregation is a single slice+sum).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 28996  # Bio_ClinicalBERT inherits the BERT-base-cased vocab
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1
    pad_token_id: int = 0

    @staticmethod
    def tiny(vocab_size: int = 128) -> "BertConfig":
        """Small config for tests."""
        return BertConfig(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
        )


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool):
        cfg = self.config
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        B, T, D = hidden.shape
        H = cfg.num_heads
        hd = D // H

        def split(x):
            return x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q = split(dense("query")(hidden))
        k = split(dense("key")(hidden))
        v = split(dense("value")(hidden))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        scores = scores + attn_bias  # additive mask, HF convention
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D).astype(self.dtype)

        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name="out")(ctx)
        out = nn.Dropout(cfg.dropout_rate)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out + hidden)
        return out


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool):
        cfg = self.config
        hidden = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(hidden, attn_bias, deterministic)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype, param_dtype=jnp.float32, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)  # HF BERT uses exact (erf) GELU
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name="output")(inter)
        out = nn.Dropout(cfg.dropout_rate)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32, name="ln")(out + hidden)
        return out


class BertModel(nn.Module):
    """Returns (sequence_output [B,T,D], pooled [B,D], hidden_states [L+1,B,T,D])."""

    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, deterministic: bool = True):
        cfg = self.config
        B, T = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, T), jnp.int32)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, param_dtype=jnp.float32, name="position_embeddings")(
            jnp.arange(T)[None, :]
        )
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, param_dtype=jnp.float32, name="token_type_embeddings")(token_type_ids)
        hidden = word + pos + typ
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32, name="embeddings_ln")(hidden)
        hidden = nn.Dropout(cfg.dropout_rate)(hidden, deterministic=deterministic)
        hidden = hidden.astype(self.dtype)

        # HF-style additive attention bias in f32
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * jnp.finfo(jnp.float32).min

        states = [hidden.astype(jnp.float32)]
        for i in range(cfg.num_layers):
            hidden = BertLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(hidden, attn_bias, deterministic)
            states.append(hidden.astype(jnp.float32))
        sequence_output = hidden.astype(jnp.float32)

        pooled = nn.Dense(cfg.hidden_size, param_dtype=jnp.float32, name="pooler")(sequence_output[:, 0])
        pooled = jnp.tanh(pooled)

        return sequence_output, pooled, jnp.stack(states)
