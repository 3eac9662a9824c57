"""Text encoder: BERT + last-n-layer aggregation + word-level pooling.

Equivalent of the reference ``BertEncoder``
(``/root/reference/gloria/models/text_model.py:6-144``), with the per-token
aggregation loop replaced by the host-precomputed assignment matmul
(:mod:`gloria_tpu.ops.segment`).  Because layer-sum, token aggregation, and
the sentence mean are all linear, they commute — we aggregate once on the
summed hidden states instead of per layer, which is numerically identical.

Conventions: word embeddings are returned as ``[B, W, D]`` (the reference
returns ``[B, D, W]``); sentence embeddings ``[B, D]``.

Parity notes:
- sentence embedding = mean over the *static* word axis including zero-padded
  rows (denominator = num_words, reference ``text_model.py:110``);
- with ``agg_tokens=False`` the per-token states are used directly and the
  sentence mean runs over all token positions (no mask), as in the reference;
- ``last_n_layers == 1`` returns the final layer states and the tanh pooler
  output (HF ``outputs[0]/outputs[1]``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.segment import aggregate_embeddings
from .bert import BertConfig, BertModel


class TextEncoder(nn.Module):
    bert_config: BertConfig
    last_n_layers: int = 4
    aggregate_method: str = "sum"
    embedding_dim: int = 768
    norm: bool = False
    agg_tokens: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        caption_ids: jnp.ndarray,       # [B, T]
        attention_mask: jnp.ndarray,    # [B, T]
        token_type_ids: jnp.ndarray,    # [B, T]
        word_assignment: jnp.ndarray | None = None,  # [B, W, T] (required if agg_tokens)
        deterministic: bool = True,
    ):
        seq, pooled, states = BertModel(self.bert_config, dtype=self.dtype, name="bert")(
            caption_ids, attention_mask, token_type_ids, deterministic=deterministic
        )

        if self.last_n_layers > 1:
            h = states[-self.last_n_layers:]  # [n, B, T, D]
            if self.aggregate_method == "sum":
                h = h.sum(0)
            elif self.aggregate_method == "mean":
                h = h.mean(0)
            else:
                raise ValueError(f"aggregation method not implemented: {self.aggregate_method}")
            if self.agg_tokens:
                if word_assignment is None:
                    raise ValueError("agg_tokens=True requires a word_assignment matrix")
                word_emb = aggregate_embeddings(h, word_assignment)  # [B, W, D]
            else:
                word_emb = h
            sent_emb = word_emb.mean(axis=1)
        else:
            word_emb, sent_emb = seq, pooled

        if self.norm:
            word_emb = word_emb / jnp.linalg.norm(word_emb, axis=-1, keepdims=True)
            sent_emb = sent_emb / jnp.linalg.norm(sent_emb, axis=-1, keepdims=True)

        return word_emb, sent_emb
