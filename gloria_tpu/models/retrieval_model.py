"""Image→text retrieval over an embedded target corpus.

Equivalent of the reference ``Retriver``
(``/root/reference/gloria/models/retrival_model.py:8-166``), including its
quirks, reproduced deliberately:

- the target word embeddings are CLS-stripped once (``:57``) and then sliced
  ``[1:cap_len+1]`` *again* (``:144``) — a double shift, so the words that
  participate are original positions 2..N+1 (second word … [SEP]);
- local similarity is aggregated per target with agg='sum' then scaled by
  temp3 (``:166``);
- 'both' mode z-normalizes local and global scores across targets before
  averaging (``:111-116``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..api import GloriaModel
from ..ops import gloria_loss


def _retrieval_word_mask(cap_lens: jnp.ndarray, num_words: int) -> jnp.ndarray:
    """Positions 2..cap_len (reference double-shift; cap_len = words+1)."""
    idx = jnp.arange(num_words)[None, :]
    lens = cap_lens[:, None]
    return (idx >= 2) & (idx <= lens)


class Retriever:
    def __init__(self, gloria_model: GloriaModel, targets: list[str],
                 target_classes: list | None = None, top_k: int = 5):
        self.gloria = gloria_model
        self.top_k = top_k
        txts = gloria_model.process_text(targets)
        # embed target corpus once
        dummy_img = jnp.zeros((1, 224, 224, 3), jnp.float32)
        _, _, txt_l, txt_g = gloria_model.encode(dummy_img, txts)
        self.target_local = txt_l
        self.target_global = txt_g
        self.cap_lens = jnp.asarray(txts["cap_lens"])
        self.targets = list(targets)
        self.target_classes = np.asarray(target_classes) if target_classes is not None else None

    def retrieve(self, image, similarity_type: str = "both"):
        if similarity_type not in ("both", "local", "global"):
            raise ValueError("similarity_type must be one of ['both', 'local', 'global']")
        imgs = self.gloria.process_img([image] if not isinstance(image, list) else image)
        txts_dummy = {  # encode image only: reuse forward with the stored text batch
            "caption_ids": np.zeros((1, self.target_local.shape[1]), np.int32),
            "attention_mask": np.ones((1, self.target_local.shape[1]), np.int32),
            "token_type_ids": np.zeros((1, self.target_local.shape[1]), np.int32),
            "word_assignment": np.eye(self.target_local.shape[1], dtype=np.float32)[None],
        }
        img_l, img_g, _, _ = self.gloria.encode(imgs, txts_dummy)

        g = self.gloria.cfg.model.gloria if self.gloria.cfg.model else None
        temp1 = (g.temp1 if g else None) or 4.0
        temp2 = (g.temp2 if g else None) or 5.0
        temp3 = (g.temp3 if g else None) or 10.0
        mask = _retrieval_word_mask(self.cap_lens, self.target_local.shape[1])
        m = gloria_loss.local_matching(
            self.target_local, img_l, mask,
            temp1=temp1, temp2=temp2, agg="sum", chunk=0,
            need_diag_attn=False, precision="highest",
        )
        local = np.asarray(m.similarities)[0] * temp3  # single source image
        global_ = np.asarray(gloria_loss.global_similarities(img_g, self.target_global))[0]

        if similarity_type == "local":
            sims = local
        elif similarity_type == "global":
            sims = global_
        else:
            norm = lambda x: (x - x.mean(axis=0)) / x.std(axis=0)
            sims = np.stack([norm(local), norm(global_)]).mean(axis=0)

        sorted_idx = np.argsort(sims)[::-1][: self.top_k]
        retrieved_cls = self.target_classes[sorted_idx] if self.target_classes is not None else None
        return np.asarray(self.targets, dtype=object)[sorted_idx], retrieved_cls
