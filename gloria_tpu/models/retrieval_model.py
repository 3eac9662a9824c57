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
        # embed target corpus once (text tower only)
        txt_l, txt_g = gloria_model.encode_text(txts)
        self.target_local = txt_l
        self.target_global = txt_g
        self.cap_lens = jnp.asarray(txts["cap_lens"])
        self.targets = list(targets)
        self.target_classes = np.asarray(target_classes) if target_classes is not None else None

    def retrieve_embedded(self, img_l, img_g, similarity_type: str = "both") -> list:
        """Batch of encoded queries → per-query (targets, classes) top-k.
        One pairwise program scores the whole batch against the corpus."""
        if similarity_type not in ("both", "local", "global"):
            raise ValueError("similarity_type must be one of ['both', 'local', 'global']")
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
        local = np.asarray(m.similarities) * temp3                       # [N, T]
        global_ = np.asarray(gloria_loss.global_similarities(img_g, self.target_global))

        if similarity_type == "local":
            sims = local
        elif similarity_type == "global":
            sims = global_
        else:
            norm = lambda x: (x - x.mean(axis=1, keepdims=True)) / x.std(axis=1, keepdims=True)
            sims = np.stack([norm(local), norm(global_)]).mean(axis=0)

        results = []
        for row in sims:
            idx = np.argsort(row)[::-1][: self.top_k]
            cls = self.target_classes[idx] if self.target_classes is not None else None
            results.append((np.asarray(self.targets, dtype=object)[idx], cls))
        return results

    def retrieve(self, image, similarity_type: str = "both"):
        """Single query (reference ``Retriver.retrieve`` API): path/array →
        (top-k targets, top-k classes)."""
        imgs = self.gloria.process_img([image] if not isinstance(image, list) else image)
        img_l, img_g = self.gloria.encode_images(imgs)
        return self.retrieve_embedded(img_l, img_g, similarity_type)[0]
