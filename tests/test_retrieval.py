"""Image→text retrieval over an embedded corpus."""

import numpy as np
import pytest

import jax

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.data.tokenizer import WordPieceTokenizer
from gloria_tpu.models import GLoRIA
from gloria_tpu.models.retrieval_model import Retriever, _retrieval_word_mask


def test_retrieval_word_mask_double_shift():
    import jax.numpy as jnp

    # reference wart: CLS stripped once then sliced [1:L+1] again → positions 2..L
    mask = np.asarray(_retrieval_word_mask(jnp.asarray([4]), 8))
    assert mask.tolist() == [[False, False, True, True, True, False, False, False]]


def test_retriever_end_to_end():
    cfg = Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
                   "vision": {"model_name": "resnet_18"},
                   "text": {"embedding_dim": 32, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 256, "hidden_size": 32,
                                              "num_layers": 2, "num_heads": 4,
                                              "intermediate_size": 64,
                                              "max_position_embeddings": 48}}},
        "data": {"image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 48}},
    })
    targets = ["mild edema at the left lung base", "no finding",
               "severe pneumothorax bilaterally", "stable cardiomegaly"]
    tok = WordPieceTokenizer.from_corpus(targets)
    model = GLoRIA(cfg)
    batch = {"imgs": np.zeros((1, 64, 64, 3), np.float32),
             "caption_ids": np.zeros((1, 24), np.int32),
             "attention_mask": np.ones((1, 24), np.int32),
             "token_type_ids": np.zeros((1, 24), np.int32),
             "word_assignment": np.eye(24, dtype=np.float32)[None]}
    variables = model.init(jax.random.PRNGKey(0), {k: jax.numpy.asarray(v) for k, v in batch.items()})
    gm = api.GloriaModel(cfg, variables, tokenizer=tok)

    retriever = Retriever(gm, targets, target_classes=["Edema", "None", "Ptx", "CM"], top_k=2)
    img = (np.random.RandomState(0).rand(80, 80) * 255).astype(np.uint8)
    for mode in ("both", "local", "global"):
        retrieved, classes = retriever.retrieve(img, similarity_type=mode)
        assert len(retrieved) == 2 and len(classes) == 2
        assert all(r in targets for r in retrieved)
    with pytest.raises(ValueError):
        retriever.retrieve(img, similarity_type="bogus")
