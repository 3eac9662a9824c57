"""WordPiece→word aggregation parity vs a loop oracle of the reference
``BertEncoder.aggregate_tokens`` (text_model.py:32-90)."""

import pytest

import numpy as np

from gloria_tpu.ops.segment import aggregate_embeddings, build_batch_assignment, build_word_assignment


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def oracle_aggregate(tokens, embs, num_words):
    """Loop re-derivation of reference aggregate_tokens for one caption."""
    agg, words = [], []
    bank_embs, bank = [], []
    for emb, tok in zip(embs, tokens):
        if tok == "[SEP]":
            agg.append(np.sum(bank_embs, axis=0))
            words.append("".join(bank))
            agg.append(emb)
            words.append(tok)
            break
        if not tok.startswith("##"):
            if not bank:
                bank_embs, bank = [emb], [tok]
            else:
                agg.append(np.sum(bank_embs, axis=0))
                words.append("".join(bank))
                bank_embs, bank = [emb], [tok]
        else:
            bank_embs.append(emb)
            bank.append(tok[2:])
    pad = num_words - len(agg)
    out = np.stack(agg + [np.zeros_like(embs[0])] * pad)
    return out, words + ["[PAD]"] * pad


TOKENS = [
    "[CLS]", "pne", "##um", "##oth", "##orax", "is", "seen", "at", "the",
    "right", "lung", "base", "[SEP]", "[PAD]", "[PAD]", "[PAD]",
]


def test_assignment_matches_oracle():
    rng = np.random.RandomState(0)
    T = len(TOKENS)
    embs = rng.randn(T, 8).astype(np.float32)
    assign, words, cap_len = build_word_assignment(TOKENS, T)
    ref_out, ref_words = oracle_aggregate(TOKENS, embs, T)
    got = assign @ embs
    np.testing.assert_allclose(got, ref_out, rtol=1e-6)
    assert words == ref_words
    assert words[1] == "pneumothorax"
    # cap_len = non-special words + 1 (gloria_model.py:107-109)
    n_real = sum(1 for w in words if not w.startswith("["))
    assert cap_len == n_real + 1 == 9


def test_truncated_caption_drops_open_group():
    # no [SEP] (truncation): trailing open group must be dropped
    toks = ["[CLS]", "card", "##iac", "sil", "##hou"]
    rng = np.random.RandomState(1)
    embs = rng.randn(5, 4).astype(np.float32)
    assign, words, cap_len = build_word_assignment(toks, 5)
    got = assign @ embs
    # rows: [CLS], "cardiac"; "silhou" group never flushed
    np.testing.assert_allclose(got[0], embs[0], rtol=1e-6)
    np.testing.assert_allclose(got[1], embs[1] + embs[2], rtol=1e-6)
    assert np.abs(got[2:]).max() == 0.0
    assert words[:2] == ["[CLS]", "cardiac"] and words[2] == "[PAD]"


def test_batch_assignment_and_device_op():
    import jax.numpy as jnp

    batch = [TOKENS, ["[CLS]", "no", "finding", "[SEP]"] + ["[PAD]"] * 12]
    assign, words, lens = build_batch_assignment(batch, 16)
    assert assign.shape == (2, 16, 16)
    assert lens.tolist()[1] == 3  # "no", "finding" + 1
    rng = np.random.RandomState(2)
    emb = rng.randn(2, 16, 8).astype(np.float32)
    out = np.asarray(aggregate_embeddings(jnp.asarray(emb), jnp.asarray(assign)))
    ref0, _ = oracle_aggregate(batch[0], emb[0], 16)
    ref1, _ = oracle_aggregate(batch[1], emb[1], 16)
    np.testing.assert_allclose(out[0], ref0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1], ref1, rtol=1e-5, atol=1e-6)
