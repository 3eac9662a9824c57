"""Torch-vs-jax numerical parity at REAL model scale.

``test_e2e_parity`` proves the complete similarity pipeline at mini scale
(D=32, 3-layer BERT, (1,1,1,1) ResNet); this file re-runs the same protocol
at the published zoo's real depth/width — a full (3,4,6,3) ResNet-50 and a
12-layer/768-wide HF ``BertModel`` — where accumulated BN/layer-depth drift
would actually show up.  It is the closest offline stand-in for the real
Zenodo checkpoints (reference ``gloria/gloria.py:44-94``): the torch model
has the reference's exact structure, its state dict is exported in the
reference's ``gloria.``-prefixed format, imported through
``torch_import.import_gloria``, and the zero-shot similarity pipeline is
computed independently on both sides (reference formulas:
``gloria/gloria.py:240-306``, ``models/vision_model.py:67-86``,
``models/text_model.py:92-144``).

Asserts, at f32/highest matmul precision:
  - image-tower outputs (global + local embeddings) agree to tight tolerance,
  - text-tower outputs agree,
  - global & local similarity matrices over 64 images x 8 captions agree,
  - zero-shot similarity *ranks* are identical per image (ties guarded).

Marked slow: two full ResNet-50 @ 299^2 x 64-image forwards on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.data.tokenizer import WordPieceTokenizer
from gloria_tpu.ops.segment import build_batch_assignment
from gloria_tpu.utils import torch_import
from test_e2e_parity import (
    reference_state_dict,
    torch_image_forward,
    torch_local_similarities,
    torch_text_forward,
)
from test_torch_import import _TorchMiniResNet

pytestmark = pytest.mark.slow

jax.config.update("jax_default_matmul_precision", "highest")

D = 768
R50 = (3, 4, 6, 3)
N_IMAGES = 64
NUM_WORDS = 24


def build_full_scale_reference(vocab_size: int = 28996):
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab_size, hidden_size=D, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, type_vocab_size=2,
    )
    bert = transformers.BertModel(hf_cfg).eval()
    resnet = _TorchMiniResNet(layers=R50).eval()
    with torch.no_grad():
        for m in resnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.7, 1.3)
    global_embedder = torch.nn.Linear(2048, D)
    local_embedder = torch.nn.Conv2d(1024, D, 1, bias=False)
    return bert, resnet, global_embedder, local_embedder


def _assert_rank_identity(a: np.ndarray, b: np.ndarray, tie_tol: float = 1e-4):
    """Per-row descending rank order of ``a`` and ``b`` must match; any
    disagreement must be a numerical tie (entries within ``tie_tol``)."""
    ra = np.argsort(-a, axis=1, kind="stable")
    rb = np.argsort(-b, axis=1, kind="stable")
    for i in range(a.shape[0]):
        if np.array_equal(ra[i], rb[i]):
            continue
        for pos in range(a.shape[1]):
            if ra[i, pos] != rb[i, pos]:
                gap = abs(a[i, ra[i, pos]] - a[i, rb[i, pos]])
                assert gap < tie_tol, (i, pos, gap)


def test_full_scale_similarity_parity():
    bert, resnet, g_emb, l_emb = build_full_scale_reference()
    state = reference_state_dict(bert, resnet, g_emb, l_emb)
    variables = torch_import.import_gloria(state, resnet_layers=R50,
                                           bert_layers=12, bert_heads=12)

    cfg = Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
                  "vision": {"model_name": "resnet_50"},
                  "text": {"embedding_dim": D, "last_n_layers": 4, "agg_tokens": True,
                           "aggregate_method": "sum",
                           "bert_config": {"vocab_size": 28996, "hidden_size": D,
                                           "num_layers": 12, "num_heads": 12,
                                           "intermediate_size": 3072,
                                           "max_position_embeddings": 512}}},
        "data": {"image": {"imsize": 224}, "text": {"word_num": NUM_WORDS}},
        "transforms": {"norm": "half"},
    })

    # -- shared text inputs: 8 captions with subword/pad variety -------------
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
             "pne": 5, "##um": 6, "##onia": 7, "left": 8, "base": 9,
             "mild": 10, "edema": 11, "right": 12, "no": 13, "acute": 14,
             "card": 15, "##iom": 16, "##egaly": 17, "effusion": 18,
             "pleural": 19, "small": 20, "large": 21, "bilateral": 22,
             "atelect": 23, "##asis": 24, "clear": 25, "lungs": 26}
    token_seqs = [
        ["[CLS]", "pne", "##um", "##onia", "left", "base", "[SEP]"],
        ["[CLS]", "mild", "edema", "right", "[SEP]"],
        ["[CLS]", "no", "acute", "card", "##iom", "##egaly", "[SEP]"],
        ["[CLS]", "small", "pleural", "effusion", "[SEP]"],
        ["[CLS]", "large", "bilateral", "pleural", "effusion", "[SEP]"],
        ["[CLS]", "atelect", "##asis", "left", "base", "[SEP]"],
        ["[CLS]", "lungs", "clear", "no", "effusion", "[SEP]"],
        ["[CLS]", "no", "pne", "##um", "##onia", "no", "edema", "[SEP]"],
    ]
    T = 16
    tokens = [seq + ["[PAD]"] * (T - len(seq)) for seq in token_seqs]
    ids = np.asarray([[vocab[t] for t in seq] for seq in tokens], np.int32)
    attn = (ids != 0).astype(np.int32)
    assignment, _, cap_lens = build_batch_assignment(tokens, NUM_WORDS)

    # -- shared image inputs ---------------------------------------------------
    rng = np.random.RandomState(0)
    raw_imgs = [(rng.rand(72, 96) * 255).astype(np.uint8) for _ in range(N_IMAGES)]

    gm = api.GloriaModel(cfg, variables, tokenizer=WordPieceTokenizer(list(vocab)))
    imgs = np.asarray(gm.process_img(raw_imgs))  # [N, 224, 224, 3] f32

    # ---- torch reference pipeline (chunked to bound peak memory) -----------
    img_g_chunks, img_l_chunks = [], []
    for lo in range(0, N_IMAGES, 16):
        t_imgs = torch.from_numpy(imgs[lo:lo + 16].transpose(0, 3, 1, 2))
        g_t, l_t = torch_image_forward(resnet, g_emb, l_emb, t_imgs)
        img_g_chunks.append(g_t)
        img_l_chunks.append(l_t)
    img_g_t = torch.cat(img_g_chunks)
    img_l_t = torch.cat(img_l_chunks)
    word_t, sent_t, cap_lens_t = torch_text_forward(
        bert, torch.from_numpy(ids.astype(np.int64)),
        torch.from_numpy(attn.astype(np.int64)), tokens, NUM_WORDS)
    assert cap_lens_t == list(cap_lens)
    local_t = torch_local_similarities(img_l_t, word_t, cap_lens_t).numpy()
    gl_n = img_g_t / img_g_t.norm(dim=-1, keepdim=True)
    tx_n = sent_t / sent_t.norm(dim=-1, keepdim=True)
    global_t = (gl_n @ tx_n.T).numpy()

    # ---- gloria_tpu pipeline (same chunking) --------------------------------
    txts = {"caption_ids": ids, "attention_mask": attn,
            "token_type_ids": np.zeros_like(ids), "word_assignment": assignment,
            "cap_lens": cap_lens}
    img_l_parts, img_g_parts = [], []
    txt_l = txt_g = None
    for lo in range(0, N_IMAGES, 16):
        il, ig, tl, tg = gm.encode(jnp.asarray(imgs[lo:lo + 16]), txts)
        img_l_parts.append(il)
        img_g_parts.append(ig)
        txt_l, txt_g = tl, tg
    img_l = jnp.concatenate(img_l_parts)
    img_g = jnp.concatenate(img_g_parts)
    local_j = np.asarray(gm.get_local_similarities(img_l, txt_l, cap_lens))
    global_j = np.asarray(gm.get_global_similarities(img_g, txt_g))

    # -- tower outputs at full depth ------------------------------------------
    # torch img_l is [B, D, h, w]; ours is [B, R, D]
    b, d, h, w = img_l_t.shape
    img_l_t_flat = img_l_t.reshape(b, d, h * w).permute(0, 2, 1).numpy()
    scale_l = np.abs(img_l_t_flat).mean()
    np.testing.assert_allclose(np.asarray(img_l), img_l_t_flat,
                               rtol=5e-3, atol=5e-3 * scale_l)
    scale_g = np.abs(img_g_t.numpy()).mean()
    np.testing.assert_allclose(np.asarray(img_g), img_g_t.numpy(),
                               rtol=5e-3, atol=5e-3 * scale_g)
    scale_w = np.abs(word_t.numpy()).mean()
    np.testing.assert_allclose(np.asarray(txt_l), word_t.numpy(),
                               rtol=5e-3, atol=5e-3 * scale_w)
    np.testing.assert_allclose(np.asarray(txt_g), sent_t.numpy(),
                               rtol=5e-3, atol=5e-3 * scale_w)

    # -- similarity matrices ----------------------------------------------------
    np.testing.assert_allclose(global_j, global_t, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(local_j, local_t, rtol=5e-3, atol=5e-3)

    # -- zero-shot rank identity over 64 images --------------------------------
    sims_j = (local_j + global_j) / 2
    sims_t = (local_t + global_t) / 2
    _assert_rank_identity(sims_j, sims_t)
    # and with the z-norm the zero-shot driver applies (gloria.py:262-268)
    zj = (sims_j - sims_j.mean(axis=0)) / sims_j.std(axis=0)
    zt = (sims_t - sims_t.mean(axis=0)) / sims_t.std(axis=0)
    _assert_rank_identity(zj, zt)
    assert np.array_equal(zj.argmax(axis=1), zt.argmax(axis=1))
