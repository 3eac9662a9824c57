"""End-to-end similarity parity against a torch assembly of the reference.

Builds a tiny torch model with the reference's exact structure (HF BertModel,
torchvision-topology ResNet, linear/1×1-conv embedders), exports its state
dict in the reference's ``gloria.``-prefixed checkpoint format, imports it
through ``utils.torch_import.import_gloria`` into our GLoRIA, and compares
the complete zero-shot similarity pipeline — image encoding (299² align-
corners upsample → backbone → embedders), text encoding (last-4-layer sum →
WordPiece→word aggregation), global cosine similarities, and the eval-path
local similarities (``[1:L+1]`` slice, max aggregation) — computed
independently in torch with the reference's formulas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.ops.segment import build_batch_assignment
from gloria_tpu.utils import torch_import
from test_torch_import import _TorchMiniResNet

jax.config.update("jax_default_matmul_precision", "highest")

D_TEXT = 32


def build_torch_reference(vocab_size: int = 120):
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab_size, hidden_size=D_TEXT, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
    )
    bert = transformers.BertModel(hf_cfg).eval()
    resnet = _TorchMiniResNet().eval()
    with torch.no_grad():
        for m in resnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.7, 1.3)
    global_embedder = torch.nn.Linear(2048, D_TEXT)
    local_embedder = torch.nn.Conv2d(1024, D_TEXT, 1, bias=False)
    return bert, resnet, global_embedder, local_embedder


def reference_state_dict(bert, resnet, g_emb, l_emb) -> dict:
    state = {}
    for k, v in bert.state_dict().items():
        state[f"gloria.text_encoder.model.{k}"] = v
    for k, v in resnet.state_dict().items():
        state[f"gloria.img_encoder.model.{k}"] = v
    state["gloria.img_encoder.global_embedder.weight"] = g_emb.weight
    state["gloria.img_encoder.global_embedder.bias"] = g_emb.bias
    state["gloria.img_encoder.local_embedder.weight"] = l_emb.weight
    return state


def torch_image_forward(resnet, g_emb, l_emb, imgs_nchw):
    # reference ImageEncoder.resnet_forward + generate_embeddings
    x = torch.nn.Upsample(size=(299, 299), mode="bilinear", align_corners=True)(imgs_nchw)
    with torch.no_grad():
        pooled, local = resnet(x)
        img_g = g_emb(pooled)                      # [B, D]
        img_l = l_emb(local)                        # [B, D, h, w]
    return img_g, img_l


def torch_text_forward(bert, ids, attn_mask, tokens, num_words):
    # reference BertEncoder.forward: sum last 4 hidden layers + aggregate_tokens
    with torch.no_grad():
        out = bert(ids, attention_mask=attn_mask, output_hidden_states=True)
        h = torch.stack(out.hidden_states[-4:]).sum(0)  # [B, T, D]
    agg_batch, cap_lens = [], []
    for b, toks in enumerate(tokens):
        agg, bank, bank_str, words = [], [], [], []
        for t, tok in enumerate(toks):
            if tok == "[SEP]":
                agg.append(torch.stack(bank).sum(0))
                words.append("".join(bank_str))
                agg.append(h[b, t])
                words.append(tok)
                break
            if tok.startswith("##"):
                bank.append(h[b, t]); bank_str.append(tok[2:])
            else:
                if bank:
                    agg.append(torch.stack(bank).sum(0)); words.append("".join(bank_str))
                bank, bank_str = [h[b, t]], [tok]
        agg = torch.stack(agg)
        pad = num_words - len(agg)
        agg = torch.cat([agg, torch.zeros(pad, agg.shape[-1])])
        agg_batch.append(agg)
        cap_lens.append(sum(1 for w in words if not w.startswith("[")) + 1)
    word_emb = torch.stack(agg_batch)          # [B, W, D]
    sent_emb = word_emb.mean(dim=1)            # reference: mean incl. zero pads
    return word_emb, sent_emb, cap_lens


def torch_local_similarities(img_l, word_emb, cap_lens, temp1=4.0, temp2=5.0):
    # reference GLoRIA.get_local_similarities (eval slice [1:L+1], max agg)
    B = img_l.shape[0]
    context = img_l.reshape(B, img_l.shape[1], -1)  # [B, D, R]
    sims = []
    for i in range(word_emb.shape[0]):
        L = cap_lens[i]
        word = word_emb[i, 1 : L + 1].T.unsqueeze(0).repeat(B, 1, 1)  # [B, D, L]
        raw = torch.bmm(context.transpose(1, 2), word)                 # [B, R, L]
        a1 = torch.softmax(raw.reshape(B * raw.shape[1], L), dim=-1).reshape(B, -1, L)
        a2 = torch.softmax(
            (temp1 * a1.transpose(1, 2)).reshape(B * L, -1), dim=-1
        ).reshape(B, L, -1)
        wc = torch.bmm(context, a2.transpose(1, 2))                    # [B, D, L]
        w_flat = word.transpose(1, 2).reshape(B * L, -1)
        c_flat = wc.transpose(1, 2).reshape(B * L, -1)
        num = (w_flat * c_flat).sum(-1)
        den = (w_flat.norm(2, dim=-1) * c_flat.norm(2, dim=-1)).clamp(min=1e-8)
        row = (num / den).reshape(B, L)
        row = (row * temp2).exp().max(dim=1, keepdim=True)[0].log()
        sims.append(row)
    return torch.cat(sims, dim=1)  # [B_img, B_text]


def test_full_pipeline_similarity_parity():
    bert, resnet, g_emb, l_emb = build_torch_reference()
    state = reference_state_dict(bert, resnet, g_emb, l_emb)
    variables = torch_import.import_gloria(state, resnet_layers=(1, 1, 1, 1),
                                           bert_layers=3, bert_heads=4)

    cfg = Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
                   "vision": {"model_name": "resnet_50"},  # mini variant loaded below
                   "text": {"embedding_dim": D_TEXT, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 120, "hidden_size": D_TEXT,
                                              "num_layers": 3, "num_heads": 4,
                                              "intermediate_size": 64,
                                              "max_position_embeddings": 64}}},
        "data": {"image": {"imsize": 64}, "text": {"word_num": 20}},
        "transforms": {"norm": "half"},
    })
    # the mini resnet is Bottleneck (1,1,1,1): register it for this test
    from gloria_tpu.models import resnet as rn

    rn.BACKBONES["resnet_mini"] = (dict(block=rn.Bottleneck, layers=(1, 1, 1, 1)), 2048, 1024)
    cfg.model.vision.model_name = "resnet_mini"

    # shared inputs: tokenized caption with subwords + a small image batch
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
             "pne": 5, "##um": 6, "##onia": 7, "left": 8, "base": 9, "mild": 10,
             "edema": 11, "right": 12}
    tokens = [
        ["[CLS]", "pne", "##um", "##onia", "left", "base", "[SEP]"] + ["[PAD]"] * 13,
        ["[CLS]", "mild", "edema", "right", "[SEP]"] + ["[PAD]"] * 15,
    ]
    ids = np.asarray([[vocab[t] for t in seq] for seq in tokens], np.int32)
    attn = (ids != 0).astype(np.int32)
    assignment, words, cap_lens = build_batch_assignment(tokens, 20)
    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.4

    # ---- torch reference pipeline ----
    t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    img_g_t, img_l_t = torch_image_forward(resnet, g_emb, l_emb, t_imgs)
    word_t, sent_t, cap_lens_t = torch_text_forward(
        bert, torch.from_numpy(ids.astype(np.int64)), torch.from_numpy(attn.astype(np.int64)),
        tokens, 20)
    assert cap_lens_t == list(cap_lens)
    local_t = torch_local_similarities(img_l_t, word_t, cap_lens_t).numpy()
    gl_n = img_g_t / img_g_t.norm(dim=-1, keepdim=True)
    tx_n = sent_t / sent_t.norm(dim=-1, keepdim=True)
    global_t = (gl_n @ tx_n.T).numpy()

    # ---- gloria_tpu pipeline ----
    from gloria_tpu.data.tokenizer import WordPieceTokenizer

    gm = api.GloriaModel(cfg, variables, tokenizer=WordPieceTokenizer(list(vocab)))
    txts = {"caption_ids": ids, "attention_mask": attn,
            "token_type_ids": np.zeros_like(ids), "word_assignment": assignment,
            "cap_lens": cap_lens}
    img_l, img_g, txt_l, txt_g = gm.encode(jnp.asarray(imgs), txts)
    local_j = gm.get_local_similarities(img_l, txt_l, cap_lens)
    global_j = gm.get_global_similarities(img_g, txt_g)

    np.testing.assert_allclose(global_j, global_t, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(local_j, local_t, rtol=2e-3, atol=2e-3)
    # and the combined API result
    sims = gm.get_similarities(jnp.asarray(imgs), txts, "both")
    np.testing.assert_allclose(sims, (local_t + global_t) / 2, rtol=2e-3, atol=2e-3)


def test_load_gloria_from_torch_lightning_ckpt(tmp_path):
    """api.load_gloria must consume a reference-format Lightning .ckpt file
    (hyper_parameters + gloria.-prefixed state_dict) end to end."""
    bert, resnet, g_emb, l_emb = build_torch_reference()
    state = reference_state_dict(bert, resnet, g_emb, l_emb)
    hyper = {
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
                   "vision": {"model_name": "resnet_mini"},
                   "text": {"embedding_dim": D_TEXT, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 120, "hidden_size": D_TEXT,
                                              "num_layers": 3, "num_heads": 4,
                                              "intermediate_size": 64,
                                              "max_position_embeddings": 64}}},
        "data": {"image": {"imsize": 64}, "text": {"word_num": 20}},
        "transforms": {"norm": "half"},
    }
    ckpt_path = tmp_path / "reference_style.ckpt"
    torch.save({"hyper_parameters": hyper, "state_dict": state}, ckpt_path)

    from gloria_tpu.models import resnet as rn

    rn.BACKBONES["resnet_mini"] = (dict(block=rn.Bottleneck, layers=(1, 1, 1, 1)), 2048, 1024)
    from gloria_tpu.data.tokenizer import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "no", "finding", "edema"]
    gm = api.load_gloria(str(ckpt_path), tokenizer=WordPieceTokenizer(vocab),
                         resnet_layers=(1, 1, 1, 1))
    imgs = gm.process_img([(np.random.RandomState(1).rand(70, 70) * 255).astype("uint8")])
    txts = gm.process_text(["no finding", "edema"])
    sims = gm.get_similarities(imgs, txts)
    assert sims.shape == (1, 2) and np.isfinite(sims).all()
    # weights really came from the torch file
    np.testing.assert_allclose(
        np.asarray(gm.variables["params"]["img_encoder"]["global_embedder"]["bias"]),
        g_emb.bias.detach().numpy(), rtol=1e-6)
