"""Full-scale checkpoint import: every key family of the published zoo.

The published GLoRIA zoo checkpoints (``/root/reference/gloria/gloria.py:34-94``)
are Lightning ``.ckpt`` files holding a ResNet-50 + 12-layer BioClinicalBERT
GLoRIA under ``gloria.``-prefixed keys, including HF buffer keys
(``embeddings.position_ids``), BN ``num_batches_tracked`` buffers, and the
optional variant parameters (2-D position embeddings, image transformer,
``no_attn_vec``).  Round-1 import tests only exercised tiny synthetic models;
this file fabricates a checkpoint with the REAL key set and REAL shapes and
round-trips it through ``api.load_gloria`` → jitted forward.

Marked slow: compiling ResNet-50@299² + BERT-base on CPU takes minutes.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import transformers

from gloria_tpu import api
from gloria_tpu.data.tokenizer import WordPieceTokenizer

pytestmark = pytest.mark.slow

R50_LAYERS = (3, 4, 6, 3)
D = 768


def fabricate_resnet50_state(rng: np.random.RandomState) -> dict:
    """torchvision ``resnet50().state_dict()`` key set + shapes (fabricated;
    torchvision is not installed in this image)."""

    def conv(out_c, in_c, k):
        std = np.sqrt(2.0 / (in_c * k * k))
        return torch.from_numpy(rng.randn(out_c, in_c, k, k).astype(np.float32) * std)

    def bn(prefix, c, state):
        state[f"{prefix}.weight"] = torch.from_numpy(np.abs(rng.randn(c)).astype(np.float32) * 0.5 + 0.5)
        state[f"{prefix}.bias"] = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1)
        state[f"{prefix}.running_mean"] = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.2)
        state[f"{prefix}.running_var"] = torch.from_numpy(np.abs(rng.randn(c)).astype(np.float32) * 0.3 + 0.7)
        state[f"{prefix}.num_batches_tracked"] = torch.tensor(1000)  # must be ignored

    state: dict = {"conv1.weight": conv(64, 3, 7)}
    bn("bn1", 64, state)
    inplanes = 64
    for stage, (n_blocks, planes) in enumerate(zip(R50_LAYERS, (64, 128, 256, 512)), start=1):
        for b in range(n_blocks):
            p = f"layer{stage}.{b}"
            width = planes
            state[f"{p}.conv1.weight"] = conv(width, inplanes if b == 0 else planes * 4, 1)
            bn(f"{p}.bn1", width, state)
            state[f"{p}.conv2.weight"] = conv(width, width, 3)
            bn(f"{p}.bn2", width, state)
            state[f"{p}.conv3.weight"] = conv(planes * 4, width, 1)
            bn(f"{p}.bn3", planes * 4, state)
            if b == 0:
                state[f"{p}.downsample.0.weight"] = conv(planes * 4, inplanes, 1)
                bn(f"{p}.downsample.1", planes * 4, state)
        inplanes = planes * 4
    return state


def test_full_scale_zoo_checkpoint_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    torch.manual_seed(0)

    # ---- BERT: real HF module → real key set, incl. position_ids buffer ----
    hf_cfg = transformers.BertConfig(
        vocab_size=28996, hidden_size=D, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, max_position_embeddings=512, type_vocab_size=2,
    )
    bert = transformers.BertModel(hf_cfg)
    bert_state = dict(bert.state_dict())
    # HF versions contemporary with the zoo serialize this buffer; the
    # importer must skip it (reference load_state_dict(strict=False)-era key)
    bert_state["embeddings.position_ids"] = torch.arange(512)[None]

    # ---- image transformer: real torch module → packed in_proj keys --------
    tlayer = torch.nn.TransformerEncoderLayer(d_model=D, nhead=4)
    transformer = torch.nn.TransformerEncoder(tlayer, num_layers=2)

    state = {}
    for k, v in bert_state.items():
        state[f"gloria.text_encoder.model.{k}"] = v
    for k, v in fabricate_resnet50_state(rng).items():
        state[f"gloria.img_encoder.model.{k}"] = v
    for k, v in transformer.state_dict().items():
        state[f"gloria.image_transformer.{k}"] = v
    g_emb = torch.nn.Linear(2048, D)
    l_emb = torch.nn.Conv2d(1024, D, 1, bias=False)
    state["gloria.img_encoder.global_embedder.weight"] = g_emb.weight
    state["gloria.img_encoder.global_embedder.bias"] = g_emb.bias
    state["gloria.img_encoder.local_embedder.weight"] = l_emb.weight
    state["gloria.position_embeddings.image_position_embeddings.weight"] = \
        torch.randn(19, D // 2) * 0.02
    state["gloria.no_attn_vec"] = torch.randn(D)

    hyper = {
        "model": {
            "gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0, "no_attn_vec": True},
            "vision": {"model_name": "resnet_50"},
            "image_position_embeddings": {"num": 19},
            "image_transformer": {"num_layers": 2, "num_heads": 4},
            "text": {"embedding_dim": D, "last_n_layers": 4, "agg_tokens": True,
                      "aggregate_method": "sum",
                      "bert_config": {"vocab_size": 28996, "hidden_size": D,
                                       "num_layers": 12, "num_heads": 12,
                                       "intermediate_size": 3072,
                                       "max_position_embeddings": 512}},
        },
        "data": {"image": {"imsize": 224}, "text": {"word_num": 97}},
        "transforms": {"norm": "imagenet"},
    }
    ckpt_path = tmp_path / "chexpert_resnet50_fabricated.ckpt"
    torch.save({"hyper_parameters": hyper, "state_dict": state,
                "epoch": 7, "global_step": 12345}, ckpt_path)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "no", "finding",
             "pleural", "effusion", "seen", "in", "the", "left", "lung"]
    gm = api.load_gloria(str(ckpt_path), tokenizer=WordPieceTokenizer(vocab))

    # every key family landed where the model expects it (structural identity
    # with a fresh init of the same config)
    import jax.numpy as jnp

    ref_shapes = jax.eval_shape(
        lambda: gm.model.init(jax.random.PRNGKey(0), {
            "imgs": jnp.zeros((1, 224, 224, 3)),
            "caption_ids": jnp.zeros((1, 97), jnp.int32),
            "attention_mask": jnp.ones((1, 97), jnp.int32),
            "token_type_ids": jnp.zeros((1, 97), jnp.int32),
            "word_assignment": jnp.zeros((1, 97, 97)),
        }))
    assert (jax.tree_util.tree_structure(gm.variables)
            == jax.tree_util.tree_structure(ref_shapes))
    flat_got = jax.tree_util.tree_leaves_with_path(gm.variables)
    flat_want = jax.tree_util.tree_leaves(ref_shapes)
    for (path, a), b in zip(flat_got, flat_want):
        assert tuple(jnp.shape(a)) == tuple(b.shape), (jax.tree_util.keystr(path), a, b)

    # weight spot checks across families
    p = gm.variables["params"]
    np.testing.assert_allclose(
        p["text_encoder"]["bert"]["layer_11"]["attention"]["out"]["kernel"],
        bert_state["encoder.layer.11.attention.output.dense.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        p["img_encoder"]["backbone"]["layer4_2"]["conv3"]["kernel"],
        state["gloria.img_encoder.model.layer4.2.conv3.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    np.testing.assert_allclose(p["no_attn_vec"], state["gloria.no_attn_vec"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        p["position_embeddings"]["table"]["embedding"],
        state["gloria.position_embeddings.image_position_embeddings.weight"].numpy(), rtol=1e-6)
    assert "image_transformer_0" in p and "image_transformer_1" in p

    # ---- full-size forward through the public API ---------------------------
    img = (rng.rand(320, 290) * 255).astype(np.uint8)
    imgs = gm.process_img([img])
    txts = gm.process_text(["no finding", "pleural effusion seen in the left lung"])
    sims = gm.get_similarities(imgs, txts, similarity_type="both")
    assert sims.shape == (1, 2)
    assert np.isfinite(sims).all()
