"""Export→import round-trip: a gloria_tpu model handed back as a reference
torch .ckpt must reload bit-identically through api.load_gloria."""

import numpy as np

import jax
import jax.numpy as jnp

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.models import GLoRIA
from gloria_tpu.utils.torch_export import export_gloria, save_reference_checkpoint


def full_featured_cfg():
    return Config({
        "model": {
            "gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0,
                        "no_attn_vec": True},
            "vision": {"model_name": "resnet_18"},
            "image_position_embeddings": {"num": 361},
            "image_transformer": {"num_layers": 2, "num_heads": 4},
            "text": {"embedding_dim": 32, "last_n_layers": 4, "agg_tokens": True,
                      "aggregate_method": "sum",
                      "bert_config": {"vocab_size": 128, "hidden_size": 32,
                                       "num_layers": 2, "num_heads": 4,
                                       "intermediate_size": 64,
                                       "max_position_embeddings": 48}},
        },
        "data": {"image": {"imsize": 64}, "text": {"word_num": 16}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 48}},
    })


def make_batch(B=2, T=16, imsize=48):
    rng = np.random.RandomState(0)
    W = T
    assignment = np.zeros((B, W, T), np.float32)
    for b in range(B):
        for t in range(T):
            assignment[b, min(t, W - 1), t] = 1.0
    return {
        "imgs": rng.randn(B, imsize, imsize, 3).astype(np.float32),
        "caption_ids": rng.randint(1, 128, (B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "token_type_ids": np.zeros((B, T), np.int32),
        "word_assignment": assignment,
    }


def test_export_import_roundtrip_exact(tmp_path):
    cfg = full_featured_cfg()
    model = GLoRIA(cfg)
    batch = make_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)

    # exported keys carry the reference surgery prefix
    flat = export_gloria(jax.device_get(variables))
    assert all(k.startswith("gloria.") for k in flat)
    assert "gloria.no_attn_vec" in flat
    assert "gloria.position_embeddings.image_position_embeddings.weight" in flat
    assert "gloria.image_transformer.layers.1.self_attn.in_proj_weight" in flat

    ckpt = tmp_path / "exported.ckpt"
    save_reference_checkpoint(ckpt, jax.device_get(variables), cfg)
    gm = api.load_gloria(str(ckpt))

    # every parameter and BN stat must round-trip exactly (f32 transposes)
    orig_p = jax.tree_util.tree_flatten_with_path(jax.device_get(variables))[0]
    new = gm.variables
    new_flat = dict(jax.tree_util.tree_flatten_with_path(jax.device_get(new))[0])
    assert len(orig_p) == len(new_flat)
    for path, a in orig_p:
        b = new_flat[path]
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                      err_msg=str(path))

    # and the forward agrees bit-for-bit
    out0 = model.apply(variables, batch, train=False)
    out1 = model.apply(new, batch, train=False)
    for a, b in zip(out0[:4], out1[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_then_torch_import_torch_loadable(tmp_path):
    """The saved file is a plain torch pickle with the Lightning layout."""
    import torch

    cfg = full_featured_cfg()
    model = GLoRIA(cfg)
    variables = model.init(jax.random.PRNGKey(1), make_batch())
    ckpt = tmp_path / "e.ckpt"
    save_reference_checkpoint(ckpt, jax.device_get(variables), cfg)
    raw = torch.load(str(ckpt), map_location="cpu", weights_only=False)
    assert set(raw) >= {"state_dict", "hyper_parameters"}
    assert all(isinstance(v, torch.Tensor) for v in raw["state_dict"].values())
    assert raw["hyper_parameters"]["model"]["vision"]["model_name"] == "resnet_18"
