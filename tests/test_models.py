"""Model smoke tests: tiny GLoRIA forward + loss + grads; resize parity vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gloria_tpu.configs import Config
from gloria_tpu.models import GLoRIA
from gloria_tpu.ops import gloria_loss as gl


def tiny_cfg(**gloria_extra):
    return Config({
        "model": {
            "gloria": {"local_loss_weight": 1.0, "global_loss_weight": 1.0,
                        "temp1": 4.0, "temp2": 5.0, "temp3": 10.0, **gloria_extra},
            "vision": {"model_name": "resnet_18"},
            "text": {
                "embedding_dim": 32, "last_n_layers": 4, "aggregate_method": "sum",
                "agg_tokens": True,
                "bert_config": {"vocab_size": 64, "hidden_size": 32, "num_layers": 4,
                                 "num_heads": 4, "intermediate_size": 64,
                                 "max_position_embeddings": 32},
            },
        },
    })


def tiny_batch(B=2, T=12, img=64, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, 64, size=(B, T)).astype(np.int32)
    assign = np.zeros((B, T, T), dtype=np.float32)
    for b in range(B):
        for t in range(T):
            assign[b, t, t] = 1.0  # identity grouping for the smoke test
    return {
        "imgs": jnp.asarray(rng.randn(B, img, img, 3).astype(np.float32)),
        "caption_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "token_type_ids": jnp.zeros((B, T), jnp.int32),
        "word_assignment": jnp.asarray(assign),
    }, jnp.asarray(rng.randint(3, T - 2, size=B).astype(np.int32))


def test_gloria_forward_and_loss():
    cfg = tiny_cfg()
    model = GLoRIA(cfg)
    batch, cap_lens = tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    img_l, img_g, txt_l, txt_g, grid = model.apply(variables, batch)
    assert img_l.shape == (2, grid[0] * grid[1], 32)
    assert img_g.shape == (2, 32)
    assert txt_l.shape == (2, 12, 32)
    assert txt_g.shape == (2, 32)

    def loss_fn(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, batch)
        il, ig, tl, tg, g = out
        loss, metrics, attn = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            il, ig, tl, tg, cap_lens, g, method=GLoRIA.calc_loss,
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_gloria_extras_paths():
    # position embeddings + image transformer + no-attn sink all exercised
    cfg = tiny_cfg(no_attn_vec=True, no_attn_loss_weight=0.1)
    cfg.model.image_position_embeddings = {"num": 32}
    cfg.model.image_transformer = {"num_heads": 4, "num_layers": 1}
    model = GLoRIA(cfg)
    batch, cap_lens = tiny_batch(seed=1)
    variables = model.init(jax.random.PRNGKey(1), batch)
    assert "no_attn_vec" in variables["params"]
    il, ig, tl, tg, grid = model.apply(variables, batch)
    loss, metrics, attn = model.apply(
        variables, il, ig, tl, tg, cap_lens, grid, method=GLoRIA.calc_loss
    )
    assert np.isfinite(float(loss))
    assert "no_attn_loss" in metrics
    # sink absorbs mass: region attention rows must sum to < 1
    assert float(attn.sum(-1).max()) < 1.0


def test_attn_seg_loss_path():
    cfg = tiny_cfg(segmentation_loss_weight=1.0)
    model = GLoRIA(cfg)
    batch, cap_lens = tiny_batch(seed=2)
    variables = model.init(jax.random.PRNGKey(2), batch)
    il, ig, tl, tg, grid = model.apply(variables, batch)
    seg = np.zeros((2, 16, 16), np.float32)
    seg[:, 4:10, 4:10] = 1.0
    loss, metrics, _ = model.apply(
        variables, il, ig, tl, tg, cap_lens, grid,
        jnp.asarray(seg), method=GLoRIA.calc_loss,
    )
    assert np.isfinite(float(loss))
    assert float(metrics["attn_seg_loss"]) > 0


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    from gloria_tpu.ops.resize import resize_bilinear, resize_nearest

    rng = np.random.RandomState(0)
    x = rng.randn(2, 17, 23, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (29, 31), align_corners=True))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(29, 31),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    got_n = np.asarray(resize_nearest(jnp.asarray(x), (40, 9)))
    ref_n = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(40, 9), mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got_n, ref_n, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("train", [True, False])
def test_split_batch_norm_matches_flax(dtype, train):
    """SplitBatchNorm == flax nn.BatchNorm: outputs and running stats, both
    precisions, train + eval (torchvision BN semantics: momentum 0.9, eps
    1e-5 — reference gloria/models/cnn_backbones.py)."""
    import flax.linen as nn

    from gloria_tpu.models.norm import SplitBatchNorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 5, 5, 8) * 2 + 1, dtype)
    ours = SplitBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    v0 = ref.init(jax.random.PRNGKey(0), x)
    # non-trivial params + running stats
    v0 = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.rand(*a.shape), a.dtype) * 0.3, v0)
    y_ref, m_ref = ref.apply(v0, x, mutable=["batch_stats"])
    y_ours, m_ours = ours.apply(v0, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_ours, np.float32),
                               np.asarray(y_ref, np.float32), rtol=1e-6, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m_ours["batch_stats"][k]),
                                   np.asarray(m_ref["batch_stats"][k]),
                                   rtol=1e-6, atol=1e-6)
