"""Downstream tasks: UNet forward, classification/segmentation train steps,
pretrained-encoder transplant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gloria_tpu.configs import Config
from gloria_tpu.models.unet import ResnetUNet
from gloria_tpu.training import optim
from gloria_tpu.training.tasks import (
    ClassificationTask, SegmentationTask, build_loss, graft_pretrained,
)


def task_cfg(loss_type="BCE", **vision):
    return Config({
        "model": {"vision": {"model_name": "resnet_18", "num_targets": 3, **vision}},
        "train": {"loss_fn": {"type": loss_type, "alpha": 10.0},
                   "optimizer": {"name": "Adam", "weight_decay": 1e-6}},
        "lightning": {"trainer": {"lr": 1e-3}},
    })


def test_unet_shapes():
    model = ResnetUNet(model_name="resnet_18", n_classes=1)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 1)


def test_classification_task_trains():
    cfg = task_cfg()
    model, patch = ClassificationTask.build_model(cfg)
    tx = optim.make_optimizer(cfg, grad_clip=1.0)
    task = ClassificationTask(model, build_loss(cfg), tx)
    rng = np.random.RandomState(0)
    batch = {"imgs": jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32)),
             "labels": jnp.asarray((rng.rand(4, 3) > 0.5).astype(np.float32))}
    state = task.init_state(batch)
    losses = []
    for _ in range(3):
        state, out = task.train_step(state, batch)
        losses.append(float(out["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    ev = task.eval_step(state, batch)
    m = task.epoch_metrics(np.asarray(ev["logits"]), np.asarray(batch["labels"]))
    assert 0 <= m["auroc"] <= 1 and 0 <= m["auprc"] <= 1


@pytest.mark.slow
def test_classification_with_pretrained_encoder_and_freeze():
    from gloria_tpu.models import GLoRIA

    gcfg = Config({"model": {
        "gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
        "vision": {"model_name": "resnet_18"},
        "text": {"embedding_dim": 32, "agg_tokens": False, "last_n_layers": 4,
                  "bert_config": {"vocab_size": 64, "hidden_size": 32, "num_layers": 1,
                                   "num_heads": 4, "intermediate_size": 64,
                                   "max_position_embeddings": 16}}}})
    g = GLoRIA(gcfg)
    gb = {"imgs": jnp.zeros((1, 64, 64, 3)),
          "caption_ids": jnp.zeros((1, 8), jnp.int32),
          "attention_mask": jnp.ones((1, 8), jnp.int32),
          "token_type_ids": jnp.zeros((1, 8), jnp.int32)}
    gvars = g.init(jax.random.PRNGKey(0), gb)

    cfg = task_cfg(freeze_cnn=True)
    model, patch = ClassificationTask.build_model(cfg, gloria_variables=gvars)
    assert patch is not None
    tx = optim.make_optimizer(cfg)
    task = ClassificationTask(model, build_loss(cfg), tx)
    batch = {"imgs": jnp.zeros((2, 64, 64, 3)), "labels": jnp.ones((2, 3))}
    state = task.init_state(batch)
    state = state.replace(params=graft_pretrained({"params": state.params}, {"params": patch["params"]})["params"],
                          batch_stats=graft_pretrained({"batch_stats": state.batch_stats},
                                                        {"batch_stats": patch["batch_stats"]})["batch_stats"])
    # encoder weights actually transplanted
    np.testing.assert_array_equal(
        np.asarray(state.params["img_encoder"]["backbone"]["conv1"]["kernel"]),
        np.asarray(gvars["params"]["img_encoder"]["backbone"]["conv1"]["kernel"]),
    )
    # freeze: frozen encoder params receive zero updates
    labels = optim.partition_trainable(state.params, optim.trainable_predicate(cfg))
    frozen_tx = optim.freeze_wrap(tx, labels)
    task2 = ClassificationTask(model, build_loss(cfg), frozen_tx)
    state = state.replace(opt_state=frozen_tx.init(state.params))
    before = np.asarray(state.params["img_encoder"]["backbone"]["conv1"]["kernel"]).copy()
    head_before = np.asarray(state.params["classifier"]["kernel"]).copy()
    state, _ = task2.train_step(state, batch)
    np.testing.assert_array_equal(np.asarray(state.params["img_encoder"]["backbone"]["conv1"]["kernel"]), before)
    assert np.abs(np.asarray(state.params["classifier"]["kernel"]) - head_before).max() > 0


@pytest.mark.slow
def test_segmentation_task_trains():
    cfg = task_cfg(loss_type="MixedLoss")
    model, _ = SegmentationTask.build_model(Config({"model": {"vision": {"model_name": "resnet_18"}}}))
    tx = optim.make_optimizer(cfg, grad_clip=1.0)
    task = SegmentationTask(model, build_loss(cfg), tx)
    rng = np.random.RandomState(1)
    masks = np.zeros((2, 64, 64), np.float32)
    masks[:, 20:40, 20:40] = 1
    batch = {"imgs": jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32)),
             "labels": jnp.asarray(masks)}
    state = task.init_state(batch)
    losses = []
    for _ in range(3):
        state, out = task.train_step(state, batch)
        losses.append(float(out["loss"]))
    assert all(np.isfinite(l) for l in losses) and losses[-1] < losses[0]
    ev = task.eval_step(state, batch)
    m = task.epoch_metrics(np.asarray(ev["logits"]), masks)
    assert 0 <= m["dice"] <= 1


def test_nonfinite_grads_skip_step_and_lr_still_settable():
    """skip_nonfinite_updates wrapper: a NaN-grad step must leave params
    untouched (the reference's fp16 GradScaler skip semantics) and the
    injected LR must stay reachable through the wrapper state."""
    import optax

    cfg = task_cfg()
    tx = optim.make_optimizer(cfg, grad_clip=1.0)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)

    good = {"w": jnp.full((4, 4), 0.1), "b": jnp.full((4,), 0.1)}
    bad = {"w": jnp.full((4, 4), jnp.nan), "b": jnp.full((4,), 0.1)}

    up, state = tx.update(bad, state, params)
    p_after_bad = optax.apply_updates(params, up)
    np.testing.assert_array_equal(np.asarray(p_after_bad["w"]), np.asarray(params["w"]))
    assert int(optax.tree_utils.tree_get(state, "total_notfinite")) == 1

    up, state = tx.update(good, state, params)
    p_after_good = optax.apply_updates(params, up)
    assert float(np.abs(np.asarray(p_after_good["w"]) - np.asarray(params["w"])).max()) > 0
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(p_after_good)[0])).all()

    state = optim.set_learning_rate(state, 5e-4)
    assert optim.get_learning_rate(state) == pytest.approx(5e-4)

    # disabled guard: NaN grads propagate (old behavior, explicit opt-out)
    cfg2 = task_cfg()
    cfg2.set_path("train.skip_nonfinite_grads", False)
    tx2 = optim.make_optimizer(cfg2, grad_clip=1.0)
    s2 = tx2.init(params)
    up2, _ = tx2.update(bad, s2, params)
    assert not np.isfinite(np.asarray(optax.apply_updates(params, up2)["w"])).all()


def test_flatten_optimizer_matches_per_leaf_updates():
    """``train.flatten_optimizer`` reroutes the elementwise chain through one
    raveled vector (a measured −16% on the v5e pretrain step — negative
    result kept as an opt-in knob, DESIGN.md round-3 audit); its updates
    must stay bit-equal in structure and near-equal in value to the
    per-leaf chain, including the clip + coupled-decay + skip-guard path."""
    cfg = Config({"train": {"optimizer": {"name": "Adam", "weight_decay": 1e-6},
                            "lr": 5e-5, "flatten_optimizer": True}})
    params = {"w": jnp.ones((16, 8)), "deep": {"b": jnp.full((5,), 0.5)}}
    grads = jax.tree_util.tree_map(lambda p: p * 0.01, params)
    tx_flat = optim.make_optimizer(cfg, grad_clip=0.25)
    cfg.set_path("train.flatten_optimizer", False)
    tx_leaf = optim.make_optimizer(cfg, grad_clip=0.25)
    u_flat, _ = tx_flat.update(grads, tx_flat.init(params), params)
    u_leaf, _ = tx_leaf.update(grads, tx_leaf.init(params), params)
    assert (jax.tree_util.tree_structure(u_flat)
            == jax.tree_util.tree_structure(u_leaf))
    for a, b in zip(jax.tree_util.tree_leaves(u_flat),
                    jax.tree_util.tree_leaves(u_leaf)):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    # the skip guard must still zero flat updates on non-finite grads
    bad = jax.tree_util.tree_map(lambda p: jnp.full_like(p, jnp.nan), params)
    cfg.set_path("train.flatten_optimizer", True)
    tx_guard = optim.make_optimizer(cfg, grad_clip=0.25)
    u_bad, st = tx_guard.update(bad, tx_guard.init(params), params)
    assert all(np.all(np.asarray(l) == 0.0)
               for l in jax.tree_util.tree_leaves(u_bad))


def test_classification_task_accumulation_matches_plain_step():
    """accum_steps=G with G identical micro-batches ≡ the plain step on one
    (grads averaged → same update; BN stats double-EMA like the pretrain
    path), and a partial [1, b, ...] window (the trainer's epoch-end flush)
    runs through the same jitted function."""
    cfg = task_cfg()
    cfg.set_path("train.optimizer.name", "SGD")   # linear in grads
    cfg.set_path("train.momentum", 0.0)
    model, _ = ClassificationTask.build_model(cfg)
    tx = optim.make_optimizer(cfg, grad_clip=None)
    rng = np.random.RandomState(0)
    batch = {"imgs": jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32)),
             "labels": jnp.asarray((rng.rand(4, 3) > 0.5).astype(np.float32))}

    plain = ClassificationTask(model, build_loss(cfg), tx)
    s_plain = plain.init_state(batch)
    s_plain, out_plain = plain.train_step(s_plain, batch)

    accum = ClassificationTask(model, build_loss(cfg), tx, accum_steps=2)
    s_accum = accum.init_state(batch)
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), batch)
    s_accum, out_accum = accum.train_step(s_accum, stacked)

    np.testing.assert_allclose(float(out_plain["loss"]), float(out_accum["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_plain.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s_accum.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # trailing-window flush shape: [1, b, ...] through the same function
    partial = jax.tree_util.tree_map(lambda x: x[None], batch)
    s_accum, out_partial = accum.train_step(s_accum, partial)
    assert np.isfinite(float(out_partial["loss"]))
    assert out_partial["logits"].shape == out_plain["logits"].shape
