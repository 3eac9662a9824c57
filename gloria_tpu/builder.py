"""Factory layer: cfg → model / optimizer / scheduler / steps.

Mirrors the reference's ``gloria/builder.py`` public surface with TPU-native
internals.  ``build_data_module`` / ``build_transformation`` live in
``gloria_tpu.data`` and are re-exported once constructed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .configs import Config
from .models.gloria_model import GLoRIA
from .training import optim
from .training.train import create_train_state, make_pretrain_steps


def default_pretrain_config() -> Config:
    """Schema-complete config mirroring ``configs/chexpert_pretrain_config.yaml``."""
    return Config({
        "experiment_name": "gloria_pretrain",
        "phase": "pretrain",
        "lightning": {
            "trainer": {"max_epochs": 50, "gradient_clip_val": 0.25, "lr": 5.0e-5, "precision": 16},
            "checkpoint_callback": {"monitor": "val_loss", "save_last": True, "mode": "min", "save_top_k": 10},
            "early_stopping_callback": {"monitor": "val_loss", "min_delta": 0.0, "patience": 10, "mode": "min"},
        },
        "model": {
            "gloria": {"local_loss_weight": 1.0, "global_loss_weight": 1.0,
                        "temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
            "vision": {"model_name": "resnet_50", "freeze_cnn": False, "pretrained": True},
            "text": {"bert_type": "emilyalsentzer/Bio_ClinicalBERT", "last_n_layers": 4,
                      "aggregate_method": "sum", "norm": False, "embedding_dim": 768,
                      "freeze_bert": False, "agg_tokens": True},
        },
        "data": {"dataset": "chexpert",
                  "text": {"word_num": 97, "captions_per_image": 5, "full_report": False},
                  "image": {"imsize": 256}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 224}},
        "train": {"batch_size": 48, "num_workers": 18,
                   "optimizer": {"name": "Adam", "weight_decay": 1.0e-6},
                   "scheduler": {"name": "plateau", "monitor": "val_loss", "interval": "epoch", "frequency": 1}},
    })


def build_gloria_model(cfg: Config, dtype=jnp.float32) -> GLoRIA:
    return GLoRIA(cfg, dtype=dtype)


def build_optimizer(cfg: Config, params=None) -> optax.GradientTransformation:
    clip = None
    if cfg.lightning and cfg.lightning.trainer and cfg.lightning.trainer.gradient_clip_val:
        clip = float(cfg.lightning.trainer.gradient_clip_val)
    tx = optim.make_optimizer(cfg, grad_clip=clip)
    if params is not None:
        pred = optim.trainable_predicate(cfg)
        labels = optim.partition_trainable(params, pred)
        flat = jax.tree_util.tree_leaves(labels)
        if any(l == "frozen" for l in flat):
            tx = optim.freeze_wrap(tx, labels)
    return tx


def build_scheduler(cfg: Config) -> optim.LRScheduler:
    return optim.make_scheduler(cfg)


def default_loss_chunk(cfg: Config) -> int:
    """Batch-keyed default for the O(B²) pairwise-loss execution strategy
    (measured on TPU v5e, docs/DESIGN.md):

    - B ≤ 128: unchunked no-remat is fastest (B=48: 638 vs 625 pairs/s
      chunked; B=96: 576 unchunked) and fits HBM.
    - B > 128: the unchunked [T,B,S,W] intermediates exceed HBM (B=192
      measured OOM); text-chunked ``lax.scan`` + remat at chunk=8 is the
      fastest measured big-batch strategy (400 pairs/s at B=192 vs the
      Pallas train kernel, which loses at B=96 and fails to compile at
      B=192 — DESIGN.md round-3 table).

    ``cfg.train.loss_chunk`` pins the strategy explicitly.
    """
    pinned = cfg.train.loss_chunk if cfg.train else None
    if pinned is not None:
        return int(pinned)
    bs = (cfg.train.batch_size if cfg.train else None) or 0
    return 0 if bs <= 128 else 8


def init_gloria(cfg: Config, batch: dict, seed: int = 0, dtype=jnp.float32,
                return_attn: bool = False, loss_chunk: int | None = None):
    """Initialize model + optimizer + train state from an example batch.
    Returns (model, state, train_step, eval_step).

    ``loss_chunk=None`` → batch-keyed auto policy (``default_loss_chunk``)."""
    if loss_chunk is None:
        loss_chunk = default_loss_chunk(cfg)
    model = build_gloria_model(cfg, dtype=dtype)
    model_batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "cap_lens" and k != "segmentation_labels"}
    # jit the init: one compiled (and persistently cacheable) program instead
    # of hundreds of eager op dispatches — ~2x faster on a 1-core CPU host and
    # one round trip instead of hundreds through a remote-device tunnel
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), model_batch)
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, variables, tx, jax.random.PRNGKey(seed + 1))
    train_step, eval_step = make_pretrain_steps(
        model, tx, return_attn=return_attn, loss_chunk=loss_chunk,
        dropout_impl=(cfg.train.dropout_rng if cfg.train else None) or "rbg",
        accum_steps=accumulate_grad_batches(cfg),
        steps_per_dispatch=steps_per_dispatch(cfg))
    return model, state, train_step, eval_step


def steps_per_dispatch(cfg: Config) -> int:
    """``train.steps_per_dispatch`` K: run K full train steps (K optimizer
    updates — reference semantics) per XLA dispatch from K stacked loader
    batches; amortizes per-dispatch host overhead (see
    ``training.train.make_pretrain_steps``)."""
    return max(1, int((cfg.train.steps_per_dispatch if cfg.train else None) or 1))


def accumulate_grad_batches(cfg: Config) -> int:
    """Lightning's ``accumulate_grad_batches`` trainer knob (the reference's
    argparse passthrough exposed it, ``run.py:116``); lives under
    ``lightning.trainer`` for config-schema parity."""
    t = cfg.lightning.trainer if cfg.lightning and cfg.lightning.trainer else None
    return max(1, int((t.accumulate_grad_batches if t else None) or 1))
