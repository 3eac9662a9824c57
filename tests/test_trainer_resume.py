"""Trainer-state resume (Lightning ``resume_from_checkpoint`` parity).

``--resume`` must continue the SAME run: epoch numbering, the loader's
deterministic shuffle sequence, scheduler and early-stopping history — not
replay from epoch 0 with only the optimizer state restored.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gloria_tpu.builder import init_gloria
from gloria_tpu.configs import Config
from gloria_tpu.data.synthetic import make_synthetic_batch
from gloria_tpu.training.checkpoints import CheckpointManager, load_checkpoint_meta
from gloria_tpu.training.trainer import Trainer


def tiny_cfg(max_epochs: int):
    return Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0,
                              "local_loss_weight": 1.0, "global_loss_weight": 1.0},
                   "vision": {"model_name": "resnet_18"},
                   "text": {"embedding_dim": 64, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 256, "hidden_size": 64,
                                              "num_layers": 2, "num_heads": 4,
                                              "intermediate_size": 128,
                                              "max_position_embeddings": 32,
                                              "dropout_rate": 0.0}}},
        "train": {"batch_size": 8, "optimizer": {"name": "SGD"}, "momentum": 0.0},
        "lightning": {"trainer": {"lr": 1e-3, "gradient_clip_val": 0.25,
                                   "max_epochs": max_epochs}},
    })


class EpochSeededLoader:
    """One deterministic batch per epoch (batch = f(epoch)), mimicking
    PrefetchLoader's seed+epoch shuffle contract."""

    def __init__(self):
        self.epoch = 0
        self.epochs_seen: list[int] = []

    def __len__(self):
        return 1

    def __iter__(self):
        e = self.epoch
        self.epoch += 1
        self.epochs_seen.append(e)
        raw = make_synthetic_batch(batch_size=8, num_tokens=24, imsize=64,
                                   vocab_size=256, seed=100 + e)
        yield {k: np.asarray(v) for k, v in raw.items()}


def _params(state):
    return jax.tree_util.tree_leaves(jax.device_get(state.params))


def test_resume_continues_epoch_numbering_and_data_order(tmp_path):
    raw = make_synthetic_batch(batch_size=8, num_tokens=24, imsize=64, vocab_size=256)

    # uninterrupted 4-epoch run
    cfg = tiny_cfg(max_epochs=4)
    cfg.set_path("output_dir", str(tmp_path / "full"))
    model, state, train_step, eval_step = init_gloria(cfg, raw)
    full_loader = EpochSeededLoader()
    full_trainer = Trainer(cfg, train_step, eval_step)
    full_state = full_trainer.fit(state, full_loader)
    assert full_loader.epochs_seen == [0, 1, 2, 3]

    # interrupted run: 2 epochs with checkpointing...
    cfg2 = tiny_cfg(max_epochs=2)
    cfg2.set_path("output_dir", str(tmp_path / "part"))
    model, state2, train_step2, eval_step2 = init_gloria(cfg2, raw)
    mgr = CheckpointManager(tmp_path / "ckpts", save_top_k=1)
    part_trainer = Trainer(cfg2, train_step2, eval_step2, checkpoints=mgr)
    part_trainer.fit(state2, EpochSeededLoader())
    last = mgr.last()
    meta = load_checkpoint_meta(last)
    assert meta["trainer_state"]["epoch"] == 2
    assert meta["trainer_state"]["global_step"] == 2

    # ...then resume for the remaining 2 epochs in a fresh trainer
    cfg3 = tiny_cfg(max_epochs=4)
    cfg3.set_path("output_dir", str(tmp_path / "resumed"))
    model, template, train_step3, eval_step3 = init_gloria(cfg3, raw)
    restored, _, extra = mgr.restore(last, target={
        "params": template.params, "batch_stats": template.batch_stats,
        "opt_state": template.opt_state, "step": template.step,
    })
    resumed_state = template.replace(
        params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, restored["batch_stats"]),
        opt_state=jax.tree_util.tree_map(jnp.asarray, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32),
    )
    resumed_loader = EpochSeededLoader()
    resumed_trainer = Trainer(cfg3, train_step3, eval_step3)
    resumed_trainer.load_state_dict(extra["trainer_state"])
    final_state = resumed_trainer.fit(resumed_state, resumed_loader)

    # epochs 2 and 3 ran — with epoch-2/3 DATA, not a replay of 0 and 1
    assert resumed_loader.epochs_seen == [2, 3]
    assert resumed_trainer.global_step == 4
    # and the resumed trajectory lands on the uninterrupted run's params
    worst = max(float(np.abs(a - b).max())
                for a, b in zip(_params(full_state), _params(final_state)))
    assert worst < 1e-6, f"resume diverged from the uninterrupted run: {worst}"


def test_early_stopping_state_roundtrip():
    from gloria_tpu.training.trainer import EarlyStopping

    es = EarlyStopping(patience=3)
    es.step(1.0)
    es.step(2.0)
    d = es.state_dict()
    es2 = EarlyStopping(patience=3)
    es2.load_state_dict(d)
    assert es2.best == 1.0 and es2.bad_epochs == 1 and not es2.stopped
