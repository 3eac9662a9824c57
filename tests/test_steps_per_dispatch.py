"""Device-resident K-step loop: one dispatch of K stacked batches must
reproduce K sequential plain train steps (same updates, same BN stats, same
dropout keys — the scan body folds the same (rng, step) pairs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gloria_tpu.builder import default_pretrain_config, init_gloria
from gloria_tpu.data.synthetic import make_synthetic_batch


def _tiny_cfg():
    cfg = default_pretrain_config()
    cfg.model.vision.model_name = "resnet_18"
    cfg.model.text.embedding_dim = 32
    cfg.model.text.bert_config = {
        "vocab_size": 256, "hidden_size": 32, "num_layers": 2, "num_heads": 4,
        "intermediate_size": 64, "max_position_embeddings": 16,
        # dropout off + SGD (same choice as test_accumulation): Adam divides
        # by √v̂, amplifying float32 reassociation noise between the scan-body
        # and straight-line compilations of the same step into O(1e-4) param
        # drift; SGD keeps the comparison at rounding level so the SEMANTICS
        # (K updates, per-step rng folds, BN stat chaining) are what's tested
        "dropout_rate": 0.0,
    }
    cfg.set_path("train.optimizer", {"name": "SGD"})
    cfg.set_path("lightning.trainer.lr", 1e-3)
    return cfg


@pytest.mark.slow  # compiles two full train-step variants (~7 min on 1 CPU core)
def test_multi_step_matches_sequential():
    K, B = 3, 4
    batches = [make_synthetic_batch(batch_size=B, num_tokens=12, imsize=32,
                                    vocab_size=256, seed=s) for s in range(K)]

    cfg = _tiny_cfg()
    _, state0, plain_step, _ = init_gloria(cfg, batches[0], dtype=jnp.float32)

    cfg_k = _tiny_cfg()
    cfg_k.set_path("train.steps_per_dispatch", K)
    _, state0_k, multi_step, _ = init_gloria(cfg_k, batches[0], dtype=jnp.float32)
    # identical init (same seed path)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.allclose(a, b)), state0.params, state0_k.params))
    assert chex_equal

    seq = state0
    seq_losses = []
    for b in batches:
        seq, m = plain_step(seq, {k: jnp.asarray(v) for k, v in b.items()})
        seq_losses.append(float(m["loss"]))

    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in batches[0]}
    multi, mm = multi_step(state0_k, stacked)

    assert int(multi.step) == K == int(seq.step)
    np.testing.assert_allclose(float(mm["loss"]), np.mean(seq_losses),
                               rtol=1e-5, atol=1e-6)
    # residual tolerance covers float32 reassociation between the scan-body
    # and straight-line compilations of the same step (different fusion /
    # reduction orders); with SGD this stays at rounding level
    for a, b in zip(jax.tree_util.tree_leaves(seq.params),
                    jax.tree_util.tree_leaves(multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(seq.batch_stats),
                    jax.tree_util.tree_leaves(multi.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-6)


def test_trainer_windows_and_counts_k_steps():
    """Trainer-level wiring: 5 loader batches at steps_per_dispatch=2 →
    dispatches of [2,b], [2,b], and a trailing [1,b] flush — but FIVE
    optimizer steps / global_steps (unlike accumulation's one per window).
    Uses a stub step fn so the wiring test costs no compile."""
    from gloria_tpu.training.trainer import Trainer

    cfg = _tiny_cfg()
    cfg.set_path("train.steps_per_dispatch", 2)
    cfg.set_path("lightning.trainer.max_epochs", 1)
    cfg.set_path("output_dir", "/tmp/test_spd_trainer")

    raw = make_synthetic_batch(batch_size=4, num_tokens=12, imsize=32,
                               vocab_size=256, seed=0)
    _, state, _, _ = init_gloria(cfg, raw)

    window_sizes = []

    def fake_step(st, stacked):
        k = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        window_sizes.append(int(k))
        return st.replace(step=st.step + k), {"loss": jnp.float32(1.0)}

    trainer = Trainer(cfg, fake_step)
    batches = [{k: np.asarray(v) for k, v in raw.items()} for _ in range(5)]
    state = trainer.fit(state, batches)
    assert window_sizes == [2, 2, 1]
    assert trainer.global_step == 5
    assert int(jax.device_get(state.step)) == 5


def test_multi_step_rejects_bad_combos():
    from gloria_tpu.models import GLoRIA
    from gloria_tpu.training.train import make_pretrain_steps
    import optax

    model = GLoRIA(_tiny_cfg())
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        make_pretrain_steps(model, optax.sgd(1e-3), steps_per_dispatch=2,
                            accum_steps=2)
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        make_pretrain_steps(model, optax.sgd(1e-3), steps_per_dispatch=2,
                            return_attn=True)
