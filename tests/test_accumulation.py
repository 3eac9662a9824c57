"""Gradient accumulation (Lightning ``accumulate_grad_batches``).

The reference exposed this knob through Lightning's argparse passthrough
(``/root/reference/run.py:116`` — ``Trainer.add_argparse_args``); here it is a
first-class jitted path: G stacked micro-batches scanned on device, gradients
averaged, BatchNorm stats updated per micro-batch, ONE optimizer update.

Uses the canonical shared setup (tests/_tiny.py) so the plain step's compile
is shared with the rest of the suite; only the accum variants compile here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _tiny import tiny_batch, tiny_cfg, tiny_setup
from gloria_tpu.builder import init_gloria
from gloria_tpu.parallel import create_mesh, replicate, shard_batch, shard_params

ACCUM2 = {"lightning.trainer.accumulate_grad_batches": 2}


def _stack(batches):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)


def test_identical_micro_batches_match_single_step():
    """mean of G identical grads == the grad → params after the accum step
    equal the plain step's; BN running stats see G updates instead of one."""
    raw = tiny_batch(seed=0)

    model, state1, step1, _ = tiny_setup()
    # the jitted step donates its input state — snapshot the pre-step BN
    # stats on host before the buffers are consumed
    old_stats = jax.device_get(state1.batch_stats)
    new1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in raw.items()})

    model, state2, step2, _ = tiny_setup(ACCUM2)
    stacked = _stack([raw, raw])
    new2, m2 = step2(state2, stacked)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(jax.device_get(new1.params))
    flat2 = jax.tree_util.tree_leaves(jax.device_get(new2.params))
    worst = max(float(np.abs(a - b).max()) for a, b in zip(flat1, flat2))
    assert worst < 1e-5, f"param divergence {worst}"
    assert int(new2.step) == 1  # ONE optimizer step from G micro-batches

    # BN stats: the accum step applied the EMA update twice with the same
    # batch stats, the plain step once — stats must differ from the plain
    # step but agree with applying the plain step's update twice:
    # new = old + m·(batch − old)  ⇒  twice = old + (2m − m²)·(batch − old)
    def leaves(t):
        return jax.tree_util.tree_leaves(jax.device_get(t))

    momentum = 0.1  # SplitBatchNorm pins momentum=0.9 (torch parity) ⇒ EMA rate 0.1
    for o, p1, p2 in zip(leaves(old_stats), leaves(new1.batch_stats),
                         leaves(new2.batch_stats)):
        once = p1 - o                       # m·(batch − old)
        expected_twice = (2 - momentum) * once
        np.testing.assert_allclose(p2 - o, expected_twice, rtol=1e-4, atol=1e-6)


def test_distinct_micro_batches_average_grads():
    """Accum over two DIFFERENT micro-batches: loss metric is the mean of the
    per-micro losses, and the update differs from either single step."""
    raw_a = tiny_batch(seed=0)
    raw_b = tiny_batch(seed=1)

    model, state, step1, _ = tiny_setup()
    _, ma = step1(state, {k: jnp.asarray(v) for k, v in raw_a.items()})
    model, state, step1, _ = tiny_setup()
    _, mb = step1(state, {k: jnp.asarray(v) for k, v in raw_b.items()})

    model, state, step2, _ = tiny_setup(ACCUM2)
    _, m2 = step2(state, _stack([raw_a, raw_b]))

    np.testing.assert_allclose(
        float(m2["loss"]), (float(ma["loss"]) + float(mb["loss"])) / 2, rtol=1e-5)


@pytest.mark.slow  # compiles a mesh-sharded accum step (~3 min on 1 CPU core)
def test_accum_under_dp_mesh_matches_single_device():
    """The stacked [G, b, ...] step under a dp mesh reproduces single-device
    numerics (micro-batch axis is axis 1; GSPMD shards it per micro-batch)."""
    assert jax.device_count() >= 8, "conftest must provide the 8-device CPU mesh"
    raw_a = tiny_batch(seed=0)
    raw_b = tiny_batch(seed=1)

    model, s1, step1, _ = tiny_setup(ACCUM2)
    new1, m1 = step1(s1, _stack([raw_a, raw_b]))

    mesh = create_mesh(4)
    with mesh:
        model, s4, step4, _ = init_gloria(tiny_cfg(ACCUM2), raw_a)
        s4 = s4.replace(
            params=shard_params(s4.params, mesh),
            batch_stats=replicate(s4.batch_stats, mesh),
            opt_state=shard_params(s4.opt_state, mesh),
        )
        # shard each micro-batch on its batch axis, THEN stack: axis 0 is the
        # accumulation window, axis 1 the dp-sharded batch
        mb_a = shard_batch({k: jnp.asarray(v) for k, v in raw_a.items()}, mesh)
        mb_b = shard_batch({k: jnp.asarray(v) for k, v in raw_b.items()}, mesh)
        stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), mb_a, mb_b)
        new4, m4 = step4(s4, stacked)

    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(jax.device_get(new1.params))
    flat4 = jax.tree_util.tree_leaves(jax.device_get(new4.params))
    worst = max(float(np.abs(a - b).max()) for a, b in zip(flat1, flat4))
    assert worst < 5e-4, f"param divergence {worst}"


def test_return_attn_with_accum_is_rejected():
    from gloria_tpu.models.gloria_model import GLoRIA
    from gloria_tpu.training.train import make_pretrain_steps

    with pytest.raises(ValueError, match="accumulate_grad_batches"):
        make_pretrain_steps(GLoRIA(tiny_cfg()), None, return_attn=True, accum_steps=2)


def test_trainer_stacks_and_counts_optimizer_steps():
    """Trainer-level wiring: 5 loader batches at accumulate_grad_batches=2 →
    2 full windows + the trailing single-batch window flushed at epoch end
    (Lightning steps the incomplete window too) = exactly 3 optimizer steps.

    Also covers the regression where an epoch SHORTER than the window
    silently trained zero steps: the second epoch below flushes a partial
    window as its only step."""
    from gloria_tpu.training.trainer import Trainer

    cfg = tiny_cfg(ACCUM2)
    cfg.set_path("lightning.trainer.max_epochs", 1)
    cfg.set_path("output_dir", "/tmp/test_accum_trainer")
    raws = [tiny_batch(seed=s) for s in range(5)]
    model, state, train_step, eval_step = tiny_setup(ACCUM2)
    trainer = Trainer(cfg, train_step, eval_step)
    batches = [{k: np.asarray(v) for k, v in r.items()} for r in raws]
    state = trainer.fit(state, batches)  # 2 full windows + 1 flushed partial
    assert int(jax.device_get(state.step)) == 3

    # epoch shorter than the window: 1 batch < G=2 → one flushed window
    cfg2 = tiny_cfg(ACCUM2)
    cfg2.set_path("lightning.trainer.max_epochs", 1)
    cfg2.set_path("output_dir", "/tmp/test_accum_trainer_flush")
    model, state2, train_step, eval_step = tiny_setup(ACCUM2)
    trainer2 = Trainer(cfg2, train_step, eval_step)
    state2 = trainer2.fit(state2, batches[:1])
    assert int(jax.device_get(state2.step)) == 1
    assert trainer2.global_step == 1
