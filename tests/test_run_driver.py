"""run.py experiment-driver smoke: pretrain + test on synthetic data (subprocess)."""

import json
import os
import subprocess

import pytest
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]

CFG = {
    "experiment_name": "driver_smoke",
    "phase": "pretrain",
    "random_seed": 0,
    "lightning": {
        "trainer": {"max_epochs": 1, "gradient_clip_val": 0.25, "lr": 5e-4, "precision": 32},
        "checkpoint_callback": {"monitor": "val_loss", "save_last": True, "mode": "min", "save_top_k": 1},
    },
    "model": {
        "gloria": {"local_loss_weight": 1.0, "global_loss_weight": 1.0,
                    "temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
        "vision": {"model_name": "resnet_18"},
        "text": {"embedding_dim": 32, "last_n_layers": 4, "agg_tokens": True,
                  "aggregate_method": "sum",
                  "bert_config": {"vocab_size": 256, "hidden_size": 32, "num_layers": 1,
                                   "num_heads": 4, "intermediate_size": 64,
                                   "max_position_embeddings": 48}},
    },
    "data": {"dataset": "synthetic", "synthetic_size": 16,
              "text": {"word_num": 24}, "image": {"imsize": 64}},
    "transforms": {"norm": "half", "random_crop": {"crop_size": 48}},
    "train": {"update_interval": 4, "batch_size": 8, "num_workers": 2,
               "optimizer": {"name": "Adam", "weight_decay": 1e-6},
               "scheduler": {"name": "plateau", "monitor": "val_loss"}},
}


@pytest.mark.slow
def test_run_driver_pretrain_smoke(tmp_path):
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(CFG))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv=['run.py','-c',{str(cfg_path)!r},'--train','--test',"
        f"'--output_dir',{str(tmp_path / 'out')!r}];"
        "exec(open('run.py').read())"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    runs = list((tmp_path / "out").glob("driver_smoke_*"))
    assert runs, proc.stdout
    run_dir = runs[0]
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "metrics_epoch.csv").exists()
    manifest = json.loads((run_dir / "ckpt" / "manifest.json").read_text())
    assert manifest["entries"] and manifest["last"]
    assert "best_ckpt" in proc.stdout and "test_loss" in proc.stdout


def test_resume_continues_bit_identically(tmp_path):
    """Checkpoint completeness: restoring (params, opt_state incl. the
    nonfinite-guard wrapper, batch_stats, rng, step) and continuing must
    reproduce the uninterrupted trajectory exactly."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gloria_tpu.builder import init_gloria
    from gloria_tpu.configs import Config
    from gloria_tpu.data.synthetic import make_synthetic_batch
    from gloria_tpu.training.checkpoints import load_checkpoint, save_checkpoint

    cfg = Config(CFG)
    raw = make_synthetic_batch(batch_size=4, num_tokens=16, imsize=32, vocab_size=256)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, state, step, _ = init_gloria(cfg, raw)

    for _ in range(3):
        state, _ = step(state, batch)
    save_checkpoint(tmp_path / "ck", state, cfg)

    lossesA, stateA = [], state
    for _ in range(3):
        stateA, m = step(stateA, batch)
        lossesA.append(float(m["loss"]))

    # fresh process-equivalent: new template state, restore, continue
    model2, template, step2, _ = init_gloria(cfg, raw)
    restored_tree, _ = load_checkpoint(tmp_path / "ck", target=template)
    stateB = jax.tree_util.tree_map(jnp.asarray, restored_tree)
    assert int(jax.device_get(stateB.step)) == 3
    lossesB = []
    for _ in range(3):
        stateB, m = step2(stateB, batch)
        lossesB.append(float(m["loss"]))

    assert lossesA == lossesB, (lossesA, lossesB)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(stateA.params)),
                    jax.tree_util.tree_leaves(jax.device_get(stateB.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
