"""Public API end-to-end: similarities, zero-shot, checkpoint round-trip."""

import numpy as np
import pytest

import jax

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.data.pretraining_dataset import SyntheticPretrainingDataset
from gloria_tpu.data.tokenizer import WordPieceTokenizer
from gloria_tpu.models import GLoRIA


def tiny_model_cfg():
    return Config({
        "model": {
            "gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0,
                        "local_loss_weight": 1.0, "global_loss_weight": 1.0},
            "vision": {"model_name": "resnet_18"},
            "text": {"embedding_dim": 32, "last_n_layers": 4, "agg_tokens": True,
                      "aggregate_method": "sum",
                      "bert_config": {"vocab_size": 256, "hidden_size": 32, "num_layers": 2,
                                       "num_heads": 4, "intermediate_size": 64,
                                       "max_position_embeddings": 48}},
        },
        "data": {"image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 48}},
    })


@pytest.fixture(scope="module")
def gm():
    cfg = tiny_model_cfg()
    ds = SyntheticPretrainingDataset(size=32, imsize=64)
    tok = WordPieceTokenizer.from_corpus(ds.corpus() + ["atelectasis cardiomegaly edema effusion"])
    # cap vocab ids under bert vocab_size
    assert tok.vocab_size <= 256
    model = GLoRIA(cfg)
    txt = api.TextProcessor(tok, num_words=24)(["mild edema at the left lung base"])
    batch = {
        "imgs": np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32),
        "caption_ids": txt["caption_ids"],
        "attention_mask": txt["attention_mask"],
        "token_type_ids": txt["token_type_ids"],
        "word_assignment": txt["word_assignment"],
    }
    variables = model.init(jax.random.PRNGKey(0), {k: np.asarray(v) for k, v in batch.items()})
    return api.GloriaModel(cfg, variables, tokenizer=tok)


def test_process_and_similarities(gm):
    imgs = gm.process_img([
        (np.random.RandomState(1).rand(90, 70) * 255).astype(np.uint8),
        (np.random.RandomState(2).rand(70, 90) * 255).astype(np.uint8),
    ])
    assert imgs.shape == (2, 48, 48, 3)
    txts = gm.process_text(["mild edema at the left lung base", "no finding", "severe pneumothorax bilaterally"])
    sims = gm.get_similarities(imgs, txts, similarity_type="both")
    assert sims.shape == (2, 3)
    assert np.isfinite(sims).all()
    g = gm.get_similarities(imgs, txts, "global")
    l = gm.get_similarities(imgs, txts, "local")
    np.testing.assert_allclose(sims, (g + l) / 2, rtol=1e-5)
    with pytest.raises(RuntimeError):
        gm.get_similarities(imgs, ["raw text"], "both")
    with pytest.raises(RuntimeError):
        gm.get_similarities(imgs, txts, "bogus")


def test_zero_shot_classification(gm):
    imgs = gm.process_img([(np.random.RandomState(i).rand(80, 80) * 255).astype(np.uint8) for i in range(3)])
    mapping = gm.process_class_prompts({
        "Edema": ["mild edema at the left lung base", "moderate edema bilaterally"],
        "No Finding": ["no finding"],
    })
    df = gm.zero_shot_classification(imgs, mapping)
    assert list(df.columns) == ["Edema", "No Finding"]
    assert df.shape == (3, 2)
    # z-normalized across images per class
    np.testing.assert_allclose(df.to_numpy().mean(axis=0), 0.0, atol=1e-4)


def test_attn_maps(gm):
    imgs = gm.process_img([(np.random.RandomState(7).rand(64, 64) * 255).astype(np.uint8)])
    txts = gm.process_text(["trace effusion at the right lung base"])
    img_l, img_g, txt_l, txt_g = gm.encode(imgs, txts)
    attn = gm.get_attn_maps(img_l, txt_l, txts["cap_lens"])
    assert attn.shape[0] == 1 and attn.shape[2] == img_l.shape[1]
    np.testing.assert_allclose(np.asarray(attn[0, 0]).sum(), 1.0, rtol=1e-4)


def test_prompt_grammar():
    prompts = api.generate_chexpert_class_prompts(n=5)
    assert set(prompts) == {"Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion"}
    assert all(len(v) == 5 for v in prompts.values())
    assert all(isinstance(p, str) and p for v in prompts.values() for p in v)


def test_checkpoint_roundtrip(gm, tmp_path):
    from gloria_tpu.training.checkpoints import save_checkpoint

    ckpt = tmp_path / "ckpt_dir"
    save_checkpoint(ckpt, gm.variables, cfg=gm.cfg)
    loaded = api.load_gloria(str(ckpt), tokenizer=gm.tokenizer)
    imgs = gm.process_img([(np.random.RandomState(3).rand(64, 64) * 255).astype(np.uint8)])
    txts = gm.process_text(["no finding", "mild edema"])
    np.testing.assert_allclose(
        loaded.get_similarities(imgs, txts), gm.get_similarities(imgs, txts), rtol=1e-5, atol=1e-6
    )


def test_load_gloria_from_training_checkpoint(gm, tmp_path):
    """Regression: training checkpoints store the FULL TrainState (params,
    opt_state, batch_stats, rng, step); load_gloria must extract the model
    collections instead of passing the whole tree to flax apply."""
    from gloria_tpu.training.checkpoints import save_checkpoint

    fake_state = {
        "step": np.asarray(3, np.int32),
        "params": gm.variables["params"],
        "batch_stats": gm.variables.get("batch_stats"),
        "opt_state": {"count": np.zeros((), np.int32)},
        "rng": np.zeros(2, np.uint32),
    }
    ckpt = tmp_path / "train_ckpt"
    save_checkpoint(ckpt, fake_state, cfg=gm.cfg)
    loaded = api.load_gloria(str(ckpt), tokenizer=gm.tokenizer)
    imgs = gm.process_img([(np.random.RandomState(4).rand(64, 64) * 255).astype(np.uint8)])
    txts = gm.process_text(["no finding"])
    np.testing.assert_allclose(
        loaded.get_similarities(imgs, txts), gm.get_similarities(imgs, txts),
        rtol=1e-5, atol=1e-6)


def test_self_contained_checkpoint_restores_tokenizer(gm, tmp_path):
    """A checkpoint saved with its tokenizer loads WITHOUT the caller passing
    one: the vocab round-trips through the sibling `.tokenizer/` dir (one-off
    save) and the manager-root `tokenizer/` dir, and the restored model's
    text pipeline matches the original exactly.  Without persistence,
    load_gloria falls back to a degenerate 2-word corpus vocab and every
    similarity is garbage (found via the round-5 verify drive)."""
    from gloria_tpu.training.checkpoints import CheckpointManager, save_checkpoint

    # one-off save_checkpoint(tokenizer=...)
    ckpt = tmp_path / "sc_ckpt"
    save_checkpoint(ckpt, gm.variables, cfg=gm.cfg, tokenizer=gm.tokenizer)
    loaded = api.load_gloria(str(ckpt))  # NO tokenizer argument
    assert loaded.tokenizer.vocab == gm.tokenizer.vocab
    assert loaded.tokenizer.lower == gm.tokenizer.lower
    txts_a = loaded.process_text(["mild edema at the left lung base"])
    txts_b = gm.process_text(["mild edema at the left lung base"])
    np.testing.assert_array_equal(txts_a["caption_ids"], txts_b["caption_ids"])
    assert txts_a["cap_lens"].tolist() == txts_b["cap_lens"].tolist()

    # CheckpointManager.save_tokenizer → every step_* under the root resolves
    mgr = CheckpointManager(tmp_path / "mgr", monitor="val_loss", save_top_k=1)
    mgr.save_tokenizer(gm.tokenizer)
    path = mgr.save(gm.variables, step=1, metrics={"val_loss": 1.0}, cfg=gm.cfg)
    loaded2 = api.load_gloria(path)
    assert loaded2.tokenizer.vocab == gm.tokenizer.vocab


def test_checkpoint_manager(tmp_path):
    from gloria_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpts", monitor="val_loss", save_top_k=2)
    state = {"w": np.ones(3)}
    for step, loss in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 2.0)]:
        mgr.save({"w": np.ones(3) * step}, step, {"val_loss": loss})
    assert mgr.best().endswith("step_00000004")
    assert mgr.last().endswith("step_00000004")
    names = {e["name"] for e in mgr.manifest["entries"]}
    assert names == {"step_00000002", "step_00000004"}  # top-2 by val_loss
    restored, cfg, extra = mgr.restore(mgr.best(), target=state)
    np.testing.assert_array_equal(restored["w"], np.ones(3) * 4)
    assert extra["metrics"]["val_loss"] == 2.0
