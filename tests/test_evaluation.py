"""Zero-shot 5×200 evaluation driver on a fabricated benchmark."""

import json

import numpy as np
import pytest

import jax

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.data.tokenizer import WordPieceTokenizer
from gloria_tpu.evaluation import evaluate_zero_shot
from gloria_tpu.models import GLoRIA


def _mini_cfg():
    return Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
                   "vision": {"model_name": "resnet_18"},
                   "text": {"embedding_dim": 32, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 512, "hidden_size": 32,
                                              "num_layers": 2, "num_heads": 4,
                                              "intermediate_size": 64,
                                              "max_position_embeddings": 64}}},
        "data": {"image": {"imsize": 64}, "text": {"word_num": 48}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 48}},
    })


def _mini_model():
    cfg = _mini_cfg()
    prompt_corpus = [p for v in api.generate_chexpert_class_prompts(5).values() for p in v]
    tok = WordPieceTokenizer.from_corpus(prompt_corpus)
    model = GLoRIA(cfg)
    batch = {
        "imgs": np.zeros((1, 64, 64, 3), np.float32),
        "caption_ids": np.zeros((1, 48), np.int32),
        "attention_mask": np.ones((1, 48), np.int32),
        "token_type_ids": np.zeros((1, 48), np.int32),
        "word_assignment": np.eye(48, dtype=np.float32)[None],
    }
    variables = model.init(jax.random.PRNGKey(0), {k: jax.numpy.asarray(v) for k, v in batch.items()})
    return api.GloriaModel(cfg, variables, tokenizer=tok)


def test_evaluate_zero_shot_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    gm = _mini_model()

    rng = np.random.RandomState(0)
    paths, labels = [], []
    classes = ["Edema", "Atelectasis"]
    for i in range(8):
        p = tmp_path / f"img{i}.png"
        cv2.imwrite(str(p), (rng.rand(80, 80) * 255).astype(np.uint8))
        paths.append(str(p))
        onehot = np.zeros(2, np.float32)
        onehot[i % 2] = 1
        labels.append(onehot)
    res = evaluate_zero_shot(gm, paths, np.stack(labels), classes, n_prompts=2, batch_size=3)
    assert res["n_images"] == 8
    assert 0.0 <= res["accuracy"] <= 1.0
    assert set(res["auroc_per_class"]) == set(classes)
    assert res["class_scores"].shape == (8, 2)
    # z-normalized over the full image set
    np.testing.assert_allclose(res["class_scores"].mean(axis=0), 0, atol=1e-4)
    json.dumps({k: v for k, v in res.items() if k != "class_scores"})  # serializable


def test_sharded_eval_matches_single_device():
    """model.shard(mesh): dp×tp-sharded zero-shot == single-device scores,
    including a batch (10) that does not divide the data axis (4 → padding)."""
    from gloria_tpu.parallel.mesh import create_mesh

    gm = _mini_model()
    rng = np.random.RandomState(1)
    imgs = (rng.rand(10, 64, 64) * 255).astype(np.uint8)

    prompts = api.generate_chexpert_class_prompts(2)
    classes = ["Edema", "Atelectasis"]
    mapping = gm.process_class_prompts({c: prompts[c] for c in classes})

    def scores(model):
        x = model.process_img(list(imgs))
        out = {}
        for c in classes:
            out[c] = model.get_similarities(x, mapping[c], "both").max(axis=1)
        return out

    base = scores(gm)
    gm.shard(create_mesh(n_devices=8, fsdp=1, tp=2))
    sharded = scores(gm)
    for c in classes:
        np.testing.assert_allclose(sharded[c], base[c], rtol=2e-4, atol=2e-5)

    # evaluate_zero_shot runs end-to-end on the sharded model
    labels = np.eye(2, dtype=np.float32)[np.arange(10) % 2]
    res = evaluate_zero_shot(gm, [imgs[i] for i in range(10)], labels, classes,
                             n_prompts=2, batch_size=4)
    assert res["n_images"] == 10 and res["class_scores"].shape == (10, 2)


def test_sharded_fused_eval_matches_sharded_xla():
    """shard_map'd Pallas eval kernel ≡ the GSPMD XLA program on a mesh.

    Rows of the [B_img, T] matrix are independent given replicated text, so
    per-device kernel calls over the 'data' axis must reproduce the sharded
    XLA scores (bf16 kernel tolerance) — including a batch that does not
    divide the data axis (padding path)."""
    from gloria_tpu.ops import gloria_loss
    from gloria_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(n_devices=8, fsdp=1, tp=1)
    rng = np.random.RandomState(3)
    for B, T, W, R, D, sink_on in ((16, 6, 12, 9, 32, True), (10, 5, 12, 9, 32, False)):
        regions = jax.numpy.asarray(rng.randn(B, R, D).astype(np.float32))
        words = jax.numpy.asarray(rng.randn(T, W, D).astype(np.float32))
        lens = jax.numpy.asarray(rng.randint(2, W - 1, size=T))
        sink = jax.numpy.asarray(rng.randn(D).astype(np.float32)) if sink_on else None

        ref = np.asarray(gloria_loss.local_similarities_eval(
            regions, words, lens, temp1=4.0, temp2=5.0, sink=sink))
        xla_sharded = np.asarray(gloria_loss.local_similarities_eval_sharded(
            regions, words, lens, mesh=mesh, sink=sink, use_fused=False))
        fused_sharded = np.asarray(gloria_loss.local_similarities_eval_sharded(
            regions, words, lens, mesh=mesh, sink=sink, use_fused=True))
        np.testing.assert_allclose(xla_sharded, ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(fused_sharded, xla_sharded, rtol=2e-2, atol=2e-2)


def test_api_sharded_fused_scores_match():
    """GloriaModel.shard + fused_kernel=True routes through shard_map and
    reproduces the unsharded XLA-path scores end-to-end."""
    from gloria_tpu.parallel.mesh import create_mesh

    gm = _mini_model()
    rng = np.random.RandomState(5)
    imgs = (rng.rand(6, 64, 64) * 255).astype(np.uint8)
    prompts = api.generate_chexpert_class_prompts(2)
    mapping = gm.process_class_prompts({"Edema": prompts["Edema"]})["Edema"]

    x = gm.process_img(list(imgs))
    base = gm.get_similarities(x, mapping, "local")
    gm.cfg.set_path("model.gloria.fused_kernel", True)
    gm.shard(create_mesh(n_devices=8, fsdp=1, tp=1))
    fused = gm.get_similarities(gm.process_img(list(imgs)), mapping, "local")
    np.testing.assert_allclose(fused, base, rtol=2e-2, atol=2e-2)
