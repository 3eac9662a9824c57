"""Serving path: bucketed encode, cached-class classify, batcher, HTTP."""

import json
import urllib.error
import urllib.request
from concurrent.futures import wait

import numpy as np
import pytest

import jax

from gloria_tpu import api
from gloria_tpu.configs import Config
from gloria_tpu.data.pretraining_dataset import SyntheticPretrainingDataset
from gloria_tpu.data.tokenizer import WordPieceTokenizer
from gloria_tpu.models import GLoRIA
from gloria_tpu.serving import DynamicBatcher, InferenceEngine, _next_bucket, serve_http


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


CLASSES = {
    "edema": ["mild edema at the left lung base", "edema in the lung"],
    "no finding": ["no finding"],
}


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_model_cfg()
    ds = SyntheticPretrainingDataset(size=16, imsize=64)
    tok = WordPieceTokenizer.from_corpus(ds.corpus() + ["atelectasis cardiomegaly edema effusion"])
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
    gm = api.GloriaModel(cfg, variables, tokenizer=tok)
    return InferenceEngine(gm, CLASSES, max_batch=8)


def _imgs(n, seed=3):
    return np.asarray(
        [np.random.RandomState(seed + i).randn(48, 48, 3).astype(np.float32) for i in range(n)])


def test_next_bucket():
    assert [_next_bucket(n, 8) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 8]


def test_bucket_padding_does_not_contaminate(engine):
    """Padded rows must not change real rows (BN eval mode, per-sample ops)."""
    imgs = _imgs(3)  # bucket pads to 4
    l3, g3 = engine.encode_images(imgs)
    l1, g1 = engine.encode_images(imgs[:1])  # bucket 1, no padding
    np.testing.assert_allclose(np.asarray(l3[0]), np.asarray(l1[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g3[0]), np.asarray(g1[0]), rtol=2e-4, atol=2e-4)


def test_classify_matches_api_zero_shot(engine):
    """Cached-class scoring ≡ the api's per-class re-encoding path."""
    imgs = _imgs(4)
    scores = engine.classify(imgs)
    assert scores.shape == (4, 2)
    gm = engine.model
    expect = []
    for name, prompts in CLASSES.items():
        txt = gm.process_text(list(prompts))
        sims = gm.get_similarities(np.asarray(imgs), txt, similarity_type="both")
        expect.append(sims.max(axis=1))
    expect = np.stack(expect, axis=1)
    np.testing.assert_allclose(scores, expect, rtol=2e-4, atol=2e-4)
    # z-norm matches the reference normalization
    zn = engine.classify(imgs, z_normalize=True)
    np.testing.assert_allclose(
        zn, (expect - expect.mean(0)) / expect.std(0), rtol=2e-3, atol=2e-3)


def test_uint8_device_normalize_matches_host_pipeline(engine):
    """uint8-input path (device-side ToTensor+Normalize, 4× less H2D) must
    score identically to the host-normalized f32 api pipeline."""
    raws = [(np.random.RandomState(60 + i).rand(80, 66) * 255).astype(np.uint8)
            for i in range(3)]
    u8 = engine.process_img_uint8(raws)
    assert u8.dtype == np.uint8 and u8.shape == (3, 48, 48, 3)
    f32 = np.asarray(engine.model.process_img(raws))
    s_u8 = engine.classify(u8)
    s_f32 = engine.classify(f32)
    np.testing.assert_allclose(s_u8, s_f32, rtol=2e-4, atol=2e-4)


def test_oversized_batch_splits(engine):
    imgs = _imgs(10)  # max_batch=8 → 8 + 2
    scores = engine.classify(imgs)
    assert scores.shape == (10, 2)
    np.testing.assert_allclose(scores[:4], engine.classify(imgs[:4]), rtol=2e-4, atol=2e-4)


def test_dynamic_batcher_coalesces_and_matches(engine):
    bat = DynamicBatcher(engine, max_wait_ms=20)
    try:
        futs = [bat.submit(_imgs(1, seed=40 + i)) for i in range(5)]
        done, not_done = wait(futs, timeout=60)
        assert not not_done
        for i, f in enumerate(futs):
            direct = engine.classify(_imgs(1, seed=40 + i))
            np.testing.assert_allclose(f.result(), direct, rtol=2e-4, atol=2e-4)
    finally:
        bat.close()


def test_dynamic_batcher_survives_incompatible_requests(engine):
    """Mixed shapes/dtypes must not kill the worker or mix device programs —
    each request still resolves with its own correct scores."""
    bat = DynamicBatcher(engine, max_wait_ms=20)
    try:
        a = _imgs(1, seed=70)                                   # f32 48x48
        b = (np.random.RandomState(71).rand(1, 48, 48, 3) * 255).astype(np.uint8)
        c = _imgs(2, seed=72)
        futs = [bat.submit(a), bat.submit(b), bat.submit(c)]
        done, not_done = wait(futs, timeout=120)
        assert not not_done
        np.testing.assert_allclose(futs[0].result(), engine.classify(a), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(futs[1].result(), engine.classify(b), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(futs[2].result(), engine.classify(c), rtol=2e-4, atol=2e-4)
    finally:
        bat.close()
    # after close: submissions are rejected, not silently stranded
    with pytest.raises(RuntimeError):
        bat.submit(a)


def test_process_img_uint8_accepts_pathlib(engine, tmp_path):
    import cv2

    p = tmp_path / "im.png"
    cv2.imwrite(str(p), (np.random.RandomState(80).rand(60, 60) * 255).astype(np.uint8))
    out = engine.process_img_uint8([p])  # pathlib.Path, not str
    assert out.shape == (1, 48, 48, 3) and out.dtype == np.uint8


def test_http_paths_root_restriction(engine, tmp_path):
    import cv2

    allowed = tmp_path / "allowed"
    allowed.mkdir()
    inside = str(allowed / "ok.png")
    cv2.imwrite(inside, (np.random.RandomState(81).rand(50, 50) * 255).astype(np.uint8))
    outside = str(tmp_path / "secret.png")
    cv2.imwrite(outside, (np.random.RandomState(82).rand(50, 50) * 255).astype(np.uint8))
    server = serve_http(engine, host="127.0.0.1", port=0, paths_root=str(allowed))
    try:
        port = server.server_address[1]

        def post(paths):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/classify",
                data=json.dumps({"paths": paths}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post([inside])
        assert code == 200 and np.asarray(out["scores"]).shape == (1, 2)
        code, out = post([outside])
        assert code == 403
        code, out = post([str(allowed / ".." / "secret.png")])  # traversal
        assert code == 403
    finally:
        server.shutdown()


def test_retrieve_endpoint(engine, tmp_path):
    import cv2

    corpus = ["mild edema at the left lung base", "no finding",
              "edema in the lung", "no finding today"]
    engine.set_corpus(corpus, target_classes=["edema", "none", "edema", "none"],
                      top_k=2)
    img = (np.random.RandomState(90).rand(70, 70) * 255).astype(np.uint8)
    direct = engine.retrieve([img])
    assert len(direct) == 1 and len(direct[0]["targets"]) == 2
    assert set(direct[0]["targets"]) <= set(corpus)
    assert len(direct[0]["classes"]) == 2

    p = str(tmp_path / "q.png")
    cv2.imwrite(p, img)
    server = serve_http(engine, host="127.0.0.1", port=0)
    try:
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"paths": [p]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["results"][0]["targets"] == direct[0]["targets"]
    finally:
        server.shutdown()


def test_http_server_classify(engine, tmp_path):
    import cv2

    paths = []
    for i in range(2):
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, (np.random.RandomState(50 + i).rand(70, 60) * 255).astype(np.uint8))
        paths.append(p)
    server = serve_http(engine, host="127.0.0.1", port=0)
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and set(health["classes"]) == set(CLASSES)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=json.dumps({"paths": paths}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        scores = np.asarray(out["scores"])
        assert scores.shape == (2, 2)
        expect = engine.classify_paths(paths)
        np.testing.assert_allclose(scores, expect, rtol=2e-4, atol=2e-4)
    finally:
        server.shutdown()


def test_stats_endpoint(engine, tmp_path):
    import cv2

    p = str(tmp_path / "stat_im.png")
    cv2.imwrite(p, (np.random.RandomState(7).rand(70, 60) * 255).astype(np.uint8))
    server = serve_http(engine, host="127.0.0.1", port=0)
    try:
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=json.dumps({"paths": [p]}).encode(),
            headers={"Content-Type": "application/json"})
        for _ in range(3):
            with urllib.request.urlopen(req, timeout=60):
                pass
        # one malformed request → counted as an error, kept out of latency
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"]["/classify"] == 4
        assert stats["errors"]["/classify"] == 1
        assert stats["images"] == 3
        lat = stats["latency"]["/classify"]
        assert lat["n"] == 3
        assert 0 < lat["p50_ms"] <= lat["p90_ms"] <= lat["p99_ms"] <= lat["max_ms"]
        assert stats["uptime_s"] > 0 and stats["max_batch"] == 8
    finally:
        server.shutdown()


def test_serving_stats_window_bounded():
    from gloria_tpu.serving import ServingStats

    s = ServingStats(window=10)
    for i in range(100):
        s.record("/x", seconds=0.001 * (i + 1), images=1)
    snap = s.snapshot()
    assert snap["requests"]["/x"] == 100 and snap["images"] == 100
    # only the LAST 10 samples survive → p50 reflects recent traffic
    assert snap["latency"]["/x"]["n"] == 10
    assert snap["latency"]["/x"]["p50_ms"] > 90.0


def test_sharded_engine_matches_single_device(engine):
    """An engine over a mesh-sharded model (GloriaModel.shard) scores
    identically to the single-device engine; buckets round up to a multiple
    of the mesh's data axis so the image tower splits evenly."""
    from gloria_tpu.parallel.mesh import create_mesh

    imgs = _imgs(5)
    base = engine.classify(imgs)
    # fresh wrapper so .shard() does not mutate the shared fixture's model
    gm2 = api.GloriaModel(engine.model.cfg, engine.model.variables,
                          tokenizer=engine.model.tokenizer)
    gm2.shard(create_mesh(n_devices=8))
    eng2 = InferenceEngine(gm2, CLASSES, max_batch=8)
    assert eng2._bucket(5) == 8  # pow2 bucket already divides the 8-way axis
    np.testing.assert_allclose(eng2.classify(imgs), base, rtol=2e-4, atol=2e-4)

    # non-dividing data axis (8 devices, tp=2 → data=4): bucket 1 rounds to 4
    gm3 = api.GloriaModel(engine.model.cfg, engine.model.variables,
                          tokenizer=engine.model.tokenizer)
    gm3.shard(create_mesh(n_devices=8, tp=2))
    eng3 = InferenceEngine(gm3, CLASSES, max_batch=8)
    assert eng3._bucket(1) == 4
    np.testing.assert_allclose(eng3.classify(imgs[:1]), base[:1],
                               rtol=2e-4, atol=2e-4)
