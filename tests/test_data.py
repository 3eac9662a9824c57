"""Host data-plane tests: letterbox parity, cleanup parity, tokenizer, collate, loader."""

import numpy as np
import pytest

from gloria_tpu.configs import Config
from gloria_tpu.data.collate import GloriaCollate, bbox_to_mask, device_batch, mask_to_bbox
from gloria_tpu.data.loader import PrefetchLoader
from gloria_tpu.data.pretraining_dataset import SyntheticPretrainingDataset, iterate_batches
from gloria_tpu.data.tokenizer import TextProcessor, WordPieceTokenizer, clean_report
from gloria_tpu.data.transforms import build_transformation, letterbox_resize, normalize


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def data_cfg(imsize=64, crop=48, word_num=24):
    return Config({
        "data": {"image": {"imsize": imsize}, "text": {"word_num": word_num}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": crop}},
    })


def test_letterbox_matches_reference_semantics():
    # tall image: height scaled to `scale`, width padded centered
    img = (np.arange(30 * 20, dtype=np.uint8).reshape(30, 20)) % 255
    out = letterbox_resize(img, 16)
    assert out.shape == (16, 16)
    # width after resize = int(20 * 16/30) = 10 → pad 3 left (floor), 3 right (ceil)
    assert (out[:, :3] == 0).all() and (out[:, 13:] == 0).all()
    assert out[:, 3:13].any()
    # wide image: width fixed, height padded
    out2 = letterbox_resize(img.T, 16)
    assert (out2[:3] == 0).all() and (out2[13:] == 0).all()


def test_clean_report_reference_rules():
    text = "1. Mild cardiomegaly.  2. No\npneumothorax seen. Ok. 3.Effusion at left base"
    got = clean_report(text)
    # numbered-split + period-split; ≤1-token sentences ("Ok") dropped; lowercased
    assert got == "mild cardiomegaly no pneumothorax seen effusion at left base"
    assert clean_report("single") == ""
    assert clean_report("café au lait") == "caf au lait"  # ascii filter


def test_wordpiece_greedy_longest_match():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "pneum", "##otho", "##rax", "##o", "no", "finding", "the"]
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("pneumothorax") == ["pneum", "##otho", "##rax"]
    assert tok.tokenize("zzz") == ["[UNK]"]
    enc = tok.encode("no finding", max_length=8)
    assert enc["tokens"][:4] == ["[CLS]", "no", "finding", "[SEP]"]
    assert enc["attention_mask"].sum() == 4
    assert enc["input_ids"][4] == tok.pad_id


def test_text_processor_batch():
    ds = SyntheticPretrainingDataset(size=16)
    tok = WordPieceTokenizer.from_corpus(ds.corpus())
    tp = TextProcessor(tok, num_words=24)
    out = tp(["Mild edema at the left lung base.", "No finding."])
    assert out["caption_ids"].shape == (2, 24)
    assert out["word_assignment"].shape == (2, 24, 24)
    assert out["cap_lens"][0] > out["cap_lens"][1] >= 3
    assert out["words"][1][0] == "[CLS]"


def test_collate_shapes_and_sorting():
    ds = SyntheticPretrainingDataset(size=8, imsize=80)
    tok = WordPieceTokenizer.from_corpus(ds.corpus())
    cfg = data_cfg()
    coll = GloriaCollate(cfg, "train", tok, seed=0)
    batch = coll([ds[i] for i in range(4)])
    assert batch["imgs"].shape == (4, 48, 48, 3)
    assert batch["caption_ids"].shape == (4, 24)
    lens = batch["cap_lens"]
    assert (np.diff(lens) <= 0).all()  # sorted desc
    assert batch["segmentation_labels"].shape == (4, 48, 48)
    dev = device_batch(batch)
    assert all(not k.startswith("_") for k in dev)
    # eval split: deterministic center crop
    coll_t = GloriaCollate(cfg, "test", tok)
    b1 = coll_t([ds[0]])
    b2 = coll_t([ds[0]])
    np.testing.assert_array_equal(b1["imgs"], b2["imgs"])


def test_bbox_mask_roundtrip():
    m = bbox_to_mask([3, 5, 10, 12], (20, 20))
    assert m.sum() == 7 * 7
    assert mask_to_bbox(m) == [3.0, 5.0, 10.0, 12.0]
    assert mask_to_bbox(np.zeros((4, 4))) is None


def test_prefetch_loader_full_epoch():
    ds = SyntheticPretrainingDataset(size=20, imsize=64)
    tok = WordPieceTokenizer.from_corpus(ds.corpus())
    coll = GloriaCollate(data_cfg(), "train", tok, seed=0)
    loader = PrefetchLoader(ds, coll, batch_size=4, num_workers=2, prefetch=2, seed=1)
    batches = list(loader)
    assert len(batches) == 5
    assert all(b["imgs"].shape == (4, 48, 48, 3) for b in batches)
    # weighted sampling path (curriculum reweighting hook)
    loader.sample_weights = np.linspace(0.1, 1.0, 20)
    batches = list(loader)
    assert len(batches) == 5


def test_prefetch_loader_process_sharding():
    """P per-process loaders with the same seed jointly reproduce the
    single-host epoch exactly: concatenating their local batches in
    process order equals the global batch row-for-row (the layout
    jax.make_array_from_process_local_data assembles)."""

    class Ids:
        def __len__(self):
            return 22

        def __getitem__(self, i):
            return i

    collate = lambda items: {"ids": np.asarray(items)}  # noqa: E731
    global_loader = PrefetchLoader(Ids(), collate, batch_size=4, seed=3,
                                   num_workers=1, drop_last=False)
    per_proc = [
        PrefetchLoader(Ids(), collate, batch_size=4, seed=3, num_workers=1,
                       drop_last=False, process_index=p, process_count=2)
        for p in range(2)
    ]
    global_batches = [b["ids"] for b in global_loader]
    local = [[b["ids"] for b in lo] for lo in per_proc]
    assert len(local[0]) == len(local[1]) == len(global_batches)
    for g, l0, l1 in zip(global_batches, local[0], local[1]):
        rows = len(g) // 2  # ragged final batch truncated per-process-even
        assert np.array_equal(np.concatenate([l0, l1]), g[: 2 * rows])
    # indivisible global batch is rejected up front
    with pytest.raises(ValueError):
        PrefetchLoader(Ids(), collate, batch_size=5, process_index=0, process_count=2)


def test_loader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 8
        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = PrefetchLoader(Bad(), lambda x: x, batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_normalize_modes():
    img = np.full((4, 4, 3), 255, np.uint8)
    np.testing.assert_allclose(normalize(img, "half"), 1.0)
    np.testing.assert_allclose(normalize(img, None), 1.0)
    out = normalize(img, "imagenet")
    assert out.shape == (4, 4, 3) and out[0, 0, 0] != out[0, 0, 2]


def test_native_ingest_matches_python_path():
    from gloria_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("native ingest library not built")
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(90, 60) * 255).astype(np.uint8), (rng.rand(50, 80) * 255).astype(np.uint8)]
    out = native.letterbox_normalize_batch(imgs, 64)
    ref = np.stack([normalize(np.repeat(letterbox_resize(im, 64)[..., None], 3, -1), "half") for im in imgs])
    assert out.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(out, ref, atol=0.03)


def test_native_train_ingest_crop_flip_parity():
    from gloria_tpu.data import native

    if not native.available():
        pytest.skip("native ingest library not built")
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(320, 280) * 255).astype(np.uint8) for _ in range(4)]
    tops = np.asarray([3, 0, 31, 10])
    lefts = np.asarray([5, 32, 0, 7])
    flips = np.asarray([0, 1, 0, 1])
    out = native.letterbox_crop_normalize_batch(imgs, 256, 224, tops, lefts, flips)
    refs = []
    for im, t, l, f in zip(imgs, tops, lefts, flips):
        lb = letterbox_resize(np.repeat(im[..., None], 3, -1), 256)
        crop = lb[t : t + 224, l : l + 224]
        if f:
            crop = crop[:, ::-1]
        refs.append(normalize(np.ascontiguousarray(crop), "half"))
    np.testing.assert_allclose(out, np.stack(refs), atol=0.03)


def test_collate_uses_native_train_path():
    from gloria_tpu.data import native

    if not native.available():
        pytest.skip("native ingest library not built")
    ds = SyntheticPretrainingDataset(size=8, imsize=80)
    tok = WordPieceTokenizer.from_corpus(ds.corpus())
    cfg = data_cfg()
    cfg.data.native_ingest = True
    cfg.transforms.random_horizontal_flip = 0.5
    coll = GloriaCollate(cfg, "train", tok, seed=0)
    assert coll.native_ingest
    batch = coll([ds[i] for i in range(4)])
    assert batch["imgs"].shape == (4, 48, 48, 3)
    assert np.isfinite(batch["imgs"]).all()
    # affine/jitter configs must fall back to the python path
    cfg2 = data_cfg()
    cfg2.data.native_ingest = True
    cfg2.transforms.random_affine = {"degrees": 5, "translate": [0.1, 0.1], "scale": [0.9, 1.1]}
    assert not GloriaCollate(cfg2, "train", tok, seed=0).native_ingest


def test_device_normalize_uint8_path_matches_host():
    """data.device_normalize: collate emits uint8 (4x smaller transfers) and
    the model's device-side normalize reproduces the host f32 pipeline."""
    import jax

    from gloria_tpu.models import GLoRIA

    ds = SyntheticPretrainingDataset(size=4, imsize=80)
    tok = WordPieceTokenizer.from_corpus(ds.corpus())
    cfg = data_cfg()
    cfg.set_path("model.gloria.temp1", 4.0)
    cfg.set_path("model.vision.model_name", "resnet_18")
    cfg.set_path("model.text.embedding_dim", 32)
    cfg.set_path("model.text.agg_tokens", True)
    cfg.set_path("model.text.bert_config", {
        "vocab_size": 256, "hidden_size": 32, "num_layers": 1, "num_heads": 4,
        "intermediate_size": 64, "max_position_embeddings": 48})

    items = [ds[i] for i in range(3)]
    coll_f32 = GloriaCollate(cfg, "test", tok)
    cfg_u8 = Config(cfg.to_dict())
    cfg_u8.set_path("data.device_normalize", True)
    coll_u8 = GloriaCollate(cfg_u8, "test", tok)

    b_f32 = coll_f32(items)
    b_u8 = coll_u8(items)
    assert b_u8["imgs"].dtype == np.uint8
    assert b_f32["imgs"].dtype == np.float32
    assert b_u8["imgs"].nbytes * 4 == b_f32["imgs"].nbytes

    model = GLoRIA(cfg)
    mb = {k: np.asarray(v) for k, v in device_batch(b_f32).items() if k != "cap_lens"}
    variables = model.init(jax.random.PRNGKey(0), mb)
    out_f32 = model.apply(variables, mb, train=False)
    mb_u8 = dict(mb)
    mb_u8["imgs"] = np.asarray(b_u8["imgs"])
    out_u8 = model.apply(variables, mb_u8, train=False)
    for a, b in zip(out_f32[:4], out_u8[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # native + device_normalize compose: the C++ u8 kernel emits single-channel
    # raw pixels ([N, s, s, 1], 12x smaller than the f32 NHWC batch) and the
    # model broadcasts C=1->3 on device; embeddings match the host pipeline
    # within the +-1-level resample rounding
    from gloria_tpu.data import native

    if native.available():
        cfg_n = Config(cfg.to_dict())
        cfg_n.set_path("data.device_normalize", True)
        cfg_n.set_path("data.native_ingest", True)
        coll_n = GloriaCollate(cfg_n, "test", tok)
        assert coll_n.native_ingest
        b_n = coll_n(items)
        assert b_n["imgs"].dtype == np.uint8 and b_n["imgs"].shape[-1] == 1
        assert b_n["imgs"].nbytes * 12 == b_f32["imgs"].nbytes
        np.testing.assert_array_equal(
            np.sort(b_n["cap_lens"]), np.sort(b_u8["cap_lens"]))
        mb_n = dict(mb)
        mb_n["imgs"] = np.asarray(b_n["imgs"])
        out_n = model.apply(variables, mb_n, train=False)
        for a, b in zip(out_f32[:4], out_n[:4]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=5e-2)


def test_native_u8_variants_match_python_resize():
    """letterbox_u8_batch / letterbox_crop_u8_batch: raw uint8 geometry equals
    the cv2 letterbox(+crop+flip) path within 1 grey level."""
    from gloria_tpu.data import native

    if not native.available():
        pytest.skip("native ingest library not built")
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(90, 60) * 255).astype(np.uint8),
            (rng.rand(50, 80) * 255).astype(np.uint8)]
    out = native.letterbox_u8_batch(imgs, 64)
    assert out.shape == (2, 64, 64, 1) and out.dtype == np.uint8
    ref = np.stack([letterbox_resize(im, 64) for im in imgs])
    assert np.abs(out[..., 0].astype(int) - ref.astype(int)).max() <= 1

    imgs2 = [(rng.rand(320, 280) * 255).astype(np.uint8) for _ in range(4)]
    tops = np.asarray([3, 0, 31, 10])
    lefts = np.asarray([5, 32, 0, 7])
    flips = np.asarray([0, 1, 0, 1])
    out2 = native.letterbox_crop_u8_batch(imgs2, 256, 224, tops, lefts, flips)
    refs = []
    for im, t, l, f in zip(imgs2, tops, lefts, flips):
        crop = letterbox_resize(im, 256)[t:t + 224, l:l + 224]
        refs.append(crop[:, ::-1] if f else crop)
    assert np.abs(out2[..., 0].astype(int) - np.stack(refs).astype(int)).max() <= 1
