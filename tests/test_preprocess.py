"""Offline dataset prep driven end-to-end on fabricated original CSVs.

Round 1 only pinned the module structure ("needs licensed data"); these
tests fabricate the RSNA / SIIM / CheXpert *original* files at small scale
and drive every preprocessor: split CSVs get written with the reference's
seeds (train_test_split(random_state=0)), bbox aggregation and RLE labeling
follow the reference's conventions, and the 5×200 benchmark selects
single-positive frontal studies merged with master-CSV reports.
"""

import pytest

from pathlib import Path

import numpy as np
import pandas as pd

from gloria_tpu import constants
from gloria_tpu.data import preprocess

ALL_LABELS = [
    "Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion",
    "Enlarged Cardiomediastinum", "No Finding", "Lung Lesion", "Lung Opacity",
    "Pneumonia", "Pneumothorax", "Pleural Other", "Fracture", "Support Devices",
]


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def test_pneumonia_split_prep(tmp_path, monkeypatch):
    d = tmp_path / "rsna"
    d.mkdir()
    monkeypatch.setattr(constants, "PNEUMONIA_DATA_DIR", d)
    monkeypatch.setattr(constants, "PNEUMONIA_ORIGINAL_TRAIN_CSV", d / "stage_2_train_labels.csv")
    monkeypatch.setattr(constants, "PNEUMONIA_TRAIN_CSV", d / "train.csv")
    monkeypatch.setattr(constants, "PNEUMONIA_VALID_CSV", d / "val.csv")
    monkeypatch.setattr(constants, "PNEUMONIA_TEST_CSV", d / "test.csv")
    monkeypatch.setattr(constants, "PNEUMONIA_IMG_DIR", d / "stage_2_train_images")

    rng = np.random.RandomState(0)
    rows = []
    for i in range(40):
        pid = f"p{i:03d}"
        if i % 3 == 0:  # positive, possibly multiple boxes
            for _ in range(rng.randint(1, 3)):
                x, y = rng.randint(0, 500, 2)
                rows.append({"patientId": pid, "x": x, "y": y,
                             "width": 40, "height": 60, "Target": 1})
        else:
            rows.append({"patientId": pid, "x": np.nan, "y": np.nan,
                         "width": np.nan, "height": np.nan, "Target": 0})
    pd.DataFrame(rows).to_csv(constants.PNEUMONIA_ORIGINAL_TRAIN_CSV, index=False)

    preprocess.preprocess_pneumonia_data()

    train = pd.read_csv(d / "train.csv")
    valid = pd.read_csv(d / "val.csv")
    test = pd.read_csv(d / "test.csv")
    assert len(train) + len(valid) + len(test) == 40
    assert set(train.patientId).isdisjoint(set(test.patientId))
    # multi-box positives aggregated to one row with a bbox list; negatives None
    pos = train[train.Target == 1]
    assert len(pos) and pos.bbox.iloc[0].startswith("[[")
    # reference seed determinism: rerun produces identical splits
    first = train.patientId.tolist()
    preprocess.preprocess_pneumonia_data()
    assert pd.read_csv(d / "train.csv").patientId.tolist() == first


def test_pneumothorax_split_prep(tmp_path, monkeypatch):
    d = tmp_path / "siim"
    img_dir = d / "dicom-images-train"
    monkeypatch.setattr(constants, "PNEUMOTHORAX_DATA_DIR", d)
    monkeypatch.setattr(constants, "PNEUMOTHORAX_ORIGINAL_TRAIN_CSV", d / "train-rle.csv")
    monkeypatch.setattr(constants, "PNEUMOTHORAX_TRAIN_CSV", d / "train.csv")
    monkeypatch.setattr(constants, "PNEUMOTHORAX_VALID_CSV", d / "valid.csv")
    monkeypatch.setattr(constants, "PNEUMOTHORAX_TEST_CSV", d / "test.csv")
    monkeypatch.setattr(constants, "PNEUMOTHORAX_IMG_DIR", img_dir)

    rows = []
    for i in range(30):
        iid = f"im{i:03d}"
        sub = img_dir / f"study{i % 4}" / "series"
        sub.mkdir(parents=True, exist_ok=True)
        (sub / f"{iid}.dcm").write_bytes(b"")
        rle = " -1" if i % 2 else "12 4 20 6"
        rows.append({"ImageId": iid, " EncodedPixels": rle})
    pd.DataFrame(rows).to_csv(d / "train-rle.csv", index=False)

    preprocess.preprocess_pneumothorax_data()
    train = pd.read_csv(d / "train.csv")
    assert {"Label", "Path"} <= set(train.columns)
    assert set(train.Label.unique()) <= {0.0, 1.0}
    # labels follow the " -1" convention and paths resolve to the dcm tree
    assert all(str(p).endswith(".dcm") for p in train.Path)
    total = sum(len(pd.read_csv(d / f"{n}.csv")) for n in ("train", "valid", "test"))
    assert total == 30


def _chexpert_fixture(d: Path, n_per_class: int = 12):
    rng = np.random.RandomState(1)
    rows, reports = [], []
    k = 0
    for ci, cls in enumerate(constants.CHEXPERT_COMPETITION_TASKS):
        for _ in range(n_per_class):
            row = {c: 0.0 for c in ALL_LABELS}
            row[cls] = 1.0
            path = f"CheXpert-v1.0/train/patient{k:05d}/study1/view1_frontal.jpg"
            row[constants.CHEXPERT_PATH_COL] = path
            row[constants.CHEXPERT_VIEW_COL] = "Frontal"
            rows.append(row)
            reports.append({constants.CHEXPERT_PATH_COL: path,
                            constants.CHEXPERT_REPORT_COL: f"impression {cls.lower()} {k}"})
            k += 1
    # distractors: multi-positive + lateral rows that must NOT be selected
    for _ in range(20):
        row = {c: float(rng.rand() > 0.5) for c in ALL_LABELS}
        row["Atelectasis"] = 1.0
        row["Edema"] = 1.0
        path = f"CheXpert-v1.0/train/patient{k:05d}/study1/view1_frontal.jpg"
        row[constants.CHEXPERT_PATH_COL] = path
        row[constants.CHEXPERT_VIEW_COL] = "Frontal" if k % 2 else "Lateral"
        rows.append(row)
        k += 1
    pd.DataFrame(rows).to_csv(d / "train.csv", index=False)
    pd.DataFrame(reports).to_csv(d / "master_updated.csv", index=False)


def test_chexpert_5x200_and_split_prep(tmp_path, monkeypatch):
    d = tmp_path / "CheXpert-v1.0"
    d.mkdir()
    monkeypatch.setattr(constants, "CHEXPERT_DATA_DIR", d)
    monkeypatch.setattr(constants, "CHEXPERT_ORIGINAL_TRAIN_CSV", d / "train.csv")
    monkeypatch.setattr(constants, "CHEXPERT_MASTER_CSV", d / "master_updated.csv")
    monkeypatch.setattr(constants, "CHEXPERT_TRAIN_CSV", d / "train_split.csv")
    monkeypatch.setattr(constants, "CHEXPERT_VALID_CSV", d / "valid_split.csv")
    monkeypatch.setattr(constants, "CHEXPERT_5x200", d / "chexpert_8x200.csv")
    monkeypatch.setattr(constants, "CHEXPERT_VALID_NUM", 5)

    _chexpert_fixture(d, n_per_class=12)
    bench = preprocess.preprocess_chexpert_5x200_data(n_per_task=10, seed=0)
    assert len(bench) == 10 * len(constants.CHEXPERT_COMPETITION_TASKS)
    # every selected study is single-positive in its class and has a report
    for cls in constants.CHEXPERT_COMPETITION_TASKS:
        sel = bench[bench[cls] == 1.0]
        assert len(sel) == 10
        others = [c for c in constants.CHEXPERT_COMPETITION_TASKS if c != cls]
        assert (sel[others].to_numpy() == 0).all()
    assert bench[constants.CHEXPERT_REPORT_COL].notna().all()

    # full split prep (benchmark rows excluded from train/valid); shrink the
    # benchmark for the small fixture
    orig = preprocess.preprocess_chexpert_5x200_data
    monkeypatch.setattr(preprocess, "preprocess_chexpert_5x200_data",
                        lambda n_per_task=10, seed=0: orig(n_per_task, seed))
    np.random.seed(0)
    preprocess.preprocess_chexpert_data()
    train = pd.read_csv(d / "train_split.csv")
    valid = pd.read_csv(d / "valid_split.csv")
    written_bench = pd.read_csv(d / "chexpert_8x200.csv")
    assert len(valid) == 5 and len(written_bench) == 50
    bench_paths = set(written_bench[constants.CHEXPERT_PATH_COL])
    assert bench_paths.isdisjoint(set(train[constants.CHEXPERT_PATH_COL]))
    assert bench_paths.isdisjoint(set(valid[constants.CHEXPERT_PATH_COL]))
