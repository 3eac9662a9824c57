"""CI data-integrity crawl over a larger synthetic PhysioNet mirror.

Round-1 shipped the crawl only as a manual script; this drives the same
sweep (reference ``test_data.py`` semantics: touch every instance, collect
errors, never die) in CI, including deliberately corrupted entries that the
crawl must report rather than crash on.
"""

import pytest

import importlib.util
import os

import numpy as np
import pandas as pd

# repo-root test_data.py (the crawl CLI) — load by path; the bare module
# name collides with tests/test_data.py
_spec = importlib.util.spec_from_file_location(
    "crawl_cli",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "test_data.py"),
)
_crawl_cli = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_crawl_cli)
crawl = _crawl_cli.crawl

from test_mimic import make_mirror

from gloria_tpu.configs import Config
from gloria_tpu.data import mimic


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def _big_mirror(tmp_path, n_dicoms=24):
    filer, imagenome, records = make_mirror(tmp_path, n_dicoms=n_dicoms)
    # corrupt one image cache entry and one scene graph
    bad_img = "d003"
    np.save(filer.image_cache_path(bad_img), np.zeros(0))  # empty array
    os.remove(filer.image_cache_path(bad_img))
    bad_sg = imagenome.get_silver_scene_graph_json_file("d005")
    with open(bad_sg, "w") as fh:
        fh.write("{not json")
    return filer, imagenome, records


def test_crawl_full_split_reports_corruption(tmp_path):
    filer, imagenome, records = _big_mirror(tmp_path)
    cfg = Config({
        "phase": "pretrain",
        "model": {"text": {}},
        "data": {"dataset": "imagenome", "group_by": "image",
                  "image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half"},
        "train": {"batch_size": 4, "num_workers": 1},
    })
    # image-grouped: one instance per dicom; reports come from the filer
    # (absent on this mirror → every instance errors on get_report unless the
    # report file exists) — write reports so only the two corrupted entries fail
    for rec in records.itertuples(index=False):
        path = filer.get_full_path(filer.report_relpath(rec.subject_id, rec.study_id))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write("Mild opacity in the left lower lung zone. No pneumothorax.")
    dm = mimic.ImaGenomeDataModule(
        cfg, mimic_cxr_filer=filer, imagenome_filer=imagenome,
        records={"train": records, "valid": records, "test": records},
    )
    n, errors = crawl(dm.dataset("valid"), verbose=False)
    assert n == 24
    bad_indices = {i for i, _ in errors}
    # exactly the corrupted entries fail: missing image cache d003 (index 3)
    # and the broken scene graph d005 (index 5)
    assert bad_indices == {3, 5}, [(i, str(e)[:60]) for i, e in errors]


def test_crawl_sentence_grouped_clean_mirror(tmp_path):
    filer, imagenome, records = make_mirror(tmp_path, n_dicoms=8)
    sentences = mimic.build_sentences_df(records, imagenome)
    cfg = Config({
        "phase": "pretrain",
        "model": {"text": {}},
        "data": {"dataset": "imagenome", "group_by": "sentence",
                  "image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half"},
        "train": {"batch_size": 4, "num_workers": 1},
    })
    dm = mimic.ImaGenomeDataModule(
        cfg, mimic_cxr_filer=filer, imagenome_filer=imagenome,
        records={"train": records, "valid": records, "test": records},
        sentences={"train": sentences, "valid": sentences, "test": sentences},
    )
    n, errors = crawl(dm.dataset("valid"), verbose=False)
    assert n == 16 and errors == []  # 8 dicoms × 2 sentences, all readable
