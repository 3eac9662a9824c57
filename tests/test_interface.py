"""Annotation UI: core logic unit tests + a scripted end-to-end drive.

streamlit is not installed in this image, so ``interface.main(st)`` is driven
with a scripted stub module — the real code path (checkpoint zoo → dataset →
sentence selection → attention overlay → per-sentence bbox projection →
annotation CSV CRUD) executes for real; only the widgets are canned.
"""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from gloria_tpu.configs import Config
from gloria_tpu.utils.annotation import (
    AnnotationStore,
    project_bboxes,
    sentence_infos,
)


# ---------------------------------------------------------------------------
# core logic
# ---------------------------------------------------------------------------

def test_project_bboxes_letterbox_math():
    # 100x200 image letterboxed to 64: scale 0.32, y-pad (64-32)/2 = 16
    boxes = project_bboxes((100, 200), [[50, 25, 150, 75]], imsize=64)
    assert len(boxes) == 1
    x1, y1, x2, y2 = boxes[0]
    assert abs(x1 - 16) <= 1 and abs(x2 - 48) <= 1
    assert 16 + 8 - 2 <= y1 <= 16 + 8 + 2 and 16 + 24 - 2 <= y2 <= 16 + 24 + 2
    # degenerate box vanishes silently
    assert project_bboxes((100, 200), [[0, 0, 0.4, 0.4]], imsize=16) == []


def test_sentence_infos_prefers_scene_graph():
    inst = {"report": "whole report", "bboxes": [[0, 0, 5, 5]],
            "objects": {"sent_to_bboxes": {
                "s1": {"sentence": "left lung clear", "coords_original": [[1, 2, 3, 4]]},
            }}}
    infos = sentence_infos(inst)
    assert infos == {"s1": {"sentence": "left lung clear",
                            "coords_original": [[1, 2, 3, 4]]}}
    infos = sentence_infos({"report": "r", "bboxes": [[0, 0, 5, 5]]})
    assert infos["report"]["coords_original"] == [[0, 0, 5, 5]]


def test_annotation_store_crud(tmp_path):
    store = AnnotationStore(tmp_path / "ann.csv")
    rec = {"dicom_id": "d1", "sent_id": "s1", "checkpoint_name": "m1",
           "prompt": "left lung", "has_good_recall": 4, "has_good_precision": 3,
           "is_intuitive": 5, "is_custom_prompt": False, "no_attn_score": 0.1}
    store.submit(rec)
    got = store.lookup("d1", "s1", "m1")
    assert got["has_good_recall"] == 4
    assert got["dicom_sent_id"] == "dicom_d1_sent_s1"
    # resubmit replaces, not duplicates (reference OnSubmit drops the old row)
    store.submit({**rec, "has_good_recall": 1})
    assert len(store.df) == 1 and store.lookup("d1", "s1", "m1")["has_good_recall"] == 1
    assert store.annotated_sent_ids("d1", "m1") == {"s1"}
    # custom ids: mint then reuse for identical prompt text
    cid = store.custom_sent_id("d1", "free text")
    assert cid == "custom0"
    store.submit({**rec, "sent_id": cid, "prompt": "free text", "is_custom_prompt": True})
    assert store.custom_sent_id("d1", "free text") == "custom0"
    assert store.custom_sent_id("d1", "other text") == "custom1"
    # anonymized view hides the checkpoint column
    assert "checkpoint_name" not in store.view(anonymize=True).columns
    store.delete("d1", "s1", "m1")
    assert store.lookup("d1", "s1", "m1") is None
    # reload from disk
    store2 = AnnotationStore(tmp_path / "ann.csv")
    assert set(store2.df.sent_id) == {"custom0"}


def test_annotation_store_numeric_ids_survive_reload(tmp_path):
    """Regression: pandas.read_csv coerces numeric-looking ids to int64,
    which used to break str-keyed lookup/replace after a UI restart."""
    store = AnnotationStore(tmp_path / "ann.csv")
    rec = {"dicom_id": "53912345", "sent_id": "7", "checkpoint_name": "m1",
           "prompt": "effusion", "has_good_recall": 2, "has_good_precision": 2,
           "is_intuitive": 3, "is_custom_prompt": False, "no_attn_score": 0.0}
    store.submit(rec)
    store2 = AnnotationStore(tmp_path / "ann.csv")
    assert store2.lookup("53912345", "7", "m1") is not None
    assert store2.annotated_sent_ids("53912345", "m1") == {"7"}
    store2.submit({**rec, "has_good_recall": 5})  # replaces, no duplicate
    assert len(store2.df) == 1
    assert store2.lookup("53912345", "7", "m1")["has_good_recall"] == 5
    # int-typed keys from a caller hit the same row as their str forms
    assert store2.lookup(53912345, 7, "m1") is not None
    store2.delete(53912345, 7, "m1")
    assert len(store2.df) == 0


# ---------------------------------------------------------------------------
# scripted end-to-end drive of interface.main
# ---------------------------------------------------------------------------

class StubSt:
    """Minimal scripted streamlit: canned widget answers, recorded outputs."""

    def __init__(self, answers: dict, clicks: set):
        self.answers = answers
        self.clicks = clicks
        self.images = []
        self.texts = []
        self.sidebar = self

    # outputs
    def title(self, t): self.texts.append(t)
    def subheader(self, t): self.texts.append(t)
    def write(self, x): self.texts.append(x)
    def warning(self, t): self.texts.append(("warning", t))
    def success(self, t): self.texts.append(("success", t))

    def image(self, img, caption=None, **kw):
        self.images.append((np.asarray(img), caption))

    # inputs
    def _get(self, label, default):
        return self.answers.get(label, default)

    def text_input(self, label, value=""): return self._get(label, value)
    def text_area(self, label, value=""): return self._get(label, value)
    def checkbox(self, label, value=False): return self._get(label, value)
    def slider(self, label, *a, **k): return self._get(label, a[-1] if a else 0)
    def number_input(self, label, min_value=0, max_value=0, value=0):
        return self._get(label, value)
    def selectbox(self, label, options): return list(options)[0]
    def radio(self, label, options, format_func=str, key=None, **kw):
        return self._get(label, list(options)[0])
    def button(self, label, on_click=None, disabled=False, **kw):
        if label in self.clicks and on_click is not None and not disabled:
            on_click()
            return True
        return False


@pytest.mark.slow
def test_interface_end_to_end_scripted(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, str(os.path.dirname(os.path.dirname(__file__))))
    import interface
    from test_mimic import make_mirror

    import jax
    import jax.numpy as jnp

    from gloria_tpu.builder import build_gloria_model
    from gloria_tpu.training.checkpoints import CheckpointManager

    # --- synthetic mirror + split csv so get_split('valid') works -------------
    filer, imagenome, records = make_mirror(tmp_path)
    for split in ("train", "valid", "test"):
        split_path = imagenome.get_full_path(f"silver_dataset/splits/{split}.csv")
        os.makedirs(os.path.dirname(split_path), exist_ok=True)
        records.to_csv(split_path, index=False)

    # --- tiny checkpoint zoo ----------------------------------------------------
    model_cfg = Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
                   "vision": {"model_name": "resnet_18"},
                   "text": {"embedding_dim": 32, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 256, "hidden_size": 32,
                                              "num_layers": 1, "num_heads": 4,
                                              "intermediate_size": 64,
                                              "max_position_embeddings": 48}}},
        "data": {"image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half"},
    })
    model = build_gloria_model(model_cfg)
    batch = {
        "imgs": jnp.zeros((1, 64, 64, 3)),
        "caption_ids": jnp.zeros((1, 24), jnp.int32),
        "attention_mask": jnp.ones((1, 24), jnp.int32),
        "token_type_ids": jnp.zeros((1, 24), jnp.int32),
        "word_assignment": jnp.zeros((1, 24, 24)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    manager = CheckpointManager(tmp_path / "zoo" / "run1", save_top_k=1)
    manager.save(dict(variables), step=1, metrics={"val_loss": 1.0}, cfg=model_cfg)

    # --- UI config ---------------------------------------------------------------
    ui_cfg = {
        "phase": "pretrain",
        "model": {"text": {}},
        "data": {"dataset": "imagenome", "group_by": "sentence",
                  "mimic_cxr_download_directory": str(tmp_path / "mimic-cxr"),
                  "imagenome_download_directory": str(tmp_path / "chest-imagenome"),
                  "image": {"imsize": 64}, "text": {"word_num": 24}},
        "transforms": {"norm": "half"},
        "train": {"batch_size": 2, "num_workers": 1},
    }
    cfg_path = tmp_path / "ui.yaml"
    cfg_path.write_text(yaml.safe_dump(ui_cfg))

    monkeypatch.chdir(tmp_path)  # annotations/ CSVs land here
    monkeypatch.setattr(
        "sys.argv",
        ["interface.py", "--config", str(cfg_path),
         "--ckpt_dir", str(tmp_path / "zoo"), "--split", "valid"],
    )

    st = StubSt(
        answers={"Annotator name": "tester", "Anonymize models": False,
                 "Custom Prompt": False, "Bilinear": True,
                 "Show Bounding Boxes": True, "Display Attention": True,
                 "Threshold the heatmap": False},
        clicks={"submit"},
    )
    interface.main(st)

    # an overlay rendered at the letterboxed frame
    assert st.images, "no image rendered"
    img, caption = st.images[0]
    assert img.shape[:2] == (64, 64) and isinstance(caption, str) and caption

    # the submit click wrote a CRUD-keyed annotation row
    df = pd.read_csv(tmp_path / "annotations" / "tester.csv")
    assert len(df) == 1
    row = df.iloc[0]
    assert row.prompt == caption
    assert row.checkpoint_name.startswith("run1/")
    assert 1 <= row.has_good_recall <= 5
    assert np.isfinite(row.no_attn_score)
    assert str(row.dicom_sent_id).startswith("dicom_")
