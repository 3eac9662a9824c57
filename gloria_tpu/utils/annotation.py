"""Annotation-UI core logic (streamlit-free, unit-testable).

The reference Streamlit app (``/root/reference/interface.py``) mixes its
sentence→bbox plumbing and annotation CRUD into the page script; here those
parts live in plain functions so the UI layer (``interface.py``) stays thin
and the behavior is testable without streamlit:

- per-sentence bounding boxes come from the instance's
  ``objects.sent_to_bboxes[sent_id].coords_original`` and are re-projected
  into processed-image coordinates exactly like training labels
  (reference ``process_bboxes`` → ``get_bboxes``, interface.py:16-25,362-368);
- annotations are keyed by (dicom_id, sent_id, checkpoint_name); submitting
  replaces any existing row, deletion removes it (reference
  ``OnSubmit``/``OnDelete``, interface.py:84-111);
- custom prompts get stable ``custom<N>`` sentence ids per dicom, reusing the
  id when the same prompt text was annotated before (interface.py:268-275).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from ..data.collate import bbox_to_mask, mask_to_bbox
from ..data.transforms import letterbox_resize

ANNOTATION_COLUMNS = [
    "dicom_sent_id", "dicom_id", "sent_id", "checkpoint_name", "prompt",
    "has_good_recall", "has_good_precision", "is_intuitive",
    "is_custom_prompt", "no_attn_score",
]

QUESTION_SCALE = {1: "0-20", 2: "20-40", 3: "40-60", 4: "60-80", 5: "80-100"}
QUESTIONS = {
    "has_good_recall": "The heatmap includes what percentage of the region of interest from the prompt?",
    "has_good_precision": "What percentage of the heatmap represents an area of interest?",
    "is_intuitive": "Rate how intuitive the heatmap is on a scale from 1-5 (1 being the worst, 5 being the best).",
}


def sentence_infos(instance: dict) -> dict[str, dict]:
    """sent_id → {sentence, coords_original} for the instance; falls back to
    the whole report (no boxes) when scene-graph objects are absent."""
    objects = instance.get("objects") or {}
    infos = objects.get("sent_to_bboxes") or {}
    if infos:
        return {sid: {"sentence": v["sentence"],
                      "coords_original": list(v.get("coords_original") or [])}
                for sid, v in infos.items()}
    return {"report": {"sentence": instance.get("report", ""),
                       "coords_original": list(instance.get("bboxes") or [])}}


def project_bboxes(original_shape: tuple[int, int], bboxes: list,
                   imsize: int, crop: int | None = None) -> list[list[float]]:
    """Original-pixel bboxes → processed-image coordinates via the same
    mask→letterbox→crop→re-box path the training labels use
    (reference ``process_bboxes``, interface.py:16-25)."""
    crop = crop or imsize
    out = []
    for bbox in bboxes:
        mask = bbox_to_mask(bbox, original_shape)
        mask = letterbox_resize((mask * 255).astype(np.uint8), imsize)
        if crop != imsize:
            off = (imsize - crop) // 2
            mask = mask[off : off + crop, off : off + crop]
        box = mask_to_bbox((mask > 127).astype(np.float32))
        if box is not None:
            out.append(box)
    return out


class AnnotationStore:
    """CSV-backed annotation CRUD with the reference's row schema."""

    # key columns are always compared as strings: read_csv would otherwise
    # coerce numeric-looking dicom/sent ids to int64 and make reloaded
    # stores miss lookups against the str keys the UI passes
    _KEY_COLS = ("dicom_id", "sent_id", "checkpoint_name")

    def __init__(self, path: str | Path):
        self.path = Path(path)
        if self.path.exists():
            self.df = pd.read_csv(self.path, dtype={c: str for c in self._KEY_COLS})
            for col in ANNOTATION_COLUMNS:
                if col not in self.df.columns:
                    self.df[col] = np.nan
        else:
            self.df = pd.DataFrame(columns=ANNOTATION_COLUMNS)

    # -- queries ----------------------------------------------------------------
    def _key_mask(self, dicom_id, sent_id, checkpoint_name):
        return ((self.df.dicom_id.astype(str) == str(dicom_id))
                & (self.df.sent_id.astype(str) == str(sent_id))
                & (self.df.checkpoint_name.astype(str) == str(checkpoint_name)))

    def lookup(self, dicom_id, sent_id, checkpoint_name) -> dict | None:
        rows = self.df[self._key_mask(dicom_id, sent_id, checkpoint_name)]
        return rows.iloc[0].to_dict() if len(rows) else None

    def annotated_sent_ids(self, dicom_id, checkpoint_name) -> set:
        rows = self.df[(self.df.dicom_id.astype(str) == str(dicom_id))
                       & (self.df.checkpoint_name.astype(str) == str(checkpoint_name))]
        return {str(s) for s in rows.sent_id}

    def custom_sent_id(self, dicom_id, prompt: str) -> str:
        """Reuse the id of a previously-annotated identical custom prompt,
        else mint custom<N> (reference interface.py:268-275)."""
        rows = self.df[(self.df.dicom_id.astype(str) == str(dicom_id))
                       & (self.df.is_custom_prompt.fillna(False).astype(bool))]
        same = rows[rows.prompt == prompt]
        if len(same):
            return str(same.iloc[0].sent_id)
        ints = [int(str(s)[6:]) for s in rows.sent_id if str(s).startswith("custom")]
        return f"custom{max(ints) + 1 if ints else 0}"

    # -- mutations ---------------------------------------------------------------
    def submit(self, record: dict) -> None:
        record = {**record,
                  **{c: str(record[c]) for c in self._KEY_COLS if c in record}}
        mask = self._key_mask(record["dicom_id"], record["sent_id"],
                              record["checkpoint_name"])
        self.df = self.df[~mask]
        record = {"dicom_sent_id": f"dicom_{record['dicom_id']}_sent_{record['sent_id']}",
                  **record}
        self.df = pd.concat([self.df, pd.DataFrame([record])], ignore_index=True)
        self._save()

    def delete(self, dicom_id, sent_id, checkpoint_name) -> None:
        self.df = self.df[~self._key_mask(dicom_id, sent_id, checkpoint_name)]
        self._save()

    def _save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.df.to_csv(self.path, index=False)

    def view(self, anonymize: bool = False) -> pd.DataFrame:
        """All annotations; anonymized view drops the checkpoint column
        (reference interface.py:392-397)."""
        if anonymize and "checkpoint_name" in self.df.columns:
            return self.df.drop(columns=["checkpoint_name"])
        return self.df
