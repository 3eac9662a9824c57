"""MIMIC-CXR + Chest ImaGenome ingestion, grounding dataset, perturbations.

Equivalent of ``/root/reference/gloria/datasets/mimic_data.py`` (1263 lines):

- :class:`MimicCxrFiler` (:97-426): PhysioNet mirror download (wget with
  credentials), DICOM→cached-array conversion, report text fetch, viewpoint
  metadata, record filters (PA/AP viewpoints, ≥N studies), parallel
  preprocessing (thread pool here — the work is numpy/IO and GIL-releasing,
  so threads replace the reference's ``mp.Pool`` without pickling overhead),
  patient-level splits (:579-589);
- :class:`ImaGenomeFiler` (:603-706): scene-graph zips, split tables, gold
  tables, per-dicom objects pkl cache;
- ``get_objects``/``update_objects`` (:709-779): scene-graph JSON → the
  ``bbox_to_sents`` / ``sent_to_bboxes`` index.  NOTE the reference builds
  silver ``coord_original`` as ``[x1, y1, x2, x2]`` — the y2 slot takes x2
  (:766-767); replicated behind ``fix_coord_bug=False`` for metric parity;
- :class:`ImaGenomeDataset` (:848-1026): grouping by sentence/image/study/
  patient, gold vs silver, and the full fault-injection suite — object
  randomization (random_bboxes / random_sentences / shuffle), left↔right
  word swap, template sentence generation from (condition, context, location)
  triples, condition swapping, and the text-masking hook;
- row selectors (:1067-1075) and :class:`ImaGenomeDataModule` (:1077-1262).

Instances are emitted flat ({'image', 'report', 'bboxes', 'id', ...}) — the
reference's nested patient→study dicts existed to serve Lightning collation
and are not carried over.
"""

from __future__ import annotations

import json
import os
import pickle
import random
import subprocess
import zipfile
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..configs import Config
from .data_module import _PretrainModule
from .text_masking import build_masker


class DownloadError(Exception):
    pass


class PhysioNetFiler:
    """Shared wget-mirror machinery (reference MimicCxrFiler/ImaGenomeFiler)."""

    base_url: str = ""

    def __init__(self, download_directory: str | None = None,
                 physio_username: str | None = None, physio_password: str | None = None):
        self.download_directory = download_directory or os.path.join(os.getcwd(), self.default_dir)
        os.makedirs(self.download_directory, exist_ok=True)
        self.full_download_directory = os.path.join(
            self.download_directory, "physionet.org/files", self.base_url.rstrip("/").split("/files/")[-1]
        )
        self.username = physio_username
        self.password = physio_password

    def get_full_path(self, path: str) -> str:
        return os.path.join(self.full_download_directory, path)

    def download_file(self, relative_path: str = "", force: bool = False, verbose: bool = True) -> None:
        url = os.path.join(self.base_url, relative_path)
        path = self.get_full_path(relative_path)
        if not force and os.path.exists(path):
            return
        if self.username is None or self.password is None:
            raise DownloadError(
                f"{path} missing and no PhysioNet credentials provided "
                f"(set physio_username/physio_password or pre-populate the mirror)"
            )
        cmd = ["wget", "-r", "-N", "-c", "-np", "--user", self.username,
               "--password", self.password, url, "--no-check-certificate"]
        kw = {} if verbose else dict(stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        proc = subprocess.run(cmd, cwd=self.download_directory, **kw)
        if proc.returncode != 0:
            raise DownloadError(f"wget failed for {url}")

    def unzip_file(self, relative_path: str, verbose: bool = True) -> None:
        path = self.get_full_path(relative_path)
        target = path[:-4]
        if os.path.exists(os.path.join(target, "done")):
            return
        with zipfile.ZipFile(path) as zf:
            for member in zf.infolist():
                try:
                    zf.extract(member, os.path.dirname(path))
                except zipfile.error:
                    pass
        os.makedirs(target, exist_ok=True)
        open(os.path.join(target, "done"), "w").close()


class MimicCxrFiler(PhysioNetFiler):
    base_url = "https://physionet.org/files/mimic-cxr/2.0.0"
    default_dir = "mimic-cxr"

    # -- layout -----------------------------------------------------------------
    def dicom_relpath(self, subject_id, study_id, dicom_id) -> str:
        return f"files/p{str(subject_id)[:2]}/p{subject_id}/s{study_id}/{dicom_id}.dcm"

    def report_relpath(self, subject_id, study_id) -> str:
        return f"files/p{str(subject_id)[:2]}/p{subject_id}/s{study_id}.txt"

    def image_cache_path(self, dicom_id) -> str:
        return self.get_full_path(f"image_cache/{dicom_id}.npy")

    # -- access -------------------------------------------------------------------
    def get_report(self, subject_id, study_id) -> str:
        path = self.get_full_path(self.report_relpath(subject_id, study_id))
        if not os.path.exists(path):
            self.download_file(self.report_relpath(subject_id, study_id), verbose=False)
        with open(path, errors="ignore") as fh:
            return fh.read()

    def nifti_path(self, dicom_id) -> str:
        return self.get_full_path(f"nifti_cache/{dicom_id}.nii")

    def save_nifti_from_dicom(self, subject_id, study_id, dicom_id,
                              process_function=None, remove_dicom: bool = False) -> str:
        """DICOM → NIfTI intermediate (reference ``save_nifti_from_dicom``,
        mimic_data.py:167-184); ``process_function`` is the registration hook
        applied to the raw pixel array before serialization."""
        out = self.nifti_path(dicom_id)
        if os.path.exists(out):
            return out
        path = self._fetch_dicom(subject_id, study_id, dicom_id)
        img = self._read_dicom_with_retry(path, subject_id, study_id, dicom_id)
        if process_function is not None:
            img = process_function(img)
        from .nifti import save_nifti

        os.makedirs(os.path.dirname(out), exist_ok=True)
        # preserve the array dtype: decoded DICOMs arrive uint8, but a
        # registration hook may return floats, which a fixed int16 cast
        # would silently truncate (save_nifti handles all common dtypes)
        save_nifti(out, np.asarray(img))
        if remove_dicom and os.path.exists(path):
            os.remove(path)
        return out

    def _fetch_dicom(self, subject_id, study_id, dicom_id) -> str:
        rel = self.dicom_relpath(subject_id, study_id, dicom_id)
        path = self.get_full_path(rel)
        if not os.path.exists(path):
            self.download_file(rel, verbose=False)
        return path

    def _read_dicom_with_retry(self, path, subject_id, study_id, dicom_id) -> np.ndarray:
        """Decode with the reference's corrupt-file recovery
        (mimic_data.py:195-209): on the first decode ValueError, delete the
        file, re-download once, and retry; any further failure propagates."""
        from .image_dataset import read_dicom

        try:
            return read_dicom(path)
        except ValueError:
            if os.path.exists(path):
                os.remove(path)
            rel = self.dicom_relpath(subject_id, study_id, dicom_id)
            self.download_file(rel, verbose=False)
            return read_dicom(path)

    def save_image_from_dicom(self, subject_id, study_id, dicom_id, imsize: int = 512,
                              via_nifti: bool = False, process_function=None) -> str:
        """DICOM → resized uint8 array cache (reference
        ``save_ptimage_from_dicom``, mimic_data.py:193-235 — .npy, not .pt).

        ``via_nifti`` routes through the optional NIfTI(+registration) stage
        (reference ``save_ptimage_from_nifti``, mimic_data.py:214-227)."""
        cache = self.image_cache_path(dicom_id)
        if os.path.exists(cache):
            return cache
        from .transforms import letterbox_resize

        if via_nifti:
            from .nifti import load_nifti

            nii = self.save_nifti_from_dicom(subject_id, study_id, dicom_id,
                                             process_function=process_function)
            img = np.asarray(load_nifti(nii))
            if img.dtype != np.uint8:
                # registration output can be float (and can go negative);
                # min-max normalize to the same uint8 range read_dicom
                # produces so the cache dtype is uniform regardless of
                # ingestion path (abs-rescaling would fold negative values
                # onto positives)
                lo, hi = float(img.min()), float(img.max())
                img = ((img.astype(np.float64) - lo) / max(hi - lo, 1e-8) * 255.0)
                img = np.clip(np.round(img), 0, 255).astype(np.uint8)
        else:
            path = self._fetch_dicom(subject_id, study_id, dicom_id)
            img = self._read_dicom_with_retry(path, subject_id, study_id, dicom_id)
            if process_function is not None:
                img = process_function(img)
        img = letterbox_resize(img, imsize)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.save(cache, img)
        return cache

    def get_image(self, dicom_id) -> np.ndarray:
        return np.load(self.image_cache_path(dicom_id))


# -- record filters (mimic_data.py:264-283) -----------------------------------

class ViewpointFilter:
    def __init__(self, viewpoints=("PA", "AP")):
        self.viewpoints = set(viewpoints)

    def __call__(self, records):
        return records[records.ViewPosition.isin(self.viewpoints)]


class HasGreaterThanNStudies:
    def __init__(self, n: int = 1):
        self.n = n

    def __call__(self, records):
        counts = records.groupby("subject_id").study_id.nunique()
        keep = counts[counts > self.n].index
        return records[records.subject_id.isin(keep)]


def process_records(records, filters=()):
    for f in filters:
        records = f(records)
    return records


def split_subjects(subject_ids, ratios=(0.8, 0.1, 0.1), seed: int = 0):
    """Patient-level split (mimic_data.py:579-589)."""
    rng = np.random.RandomState(seed)
    ids = np.asarray(sorted(set(subject_ids)))
    rng.shuffle(ids)
    n = len(ids)
    n_train = int(n * ratios[0])
    n_valid = int(n * ratios[1])
    return {
        "train": set(ids[:n_train].tolist()),
        "valid": set(ids[n_train : n_train + n_valid].tolist()),
        "test": set(ids[n_train + n_valid :].tolist()),
    }


def prepare_images_parallel(filer: MimicCxrFiler, records, imsize: int = 512,
                            num_workers: int | None = None,
                            via_nifti: bool = False, process_function=None,
                            password_provider=None) -> list[str]:
    """Parallel DICOM→cache conversion (reference mp.Pool.imap,
    mimic_data.py:555-564).

    ``password_provider`` mirrors the reference's retry-on-password-failure
    loop (mimic_data.py:549-567): on a ``DownloadError`` it is called for new
    PhysioNet credentials and the whole pass retries; pass e.g.
    ``lambda: getpass.getpass("physio password: ")`` for interactive use.
    Without a provider the error propagates after the first failure.
    """
    rows = list(records[["subject_id", "study_id", "dicom_id"]].itertuples(index=False))

    def convert(r):
        return filer.save_image_from_dicom(*r, imsize=imsize, via_nifti=via_nifti,
                                           process_function=process_function)

    while True:
        try:
            with ThreadPoolExecutor(num_workers or os.cpu_count()) as pool:
                return list(pool.map(convert, rows))
        except DownloadError:
            if password_provider is None:
                raise
            filer.password = password_provider()


class ImaGenomeFiler(PhysioNetFiler):
    base_url = "https://physionet.org/files/chest-imagenome/1.0.0"
    default_dir = "chest-imagenome"

    def get_split(self, split: str):
        import pandas as pd

        if split in ("train", "valid", "test"):
            return pd.read_csv(self.get_full_path(f"silver_dataset/splits/{split}.csv"))
        if split == "gold":
            return pd.read_csv(self.get_full_path("silver_dataset/splits/images_to_avoid.csv"))
        raise ValueError(split)

    def get_gold_file(self, file: str):
        import pandas as pd

        if not file.endswith(".txt"):
            raise ValueError(file)
        return pd.read_csv(self.get_full_path(os.path.join("gold_dataset", file)), sep="\t")

    def get_silver_scene_graph_json_file(self, dicom_id) -> str:
        return self.get_full_path(f"silver_dataset/scene_graph/{dicom_id}_SceneGraph.json")

    def get_silver_scene_graph_json(self, dicom_id) -> dict:
        with open(self.get_silver_scene_graph_json_file(dicom_id)) as fh:
            return json.load(fh)

    def get_objects_file(self, dicom_id) -> str:
        return self.get_full_path(f"objects/{dicom_id}.pkl")

    def save_objects(self, obj, dicom_id) -> None:
        path = self.get_objects_file(dicom_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            pickle.dump(obj, fh)

    def get_objects(self, dicom_id) -> dict:
        with open(self.get_objects_file(dicom_id), "rb") as fh:
            return pickle.load(fh)

    def has_objects(self, dicom_id) -> bool:
        return os.path.exists(self.get_objects_file(dicom_id))


# ---------------------------------------------------------------------------
# Scene graph → objects index
# ---------------------------------------------------------------------------

def update_objects(objects, bbox, coord_original, sentence_id, sentence, label, context):
    sent_info = objects["bbox_to_sents"].setdefault(bbox, {
        "coord_original": coord_original, "sentence_ids": [], "sentences": [],
        "labels": [], "contexts": [],
    })
    sent_info["sentence_ids"].append(sentence_id)
    sent_info["sentences"].append(sentence)
    sent_info["labels"].append(label)
    sent_info["contexts"].append(context)
    bbox_info = objects["sent_to_bboxes"].setdefault(sentence_id, {
        "sentence": sentence, "bboxes": [], "coords_original": [],
        "labels": [], "contexts": [],
    })
    bbox_info["bboxes"].append(bbox)
    bbox_info["coords_original"].append(coord_original)
    bbox_info["labels"].append(label)
    bbox_info["contexts"].append(context)


def get_objects(dicom_id, gold: bool, gold_objects_df=None, imagenome_filer=None,
                fix_coord_bug: bool = False) -> dict:
    """Reference ``get_objects`` (mimic_data.py:738-779)."""
    objects = {"bbox_to_sents": {}, "sent_to_bboxes": {}}
    if gold:
        assert gold_objects_df is not None
        rows = gold_objects_df[gold_objects_df.image_id.str.replace(".dcm", "", regex=False) == dicom_id]
        for _, row in rows.iterrows():
            coord = row.coord_original
            if isinstance(coord, str):
                coord = json.loads(coord.replace("(", "[").replace(")", "]"))
            update_objects(objects, bbox=row.bbox, coord_original=coord,
                           sentence_id=row.row_id, sentence=row.sentence,
                           label=row.label_name, context=row.context)
        return objects

    assert imagenome_filer is not None
    if not os.path.exists(imagenome_filer.get_silver_scene_graph_json_file(dicom_id)):
        return objects
    scene_graph = imagenome_filer.get_silver_scene_graph_json(dicom_id)
    temp_objects = {obj["object_id"]: obj for obj in scene_graph["objects"]}
    for bbox_attributes in scene_graph["attributes"]:
        if bbox_attributes["object_id"] not in temp_objects:
            continue
        obj = temp_objects[bbox_attributes["object_id"]]
        y2 = obj["original_y2"] if fix_coord_bug else obj["original_x2"]  # reference wart :766-767
        coord_original = [obj["original_x1"], obj["original_y1"], obj["original_x2"], y2]
        for sentence_id, sentence, sentence_attributes in zip(
                bbox_attributes["phrase_IDs"], bbox_attributes["phrases"], bbox_attributes["attributes"]):
            for attribute in sentence_attributes:
                _, context, label = attribute.split("|")
                update_objects(objects, bbox=obj["bbox_name"], coord_original=coord_original,
                               sentence_id=sentence_id, sentence=sentence, label=label, context=context)
    return objects


def save_and_get_all_location_condition_pairs(dataset, filename) -> dict:
    """(condition,context) ↔ location-set index for condition swapping
    (mimic_data.py:783-813)."""
    if os.path.exists(filename):
        with open(filename, "rb") as fh:
            return pickle.load(fh)
    pairs = {"location_to_condition": {}, "condition_to_location": {}}
    for i in range(len(dataset)):
        inst = dataset[i]
        for _sid, v in inst["objects"]["sent_to_bboxes"].items():
            sent_cond_to_locs: dict = {}
            for label, context, bbox in zip(v["labels"], v["contexts"], v["bboxes"]):
                sent_cond_to_locs.setdefault((label, context), set()).add(bbox)
            for (label, context), bboxes in sent_cond_to_locs.items():
                key = tuple(sorted(bboxes))
                pairs["condition_to_location"].setdefault((label, context), set()).add(key)
                pairs["location_to_condition"].setdefault(key, set()).add((label, context))
    with open(filename, "wb") as fh:
        pickle.dump(pairs, fh)
    return pairs


class GenerateContextLocationConditionSentences:
    """Template sentences from (condition, context, location) triples
    (mimic_data.py:816-845), including the left/right → plural merge."""

    def __call__(self, conditions, contexts, locations) -> str:
        condition_to_locations: dict = {}
        for context, loc, condition in zip(contexts, locations, conditions):
            condition_to_locations.setdefault(condition, [])
            if context == "yes":
                condition_to_locations[condition].append(loc)
        sentence = ""
        for cond, locs in condition_to_locations.items():
            new_locs = set()
            for loc in locs:
                if ("left" in loc and loc.replace("left", "right") in locs) or \
                   ("right" in loc and loc.replace("right", "left") in locs):
                    new_locs.add(loc.replace("left ", "").replace("right ", "") + "s")
                else:
                    new_locs.add(loc)
            new_locs = list(new_locs)
            if len(locs) == 0:
                sentence += " There is no " + cond + "."
            else:
                if len(new_locs) > 2:
                    loclist = ", ".join(new_locs[:-1]) + ", and " + new_locs[-1]
                else:
                    loclist = " and ".join(new_locs)
                if cond in ("normal", "abnormal"):
                    sentence += " The " + loclist + (" are " if len(locs) > 1 else " is ") + cond + "."
                else:
                    sentence += " There is " + cond + " in the " + loclist + "."
        return sentence.strip()


def swap_left_right_words(sentence: str) -> str:
    """left↔right token swap (mimic_data.py:1012-1017)."""
    return (sentence.lower()
            .replace("right", "right*****")
            .replace("left", "right")
            .replace("right*****", "left"))


# -- row selectors (mimic_data.py:1067-1075, visualization_utils.py:379-423) --

def get_ent_to_bbox(sent_labels, sent_contexts, sent_bbox_names) -> dict:
    out: dict = {}
    for label, context, bbox in zip(sent_labels, sent_contexts, sent_bbox_names):
        out.setdefault((label, context), set()).add(bbox)
    return out


class RowContainsOrDoesNotContainSelector:
    def __init__(self, contains=None, does_not_contain=None, only_contains=False):
        assert contains is not None or does_not_contain is not None
        if only_contains:
            assert does_not_contain is None
        self.contains = set(contains) if contains is not None else None
        self.does_not_contain = set(does_not_contain) if does_not_contain is not None else None
        self.only_contains = only_contains

    def get_row_set(self, row):
        raise NotImplementedError

    def __call__(self, row) -> bool:
        row_set = self.get_row_set(row)
        if self.only_contains:
            return self.contains == row_set
        ok = True
        if self.contains is not None:
            ok = ok and len(self.contains - row_set) == 0
        if self.does_not_contain is not None:
            ok = ok and len(row_set - self.does_not_contain) == len(row_set)
        return ok


class RowLabelAndContextSelector(RowContainsOrDoesNotContainSelector):
    def get_row_set(self, row):
        import ast

        return set(get_ent_to_bbox(ast.literal_eval(row["sent_labels"]),
                                   ast.literal_eval(row["sent_contexts"]),
                                   ast.literal_eval(row["bbox_names"])).keys())


class RowBBoxSelector(RowContainsOrDoesNotContainSelector):
    def get_row_set(self, row):
        import ast

        return set(ast.literal_eval(row["bbox_names"]))


class OrSelector:
    def __init__(self, *selectors):
        self.selectors = selectors

    def __call__(self, row) -> bool:
        return any(sel(row) for sel in self.selectors)


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

class ImaGenomeDataset:
    """Grounding dataset over cached MIMIC-CXR images + ImaGenome objects.

    ``records``: DataFrame with subject_id/study_id/dicom_id rows.
    ``sentences_df`` (for group_by='sentence'): rows with dicom_id/sent_id.
    Emits flat instances: image, report (the sentence or full report), the
    sentence's original-space bboxes, plus the full objects dict.
    """

    def __init__(self, records, mimic_cxr_filer: MimicCxrFiler, imagenome_filer: ImaGenomeFiler,
                 group_by: str = "sentence", gold: bool = False,
                 randomize_reports: bool = False, randomize_objects_mode: str | None = None,
                 sentences_df=None, sentence_selector=None,
                 swap_left_right: bool = False, generate_sent: bool = False,
                 swap_conditions: bool = False, valid_locations_conditions=None,
                 text_masker=None, prob_of_masking: float = 0.5,
                 num_rand_sent: int | None = None, rng: random.Random | None = None,
                 fix_coord_bug: bool = False):
        self.records = records.reset_index(drop=True)
        self.filer = mimic_cxr_filer
        self.imagenome = imagenome_filer
        self.group_by_sentence = group_by == "sentence"
        self.group_by = group_by
        self.gold = gold
        self.gold_objects_df = (
            imagenome_filer.get_gold_file("gold_object_attribute_with_coordinates.txt") if gold else None
        )
        self.randomize_objects_mode = randomize_objects_mode
        self.sentences_df = sentences_df
        if self.group_by_sentence:
            assert sentences_df is not None
            if sentence_selector is not None:
                self.sentences_df = self.sentences_df[self.sentences_df.apply(sentence_selector, axis=1)]
            if num_rand_sent is not None:
                self.sentences_df = self.sentences_df.sample(num_rand_sent, random_state=0)
            self.sentences_df = self.sentences_df.reset_index(drop=True)
        self.swap_left_right = swap_left_right
        self.generate_sent = generate_sent
        self.sentence_generator = GenerateContextLocationConditionSentences() if generate_sent else None
        self.swap_conditions = swap_conditions
        self.valid_locations_conditions = valid_locations_conditions
        if swap_conditions:
            assert generate_sent and valid_locations_conditions is not None
        self.randomize_reports = randomize_reports
        self.text_masker = text_masker
        self.prob_of_masking = prob_of_masking
        self.rng = rng or random.Random(0)
        self.fix_coord_bug = fix_coord_bug

    def __len__(self) -> int:
        if self.group_by_sentence:
            return len(self.sentences_df)
        if self.group_by == "image":
            return len(self.records)
        return self.records[{"study": "study_id", "patient": "subject_id"}[self.group_by]].nunique()

    def _objects_for(self, dicom_id) -> dict:
        if self.imagenome.has_objects(dicom_id):
            objects = self.imagenome.get_objects(dicom_id)
        else:
            objects = get_objects(dicom_id, self.gold, self.gold_objects_df,
                                  self.imagenome, fix_coord_bug=self.fix_coord_bug)
            try:
                self.imagenome.save_objects(objects, dicom_id)
            except OSError:
                pass
        if self.randomize_objects_mode is not None:
            objects = self.randomize_objects(objects, dicom_id, self.randomize_objects_mode)
        return objects

    # -- object randomization (mimic_data.py:896-945) ----------------------
    def get_negative_parts_for_objects(self, objects, get_external_negatives: bool,
                                       part_type: str, dicom_id=None) -> list[dict]:
        assert part_type in ("sentence", "bbox")
        neg_parts: list[dict] = []
        while len(neg_parts) < len(objects["sent_to_bboxes"]):
            if get_external_negatives:
                other = self.records[self.records.dicom_id != dicom_id]
                neg_row = other.iloc[self.rng.randrange(len(other))]
                neg_objects = get_objects(neg_row.dicom_id, self.gold, self.gold_objects_df,
                                          self.imagenome, fix_coord_bug=self.fix_coord_bug)
                if not neg_objects["sent_to_bboxes"]:
                    continue
            else:
                neg_objects = objects
            for sentence_id, obj in neg_objects["sent_to_bboxes"].items():
                part = ({k: v for k, v in obj.items() if k != "sentence"}
                        if part_type == "bbox" else {"sentence": obj["sentence"]})
                part["original_sentence_id"] = sentence_id
                part["part_randomized"] = part_type
                neg_parts.append(part)
        neg_parts = neg_parts[: len(objects["sent_to_bboxes"])]
        self.rng.shuffle(neg_parts)
        return neg_parts

    def randomize_objects(self, objects, dicom_id=None, mode: str = "random_sentences") -> dict:
        assert mode in ("random_bboxes", "random_sentences", "shuffle_bboxes_sentences", "shuffle")
        if mode == "shuffle":
            mode = "shuffle_bboxes_sentences"
        part_type = "sentence" if mode == "random_sentences" else "bbox"
        external = mode != "shuffle_bboxes_sentences"
        neg_parts = self.get_negative_parts_for_objects(objects, external, part_type, dicom_id)
        new_objects = {"bbox_to_sents": {}, "sent_to_bboxes": {}, "mode": mode}
        for (sentence_id, original), neg in zip(objects["sent_to_bboxes"].items(), neg_parts):
            new_value = dict(original)
            new_value.update(neg)
            for bbox, coord, label, context in zip(
                    new_value["bboxes"], new_value["coords_original"],
                    new_value["labels"], new_value["contexts"]):
                update_objects(new_objects, bbox, coord, sentence_id, new_value["sentence"], label, context)
            new_objects["sent_to_bboxes"][sentence_id].update(new_value)
        return new_objects

    # -- item assembly ---------------------------------------------------------
    def __getitem__(self, item: int) -> dict:
        if self.group_by_sentence:
            row = self.sentences_df.iloc[item]
            sent_id, dicom_id = row.sent_id, row.dicom_id
            rec = self.records[self.records.dicom_id == dicom_id].iloc[0]
        else:
            sent_id = None
            rec = self.records.iloc[item]
            dicom_id = rec.dicom_id

        image = self.filer.get_image(dicom_id)
        objects = self._objects_for(dicom_id)

        if sent_id is not None:
            sent_info = objects["sent_to_bboxes"][sent_id]
            if self.generate_sent:
                labels, contexts, bboxes = sent_info["labels"], sent_info["contexts"], sent_info["bboxes"]
                if self.swap_conditions:
                    labels, contexts, bboxes = self.get_swapped_conditions(labels, contexts, bboxes)
                text = self.sentence_generator(labels, contexts, bboxes)
            else:
                text = sent_info["sentence"]
                if self.swap_left_right:
                    text = swap_left_right_words(text)
            bboxes_coords = sent_info["coords_original"]
        else:
            text = self.filer.get_report(rec.subject_id, rec.study_id)
            if self.randomize_reports:
                neg = self.records.iloc[self.rng.randrange(len(self.records))]
                text = self.filer.get_report(neg.subject_id, neg.study_id)
            bboxes_coords = []

        if self.text_masker is not None and (
                self.prob_of_masking == 1 or self.rng.random() < self.prob_of_masking):
            text = self.text_masker(text)

        return {
            "image": image,
            "report": text,
            "bboxes": bboxes_coords,
            "id": f"dicom_{dicom_id}_sent_{sent_id}" if sent_id is not None else str(dicom_id),
            "objects": objects,
            "sent_id": sent_id,
            "index": item,
        }

    def get_swapped_conditions(self, labels, contexts, bboxes):
        """(mimic_data.py:967-986)"""
        condition_to_locations: dict = {}
        for label, context, bbox in zip(labels, contexts, bboxes):
            condition_to_locations.setdefault((label, context), set()).add(bbox)
        new_labels, new_contexts, new_bboxes = [], [], []
        for (label, context), bbox_set in condition_to_locations.items():
            key = tuple(sorted(bbox_set))
            potential = self.valid_locations_conditions["location_to_condition"].get(key, set())
            potential = list(potential.difference(condition_to_locations.keys()))
            if potential:
                self.rng.shuffle(potential)
                label, context = potential[0]
            for bbox in key:
                new_labels.append(label)
                new_contexts.append(context)
                new_bboxes.append(bbox)
        return new_labels, new_contexts, new_bboxes


def build_sentences_df(records, imagenome_filer: ImaGenomeFiler, gold: bool = False,
                       gold_objects_df=None, fix_coord_bug: bool = False):
    """Per-split *_sentences.csv builder (reference prepare_data,
    mimic_data.py:1196-1215): one row per (dicom, sentence) with bbox names,
    labels, contexts."""
    import pandas as pd

    rows = []
    for rec in records.itertuples(index=False):
        objects = get_objects(rec.dicom_id, gold, gold_objects_df, imagenome_filer,
                              fix_coord_bug=fix_coord_bug)
        for sent_id, info in objects["sent_to_bboxes"].items():
            rows.append({
                "dicom_id": rec.dicom_id,
                "subject_id": rec.subject_id,
                "study_id": rec.study_id,
                "sent_id": sent_id,
                "sentence": info["sentence"],
                "bbox_names": repr(info["bboxes"]),
                "sent_labels": repr(info["labels"]),
                "sent_contexts": repr(info["contexts"]),
                "bboxes": repr(info["coords_original"]),
            })
    return pd.DataFrame(rows)


class ImaGenomeDataModule(_PretrainModule):
    """cfg-driven module (reference ImaGenomeDataModule + wrapper,
    data_module.py:62-98, mimic_data.py:1077-1262)."""

    def __init__(self, cfg: Config, to_device=None,
                 mimic_cxr_filer: MimicCxrFiler | None = None,
                 imagenome_filer: ImaGenomeFiler | None = None,
                 records=None, sentences: dict | None = None):
        data = cfg.data or Config()
        self.filer = mimic_cxr_filer or MimicCxrFiler(data.mimic_cxr_download_directory)
        self.imagenome = imagenome_filer or ImaGenomeFiler(data.imagenome_download_directory)
        self._records = records
        self._sentences = sentences or {}
        super().__init__(cfg, to_device=to_device)

    def records(self, split: str):
        if self._records is not None:
            return self._records[split] if isinstance(self._records, dict) else self._records
        df = self.imagenome.get_split(split if split != "test" or not self.cfg.data.gold_test else "gold")
        return df

    def dataset(self, split: str) -> ImaGenomeDataset:
        data = self.cfg.data or Config()
        gold = bool(data.gold_test) and split == "test"
        records = self.records(split)
        sentences_df = self._sentences.get(split)
        if sentences_df is None and (data.group_by or "sentence") == "sentence":
            gold_df = self.imagenome.get_gold_file("gold_object_attribute_with_coordinates.txt") if gold else None
            sentences_df = build_sentences_df(records, self.imagenome, gold, gold_df)
        masker = None
        if data.mask_mode:
            masker = build_masker(data.mask_mode, mask_prob=float(data.mask_prob or 0.15))
        return ImaGenomeDataset(
            records, self.filer, self.imagenome,
            group_by=data.group_by or "sentence",
            gold=gold,
            randomize_reports=bool(data.randomize_reports),
            randomize_objects_mode=data.randomize_objects_mode,
            sentences_df=sentences_df,
            swap_left_right=bool(data.swap_left_right),
            generate_sent=bool(data.generate_sent),
            swap_conditions=bool(data.swap_conditions),
            valid_locations_conditions=None if not data.swap_conditions else
                save_and_get_all_location_condition_pairs(
                    self.dataset_without_perturbations(split),
                    self.imagenome.get_full_path("location_condition_pairs.pkl")),
            text_masker=masker,
            prob_of_masking=float(data.prob_of_masking or 0.5),
            rng=random.Random(int(self.cfg.random_seed or 0)),
        )

    def dataset_without_perturbations(self, split: str) -> ImaGenomeDataset:
        records = self.records(split)
        gold = bool(self.cfg.data.gold_test) and split == "test"
        gold_df = self.imagenome.get_gold_file("gold_object_attribute_with_coordinates.txt") if gold else None
        return ImaGenomeDataset(
            records, self.filer, self.imagenome, group_by="sentence", gold=gold,
            sentences_df=build_sentences_df(records, self.imagenome, gold, gold_df),
        )

    def get_dataset(self, split: str) -> ImaGenomeDataset:  # reference naming
        return self.dataset(split)
