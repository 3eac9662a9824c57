"""Streamlit annotation UI for word-region attention inspection.

Equivalent of the reference ``interface.py`` (398 lines): loads a checkpoint
zoo, an ImaGenome val/gold dataset, lets the annotator pick an instance and a
report sentence (or type a custom prompt), renders the attention heatmap
(bilinear or pyramid overlay) with the SELECTED SENTENCE's bounding boxes
re-projected into processed-image coordinates (reference ``get_bboxes`` over
``sent_to_bboxes[...].coords_original``, interface.py:362-368), thresholds
the heatmap, and records the three 1-5 scale annotations with CRUD semantics
(reference ``OnSubmit``/``OnDelete``, interface.py:84-111) plus the no-attn
score; models can be anonymized (checkpoint column hidden from the
all-annotations view, interface.py:392-397).

The UI layer is thin: all sentence/bbox/CRUD logic lives in
``gloria_tpu.utils.annotation`` and is unit-tested without streamlit.  For
testing, ``main(st)`` accepts a stub streamlit module.

Run:  streamlit run interface.py -- --config configs/imagenome_pretrain_val_config.yaml
"""

from __future__ import annotations

import argparse
import hashlib
from pathlib import Path

import numpy as np

from gloria_tpu import api
from gloria_tpu.configs import Config, load_config
from gloria_tpu.utils.annotation import (
    ANNOTATION_COLUMNS,
    QUESTION_SCALE,
    QUESTIONS,
    AnnotationStore,
    project_bboxes,
    sentence_infos,
)
from gloria_tpu.utils.viz import draw_bounding_boxes, get_attn_overlay, heatmap_overlay

ANNOTATION_DIR = Path("annotations")


def load_models(ckpt_dir: str) -> dict[str, str]:
    """Checkpoint zoo: every checkpoint directory under ckpt_dir
    (reference interface.py:28-44)."""
    zoo = {}
    for p in sorted(Path(ckpt_dir).glob("**/manifest.json")):
        for entry_dir in p.parent.iterdir():
            if entry_dir.is_dir():
                zoo[f"{p.parent.name}/{entry_dir.name}"] = str(entry_dir)
    return zoo


def get_attention(model, image: np.ndarray, prompt: str, mode: str = "upsample",
                  target: tuple[int, int] | None = None):
    """Single (image, prompt) pair → (word-mean overlay, no_attn_score)
    (reference get_attention, interface.py:317-334)."""
    imgs = model.process_img([image])
    txts = model.process_text([prompt])
    img_l, _, txt_l, _ = model.encode(imgs, txts)
    attn = np.asarray(model.get_attn_maps(img_l, txt_l, txts["cap_lens"]))[0]
    L = int(txts["cap_lens"][0])
    mean_attn = attn[:L].mean(0)
    no_attn_score = float(1.0 - mean_attn.sum())
    side = int(round(mean_attn.shape[-1] ** 0.5))
    target = target or (imgs.shape[1], imgs.shape[2])
    return get_attn_overlay(mean_attn.reshape(side, side), target, mode), no_attn_score


def main(st=None) -> None:
    if st is None:
        try:
            import streamlit as st
        except ImportError as exc:  # streamlit is not baked into every image
            raise SystemExit(
                "streamlit is required for the annotation UI: pip install streamlit"
            ) from exc

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/imagenome_pretrain_val_config.yaml")
    parser.add_argument("--ckpt_dir", default="./data/ckpt")
    parser.add_argument("--split", default="valid")
    args, _ = parser.parse_known_args()

    st.title("Word-region attention annotation")
    annotator = st.sidebar.text_input("Annotator name", value="anonymous")
    anonymize = st.sidebar.checkbox("Anonymize models", value=True)

    zoo = load_models(args.ckpt_dir)
    if not zoo:
        st.warning(f"No checkpoints found under {args.ckpt_dir}")
        return
    names = sorted(zoo)
    display = (
        {f"model_{hashlib.sha1(n.encode()).hexdigest()[:6]}": n for n in names}
        if anonymize else {n: n for n in names}
    )
    model_key = st.sidebar.selectbox("Model", sorted(display))
    checkpoint_name = display[model_key]
    model = api.load_gloria(zoo[checkpoint_name])

    from gloria_tpu.data.data_module import build_data_module

    cfg = load_config(args.config)
    dm = build_data_module(cfg)
    dataset = dm.dataset(args.split)
    idx = st.sidebar.number_input("Instance", min_value=0, max_value=len(dataset) - 1, value=0)
    instance = dataset[int(idx)]
    image = np.asarray(instance["image"])
    dicom_id = str(instance.get("dicom_id") or instance.get("id", idx))

    store = AnnotationStore(ANNOTATION_DIR / f"{annotator}.csv") if annotator else None

    # -- prompt: report sentence (with its own boxes) or custom ---------------
    infos = sentence_infos(instance)
    annotated = store.annotated_sent_ids(dicom_id, checkpoint_name) if store else set()
    use_custom = st.checkbox("Custom Prompt")
    sent_id = st.radio(
        "Report Sentences", list(infos),
        format_func=lambda k: infos[k]["sentence"] + (" (annotated)" if k in annotated else ""),
        key=f"report sentences {dicom_id}",
    )
    if use_custom:
        prompt = st.text_area("Enter text prompt here.")
        if store and prompt:
            sent_id = store.custom_sent_id(dicom_id, prompt)
    else:
        prompt = infos[sent_id]["sentence"]

    mode = "upsample" if st.checkbox("Bilinear", value=True) else "pyramid"
    show_boxes = st.checkbox("Show Bounding Boxes", value=True)
    display_attn = st.checkbox("Display Attention", value=True)

    # everything renders in the letterboxed imsize frame so attention maps,
    # bounding boxes, and pixels share one coordinate space
    from gloria_tpu.data.transforms import letterbox_resize, to_rgb

    imsize = int(cfg.data.image.imsize or 256) if cfg.data and cfg.data.image else 256
    disp = image
    if disp.dtype != np.uint8:
        lo, hi = float(disp.min()), float(disp.max())
        disp = ((disp - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8)
    rendered = letterbox_resize(to_rgb(disp), imsize)

    no_attn_score = None
    if prompt and display_attn:
        overlay, no_attn_score = get_attention(model, image, prompt, mode,
                                               target=(imsize, imsize))
        norm = (overlay - overlay.min()) / (overlay.max() - overlay.min() + 1e-8)
        if st.checkbox("Threshold the heatmap"):
            threshold = st.slider("threshold", 0.0, 1.0, 0.01)
            norm = (norm > threshold).astype(np.float32)
        rendered = heatmap_overlay(rendered, norm)

    if show_boxes:
        # the SELECTED sentence's boxes, re-projected like training labels
        coords = infos.get(sent_id, {}).get("coords_original") or []
        boxes = project_bboxes(image.shape[:2], coords, imsize)
        rendered = draw_bounding_boxes(rendered, boxes, color=(0, 150, 0))
    st.image(rendered, caption=prompt, use_container_width=True)

    # -- annotation CRUD --------------------------------------------------------
    if store is not None:
        st.subheader("Annotate")
        existing = store.lookup(dicom_id, sent_id, checkpoint_name)
        if existing:
            st.write("Current annotation:")
            for col in ("has_good_recall", "has_good_precision", "is_intuitive"):
                st.write(f"{col}: {existing[col]}")
            st.button("delete", on_click=lambda: store.delete(dicom_id, sent_id, checkpoint_name))
        answers = {}
        for col, question in QUESTIONS.items():
            fmt = (lambda x: QUESTION_SCALE[x]) if col != "is_intuitive" else None
            answers[col] = st.radio(
                question, options=[1, 2, 3, 4, 5], format_func=fmt or str,
                key=f"{col} {dicom_id} {sent_id} {checkpoint_name}",
            )
        record = {
            "dicom_id": dicom_id, "sent_id": sent_id,
            "checkpoint_name": checkpoint_name, "prompt": prompt,
            "is_custom_prompt": bool(use_custom), "no_attn_score": no_attn_score,
            **answers,
        }
        st.button("submit", on_click=lambda: store.submit(record), disabled=prompt == "")

        st.subheader("All Annotations")
        st.write(store.view(anonymize=anonymize))


if __name__ == "__main__":
    main()
