"""Zero-shot CheXpert 5×200 evaluation — the framework's parity benchmark.

Drives the reference's zero-shot protocol end to end
(``/root/reference/gloria/gloria.py:240-306`` + the 5×200 benchmark built by
``preprocess_datasets.py:105-140``): sample 5 prompts per competition class
from the severity×subtype×location grammar, score every image against every
class with mean(local, global) similarity, max over prompts, z-normalize
across classes, and report accuracy + per-class AUROC.

    python -m gloria_tpu.evaluation --ckpt <dir-or-.ckpt> [--csv <5x200.csv>]
                                    [--devices N [--fsdp F --tp T]]

``--devices N`` runs the evaluation data-parallel over an N-chip mesh
(image batches sharded over the ``data`` axis, prompts and parameters
replicated/TP-sharded per ``parallel.mesh`` rules) — the reference evaluates
on one GPU only.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from . import constants
from .api import GloriaModel, generate_chexpert_class_prompts, load_gloria


def evaluate_zero_shot(
    model: GloriaModel,
    image_paths: list,
    labels: np.ndarray,           # [N, C] one-hot over class_names
    class_names: list[str],
    n_prompts: int = 5,
    batch_size: int = 64,
) -> dict:
    """Returns accuracy + per-class AUROC of the z-normalized class scores."""
    prompts = generate_chexpert_class_prompts(n=n_prompts)
    prompts = {c: prompts[c] for c in class_names}
    mapping = model.process_class_prompts(prompts)

    # class prompt embeddings computed ONCE (the reference re-runs the image
    # tower per class, gloria.py:252-257; the towers are independent so
    # encoding each side once is numerically identical and C× cheaper)
    cls_emb = {c: (*model.encode_text(mapping[c]), mapping[c]["cap_lens"])
               for c in class_names}

    # raw (un-normalized) per-class scores accumulated over image batches;
    # z-normalization must happen over the FULL image set, as the reference
    # normalizes the stacked matrix once (gloria.py:266-270)
    scores = []
    for start in range(0, len(image_paths), batch_size):
        chunk = image_paths[start : start + batch_size]
        imgs = model.process_img(list(chunk))
        img_l, img_g = model.encode_images(imgs)
        cls_scores = []
        for cls in class_names:
            txt_l, txt_g, cap_lens = cls_emb[cls]
            local = model.get_local_similarities(img_l, txt_l, cap_lens)
            glob = model.get_global_similarities(img_g, txt_g)
            sims = (local + glob) / 2  # get_similarities 'both' formula
            cls_scores.append(sims.max(axis=1))
        scores.append(np.stack(cls_scores, axis=1))
    arr = np.concatenate(scores, axis=0)  # [N, C]
    if arr.shape[0] > 1:
        arr = (arr - arr.mean(axis=0)) / arr.std(axis=0)

    pred = arr.argmax(axis=1)
    truth = labels.argmax(axis=1)
    accuracy = float((pred == truth).mean())

    from sklearn.metrics import roc_auc_score

    aurocs = {}
    for i, cls in enumerate(class_names):
        y = labels[:, i]
        if len(np.unique(y)) > 1:
            aurocs[cls] = float(roc_auc_score(y, arr[:, i]))
    result = {
        "accuracy": accuracy,
        "auroc_per_class": aurocs,
        "auroc_mean": float(np.mean(list(aurocs.values()))) if aurocs else float("nan"),
        "n_images": int(arr.shape[0]),
        "class_scores": arr,
    }
    return result


def evaluate_chexpert_5x200(model: GloriaModel, csv_path=None, batch_size: int = 64,
                            n_prompts: int = 5, limit: int | None = None) -> dict:
    import pandas as pd

    csv_path = csv_path or constants.CHEXPERT_5x200
    df = pd.read_csv(csv_path)
    if limit:
        df = df.iloc[:limit]
    class_names = constants.CHEXPERT_COMPETITION_TASKS
    labels = df[class_names].to_numpy(dtype=np.float32)
    # CSV paths are "CheXpert-v1.0/..."-relative in the reference layout
    root = Path(constants.CHEXPERT_DATA_DIR).parent
    paths = [str(p) if Path(p).is_absolute() else str(root / str(p))
             for p in df[constants.CHEXPERT_PATH_COL]]
    return evaluate_zero_shot(model, paths, labels, class_names,
                              n_prompts=n_prompts, batch_size=batch_size)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="gloria_tpu checkpoint dir or torch .ckpt")
    ap.add_argument("--csv", default=None, help="5x200 benchmark csv (default: constants)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--n_prompts", type=int, default=5)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--devices", type=int, default=None,
                    help="shard the eval over an N-device mesh (default: 1 device)")
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args(argv)

    model = load_gloria(args.ckpt)
    if args.devices:
        from .parallel.mesh import create_mesh

        model.shard(create_mesh(n_devices=args.devices, fsdp=args.fsdp, tp=args.tp))
    result = evaluate_chexpert_5x200(model, args.csv, args.batch_size,
                                     args.n_prompts, args.limit)
    printable = {k: v for k, v in result.items() if k != "class_scores"}
    print(json.dumps(printable, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(printable, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
