"""Evaluation analysis: annotation studies + per-model localization deltas.

CLI equivalent of the reference's analysis notebooks
(``/root/reference/analyze_annotations.ipynb``,
``compare_model_outs{,2,3}.ipynb``), which produced the paper figures
(precision.pdf / recall.pdf / intuitiveness.pdf / deltas_*.pdf):

- ``annotations``: aggregate the per-annotator CSVs written by the
  annotation UI (interface.py) into per-model mean/CI tables and an
  intuitiveness bar figure;
- ``compare``: join two or more localization ``sentences.csv`` runs on
  dicom_sent_id and produce per-sentence metric deltas, summary stats, and
  delta histograms.

    python -m gloria_tpu.utils.analysis annotations annotations/*.csv
    python -m gloria_tpu.utils.analysis compare runA/sentences.csv runB/sentences.csv
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def analyze_annotations(paths: list[str], out_dir: str | None = None):
    import pandas as pd

    frames = []
    for p in paths:
        df = pd.read_csv(p)
        df["annotator"] = Path(p).stem
        frames.append(df)
    df = pd.concat(frames, ignore_index=True)
    q_cols = [c for c in df.columns if c.startswith("q")]
    summary = df.groupby("model")[q_cols].agg(["mean", "std", "count"])
    print(summary.to_string())
    if out_dir:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        summary.to_csv(out / "annotation_summary.csv")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            means = df.groupby("model")[q_cols].mean()
            ax = means.plot.bar(rot=20, figsize=(8, 4))
            ax.set_ylabel("mean score (1-5)")
            ax.figure.tight_layout()
            ax.figure.savefig(out / "intuitiveness.pdf")
        except Exception:
            pass
    return summary


def compare_runs(paths: list[str], metrics: tuple[str, ...] = ("auroc", "avg_precision"),
                 out_dir: str | None = None):
    import pandas as pd

    runs: dict = {}
    for i, p in enumerate(paths):
        name = Path(p).parent.parent.name or f"run{i}"
        while name in runs:  # disambiguate identical directory layouts
            name = f"{name}_{i}"
        runs[name] = pd.read_csv(p)
    names = list(runs)
    base_name = names[0]
    base = runs[base_name].set_index("dicom_sent_id")
    rows = []
    deltas_frames = {}
    for name in names[1:]:
        other = runs[name].set_index("dicom_sent_id")
        joined = base.join(other, how="inner", lsuffix="_a", rsuffix="_b")
        deltas = pd.DataFrame(index=joined.index)
        for m in metrics:
            deltas[m] = joined[f"{m}_b"] - joined[f"{m}_a"]
            rows.append({
                "comparison": f"{name} - {base_name}",
                "metric": m,
                "mean_delta": float(np.nanmean(deltas[m])),
                "median_delta": float(np.nanmedian(deltas[m])),
                "pct_improved": float(np.nanmean(deltas[m] > 0)),
                "n": int(deltas[m].notna().sum()),
            })
        deltas_frames[name] = deltas
    summary = pd.DataFrame(rows)
    print(summary.to_string(index=False))
    if out_dir:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        summary.to_csv(out / "comparison_summary.csv", index=False)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for name, deltas in deltas_frames.items():
                fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 3.5))
                axes = np.atleast_1d(axes)
                for ax, m in zip(axes, metrics):
                    ax.hist(deltas[m].dropna(), bins=40)
                    ax.axvline(0, color="k", lw=1)
                    ax.set_title(f"Δ{m}: {name} − {base_name}")
                fig.tight_layout()
                fig.savefig(out / f"deltas_{name}.pdf")
        except Exception:
            pass
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("annotations")
    a.add_argument("csvs", nargs="+")
    a.add_argument("--out", default=None)
    c = sub.add_parser("compare")
    c.add_argument("csvs", nargs="+", help="sentences.csv files; first is the baseline")
    c.add_argument("--metrics", default="auroc,avg_precision")
    c.add_argument("--out", default=None)
    p = sub.add_parser(
        "plot-info",
        help="render the per-sentence 5-panel diagnostic figures "
             "(reference plot_info) from an EvaluateLocalization artifact dir")
    p.add_argument("artifact_dir", help="dir holding sentences.csv + image/attn/... folders")
    p.add_argument("--out", default=None)
    p.add_argument("--mode", default="upsample", choices=("upsample", "pyramid", "windows"))
    p.add_argument("--no-attn-bar", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)
    if args.cmd == "annotations":
        analyze_annotations(args.csvs, args.out)
    elif args.cmd == "plot-info":
        from .viz import plot_info

        written = plot_info(args.artifact_dir, args.out, args.mode,
                            args.no_attn_bar, args.limit)
        print(f"wrote {len(written)} sentence figures")
    else:
        compare_runs(args.csvs, tuple(args.metrics.split(",")), args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
