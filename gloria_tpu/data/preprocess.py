"""Offline dataset preparation CLI.

Equivalent of ``/root/reference/gloria/datasets/preprocess_datasets.py``:
builds the RSNA / SIIM / CheXpert split CSVs and the **CheXpert 5×200**
zero-shot benchmark (200 single-positive frontal studies per competition
task, merged with master-CSV report impressions — reference :105-140),
preserving the split seeds (``train_test_split(random_state=0)``) so splits
match the reference bit-for-bit given the same inputs.

    python -m gloria_tpu.data.preprocess -d chexpert|pneumonia|pneumothorax
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import constants


def preprocess_pneumonia_data(test_fac: float = 0.15) -> None:
    import pandas as pd
    from sklearn.model_selection import train_test_split

    try:
        df = pd.read_csv(constants.PNEUMONIA_ORIGINAL_TRAIN_CSV)
    except Exception as exc:
        raise RuntimeError(
            f"Please make sure the RSNA Pneumonia dataset is stored at {constants.PNEUMONIA_DATA_DIR}"
        ) from exc

    def create_bbox(row):
        if row["Target"] == 0:
            return 0
        return [row["x"], row["y"], row["x"] + row["width"], row["y"] + row["height"]]

    df["bbox"] = df.apply(create_bbox, axis=1)
    df = df[["patientId", "bbox"]].groupby("patientId").agg(list).reset_index()
    df["bbox"] = df["bbox"].apply(lambda x: None if x == [0] else x)
    df["Target"] = df["bbox"].apply(lambda x: 0 if x is None else 1)
    df["Path"] = df["patientId"].apply(lambda x: constants.PNEUMONIA_IMG_DIR / (x + ".dcm"))

    train_df, test_val_df = train_test_split(df, test_size=test_fac * 2, random_state=0)
    test_df, valid_df = train_test_split(test_val_df, test_size=0.5, random_state=0)
    for name, d in [("train", train_df), ("valid", valid_df), ("test", test_df)]:
        print(f"Number of {name} samples: {len(d)}")
        print(d["Target"].value_counts())
    train_df.to_csv(constants.PNEUMONIA_TRAIN_CSV)
    valid_df.to_csv(constants.PNEUMONIA_VALID_CSV)
    test_df.to_csv(constants.PNEUMONIA_TEST_CSV)


def preprocess_pneumothorax_data(test_fac: float = 0.15) -> None:
    import pandas as pd
    from sklearn.model_selection import train_test_split

    try:
        df = pd.read_csv(constants.PNEUMOTHORAX_ORIGINAL_TRAIN_CSV)
    except Exception as exc:
        raise RuntimeError(
            f"Please make sure the SIIM Pneumothorax dataset is stored at {constants.PNEUMOTHORAX_DATA_DIR}"
        ) from exc

    img_paths: dict[str, str] = {}
    for subdir, _dirs, files in os.walk(constants.PNEUMOTHORAX_IMG_DIR):
        for f in files:
            if "dcm" in f:
                img_paths[f[:-4]] = os.path.join(subdir, f)

    df["Label"] = df.apply(lambda x: 0.0 if x[" EncodedPixels"] == " -1" else 1.0, axis=1)
    df["Path"] = df["ImageId"].apply(lambda x: img_paths[x])

    train_df, test_val_df = train_test_split(df, test_size=test_fac * 2, random_state=0)
    test_df, valid_df = train_test_split(test_val_df, test_size=0.5, random_state=0)
    for name, d in [("train", train_df), ("valid", valid_df), ("test", test_df)]:
        print(f"Number of {name} samples: {len(d)}")
        print(d["Label"].value_counts())
    train_df.to_csv(constants.PNEUMOTHORAX_TRAIN_CSV)
    valid_df.to_csv(constants.PNEUMOTHORAX_VALID_CSV)
    test_df.to_csv(constants.PNEUMOTHORAX_TEST_CSV)


def preprocess_chexpert_5x200_data(n_per_task: int = 200, seed: int | None = None):
    """200 single-positive frontal studies per competition task, merged with
    report impressions (reference :105-140).  The single-positive filter keys
    all 13 non-"No Finding" label columns exactly as the reference does."""
    import pandas as pd

    df = pd.read_csv(constants.CHEXPERT_ORIGINAL_TRAIN_CSV).fillna(0)
    df = df[df[constants.CHEXPERT_VIEW_COL] == "Frontal"]
    df_master = pd.read_csv(constants.CHEXPERT_MASTER_CSV)[
        [constants.CHEXPERT_PATH_COL, constants.CHEXPERT_REPORT_COL]
    ]

    task_dfs = []
    for i, _t in enumerate(constants.CHEXPERT_COMPETITION_TASKS):
        index = np.zeros(14)
        index[i] = 1
        df_task = df[
            (df["Atelectasis"] == index[0])
            & (df["Cardiomegaly"] == index[1])
            & (df["Consolidation"] == index[2])
            & (df["Edema"] == index[3])
            & (df["Pleural Effusion"] == index[4])
            & (df["Enlarged Cardiomediastinum"] == index[5])
            & (df["Lung Lesion"] == index[7])
            & (df["Lung Opacity"] == index[8])
            & (df["Pneumonia"] == index[9])
            & (df["Pneumothorax"] == index[10])
            & (df["Pleural Other"] == index[11])
            & (df["Fracture"] == index[12])
            & (df["Support Devices"] == index[13])
        ]
        task_dfs.append(df_task.sample(n=n_per_task, random_state=seed))
    df_200 = pd.concat(task_dfs)
    return pd.merge(df_200, df_master, how="left", on=constants.CHEXPERT_PATH_COL)


def preprocess_chexpert_data() -> None:
    import pandas as pd

    try:
        df = pd.read_csv(constants.CHEXPERT_ORIGINAL_TRAIN_CSV)
    except Exception as exc:
        raise RuntimeError(
            f"Please make sure the CheXpert dataset is stored at {constants.CHEXPERT_DATA_DIR}"
        ) from exc

    df_200 = preprocess_chexpert_5x200_data()
    df = df[~df[constants.CHEXPERT_PATH_COL].isin(df_200[constants.CHEXPERT_PATH_COL])]
    valid_ids = np.random.choice(len(df), size=constants.CHEXPERT_VALID_NUM, replace=False)
    valid_df = df.iloc[valid_ids]
    train_df = df.drop(df.index[valid_ids], errors="ignore")
    print(f"Number of train samples: {len(train_df)}")
    print(f"Number of valid samples: {len(valid_df)}")
    print(f"Number of chexpert5x200 samples: {len(df_200)}")
    train_df.to_csv(constants.CHEXPERT_TRAIN_CSV)
    valid_df.to_csv(constants.CHEXPERT_VALID_CSV)
    df_200.to_csv(constants.CHEXPERT_5x200)


_DATASETS = {
    "chexpert": preprocess_chexpert_data,
    "pneumonia": preprocess_pneumonia_data,
    "pneumothorax": preprocess_pneumothorax_data,
}


def available_datasets() -> list[str]:
    return list(_DATASETS.keys())


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset", required=True,
                        help=f"one of {available_datasets()}")
    args = parser.parse_args()
    name = args.dataset.lower()
    if name not in _DATASETS:
        raise RuntimeError(f"Dataset {args.dataset} not found; available = {available_datasets()}")
    _DATASETS[name]()
