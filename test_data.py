"""Data-integrity crawl: iterate a full split, printing failures.

Equivalent of the reference's manual smoke script
(``/root/reference/test_data.py``): instantiate the configured data module
and touch every instance of a split, reporting exceptions instead of dying.

    python test_data.py [-c configs/imagenome_pretrain_config.yaml] [--split valid]
"""

import argparse


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/imagenome_pretrain_config.yaml")
    ap.add_argument("--split", default="valid")
    args = ap.parse_args()

    from gloria_tpu.configs import load_config
    from gloria_tpu.data.data_module import build_data_module

    cfg = load_config(args.config)
    dm = build_data_module(cfg)
    ds = dm.dataset(args.split)
    n_err = 0
    for i in range(len(ds)):
        try:
            ds[i]
        except Exception as e:  # data crawl: report, keep going
            n_err += 1
            print(f"[{i}] {type(e).__name__}: {e}")
    print(f"done: {len(ds)} instances, {n_err} errors")
