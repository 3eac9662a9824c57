"""Data-integrity crawl: iterate a full split, printing failures.

Equivalent of the reference's manual smoke script
(``/root/reference/test_data.py``): instantiate the configured data module
and touch every instance of a split, reporting exceptions instead of dying.
``crawl`` is importable so CI can run the same sweep over a synthetic
PhysioNet mirror (``tests/test_data_crawl.py``).

    python test_data.py [-c configs/imagenome_pretrain_config.yaml] [--split valid]
"""

import argparse


def crawl(dataset, verbose: bool = True):
    """Touch every instance; returns (n_instances, [(index, error), ...])."""
    errors = []
    for i in range(len(dataset)):
        try:
            dataset[i]
        except Exception as e:  # data crawl: report, keep going
            errors.append((i, e))
            if verbose:
                print(f"[{i}] {type(e).__name__}: {e}")
    return len(dataset), errors


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/imagenome_pretrain_config.yaml")
    ap.add_argument("--split", default="valid")
    args = ap.parse_args()

    from gloria_tpu.configs import load_config
    from gloria_tpu.data.data_module import build_data_module

    cfg = load_config(args.config)
    dm = build_data_module(cfg)
    n, errors = crawl(dm.dataset(args.split))
    print(f"done: {n} instances, {len(errors)} errors")
