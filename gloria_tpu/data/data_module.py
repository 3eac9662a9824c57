"""Data modules: cfg → per-split loaders (reference ``gloria/datasets/data_module.py``).

Registry ``DATA_MODULES`` mirrors the reference's
(``gloria/datasets/__init__.py:5-11``) with an extra hermetic ``synthetic``
module so every phase runs without the license-gated medical datasets.
"""

from __future__ import annotations

from typing import Any, Callable

from ..configs import Config
from .collate import GloriaCollate
from .image_dataset import (
    CheXpertImageDataset, PneumoniaImageDataset, PneumothoraxImageDataset,
    SupervisedCollate, SyntheticImageDataset,
)
from .loader import PrefetchLoader
from .pretraining_dataset import CheXpertPretrainingDataset, SyntheticPretrainingDataset
from .tokenizer import WordPieceTokenizer, load_tokenizer


class DataModule:
    """Builds datasets/collates/loaders per split for one experiment cfg."""

    def __init__(self, cfg: Config, to_device: Callable | None = None):
        self.cfg = cfg
        self.to_device = to_device
        self.batch_size = int(cfg.train.batch_size or 8) if cfg.train else 8
        self.num_workers = int(cfg.train.num_workers or 8) if cfg.train else 8
        self.tokenizer: WordPieceTokenizer | None = None

    # subclasses implement
    def dataset(self, split: str):
        raise NotImplementedError

    def collate(self, split: str):
        raise NotImplementedError

    def loader(self, split: str, **kw) -> PrefetchLoader:
        if "process_count" not in kw:
            # multi-host: each process loads only its rows of the global batch
            # (see PrefetchLoader docstring); resolved lazily so CPU-only
            # tests can pass explicit fakes instead
            try:
                import jax

                kw["process_index"] = jax.process_index()
                kw["process_count"] = jax.process_count()
            except Exception:
                pass
        return PrefetchLoader(
            self.dataset(split), self.collate(split), self.batch_size,
            shuffle=(split == "train"), num_workers=self.num_workers,
            drop_last=(split == "train"),
            to_device=self.to_device or device_batch_to_jax,
            **kw,
        )

    def train_dataloader(self):
        return self.loader("train")

    def val_dataloader(self):
        return self.loader("valid")

    def test_dataloader(self):
        return self.loader("test")


def device_batch_to_jax(batch: dict) -> dict:
    import jax.numpy as jnp

    out = {k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")}
    out.update({k: v for k, v in batch.items() if k.startswith("_")})
    return out


class _PretrainModule(DataModule):
    dataset_cls: Any = None

    def __init__(self, cfg: Config, **kw):
        super().__init__(cfg, **kw)
        self._collates: dict = {}
        if (cfg.phase or "pretrain").lower() == "pretrain":
            self.tokenizer = self._make_tokenizer()
            self._collates = {
                split: GloriaCollate(cfg, split, self.tokenizer, seed=i)
                for i, split in enumerate(("train", "valid", "test"))
            }

    def _make_tokenizer(self) -> WordPieceTokenizer:
        text_cfg = (self.cfg.model.text if self.cfg.model else None) or Config()
        try:
            return load_tokenizer(bert_type=text_cfg.bert_type, vocab_file=text_cfg.vocab_file)
        except ValueError:
            ds = self.dataset("train")  # construct once: may parse scene graphs etc.
            corpus = []
            for i in range(min(64, len(ds))):
                try:
                    corpus.append(ds[i]["report"])
                except Exception:
                    continue  # corrupt instances must not kill module build
            if not corpus:
                corpus = ["no finding"]
            return load_tokenizer(corpus=corpus)

    def collate(self, split):
        return self._collates[split]


class CheXpertDataModule(_PretrainModule):
    def dataset(self, split):
        phase = (self.cfg.phase or "pretrain").lower()
        if phase == "pretrain":
            return CheXpertPretrainingDataset(self.cfg, split)
        return CheXpertImageDataset(self.cfg, split)

    def collate(self, split):
        if (self.cfg.phase or "pretrain").lower() == "pretrain":
            return super().collate(split)
        return SupervisedCollate(self.cfg, split)


class PneumoniaDataModule(DataModule):
    def dataset(self, split):
        return PneumoniaImageDataset(self.cfg, split)

    def collate(self, split):
        return SupervisedCollate(self.cfg, split)


class PneumothoraxDataModule(DataModule):
    def dataset(self, split):
        return PneumothoraxImageDataset(self.cfg, split)

    def collate(self, split):
        seg = (self.cfg.phase or "").lower() == "segmentation"
        return SupervisedCollate(self.cfg, split, segmentation=seg)


class SyntheticDataModule(_PretrainModule):
    """Hermetic module covering all three phases."""

    def dataset(self, split):
        phase = (self.cfg.phase or "pretrain").lower()
        seeds = {"train": 0, "valid": 1, "test": 2}
        size = int(self.cfg.data.synthetic_size or 64) if self.cfg.data else 64
        imsize = int(self.cfg.data.image.imsize or 64)
        if phase == "pretrain":
            return SyntheticPretrainingDataset(size=size, imsize=imsize, seed=seeds[split])
        num_targets = int(self.cfg.model.vision.num_targets or 5) if self.cfg.model and self.cfg.model.vision else 5
        return SyntheticImageDataset(
            size=size, imsize=imsize, num_classes=num_targets,
            segmentation=(phase == "segmentation"), seed=seeds[split],
        )

    def collate(self, split):
        phase = (self.cfg.phase or "pretrain").lower()
        if phase == "pretrain":
            return super().collate(split)
        return SupervisedCollate(self.cfg, split, segmentation=(phase == "segmentation"))


DATA_MODULES = {
    "chexpert": CheXpertDataModule,
    "pneumonia": PneumoniaDataModule,
    "pneumothorax": PneumothoraxDataModule,
    "synthetic": SyntheticDataModule,
    # "imagenome" registered in gloria_tpu.data.mimic (heavier import chain)
}


def build_data_module(cfg: Config, **kw) -> DataModule:
    name = (cfg.data.dataset or "synthetic").lower() if cfg.data else "synthetic"
    if name == "imagenome":
        from .mimic import ImaGenomeDataModule

        return ImaGenomeDataModule(cfg, **kw)
    return DATA_MODULES[name](cfg, **kw)
