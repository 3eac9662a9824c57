"""Minimal OmegaConf-compatible configuration system.

The reference threads an ``omegaconf.DictConfig`` through every constructor
(``/root/reference/run.py:221``, ``gloria/builder.py``).  omegaconf is not
available in this image, so we provide a small drop-in with the semantics the
reference relies on:

- attribute *and* item access (``cfg.model.text.bert_type``),
- missing keys resolve to ``None`` instead of raising (the reference leans on
  this, e.g. ``cfg.model.norm`` is absent from every config yaml and the
  ``ImageEncoder`` treats it as falsy — ``gloria/models/vision_model.py:13``),
- ``in`` / ``keys()`` / ``items()`` dict protocol,
- YAML load/save and recursive merge for CLI overrides.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """A recursive attribute-dict. Missing keys read as ``None``."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        merged: dict = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = value

    # -- construction -----------------------------------------------------
    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return [Config._wrap(v) for v in value]
        return value

    # -- mapping protocol --------------------------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __getitem__(self, key: str) -> Any:
        return super().get(key, None)

    def __getattr__(self, key: str) -> Any:
        if key.startswith("__") and key.endswith("__"):
            raise AttributeError(key)
        return super().get(key, None)

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        if key in self:
            del self[key]

    def get(self, key: str, default: Any = None) -> Any:
        return super().get(key, default)

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    # -- conversion ---------------------------------------------------------
    def to_dict(self) -> dict:
        def unwrap(value: Any) -> Any:
            if isinstance(value, Config):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, list):
                return [unwrap(v) for v in value]
            return value

        return unwrap(self)

    # -- merge ---------------------------------------------------------------
    def merge(self, other: Mapping[str, Any] | None) -> "Config":
        """Recursively merge ``other`` on top of ``self`` (in place)."""
        if other is None:
            return self
        for key, value in other.items():
            if isinstance(value, Mapping) and isinstance(self.get(key), Config):
                self[key].merge(value)
            else:
                self[key] = value
        return self

    def set_path(self, dotted: str, value: Any) -> None:
        """Set ``a.b.c`` style path, creating intermediate nodes."""
        node = self
        parts = dotted.split(".")
        for part in parts[:-1]:
            if not isinstance(node.get(part), Config):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Config) or part not in node:
                return default
            node = node[part]
        return node


def load_config(path: str) -> Config:
    with open(path, "r") as fh:
        return Config(yaml.safe_load(fh) or {})


def loads_config(text: str) -> Config:
    return Config(yaml.safe_load(io.StringIO(text)) or {})


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as fh:
        yaml.safe_dump(cfg.to_dict(), fh, sort_keys=False)


def merge_configs(*cfgs: Mapping[str, Any] | None) -> Config:
    out = Config()
    for cfg in cfgs:
        out.merge(cfg)
    return out


def iter_leaves(cfg: Config, prefix: str = "") -> Iterator[tuple[str, Any]]:
    for key, value in cfg.items():
        dotted = f"{prefix}.{key}" if prefix else key
        if isinstance(value, Config):
            yield from iter_leaves(value, dotted)
        else:
            yield dotted, value
