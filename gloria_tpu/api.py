"""Public API: model loading, similarities, zero-shot classification, prompts.

Mirrors the reference's top-level ``gloria/gloria.py`` surface:
``available_models`` / ``load_gloria`` / ``load_img_classification_model`` /
``get_similarities`` / ``zero_shot_classification`` /
``generate_chexpert_class_prompts`` (``/root/reference/gloria/gloria.py``),
plus the ``GLoRIA.process_img`` / ``process_text`` host preprocessing
(``gloria/models/gloria_model.py:233-336``).

Checkpoint sources:
- gloria_tpu orbax checkpoints (``training.checkpoints``),
- the reference's torch Lightning ``.ckpt`` zoo — loaded with torch on host
  and mapped through ``utils.torch_import`` (state-dict key surgery included).
"""

from __future__ import annotations

import os
import random
from pathlib import Path
from typing import Union

import numpy as np

import jax
import jax.numpy as jnp

from . import constants
from .configs import Config
from .data.tokenizer import TextProcessor, WordPieceTokenizer, load_tokenizer
from .data.transforms import build_transformation, letterbox_resize, to_rgb
from .models.gloria_model import GLoRIA
from .ops import gloria_loss
from .training.train import make_forward
from .utils import torch_import

# the reference seeds these at import for prompt sampling (gloria.py:16-17)
np.random.seed(6)
random.seed(6)


def enable_persistent_compile_cache() -> None:
    """Share XLA executables across processes (same policy as ``run.py``).

    The zero-shot / similarity API compiles several distinct programs (both
    towers + the similarity kernels); on a tunnel-attached device a cold
    compile dominates wall-clock, and every new CLI process would otherwise
    pay it again.  Respects ``GLORIA_COMPILE_CACHE`` (set it to an empty
    string to disable)."""
    cache_dir = os.environ.get("GLORIA_COMPILE_CACHE", "/tmp/jax_cache")
    if not cache_dir:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

_MODELS = {
    "gloria_resnet50": "./pretrained/chexpert_resnet50.ckpt",
    "gloria_resnet18": "./pretrained/chexpert_resnet18.ckpt",
}
_SEGMENTATION_MODELS = {"gloria_resnet50": "./pretrained/chexpert_resnet50.ckpt"}
_FEATURE_DIM = {"gloria_resnet50": 2048, "gloria_resnet18": 2048}


def available_models() -> list[str]:
    return list(_MODELS.keys())


def available_segmentation_models() -> list[str]:
    return list(_SEGMENTATION_MODELS.keys())


class GloriaModel:
    """Bundled model + params + tokenizer with the reference's instance API."""

    def __init__(self, cfg: Config, variables: dict, tokenizer: WordPieceTokenizer | None = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        # ``dtype`` is the compute dtype of the served forward (params stay
        # f32); pass bf16 for serving throughput, keep f32 for parity paths
        self.model = GLoRIA(cfg, dtype=dtype)
        self.variables = variables
        self.tokenizer = tokenizer or load_tokenizer(
            bert_type=cfg.model.text.bert_type if cfg.model and cfg.model.text else None,
            vocab_file=cfg.model.text.vocab_file if cfg.model and cfg.model.text else None,
            corpus=["no finding"],
        )
        word_num = int(cfg.data.text.word_num or 97) if cfg.data and cfg.data.text else 97
        self.text_processor = TextProcessor(self.tokenizer, num_words=word_num)
        self._forward = jax.jit(make_forward(self.model))
        self.mesh = None
        g = (cfg.model.gloria if cfg.model else None) or Config()
        self.temp1 = g.temp1 or 4.0
        self.temp2 = g.temp2 or 5.0
        self.temp3 = g.temp3 or 10.0

    def shard(self, mesh) -> "GloriaModel":
        """Distribute inference over a ``jax.sharding.Mesh``.

        Parameters are placed per the TP/FSDP rules of
        :mod:`gloria_tpu.parallel.mesh` (replicated over the ``data`` axis);
        image batches are then split over ``data`` by :meth:`encode_images`,
        so the image tower — the eval path's dominant cost — runs
        data-parallel with GSPMD-inserted collectives over ICI. The reference
        evaluates on a single GPU only (``gloria/gloria.py:240-275``). Batch
        sizes that don't divide the data axis are padded with repeated rows
        and sliced back (the towers are row-independent in eval mode).
        Returns ``self`` for chaining: ``load_gloria(p).shard(mesh)``."""
        from .parallel.mesh import shard_params

        for attr in ("_img_forward", "_txt_forward"):
            if hasattr(self, attr):
                delattr(self, attr)  # re-trace against the sharded params
        self.mesh = mesh
        self.variables = shard_params(self.variables, mesh)
        return self

    # -- host preprocessing ------------------------------------------------
    def process_img(self, paths_or_arrays, device=None) -> jnp.ndarray:
        """Paths (cv2 grayscale read) or arrays → letterbox → eval transform →
        NHWC float32 (reference ``GLoRIA.process_img``)."""
        import cv2

        if isinstance(paths_or_arrays, (str, Path, np.ndarray)):
            paths_or_arrays = [paths_or_arrays]
        transform = build_transformation(self.cfg, split="test")
        imsize = int(self.cfg.data.image.imsize or 256) if self.cfg.data and self.cfg.data.image else 256
        imgs = []
        for p in paths_or_arrays:
            x = cv2.imread(str(p), 0) if isinstance(p, (str, Path)) else np.asarray(p)
            x = letterbox_resize(x, imsize)
            imgs.append(transform(to_rgb(x)))
        return jnp.asarray(np.stack(imgs).astype(np.float32))

    def process_text(self, text: Union[str, list[str]], device=None) -> dict:
        if isinstance(text, str):
            text = [text]
        return self.text_processor(text)

    def process_class_prompts(self, class_prompts: dict, device=None) -> dict:
        return {k: self.process_text(v) for k, v in class_prompts.items()}

    # -- forward + similarities ----------------------------------------------
    def encode_images(self, imgs: jnp.ndarray):
        """Image tower only → (img_emb_l [B, R, D], img_emb_g [B, D]).
        Same embeddings as :meth:`encode` (the towers are independent) —
        used by eval/serving paths that reuse cached text embeddings."""
        if not hasattr(self, "_img_forward"):
            m = self.model
            self._img_forward = jax.jit(lambda v, x: m.apply(
                v, x, train=False, method=type(m).image_encoder_forward)[:2])
        imgs = jnp.asarray(imgs)
        if self.mesh is None:
            return self._img_forward(self.variables, imgs)
        from .parallel.mesh import batch_sharding

        B, n = imgs.shape[0], self.mesh.shape["data"]
        pad = (-B) % n
        if pad:  # rows are independent under eval-mode BN; repeat + slice back
            imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad, axis=0)], 0)
        imgs = jax.device_put(imgs, batch_sharding(self.mesh))
        out_l, out_g = self._img_forward(self.variables, imgs)
        return (out_l[:B], out_g[:B]) if pad else (out_l, out_g)

    def encode_text(self, txts: dict):
        """Text tower only → (txt_emb_l [T, W, D], txt_emb_g [T, D])."""
        if not hasattr(self, "_txt_forward"):
            m = self.model
            self._txt_forward = jax.jit(lambda v, a, b, c, d: m.apply(
                v, a, b, c, d, method=type(m).text_encoder_forward))
        args = (jnp.asarray(txts["caption_ids"]), jnp.asarray(txts["attention_mask"]),
                jnp.asarray(txts["token_type_ids"]), jnp.asarray(txts["word_assignment"]))
        if self.mesh is not None:  # prompt batches are small: replicate
            from .parallel.mesh import replicate

            args = replicate(args, self.mesh)
        return self._txt_forward(self.variables, *args)

    def encode(self, imgs: jnp.ndarray, txts: dict):
        img_l, img_g, txt_l, txt_g = self._forward(self.variables, {
            "imgs": jnp.asarray(imgs),
            "caption_ids": jnp.asarray(txts["caption_ids"]),
            "attention_mask": jnp.asarray(txts["attention_mask"]),
            "token_type_ids": jnp.asarray(txts["token_type_ids"]),
            "word_assignment": jnp.asarray(txts["word_assignment"]),
        })
        return img_l, img_g, txt_l, txt_g

    def get_global_similarities(self, img_emb_g, text_emb_g) -> np.ndarray:
        return np.asarray(gloria_loss.global_similarities(img_emb_g, text_emb_g))

    def get_local_similarities(self, img_emb_l, text_emb_l, cap_lens) -> np.ndarray:
        sink = self.variables["params"].get("no_attn_vec")
        g = (self.cfg.model.gloria if self.cfg.model else None) or Config()
        # fused_kernel: True/False pins the path; unset → auto (Pallas on TPU)
        use_fused = (gloria_loss.fused_eval_default() if g.fused_kernel is None
                     else bool(g.fused_kernel))
        if self.mesh is not None and use_fused:
            # pallas_call has no GSPMD rule; shard_map runs the kernel on each
            # device's row block of the [B_img, T] matrix (rows independent
            # given replicated text) so sharded eval keeps the 2.42× kernel
            return np.asarray(gloria_loss.local_similarities_eval_sharded(
                img_emb_l, text_emb_l, jnp.asarray(cap_lens),
                mesh=self.mesh, temp1=4.0, temp2=5.0, sink=sink,
                use_fused=True,
            ))
        return np.asarray(gloria_loss.local_similarities_eval_jit(
            img_emb_l, text_emb_l, jnp.asarray(cap_lens),
            temp1=4.0, temp2=5.0, sink=sink,  # hardcoded in the reference eval path
            use_fused=use_fused,
        ))

    def get_attn_maps(self, img_emb_l, text_emb_l, cap_lens):
        """Diagonal-pair attention maps [B, W, R] (train-slice convention)."""
        sink = self.variables["params"].get("no_attn_vec")
        W = text_emb_l.shape[1]
        m = gloria_loss.local_matching(
            text_emb_l, img_emb_l,
            gloria_loss.make_word_mask(jnp.asarray(cap_lens), W, "train"),
            temp1=self.temp1, temp2=self.temp2, sink=sink, chunk=0,
            need_diag_attn=True, precision="highest",
        )
        return m.attn_diag

    def get_similarities(self, imgs, txts, similarity_type: str = "both") -> np.ndarray:
        if similarity_type not in ("global", "local", "both"):
            raise RuntimeError("similarity type should be one of ['global', 'local', 'both']")
        if isinstance(txts, (str, list)):
            raise RuntimeError("Text input not processed - please use process_text")
        if self.mesh is not None:
            # split towers so the image batch shards over 'data' (identical
            # embeddings: the towers are independent, see encode_images)
            img_l, img_g = self.encode_images(jnp.asarray(imgs))
            txt_l, txt_g = self.encode_text(txts)
        else:
            img_l, img_g, txt_l, txt_g = self.encode(imgs, txts)
        global_sim = self.get_global_similarities(img_g, txt_g)
        local_sim = self.get_local_similarities(img_l, txt_l, txts["cap_lens"])
        if similarity_type == "global":
            return global_sim
        if similarity_type == "local":
            return local_sim
        return (local_sim + global_sim) / 2

    def plot_attn_maps(self, attn_maps, imgs, words, cap_lens, output_path=None,
                       nvis: int = 8, rand_vis: bool = False):
        """Render the per-word attention grid (reference ``plot_attn_maps``,
        gloria_model.py:213-231). Returns the image array; saves when
        ``output_path`` is given."""
        from .utils.viz import build_attention_images

        B, W, R = np.asarray(attn_maps).shape
        side = int(round(R ** 0.5))
        grid = np.asarray(attn_maps).reshape(B, W, side, side)
        img_set = build_attention_images(
            np.asarray(imgs), grid, words, np.asarray(cap_lens),
            nvis=nvis, rand_vis=rand_vis,
        )
        if output_path is not None:
            from PIL import Image

            Image.fromarray(img_set).save(output_path)
        return img_set

    def zero_shot_classification(self, imgs, cls_txt_mapping: dict):
        """Per-class max-over-prompts mean similarity, z-normalized across
        classes (reference ``zero_shot_classification``, gloria.py:240-275)."""
        import pandas as pd

        class_similarities = []
        for cls_name, cls_txt in cls_txt_mapping.items():
            sims = self.get_similarities(imgs, cls_txt, similarity_type="both")
            class_similarities.append(sims.max(axis=1))
        arr = np.stack(class_similarities, axis=1)
        if arr.shape[0] > 1:
            arr = (arr - arr.mean(axis=0)) / arr.std(axis=0)  # utils.normalize
        return pd.DataFrame(arr, columns=list(cls_txt_mapping.keys()))


def load_img_classification_model(
    name: str = "gloria_resnet50",
    device=None,
    num_cls: int = 1,
    freeze_encoder: bool = True,
):
    """Pretrained-encoder classifier (reference gloria.py:97-133).

    Returns (model, variables, trainable_labels): the GLoRIA image encoder is
    transplanted into a PretrainedImageClassifier; freezing is expressed as an
    optax partition label tree (see training.optim.freeze_wrap)."""
    import jax
    import jax.numpy as jnp

    from .models.vision_model import PretrainedImageClassifier
    from .training import optim

    gm = load_gloria(name, device)
    model_name = (gm.cfg.model.vision.model_name if gm.cfg.model and gm.cfg.model.vision else None) or "resnet_50"
    model = PretrainedImageClassifier(model_name=model_name, num_classes=num_cls)
    imsize = int(gm.cfg.data.image.imsize or 256) if gm.cfg.data and gm.cfg.data.image else 256
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imsize, imsize, 3)))
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    variables["params"]["img_encoder"] = gm.variables["params"]["img_encoder"]
    variables["batch_stats"]["img_encoder"] = gm.variables["batch_stats"]["img_encoder"]
    labels = None
    if freeze_encoder:
        labels = optim.partition_trainable(
            variables["params"], lambda path: not path[0].startswith("img_encoder")
        )
    return model, variables, labels


def load_img_segmentation_model(name: str = "gloria_resnet50", device=None):
    """U-Net with the GLoRIA ResNet encoder transplanted
    (reference gloria.py:136-181; decoder is the first-party ResnetUNet —
    segmentation_models_pytorch is torch-only). Returns (model, variables)."""
    import jax
    import jax.numpy as jnp

    from .models.unet import ResnetUNet

    gm = load_gloria(name, device)
    model_name = (gm.cfg.model.vision.model_name if gm.cfg.model and gm.cfg.model.vision else None) or "resnet_50"
    model = ResnetUNet(model_name=model_name, n_classes=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    variables["params"]["backbone"] = gm.variables["params"]["img_encoder"]["backbone"]
    variables["batch_stats"]["backbone"] = gm.variables["batch_stats"]["img_encoder"]["backbone"]
    return model, variables


def generate_chexpert_class_prompts(n: int = 5) -> dict:
    """severity × subtype × location prompt grammar sampling
    (reference gloria.py:278-306)."""
    prompts = {}
    for k, v in constants.CHEXPERT_CLASS_PROMPTS.items():
        cls_prompts = []
        keys = list(v.keys())
        for k0 in v[keys[0]]:
            for k1 in v[keys[1]]:
                for k2 in v[keys[2]]:
                    cls_prompts.append(f"{k0} {k1} {k2}")
        prompts[k] = random.sample(cls_prompts, n)
    return prompts


def load_gloria(
    name: str = "gloria_resnet50",
    device=None,
    cfg_override: Config | None = None,
    tokenizer: WordPieceTokenizer | None = None,
    resnet_layers: tuple | None = None,
) -> GloriaModel:
    """Load from a registry name, a torch ``.ckpt`` (reference zoo), or a
    gloria_tpu orbax checkpoint directory."""
    enable_persistent_compile_cache()
    if name in _MODELS:
        ckpt_path = _MODELS[name]
    elif os.path.exists(name):
        ckpt_path = name
    else:
        raise RuntimeError(f"Model {name} not found; available models = {available_models()}")
    if not os.path.exists(ckpt_path):
        raise RuntimeError(
            f"Model {name} not found. Download the pretrained weights from the "
            f"GLoRIA zoo and place them at {ckpt_path}."
        )

    path = Path(ckpt_path)
    if path.is_dir():  # gloria_tpu checkpoint
        from .data.tokenizer import load_saved_tokenizer
        from .training.checkpoints import load_checkpoint

        state, cfg = load_checkpoint(path)
        cfg = cfg_override or cfg or Config()
        if tokenizer is None:
            # self-contained checkpoints: the vocab persisted at save time
            # (sibling `<name>.tokenizer/` for one-off saves, `tokenizer/` at
            # the CheckpointManager root) beats the generic fallback below
            for cand in (path.parent / f"{path.name}.tokenizer",
                         path.parent / "tokenizer"):
                tokenizer = load_saved_tokenizer(cand)
                if tokenizer is not None:
                    break
        if isinstance(state, dict) and "opt_state" in state:
            # training checkpoint: a full TrainState tree (params, opt_state,
            # batch_stats, rng, step) — the model needs only the collections
            variables = {"params": state["params"]}
            if state.get("batch_stats") is not None:
                variables["batch_stats"] = state["batch_stats"]
        elif "params" in state:
            variables = state
        else:
            variables = {"params": state}
        return GloriaModel(cfg, variables, tokenizer)

    # torch Lightning checkpoint from the reference zoo
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    torch_cfg = ckpt.get("hyper_parameters", {})
    cfg = cfg_override or Config(_cfg_to_dict(torch_cfg))
    state_dict = ckpt["state_dict"]
    bert_cfg = (cfg.model.text.bert_config or Config()) if cfg.model and cfg.model.text else Config()
    variables = torch_import.import_gloria(
        state_dict,
        resnet_layers=resnet_layers or _resnet_layers(cfg),
        bert_layers=int(bert_cfg.num_layers or 12),
        bert_heads=int(bert_cfg.num_heads or 12),
        transformer_layers=int(cfg.model.image_transformer.num_layers) if cfg.model and cfg.model.image_transformer else 0,
        transformer_heads=int(cfg.model.image_transformer.num_heads) if cfg.model and cfg.model.image_transformer else 1,
    )
    return GloriaModel(cfg, variables, tokenizer)


def _resnet_layers(cfg: Config) -> tuple[int, ...]:
    name = (cfg.model.vision.model_name if cfg.model and cfg.model.vision else None) or "resnet_50"
    return {
        "resnet_18": (2, 2, 2, 2), "resnet_34": (3, 4, 6, 3), "resnet_50": (3, 4, 6, 3),
        "resnet_101": (3, 4, 23, 3), "resnext_50": (3, 4, 6, 3), "resnext_101": (3, 4, 23, 3),
    }[name]


def _cfg_to_dict(obj):
    """OmegaConf/namespace/dict → plain dict (torch ckpt hyper_parameters)."""
    if hasattr(obj, "items"):
        return {k: _cfg_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_cfg_to_dict(v) for v in obj]
    return obj
