"""Downstream task programs: classification and segmentation.

Equivalents of the reference Lightning modules
(``/root/reference/gloria/lightning/classification_model.py`` and
``segmentation_model.py``) as jitted step functions + host epoch metrics:

- classification: (pretrained-encoder) linear probe / finetune, BCE loss,
  epoch-end mean per-class AUROC/AUPRC, test results json;
- segmentation: ResNet-U-Net, Dice/Focal/Mixed loss, dice metric with the
  reference's empty-mask convention.

Encoder transplant from a GLoRIA checkpoint happens by pytree grafting
(see ``builders`` below), replacing the reference's state-dict key rewrites.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import Config
from ..models.unet import ResnetUNet
from ..models.vision_model import ImageClassifier, PretrainedImageClassifier
from ..ops import segmentation_loss as segloss
from . import metrics as M
from .train import TrainState, create_train_state


def build_loss(cfg: Config) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """cfg.train.loss_fn → loss callable (reference builder.build_loss,
    ``gloria/builder.py:140-156``)."""
    lf = (cfg.train.loss_fn or Config()) if cfg.train else Config()
    kind = lf.type or "BCE"
    if kind == "DiceLoss":
        return segloss.dice_loss
    if kind == "FocalLoss":
        return segloss.focal_loss
    if kind == "MixedLoss":
        alpha = float(lf.alpha or 10.0)
        return lambda logit, y: segloss.mixed_loss(logit, y, alpha=alpha)
    if kind == "BCE":
        pos_weight = jnp.asarray(lf.class_weights, jnp.float32) if lf.class_weights else None
        return lambda logit, y: segloss.bce_with_logits(logit, y, pos_weight)
    raise NotImplementedError(f"{kind} not implemented yet")


class SupervisedTask:
    """Shared machinery: jitted train/eval steps over (imgs, labels)."""

    def __init__(self, model, loss_fn: Callable, tx: optax.GradientTransformation,
                 accum_steps: int = 1):
        self.model = model
        self.loss_fn = loss_fn
        self.tx = tx
        # accum_steps > 1: the trainer stacks G loader batches into [G, b, ...]
        # and this step scans them (Lightning accumulate_grad_batches, same
        # semantics as the pretrain path: grads averaged, BN stats per micro)
        self.accum_steps = max(1, int(accum_steps))
        step = self._train_step_accum if self.accum_steps > 1 else self._train_step
        self.train_step = jax.jit(step, donate_argnums=(0,))
        self.eval_step = jax.jit(self._eval_step)

    def init_state(self, example_batch: dict, seed: int = 0) -> TrainState:
        variables = self.model.init(jax.random.PRNGKey(seed), jnp.asarray(example_batch["imgs"]))
        return create_train_state(self.model, variables, self.tx, jax.random.PRNGKey(seed + 1))

    def _apply(self, params, batch_stats, imgs, train: bool):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train:
            return self.model.apply(variables, imgs, train=True, mutable=["batch_stats"])
        return self.model.apply(variables, imgs, train=False), {"batch_stats": batch_stats}

    def _train_step(self, state: TrainState, batch: dict):
        def loss_fn(params):
            logits, muts = self._apply(params, state.batch_stats, batch["imgs"], True)
            return self.loss_fn(jnp.squeeze(logits), jnp.squeeze(batch["labels"])), (logits, muts)

        (loss, (logits, muts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=muts["batch_stats"],
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "logits": logits}

    def _train_step_accum(self, state: TrainState, batch: dict):
        """One update from stacked micro-batches (leaves ``[G, b, ...]``);
        G comes from the shape so the trainer's trailing-window flush
        (G < accumulate_grad_batches) reuses this same function."""
        def micro(carry, mb):
            stats, grad_sum, loss_sum = carry

            def loss_fn(params):
                variables = {"params": params}
                if stats is not None:
                    variables["batch_stats"] = stats
                logits, muts = self.model.apply(variables, mb["imgs"], train=True,
                                                mutable=["batch_stats"])
                loss = self.loss_fn(jnp.squeeze(logits), jnp.squeeze(mb["labels"]))
                return loss, (logits, muts)

            (loss, (logits, muts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            return (muts["batch_stats"], grad_sum, loss_sum + loss), logits

        g = jax.tree_util.tree_leaves(batch)[0].shape[0]
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_stats, grad_sum, loss_sum), logits = jax.lax.scan(
            micro, (state.batch_stats, zeros, 0.0), batch)
        grads = jax.tree_util.tree_map(lambda x: x / g, grad_sum)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        # callbacks see the LAST micro-batch (matching the trainer's contract)
        return new_state, {"loss": loss_sum / g, "logits": logits[-1]}

    def _eval_step(self, state: TrainState, batch: dict):
        logits, _ = self._apply(state.params, state.batch_stats, batch["imgs"], False)
        loss = self.loss_fn(jnp.squeeze(logits), jnp.squeeze(batch["labels"]))
        return {"loss": loss, "logits": logits}


class ClassificationTask(SupervisedTask):
    """Reference ``ClassificationModel``: BCE + epoch AUROC/AUPRC."""

    @staticmethod
    def build_model(cfg: Config, gloria_variables: dict | None = None):
        """Returns (model, init_variables_patch). With a pretrained GLoRIA,
        the full ``img_encoder`` subtree is transplanted
        (reference ``load_img_classification_model``, gloria.py:97-133)."""
        num_cls = int(cfg.model.vision.num_targets or 1)
        name = cfg.model.vision.model_name or "resnet_50"
        if name.startswith("gloria_"):
            name = {"gloria_resnet50": "resnet_50", "gloria_resnet18": "resnet_18"}[name]
        if gloria_variables is not None:
            model = PretrainedImageClassifier(model_name=name, num_classes=num_cls)
            patch = {
                "params": {"img_encoder": gloria_variables["params"]["img_encoder"]},
                "batch_stats": {"img_encoder": gloria_variables["batch_stats"]["img_encoder"]},
            }
            return model, patch
        return ImageClassifier(model_name=name, num_classes=num_cls), None

    def epoch_metrics(self, logits: np.ndarray, labels: np.ndarray) -> dict:
        prob = jax.nn.sigmoid(jnp.asarray(logits))
        labels = np.asarray(labels)
        if labels.ndim == 1:
            labels = labels[:, None]
            prob = np.asarray(prob).reshape(-1, 1)
        return M.classification_metrics(labels, np.asarray(prob))

    @staticmethod
    def write_results(cfg: Config, results: dict):
        if cfg.output_dir:
            with open(os.path.join(cfg.output_dir, "results.csv"), "w") as fp:
                json.dump(results, fp)


class SegmentationTask(SupervisedTask):
    """Reference ``SegmentationModel``: U-Net + Mixed loss + dice metric."""

    @staticmethod
    def build_model(cfg: Config, gloria_variables: dict | None = None):
        name = cfg.model.vision.model_name or "resnet_50"
        if name.startswith("gloria_"):
            name = {"gloria_resnet50": "resnet_50", "gloria_resnet18": "resnet_18"}[name]
        model = ResnetUNet(model_name=name, n_classes=1)
        patch = None
        if gloria_variables is not None:
            patch = {
                "params": {"backbone": gloria_variables["params"]["img_encoder"]["backbone"]},
                "batch_stats": {"backbone": gloria_variables["batch_stats"]["img_encoder"]["backbone"]},
            }
        return model, patch

    def epoch_metrics(self, logits: np.ndarray, labels: np.ndarray) -> dict:
        prob = np.asarray(jax.nn.sigmoid(jnp.asarray(logits))).squeeze(-1) if logits.ndim == 4 else np.asarray(jax.nn.sigmoid(jnp.asarray(logits)))
        return {"dice": M.dice_score(prob, np.asarray(labels))}


class LogSegmentationSamples:
    """Log the first validation sample's input/mask/layered/pred images
    (reference ``SegmentationModel.shared_step`` W&B image logging,
    ``segmentation_model.py:76-95``) through ``MetricLogger.log_image``."""

    def __getattr__(self, name):  # other Callback hooks: no-ops
        if name.startswith("on_"):
            return lambda *a, **k: None
        raise AttributeError(name)

    def on_validation_batch_end(self, trainer, state, metrics, batch, batch_idx):
        if batch_idx != 0 or "logits" not in metrics:
            return
        logger = getattr(trainer, "logger", None)
        if logger is None or not hasattr(logger, "log_image"):
            return
        img = np.asarray(batch["imgs"][0], np.float32)
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-6)
        mask = np.asarray(batch["labels"][0], np.float32).squeeze()
        prob = np.asarray(jax.nn.sigmoid(jnp.asarray(metrics["logits"][0]))).squeeze()
        layered = 0.5 * img[..., :3].mean(-1) + 0.5 * mask
        step = trainer.global_step
        logger.log_image("input_image", img, step)
        logger.log_image("mask", mask, step)
        logger.log_image("layered", layered, step)
        logger.log_image("pred", prob, step)


def graft_pretrained(variables: dict, patch: dict | None) -> dict:
    """Overlay a pretrained-subtree patch onto freshly-initialized variables."""
    if patch is None:
        return variables
    out = jax.tree_util.tree_map(lambda x: x, variables)
    for collection, sub in patch.items():
        for key, subtree in sub.items():
            out[collection][key] = subtree
    return out
