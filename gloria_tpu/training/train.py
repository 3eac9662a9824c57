"""Train state + jitted SPMD train/eval steps.

Replaces the reference's Lightning ``PretrainModel.shared_step`` +
``Trainer`` inner loop (``/root/reference/gloria/lightning/pretrain_model.py:56-81``)
with a single compiled program: forward (bf16-capable), multi-term loss,
grad, clip, optimizer update, and BatchNorm stat update — one XLA executable
per (shapes, mesh) pair.  Sharding comes from the placement of the inputs
(see ``gloria_tpu.parallel.mesh``); GSPMD inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.gloria_model import GLoRIA


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    model, variables: dict, tx: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(variables["params"]),
        rng=rng,
    )


def make_pretrain_steps(
    model: GLoRIA, tx: optax.GradientTransformation, *, loss_chunk: int = 8,
    donate: bool = True, return_attn: bool = False,
) -> tuple[Callable, Callable]:
    """Returns (train_step(state, batch) -> (state, metrics),
                eval_step(state, batch) -> metrics).  Metrics include the
    diagonal attention maps under "_attn" (always for eval; for train only
    when ``return_attn`` — the localization callbacks consume them)."""

    def loss_from_outputs(params, state, batch, outs):
        img_l, img_g, txt_l, txt_g, grid = outs
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            img_l, img_g, txt_l, txt_g,
            batch["cap_lens"], grid, batch.get("segmentation_labels"),
            chunk=loss_chunk,
            method=GLoRIA.calc_loss,
        )

    def train_step(state: TrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            outs, muts = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            loss, metrics, attn = loss_from_outputs(params, state, batch, outs)
            if return_attn:
                metrics["_attn"] = jax.lax.stop_gradient(attn)
            return loss, (metrics, muts["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        return new_state, metrics

    def eval_step(state: TrainState, batch: dict):
        outs = model.apply(state.variables(), batch, train=False)
        loss, metrics, attn = loss_from_outputs(state.params, state, batch, outs)
        metrics = dict(metrics)
        metrics["_attn"] = attn
        return metrics

    jit_train = jax.jit(train_step, donate_argnums=(0,) if donate else ())
    jit_eval = jax.jit(eval_step)
    return jit_train, jit_eval


def make_forward(model: GLoRIA) -> Callable:
    """Jittable deterministic forward: batch → (img_l, img_g, txt_l, txt_g)."""

    def forward(variables, batch):
        img_l, img_g, txt_l, txt_g, _ = model.apply(variables, batch, train=False)
        return img_l, img_g, txt_l, txt_g

    return forward
