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
from ..ops import gloria_loss


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
    model: GLoRIA, tx: optax.GradientTransformation, *, loss_chunk: int = 0,
    donate: bool = True, return_attn: bool = False, dropout_impl: str = "rbg",
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

    def diag_sims(params, batch, outs):
        """Per-pair (i, i) eval-path similarities — the reference callback
        persists ``diagonal(get_local_similarities)`` and
        ``diagonal(get_global_similarities)`` per sentence row
        (``callbacks.py:385-408``).  Eval temps are the reference's hardcoded
        4.0/5.0 (``gloria_model.py:171-207``).  Only the aligned pairs are
        computed (O(B), not the full O(B²) pairwise matrix)."""
        img_l, img_g, txt_l, txt_g, _ = outs
        local = gloria_loss.local_similarities_eval_diag(
            img_l, txt_l, batch["cap_lens"], temp1=4.0, temp2=5.0,
            sink=params.get("no_attn_vec"),
        )
        glob = gloria_loss.global_similarities(img_g, txt_g)
        return local, jnp.diagonal(glob)

    def _dropout_rng(rng, step):
        """Per-step dropout key; bit generation per ``dropout_impl``.

        Default "rbg" (XLA RngBitGenerator): threefry mask generation for
        BERT's 12 dropout layers costs ~12.6 ms/step at B=48 on v5e
        (measured: text encoder fwd+bwd 34.2 ms with threefry dropout vs
        21.6 ms without); the hardware rng_bit_generator is effectively
        free.  The trade-off: rbg bits are documented as implementation-
        and sharding-dependent, so dropout masks are NOT bit-reproducible
        across backends or mesh shapes (the masks are still valid i.i.d.
        draws — training statistics are unaffected).  Pass
        ``dropout_impl="threefry"`` (cfg ``train.dropout_rng``) when
        bit-exact cross-sharding reproducibility matters more than the
        ~16% step-time cost.  The stored ``state.rng`` stays a raw threefry
        key either way so checkpoints serialize as plain arrays."""
        folded = jax.random.fold_in(rng, step)  # raw [2] uint32
        if dropout_impl == "threefry":
            return folded
        return jax.random.wrap_key_data(jnp.tile(folded, 2), impl="rbg")

    def train_step(state: TrainState, batch: dict):
        rng = _dropout_rng(state.rng, state.step)

        def loss_fn(params):
            outs, muts = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            loss, metrics, attn = loss_from_outputs(params, state, batch, outs)
            if return_attn:
                metrics["_attn"] = jax.lax.stop_gradient(attn)
                loc, glo = diag_sims(params, batch, outs)
                metrics["_local_sims"] = jax.lax.stop_gradient(loc)
                metrics["_global_sims"] = jax.lax.stop_gradient(glo)
            return loss, (metrics, muts["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        total_notfinite = optax.tree_utils.tree_get(new_opt, "total_notfinite")
        if total_notfinite is not None:  # skip-on-nonfinite guard active
            metrics["nonfinite_steps"] = total_notfinite
            # the guard zeroes the param update, but a NaN *forward* would
            # still have poisoned the BN running stats — keep the previous
            # stats on skipped steps (tiny per-channel tensors, fused selects)
            ok = jnp.isfinite(metrics["grad_norm"])
            if new_stats is not None:
                new_stats = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), new_stats, state.batch_stats)
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
        loc, glo = diag_sims(state.params, batch, outs)
        metrics["_local_sims"] = loc
        metrics["_global_sims"] = glo
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
