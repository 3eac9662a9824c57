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
    accum_steps: int = 1, steps_per_dispatch: int = 1,
) -> tuple[Callable, Callable]:
    """Returns (train_step(state, batch) -> (state, metrics),
                eval_step(state, batch) -> metrics).  Metrics include the
    diagonal attention maps under "_attn" (always for eval; for train only
    when ``return_attn`` — the localization callbacks consume them).

    ``accum_steps=G > 1`` (Lightning ``accumulate_grad_batches``, which the
    reference's ``Trainer.add_argparse_args`` passthrough exposed,
    ``run.py:116``): the train step then takes batch leaves stacked
    ``[G, b, ...]``, runs G sequential micro-batch forward/backward passes
    under ``lax.scan`` (grads averaged, BatchNorm stats updated per
    micro-batch — Lightning's semantics exactly), and applies ONE optimizer
    update.  The contrastive losses stay per-micro-batch (negatives do NOT
    span micro-batches — same as Lightning; use real large batches +
    ``loss_chunk`` when large-batch InfoNCE semantics are wanted).  Peak
    activation memory stays that of one micro-batch, so G scales the
    effective Adam batch far past HBM limits.

    ``steps_per_dispatch=K > 1`` is the *device-resident* loop: the train
    step takes K stacked loader batches ``[K, b, ...]`` and runs K FULL
    train steps — K forward/backward passes AND K optimizer updates — inside
    one ``lax.scan``, i.e. one XLA dispatch.  Unlike accumulation this
    preserves the reference's semantics exactly (one Adam update per batch
    of b pairs); it only amortizes the per-dispatch host cost (Python
    dispatch + tunnel round-trip + the unfused optimizer tail) over K steps.
    Metrics are averaged over the window.  Mutually exclusive with
    ``accum_steps`` and ``return_attn`` (per-step attention/sims would need
    per-step host readback, defeating the point — keep K=1 for callback
    cadences)."""
    if accum_steps > 1 and return_attn:
        raise ValueError(
            "accumulate_grad_batches > 1 is not supported together with "
            "train-time attention callbacks (return_attn): per-sample attention "
            "rows would span micro-batches. Run EvaluateLocalization on the "
            "val/test loaders instead.")
    if steps_per_dispatch > 1 and (accum_steps > 1 or return_attn):
        raise ValueError(
            "steps_per_dispatch > 1 composes with neither "
            "accumulate_grad_batches > 1 nor train-time attention callbacks "
            "(return_attn); run those at K=1.")

    def loss_from_outputs(params, stats, batch, outs):
        img_l, img_g, txt_l, txt_g, grid = outs
        return model.apply(
            {"params": params, "batch_stats": stats},
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
            loss, metrics, attn = loss_from_outputs(params, state.batch_stats, batch, outs)
            if return_attn:
                metrics["_attn"] = jax.lax.stop_gradient(attn)
                loc, glo = diag_sims(params, batch, outs)
                metrics["_local_sims"] = jax.lax.stop_gradient(loc)
                metrics["_global_sims"] = jax.lax.stop_gradient(glo)
            return loss, (metrics, muts["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _apply_grads(state, grads, metrics, new_stats)

    def _apply_grads(state: TrainState, grads, metrics, new_stats):
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

    def train_step_accum(state: TrainState, batch: dict):
        """One optimizer step from ``accum_steps`` stacked micro-batches
        (leaves ``[G, b, ...]``): sequential fwd/bwd under ``lax.scan`` with
        per-micro-batch dropout keys and BN-stat updates, mean of the G
        gradients applied once."""
        base_rng = jax.random.fold_in(state.rng, state.step)

        def micro(carry, inputs):
            stats, grad_sum, metric_sum = carry
            i, mb = inputs

            def loss_fn(params):
                folded = jax.random.fold_in(base_rng, i)
                rng = (folded if dropout_impl == "threefry"
                       else jax.random.wrap_key_data(jnp.tile(folded, 2), impl="rbg"))
                outs, muts = model.apply(
                    {"params": params, "batch_stats": stats},
                    mb, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
                loss, metrics, _ = loss_from_outputs(params, stats, mb, outs)
                return loss, (metrics, muts["batch_stats"])

            (_, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            metric_sum = jax.tree_util.tree_map(jnp.add, metric_sum, metrics)
            return (new_stats, grad_sum, metric_sum), None

        # trace one micro-batch to get the metrics structure for the carry
        mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        metrics_shape = jax.eval_shape(
            lambda p, s, b: loss_from_outputs(
                p, s, b,
                model.apply({"params": p, "batch_stats": s}, b, train=False))[1],
            state.params, state.batch_stats, mb0)
        zeros_metrics = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), metrics_shape)
        zeros_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        # window size from the stacked shape, NOT the configured accum_steps:
        # the trainer flushes a trailing incomplete window (< accum_steps
        # micro-batches) at epoch end with this same step function
        g = jax.tree_util.tree_leaves(batch)[0].shape[0]
        (new_stats, grad_sum, metric_sum), _ = jax.lax.scan(
            micro, (state.batch_stats, zeros_grads, zeros_metrics),
            (jnp.arange(g), batch))
        grads = jax.tree_util.tree_map(lambda x: x / g, grad_sum)
        metrics = jax.tree_util.tree_map(lambda m: m / g, metric_sum)
        return _apply_grads(state, grads, metrics, new_stats)

    def train_step_multi(state: TrainState, batch: dict):
        """K device-resident train steps in one dispatch (leaves [K, b, ...]);
        K optimizer updates — reference semantics, unlike accumulation."""

        def body(st, mb):
            return train_step(st, mb)

        state, metrics = jax.lax.scan(body, state, batch)
        # scalar metrics (loss terms, grad_norm) → window mean; the nonfinite
        # counter is monotone in the opt state, so its window mean is between
        # the first and last step values — report the last instead
        metrics = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
        if "nonfinite_steps" in metrics:
            metrics["nonfinite_steps"] = optax.tree_utils.tree_get(
                state.opt_state, "total_notfinite")
        return state, metrics

    def eval_step(state: TrainState, batch: dict):
        outs = model.apply(state.variables(), batch, train=False)
        loss, metrics, attn = loss_from_outputs(state.params, state.batch_stats, batch, outs)
        metrics = dict(metrics)
        metrics["_attn"] = attn
        loc, glo = diag_sims(state.params, batch, outs)
        metrics["_local_sims"] = loc
        metrics["_global_sims"] = glo
        return metrics

    step_fn = (train_step_accum if accum_steps > 1
               else train_step_multi if steps_per_dispatch > 1 else train_step)
    jit_train = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    jit_eval = jax.jit(eval_step)
    return jit_train, jit_eval


def make_forward(model: GLoRIA) -> Callable:
    """Jittable deterministic forward: batch → (img_l, img_g, txt_l, txt_g)."""

    def forward(variables, batch):
        img_l, img_g, txt_l, txt_g, _ = model.apply(variables, batch, train=False)
        return img_l, img_g, txt_l, txt_g

    return forward
