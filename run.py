"""Experiment driver: config + CLI overrides → train / validate / test.

Equivalent of the reference ``run.py`` (``/root/reference/run.py:26-292``):
loads a YAML config, applies CLI ablation overrides, seeds, builds the data
module + task + trainer, runs the requested phase(s), and saves the resolved
config and best-checkpoint paths to the output directory.

    python run.py -c configs/chexpert_pretrain_config.yaml --train
    python run.py -c configs/imagenome_pretrain_val_config.yaml --test \
        --ckpt <ckpt-dir>
"""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="gloria_tpu experiment driver")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--val", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--ckpt", default=None, help="checkpoint dir to load/resume")
    p.add_argument("--resume", action="store_true", help="resume optimizer state from --ckpt")
    p.add_argument("--random_seed", type=int, default=None)
    p.add_argument("--train_pct", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--output_dir", default=None)
    # ablation flags (reference run.py:102-115)
    p.add_argument("--randomize_reports", action="store_true")
    p.add_argument("--randomize_objects_mode", default=None,
                   choices=["random_bboxes", "random_sentences", "shuffle"])
    p.add_argument("--swap_left_right", action="store_true")
    p.add_argument("--swap_conditions", action="store_true")
    p.add_argument("--generate_sent", action="store_true")
    p.add_argument("--mask_mode", default=None, choices=["word", "sentence", "entity", "clinical_entity"])
    p.add_argument("--mask_prob", type=float, default=None)
    p.add_argument("--no_attn_vec", action="store_true")
    p.add_argument("--no_attn_loss_weight", type=float, default=None)
    p.add_argument("--attention_divergence_loss_weight", type=float, default=None)
    p.add_argument("--attention_entropy_loss_weight", type=float, default=None)
    p.add_argument("--segmentation_loss_weight", type=float, default=None)
    p.add_argument("--limit_batches", type=int, default=None, help="cap batches/epoch (debug)")
    p.add_argument("--fused_kernel", action="store_true",
                   help="route the O(B²) local-matching sims through the Pallas kernel")
    p.add_argument("--profile", type=int, default=None, metavar="N",
                   help="capture a jax.profiler device trace of N steady-state "
                        "train steps to <output_dir>/profile (TensorBoard/"
                        "Perfetto-viewable)")
    p.add_argument("--accumulate_grad_batches", type=int, default=None,
                   help="Lightning-style gradient accumulation: G loader "
                        "batches per optimizer step (grads averaged, BN stats "
                        "per micro-batch; contrastive negatives stay per-"
                        "micro-batch, as in Lightning)")
    p.add_argument("--steps_per_dispatch", type=int, default=None,
                   help="device-resident loop K (pretrain only): run K FULL "
                        "train steps (K optimizer updates — reference "
                        "semantics, unlike --accumulate_grad_batches) per XLA "
                        "dispatch from K stacked loader batches; amortizes "
                        "per-dispatch host overhead. Incompatible with "
                        "accumulation and train-time attention callbacks")
    p.add_argument("--loss_chunk", type=int, default=None,
                   help="text-chunk size for the O(B²) pairwise loss (scan+remat); "
                        "default: batch-keyed auto (unchunked ≤128, chunk=8 above)")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over the transformer towers")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host SPMD (DCN)")
    p.add_argument("--n_seeds", type=int, default=1,
                   help="repeat the experiment over consecutive seeds (reference run.py seed loop)")
    return p


def apply_overrides(cfg, args) -> None:
    if args.random_seed is not None:
        cfg.random_seed = args.random_seed
    if args.batch_size is not None:
        cfg.set_path("train.batch_size", args.batch_size)
    if args.max_epochs is not None:
        cfg.set_path("lightning.trainer.max_epochs", args.max_epochs)
    if args.train_pct is not None:
        cfg.set_path("data.frac", args.train_pct)
    if args.randomize_reports:
        cfg.set_path("data.randomize_reports", True)
    if args.randomize_objects_mode:
        cfg.set_path("data.randomize_objects_mode", args.randomize_objects_mode)
    if args.swap_left_right:
        cfg.set_path("data.swap_left_right", True)
    if args.swap_conditions:
        cfg.set_path("data.swap_conditions", True)
    if args.generate_sent:
        cfg.set_path("data.generate_sent", True)
    if args.mask_mode:
        cfg.set_path("data.mask_mode", args.mask_mode)
    if args.mask_prob is not None:
        cfg.set_path("data.mask_prob", args.mask_prob)
    if args.limit_batches is not None:
        cfg.set_path("lightning.trainer.limit_train_batches", args.limit_batches)
        cfg.set_path("lightning.trainer.limit_val_batches", args.limit_batches)
    if args.no_attn_vec:
        cfg.set_path("model.gloria.no_attn_vec", True)
    if args.fused_kernel:
        cfg.set_path("model.gloria.fused_kernel", True)
    if args.loss_chunk is not None:
        cfg.set_path("train.loss_chunk", args.loss_chunk)
    if args.accumulate_grad_batches is not None:
        cfg.set_path("lightning.trainer.accumulate_grad_batches",
                     args.accumulate_grad_batches)
    if args.steps_per_dispatch is not None:
        cfg.set_path("train.steps_per_dispatch", args.steps_per_dispatch)
    for key in ("no_attn_loss_weight", "attention_divergence_loss_weight",
                "attention_entropy_loss_weight", "segmentation_loss_weight"):
        value = getattr(args, key)
        if value is not None:
            cfg.set_path(f"model.gloria.{key}", value)


def main(cfg, args) -> dict:
    import jax
    import jax.numpy as jnp

    # honor JAX_PLATFORMS even when a PJRT plugin overrides it at import
    # (the axon TPU plugin does): `JAX_PLATFORMS=cpu python run.py` must be
    # a hermetic CPU run, same pin as bench.py --smoke / tests/conftest.py
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    # persistent compilation cache: re-running an experiment (seed sweeps,
    # resumes, ablation grids over non-shape flags) skips the multi-minute
    # first compile of the train step
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("GLORIA_COMPILE_CACHE", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from gloria_tpu import builder
    from gloria_tpu.data import device_batch
    from gloria_tpu.data.data_module import build_data_module
    from gloria_tpu.parallel import (
        create_mesh, replicate, shard_batch, shard_batch_per_host, shard_params,
    )
    from gloria_tpu.training import optim
    from gloria_tpu.training.checkpoints import (
        CheckpointManager, load_checkpoint, load_checkpoint_meta,
    )
    from gloria_tpu.training.tasks import ClassificationTask, SegmentationTask, build_loss, graft_pretrained
    from gloria_tpu.training.trainer import Trainer
    from gloria_tpu.utils.logging import MetricLogger

    phase = (cfg.phase or "pretrain").lower()
    mesh = (create_mesh(fsdp=max(1, args.fsdp), tp=max(1, getattr(args, "tp", 1)))
            if jax.device_count() > 1 else None)
    def to_device(batch):
        b = device_batch(batch)
        if mesh is not None and jax.process_count() > 1:
            # each process's loader holds only its LOCAL rows (the data module
            # strides the dataset by process); assemble the global sharded
            # array across hosts
            b = shard_batch_per_host(b, mesh)
        else:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            if mesh is not None:
                b = shard_batch(b, mesh)
        b.update({k: v for k, v in batch.items() if k.startswith("_")})
        return b

    dm = build_data_module(cfg, to_device=to_device)
    ckpt_cfg = (cfg.lightning.checkpoint_callback if cfg.lightning else None) or {}
    manager = CheckpointManager(
        Path(cfg.output_dir) / "ckpt",
        monitor=ckpt_cfg.get("monitor", "val_loss"),
        mode=ckpt_cfg.get("mode", "min"),
        save_top_k=int(ckpt_cfg.get("save_top_k", 1)),
        save_last=bool(ckpt_cfg.get("save_last", True)),
        # overlap the disk write with the next epoch's training; the trainer
        # waits for durability at fit() exit and on preemption saves
        async_save=bool(ckpt_cfg.get("async_save", False)),
    )
    # self-contained checkpoints: persist the training vocab once so
    # api.load_gloria(<ckpt>) restores the exact tokenizer with no corpus
    if getattr(dm, "tokenizer", None) is not None:
        manager.save_tokenizer(dm.tokenizer)
    # reference run.py:137-144 instantiates the logger class named by
    # cfg.lightning.logger.logger_type (WandbLogger in the shipped configs);
    # here the same key opts the MetricLogger into its wandb mirror
    logger_cfg = cfg.lightning.logger if cfg.lightning else None
    use_wandb = bool(logger_cfg) and "wandb" in str(logger_cfg.logger_type or "").lower()
    logger = MetricLogger(cfg.output_dir, project=logger_cfg.project if logger_cfg else None,
                          experiment=cfg.experiment_name, use_wandb=use_wandb)

    train_loader = None
    pretrained_vars = None
    if args.ckpt:
        pretrained_vars, _ = load_checkpoint(args.ckpt)

    if phase == "pretrain":
        example = device_batch(dm.collate("train")([dm.dataset("train")[0]] * 2))
        loc_cfg = cfg.lightning.evaluate_localization if cfg.lightning else None
        wil_cfg = cfg.lightning.weight_instances_by_localization if cfg.lightning else None
        wants_attn = bool(loc_cfg or wil_cfg or (cfg.train and cfg.train.nvis))
        model, state, train_step, eval_step = builder.init_gloria(
            cfg, example, seed=int(cfg.random_seed or 0),
            dtype=jnp.bfloat16 if str(cfg.lightning.trainer.precision or "") in ("16", "bf16") else jnp.float32,
            return_attn=wants_attn,
        )
        if pretrained_vars is not None:
            state = state.replace(params=pretrained_vars["params"],
                                  batch_stats=pretrained_vars.get("batch_stats"))
            if args.resume and "opt_state" in pretrained_vars:
                # re-restore against the live state as the target so the
                # optimizer pytree structure (optax namedtuples) is preserved
                restored, _ = load_checkpoint(args.ckpt, target={
                    "params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step,
                })
                state = state.replace(opt_state=restored["opt_state"],
                                      step=jnp.asarray(restored["step"], jnp.int32))
        callbacks = []
        if args.profile:
            from gloria_tpu.training.trainer import ProfileTrace

            callbacks.append(ProfileTrace(Path(cfg.output_dir) / "profile",
                                          steps=int(args.profile)))
        if cfg.train and cfg.train.nvis:
            from gloria_tpu.training.plotting import AttentionPlotCallback

            callbacks.append(AttentionPlotCallback(cfg))
        if wil_cfg:
            from gloria_tpu.training.localization import WeightInstancesByLocalization

            # must be the SAME loader instance the trainer iterates, so the
            # epoch-end sampler weights take effect
            train_loader = dm.train_dataloader()
            callbacks.append(WeightInstancesByLocalization(
                train_loader, len(dm.dataset("train")),
                weight_mode=wil_cfg.weight_mode or "attn_entropy",
                temp=float(wil_cfg.temp or 0.2),
            ))
        if loc_cfg:
            from gloria_tpu.training.localization import EvaluateLocalization

            callbacks.append(EvaluateLocalization(
                cfg, save_dir=Path(cfg.output_dir) / "localization",
                eval_attn_overlay_mode=loc_cfg.eval_attn_overlay_mode or "upsample",
                plot_attn_overlay_mode=loc_cfg.plot_attn_overlay_mode or "upsample",
                log_train_every=int(loc_cfg.log_train_every or 100),
                save_full_data=bool(cfg.data.gold_test) if cfg.data else False,
            ))
        trainer = Trainer(cfg, train_step, eval_step,
                          logger=logger, checkpoints=manager, callbacks=callbacks)
        if args.resume and args.ckpt:
            # Lightning resume_from_checkpoint parity: continue epoch
            # numbering, data order, and plateau/early-stop history
            trainer.load_state_dict(load_checkpoint_meta(args.ckpt).get("trainer_state", {}))
    else:
        task_cls = ClassificationTask if phase == "classification" else SegmentationTask
        if builder.steps_per_dispatch(cfg) > 1:
            raise ValueError("--steps_per_dispatch is pretrain-only; the "
                             "classification/segmentation tasks dispatch per "
                             "batch (their epochs are metric-callback bound)")
        model, patch = task_cls.build_model(cfg, gloria_variables=pretrained_vars)
        tx = optim.make_optimizer(cfg, grad_clip=float(cfg.lightning.trainer.gradient_clip_val or 0) or None)
        accum = builder.accumulate_grad_batches(cfg)
        task = task_cls(model, build_loss(cfg), tx, accum_steps=accum)
        example = dm.collate("train")([dm.dataset("train")[0]] * 2)
        state = task.init_state(example)
        if patch is not None:
            merged = graft_pretrained({"params": state.params, "batch_stats": state.batch_stats}, patch)
            state = state.replace(params=merged["params"], batch_stats=merged["batch_stats"])
        if cfg.model.vision.freeze_cnn:
            labels = optim.partition_trainable(state.params, optim.trainable_predicate(cfg))
            tx = optim.freeze_wrap(tx, labels)
            task = task_cls(model, build_loss(cfg), tx, accum_steps=accum)
            state = state.replace(opt_state=tx.init(state.params))

        def extractor(collected):
            if not collected:
                return {}
            logits = np.concatenate([c["logits"] for c in collected])
            labels_ = np.concatenate([c["labels"] for c in collected])
            return {f"val_{k}": v for k, v in task.epoch_metrics(logits, labels_).items()}

        def eval_with_labels(s, b):
            out = task.eval_step(s, b)
            return {**out, "labels": b["labels"]}

        task_callbacks = []
        if phase == "segmentation":
            from gloria_tpu.training.tasks import LogSegmentationSamples

            task_callbacks.append(LogSegmentationSamples())
        trainer = Trainer(cfg, task.train_step, eval_with_labels,
                          logger=logger, checkpoints=manager, metric_extractor=extractor,
                          callbacks=task_callbacks)

    if mesh is not None:
        state = state.replace(params=shard_params(state.params, mesh),
                              batch_stats=replicate(state.batch_stats, mesh),
                              opt_state=shard_params(state.opt_state, mesh))

    results = {}
    if args.train:
        if train_loader is None:
            train_loader = dm.train_dataloader()
        state = trainer.fit(state, train_loader, dm.val_dataloader())
        results["best_ckpt"] = manager.best()
    if args.val:
        results["val"] = trainer.validate(state, dm.val_dataloader())
    if args.test:
        results["test"] = trainer.test(state, dm.test_dataloader())
    return results


if __name__ == "__main__":
    from gloria_tpu.configs import load_config, save_config

    args = get_parser().parse_args()
    if args.multihost:
        import jax

        jax.distributed.initialize()  # coordinator/process env-driven

    base_cfg = load_config(args.config)
    apply_overrides(base_cfg, args)
    base_seed = int(base_cfg.random_seed or 0)

    best_ckpts = {}
    for split_idx in range(max(1, args.n_seeds)):
        cfg = load_config(args.config)
        apply_overrides(cfg, args)
        cfg.random_seed = base_seed + split_idx
        np.random.seed(int(cfg.random_seed))

        stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        base = args.output_dir or cfg.base_output_dir or "./output"
        name = f"{cfg.experiment_name or 'experiment'}_{stamp}"
        if args.n_seeds > 1:
            name += f"_seed{cfg.random_seed}"
        cfg.output_dir = os.path.join(base, name)
        os.makedirs(cfg.output_dir, exist_ok=True)
        save_config(cfg, os.path.join(cfg.output_dir, "config.yaml"))

        out = main(cfg, args)
        if out.get("best_ckpt"):
            best_ckpts[f"seed_{cfg.random_seed}"] = out["best_ckpt"]
            # durable after every seed, and BEFORE touching stdout: a driver
            # that captured our pipe may be gone, making print() raise
            # BrokenPipeError — the ckpt index must not die with it
            import yaml

            with open(os.path.join(base, "best_ckpts.yaml"), "w") as fh:
                yaml.safe_dump(best_ckpts, fh)
        try:
            print(out)
        except BrokenPipeError:
            pass
