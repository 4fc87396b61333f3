#!/usr/bin/env python
"""Vanilla CLIP-style (InfoNCE) pretraining entry point (TPU).

CLI-compatible rebuild of /root/reference/train_pretrain.py: a dual-encoder
model returning (wsi_emb, rna_emb) trained with InfoNCE over in-batch
negatives. The reference registers no such model (SURVEY.md section 2.4) —
``mirror_dual`` (TransMIL + TransFormer with projection heads) fills that gap
and is the default here.
"""

import logging

import jax
import jax.numpy as jnp

from mirror_tpu.config import parse_args, resolve_lr, resolve_use_pallas
from mirror_tpu.data import Loader, PretrainDataset
from mirror_tpu.parallel import allgather_rows, shard_batch, shard_state
from mirror_tpu.registry import create_model
from mirror_tpu.train import (
    CheckpointSaver,
    TrainHarness,
    common_setup,
    create_train_state,
    load_pretrained,
    make_optimizer,
    make_schedule,
    resume_checkpoint,
)
from mirror_tpu.train.steps import make_clip_eval_step, make_clip_train_step
from mirror_tpu.utils import AverageMeter

_logger = logging.getLogger("train")


def main(argv=None):
    args, args_text = parse_args("pretrain", argv)
    if args.model == "mirror":
        args.model = "mirror_dual"
    rng, mesh, out_dir = common_setup(args, "pretrain_clip")
    # batch sharding rides the DATA axis only (shard_batch); with
    # --model-parallel the model axis must not enter batch divisibility
    n_devices = mesh.shape["data"]

    dataset = PretrainDataset(
        args.wsi_feature_dir,
        args.rna_feature_csv,
        num_wsi_feature_tokens=args.num_wsi_feature_tokens,
        splits=args.split_dir,
        k=args.k,
        cache=args.cache,
    )
    dataset.update_fold_nb(args.fold_nb)

    model_kwargs = dict(args.model_kwargs or {})
    model_kwargs["rna_embed_dim"] = dataset.rna_dim
    if args.amp:
        model_kwargs.setdefault("dtype", args.amp_dtype)
    model_kwargs.setdefault("use_pallas", resolve_use_pallas(args))
    model_kwargs.setdefault("pinv_grad", args.pinv_grad)
    model_kwargs.setdefault("grad_checkpointing", args.grad_checkpointing)
    model = create_model(args.model, **model_kwargs)

    if args.batch_size % n_devices:
        raise SystemExit(
            f"batch_size {args.batch_size} must divide over the data axis "
            f"({n_devices} shards)"
        )

    wsi_dim = model.wsi_embed_dim
    dummy_wsi = jnp.zeros((2, args.num_wsi_feature_tokens, wsi_dim), jnp.float32)
    dummy_rna = jnp.zeros((2, dataset.rna_dim), jnp.float32)
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    params = jax.jit(lambda r: model.init(r, dummy_wsi, dummy_rna, True))(
        init_rngs
    )["params"]
    _logger.info(
        "Model %s created, param count: %d",
        args.model, sum(x.size for x in jax.tree.leaves(params)),
    )

    dataset.train()
    train_loader = Loader(
        dataset, args.batch_size, shuffle=True, drop_last=True, seed=args.seed,
        native_threads=args.workers,
    )
    updates_per_epoch = max(
        (len(train_loader) + args.grad_accum_steps - 1) // args.grad_accum_steps, 1
    )

    lr = resolve_lr(args, args.batch_size)
    schedule = make_schedule(args, updates_per_epoch, lr)
    tx = make_optimizer(args, schedule)
    lr_controller = None
    if args.use_sched and args.sched == "plateau":
        from mirror_tpu.train.optim import PlateauController

        lr_controller = PlateauController.from_args(args, lr, decreasing_metric=True)
    state = create_train_state(params, tx, model_ema=args.model_ema)
    start_epoch = 0
    if args.initial_checkpoint:
        state = state.replace(
            params=load_pretrained(state.params, args.initial_checkpoint)
        )
    if args.resume:
        state, start_epoch = resume_checkpoint(
            state, args.resume, resume_opt=not args.no_resume_opt
        )
        if lr_controller is not None and not args.no_resume_opt:
            lr_controller.sync_from_state(state)
    if args.start_epoch is not None:
        # an explicit --start-epoch always overrides the resume epoch
        # (ref train_mirror.py:966-968)
        start_epoch = args.start_epoch
    args.start_epoch = start_epoch
    if start_epoch > 0:
        # timm fast-forwards its scheduler to start_epoch (ref
        # train_mirror.py:971-975); our schedule count lives in opt_state
        # and survives --resume, so this only advances counts still at 0
        # (--no-resume-opt, or --start-epoch on a fresh run)
        from mirror_tpu.train.optim import fast_forward_schedule

        state = state.replace(opt_state=fast_forward_schedule(
            state.opt_state, start_epoch * updates_per_epoch
        ))
        if lr_controller is not None and (
            not args.resume or args.no_resume_opt
        ):
            # plateau: exit warmup and write base_lr into HostLRState so
            # the first resumed epoch doesn't train at warmup_lr
            state = lr_controller.step_epoch(state, start_epoch - 1, None)
    state = shard_state(mesh, state, zero1=args.optimizer_sharding)  # TP/ZeRO-1-aware; == replicate by default

    contrastive_loss_fn = None
    if args.contrastive_negatives == "local" and n_devices > 1:
        from functools import partial

        from mirror_tpu.losses import local_info_nce

        contrastive_loss_fn = partial(
            local_info_nce, mesh=mesh, temperature=args.temperature,
        )
        _logger.info("contrastive loss: per-chip LOCAL negatives (parity mode)")
        if args.batch_size // n_devices < 2:
            _logger.warning(
                "local negatives with %d sample/shard: the in-shard "
                "contrastive term is degenerate (a 1-row batch has no "
                "negatives, loss==0 — true of reference DDP at per-rank "
                "batch 1 too); raise --batch-size or use "
                "--contrastive-negatives global",
                args.batch_size // n_devices,
            )
    train_step = make_clip_train_step(
        model, tx, temperature=args.temperature,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        ema_warmup=args.model_ema_warmup,
        schedule=schedule,
        watch=args.wandb_watch,
        contrastive_loss_fn=contrastive_loss_fn,
    )
    eval_step = jax.jit(make_clip_eval_step(
        model, temperature=args.temperature,
        contrastive_loss_fn=contrastive_loss_fn,
    ))

    eval_fn = None
    if args.val and args.split_dir is not None:
        val_batch = args.validation_batch_size or args.batch_size
        # pad+mask the tail so eval shards over all chips with one compiled
        # shape; info_nce's valid mask keeps the contrastive loss exact
        val_batch = ((val_batch + n_devices - 1) // n_devices) * n_devices

        def eval_fn(state, epoch, root_rng):
            val_ds = dataset.val()
            loader = Loader(
                val_ds, val_batch, shuffle=False, drop_last=False, pad_last=True,
                seed=args.seed, native_threads=args.workers,
            )
            # fresh token subsample per eval epoch (the reference redraws via
            # the global RNG each validate) — a fixed epoch-0 draw would let
            # best-checkpoint selection overfit one particular subsample of
            # each long slide (same guard as harness.gather_eval_outputs)
            loader.set_epoch(epoch)
            meters = {}
            for i, host_batch in enumerate(loader):
                # GLOBAL valid count: multi-host batches are per-process
                # blocks, and a block can be entirely tail-padding (local
                # count 0) while the psum'd metric values are global and
                # identical on every process — the weights must match
                n_valid = int(allgather_rows(host_batch["valid"]).sum())
                batch = shard_batch(mesh, host_batch)
                step_rng = jax.random.fold_in(root_rng, 20_000_000 + epoch * 10_000 + i)
                metrics = eval_step(state.params, batch, step_rng)
                for k, v in metrics.items():
                    meters.setdefault(k, AverageMeter()).update(float(v), n_valid)
            dataset.train()
            return {k: m.avg for k, m in meters.items()}

    saver = None
    if out_dir:
        saver = CheckpointSaver(
            out_dir, arch=args.model, args_text=args_text,
            decreasing=True, max_history=args.checkpoint_hist,
            fmt=args.ckpt_format,
        )
    from mirror_tpu.train.optim import scheduled_epochs

    harness = TrainHarness(
        args, mesh, state, train_step, train_loader, eval_fn, saver, out_dir,
        rng, eval_metric=args.eval_metric, decreasing_metric=True,
        schedule=schedule,
        lr_controller=lr_controller, num_epochs=scheduled_epochs(args),
    )
    return harness.run()


if __name__ == "__main__":
    main()
