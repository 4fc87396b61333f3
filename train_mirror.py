#!/usr/bin/env python
"""MIRROR pretraining entry point (TPU).

CLI-compatible rebuild of /root/reference/train_mirror.py:
``python train_mirror.py --config configs/pretrain/mirror.yaml --fold-nb 0``
with CLI flags overriding YAML. The torchrun launcher disappears: one process
drives all chips via SPMD over the device mesh.
"""

import logging

import jax
import jax.numpy as jnp

from mirror_tpu.config import parse_args, resolve_lr, resolve_use_pallas
from mirror_tpu.data import Loader, PretrainDataset
from mirror_tpu.losses import MirrorLossWeights
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
from mirror_tpu.train.steps import make_mirror_eval_step, make_mirror_train_step
from mirror_tpu.utils import AverageMeter

_logger = logging.getLogger("train")


def main(argv=None):
    args, args_text = parse_args("pretrain", argv)
    rng, mesh, out_dir = common_setup(args, "pretrain")
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
    if model_kwargs.get("rna_embed_dim") not in (None, dataset.rna_dim):
        _logger.warning(
            "model_kwargs rna_embed_dim=%s != dataset rna dim %d; using dataset",
            model_kwargs.get("rna_embed_dim"), dataset.rna_dim,
        )
    model_kwargs["rna_embed_dim"] = dataset.rna_dim
    model_kwargs.setdefault("wsi_num_tokens", args.num_wsi_feature_tokens)
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

    # init params on a host-shaped dummy batch
    wsi_dim = model.wsi_embed_dim
    dummy = {
        "wsi": jnp.zeros((2, args.num_wsi_feature_tokens, wsi_dim), jnp.float32),
        "rna": jnp.zeros((2, dataset.rna_dim), jnp.float32),
    }
    init_rngs = dict(
        zip(["params", "dropout", "masking", "style"], jax.random.split(rng, 4))
    )
    variables = jax.jit(
        lambda r, w, x: model.init(
            r, w, x, args.wsi_mask_ratio, args.rna_mask_ratio, True
        ),
        static_argnums=(),
    )(init_rngs, dummy["wsi"], dummy["rna"])
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    _logger.info("Model %s created, param count: %d", args.model, n_params)

    dataset.train()
    train_loader = Loader(
        dataset, args.batch_size, shuffle=True, drop_last=True, seed=args.seed,
        native_threads=args.workers,
    )
    # the schedule advances once per REAL update (ref train_mirror.py:954-956)
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

    loss_weights = MirrorLossWeights(
        alignment=float((args.loss_kwargs or {}).get("alignment_loss_weight", 0.5)),
        wsi_retention=float(
            (args.loss_kwargs or {}).get("wsi_retention_loss_weight", 0.1)
        ),
        rna_retention=float(
            (args.loss_kwargs or {}).get("rna_retention_loss_weight", 0.1)
        ),
        style=float((args.loss_kwargs or {}).get("style_loss_weight", 0.1)),
        cluster=float((args.loss_kwargs or {}).get("cluster_loss_weight", 0.2)),
    )
    alignment_loss_fn = None
    if args.contrastive_negatives == "local" and n_devices > 1:
        from functools import partial

        from mirror_tpu.losses import local_clip_loss

        alignment_loss_fn = partial(local_clip_loss, mesh=mesh)
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
    train_step = make_mirror_train_step(
        model, tx, loss_weights,
        wsi_mask_ratio=args.wsi_mask_ratio,
        rna_mask_ratio=args.rna_mask_ratio,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        ema_warmup=args.model_ema_warmup,
        schedule=schedule,
        alignment_loss_fn=alignment_loss_fn,
        watch=args.wandb_watch,
    )
    eval_step = jax.jit(
        make_mirror_eval_step(
            model, loss_weights, args.wsi_mask_ratio, args.rna_mask_ratio,
            alignment_loss_fn=alignment_loss_fn,
        )
    )

    eval_fn = None
    if args.val and args.split_dir is not None:
        val_batch = args.validation_batch_size or args.batch_size
        # pad the batch to a device multiple so eval shards over ALL chips and
        # XLA compiles one shape; batch["valid"] masks padded rows out of the
        # loss (incl. the contrastive logit matrix). The result matches the
        # unpadded value up to the reference's GLOBAL-max pinv-scaling quirk,
        # through which any batch row can nudge the shared z0 scale —
        # repeat-row padding measured bit-equal on synthetic data, and the
        # residual coupling is bounded ~1e-4 even for adversarial padding
        # (tests/test_eval_tail.py::test_model_forward_pad_coupling)
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
                step_rng = jax.random.fold_in(root_rng, 10_000_000 + epoch * 10_000 + i)
                metrics = eval_step(state.params, batch, step_rng)
                for k, v in metrics.items():
                    meters.setdefault(k, AverageMeter()).update(float(v), n_valid)
            out = {k: m.avg for k, m in meters.items()}
            dataset.train()
            return out

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
