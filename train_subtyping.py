#!/usr/bin/env python
"""Cancer-subtyping fine-tuning / linear-probe entry point (TPU).

CLI-compatible rebuild of /root/reference/train_subtyping.py: loads a
pretrain checkpoint non-strict, optionally freezes everything but the head
(linear probe), trains with (label-smoothed) cross-entropy and reports
acc / AUROC / F1 computed globally on device-gathered logits.
"""

import logging

import jax
import jax.numpy as jnp


from mirror_tpu.config import parse_args, resolve_lr, resolve_use_pallas
from mirror_tpu.data import Loader, SubtypingDataset
from mirror_tpu.parallel import fit_mesh_to_batch, shard_state
from mirror_tpu.registry import create_model
from mirror_tpu.train import (
    CheckpointSaver,
    TrainHarness,
    common_setup,
    gather_eval_outputs,
    create_train_state,
    load_pretrained,
    make_optimizer,
    make_schedule,
    scheduled_epochs,
    resume_checkpoint,
)
from mirror_tpu.train.metrics import accuracy, multiclass_auroc, multiclass_f1
from mirror_tpu.train.steps import (
    make_classifier_eval_step,
    make_classifier_train_step,
    smoothed_xent,
)

_logger = logging.getLogger("train")


def head_only_mask(params):
    """Trainable-mask for linear probing: only the classifier head updates
    (ref train_subtyping.py:756-763)."""
    return {k: jax.tree.map(lambda _: k == "head", v) for k, v in params.items()}


def reinit_head(params, rng, scale=None, bias=None, std=0.01):
    """Linear-probe head init N(0, 0.01) / init-head scaling
    (ref train_subtyping.py:746-763)."""
    head = dict(params["head"])
    if std is not None:
        head["kernel"] = std * jax.random.normal(
            rng, head["kernel"].shape, jnp.float32
        )
        head["bias"] = jnp.zeros_like(head["bias"])
    if scale is not None:
        head["kernel"] = head["kernel"] * scale
        head["bias"] = head["bias"] * scale
    if bias is not None:
        head["bias"] = jnp.full_like(head["bias"], bias)
    return {**params, "head": head}


def clamp_batch_size(batch_size: int, dataset_len: int) -> int:
    """Power-of-2 clamp so a batch never exceeds the dataset
    (ref train_subtyping.py:935-939)."""
    while batch_size > dataset_len and batch_size > 1:
        batch_size //= 2
    return batch_size


def main(argv=None):
    args, args_text = parse_args("subtyping", argv)
    if args.model == "mirror":
        # the config default is the pretrain model; downstream tasks
        # use the classifier head (mirror gets num_classes/fusion
        # silently filtered and then crashes deep in init)
        args.model = "mirror_classifier"
    rng, mesh, out_dir = common_setup(args, "subtyping")
    # batch sharding rides the DATA axis only (shard_batch); with
    # --model-parallel the model axis must not enter batch divisibility
    n_devices = mesh.shape["data"]

    assert args.classes, "subtyping requires --classes"
    dataset = SubtypingDataset(
        args.wsi_feature_dir,
        args.rna_feature_csv,
        classes=args.classes,
        num_wsi_feature_tokens=args.num_wsi_feature_tokens,
        splits=args.split_dir,
        k=args.k,
        wsi_feature_only=args.wsi_feature_only,
        cache=args.cache,
    )
    dataset.update_fold_nb(args.fold_nb)
    num_classes = args.num_classes or len(args.classes)
    assert num_classes == len(args.classes), (
        f"num_classes {num_classes} != len(classes) {len(args.classes)}"
    )

    model_kwargs = dict(args.model_kwargs or {})
    model_kwargs["num_classes"] = num_classes
    model_kwargs["rna_embed_dim"] = dataset.rna_dim
    if args.amp:
        model_kwargs.setdefault("dtype", args.amp_dtype)
    model_kwargs.setdefault("use_pallas", resolve_use_pallas(args))
    model_kwargs.setdefault("pinv_grad", args.pinv_grad)
    model_kwargs.setdefault("grad_checkpointing", args.grad_checkpointing)
    if args.wsi_feature_only:
        model_kwargs.setdefault("fusion", "add")
    model = create_model(args.model, **model_kwargs)

    wsi_dim = model.wsi_embed_dim
    dummy_wsi = jnp.zeros((2, args.num_wsi_feature_tokens, wsi_dim), jnp.float32)
    dummy_rna = None if args.wsi_feature_only else jnp.zeros(
        (2, dataset.rna_dim), jnp.float32
    )
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    params = jax.jit(lambda r: model.init(r, dummy_wsi, dummy_rna, True))(
        init_rngs
    )["params"]
    _logger.info(
        "Model %s created, param count: %d",
        args.model, sum(x.size for x in jax.tree.leaves(params)),
    )

    if args.initial_checkpoint:
        params = load_pretrained(params, args.initial_checkpoint)
    if args.linear_probe:
        params = reinit_head(params, jax.random.fold_in(rng, 2), std=0.01)
        _logger.info("Linear probe: training head only")
    elif args.init_head:
        params = reinit_head(
            params, jax.random.fold_in(rng, 2), scale=args.head_init_scale,
            bias=args.head_init_bias, std=None,
        )

    dataset.train()
    batch_size = clamp_batch_size(args.batch_size, len(dataset))
    if batch_size % n_devices:
        # few-shot support sets clamp the batch below the chip count; run
        # data-parallel over the largest divisor instead of failing
        mesh = fit_mesh_to_batch(mesh, batch_size)
        n_devices = mesh.shape["data"]
        _logger.warning(
            "batch %d does not divide the slice; using %d of %d devices",
            batch_size, n_devices, len(jax.devices()),
        )
    train_loader = Loader(
        dataset, batch_size, shuffle=not args.weighted_sampler,
        drop_last=args.drop_last, weighted=args.weighted_sampler, seed=args.seed,
        native_threads=args.workers,
        # --no-drop-last: pad the tail batch and let the loss mask it via
        # batch["valid"] (exact small-tail-batch semantics) — an unpadded
        # tail would fail the Pallas shard_map divisibility check on >1
        # data shard, one whole epoch in
        pad_last=not args.drop_last,
    )
    updates_per_epoch = max(
        (len(train_loader) + args.grad_accum_steps - 1) // args.grad_accum_steps, 1
    )

    lr = resolve_lr(args, batch_size)
    schedule = make_schedule(args, updates_per_epoch, lr)
    trainable_mask = head_only_mask(params) if args.linear_probe else None
    tx = make_optimizer(args, schedule, trainable_mask=trainable_mask)
    lr_controller = None
    if args.use_sched and args.sched == "plateau":
        from mirror_tpu.train.optim import PlateauController

        lr_controller = PlateauController.from_args(
            args, lr, decreasing_metric=args.eval_metric == "loss"
        )
    state = create_train_state(params, tx, model_ema=args.model_ema)
    start_epoch = 0
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

    # smoothing > 0 selects LabelSmoothingCE, else plain CE
    # (ref train_subtyping.py:982-990)
    train_step = make_classifier_train_step(
        model, tx, smoothing=args.smoothing or 0.0,
        wsi_only=args.wsi_feature_only,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        ema_warmup=args.model_ema_warmup,
        schedule=schedule,
        watch=args.wandb_watch,
    )
    eval_step = jax.jit(make_classifier_eval_step(model, args.wsi_feature_only))

    avg = args.eval_metric_average

    def eval_fn(state, epoch, root_rng):
        logits, labels, _ = gather_eval_outputs(
            mesh, eval_step, state.params, dataset.val(),
            args.validation_batch_size or batch_size, n_devices,
            seed=args.seed, native_threads=args.workers, epoch=epoch,
        )
        loss = float(
            smoothed_xent(jnp.asarray(logits), jnp.asarray(labels), 0.0)
        )
        dataset.train()
        return {
            "loss": loss,
            "acc": accuracy(logits, labels),
            "auc": multiclass_auroc(logits, labels, average=avg),
            "f1": multiclass_f1(logits, labels, average=avg),
        }

    saver = None
    if out_dir:
        saver = CheckpointSaver(
            out_dir, arch=args.model, args_text=args_text,
            decreasing=args.eval_metric == "loss", max_history=args.checkpoint_hist,
            fmt=args.ckpt_format,
        )
    harness = TrainHarness(
        args, mesh, state, train_step, train_loader,
        eval_fn if args.val else None, saver, out_dir, rng,
        eval_metric=args.eval_metric,
        decreasing_metric=args.eval_metric == "loss",
        schedule=schedule,
        lr_controller=lr_controller,
        num_epochs=scheduled_epochs(args),
    )
    return harness.run()


if __name__ == "__main__":
    main()
