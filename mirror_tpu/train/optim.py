"""Optimizer + LR-schedule factory (optax).

Replicates the subset of timm's ``create_optimizer_v2`` /
``create_scheduler_v2`` the reference exercises
(/root/reference/train_mirror.py:742-746,952-975):

- opt names: adam (torch defaults b1=0.9 b2=0.999 eps=1e-8), adamw, sgd /
  momentum (nesterov like timm), lamb, adagrad, rmsprop.
- weight decay excludes 1-D params (biases, norms) — timm's no-decay split.
- schedules: constant (use_sched=false, the reference default), cosine with
  linear warmup, step, multistep. All are pure step->lr functions evaluated
  inside the jitted train step, stepped per-epoch or per-update
  (``sched_on_updates``).
- grad clipping: global-norm or value (``clip_mode``).
"""

import logging
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

_logger = logging.getLogger(__name__)


def make_schedule(
    args, steps_per_epoch: int, base_lr: float
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns lr(update_step). When the reference steps per-epoch, the
    schedule quantizes update_step -> epoch internally."""
    if not getattr(args, "use_sched", False):
        return lambda step: jnp.asarray(base_lr, jnp.float32)

    on_updates = getattr(args, "sched_on_updates", False)
    unit = 1 if on_updates else steps_per_epoch
    warmup_t = args.warmup_epochs * unit if not on_updates else args.warmup_epochs * steps_per_epoch
    total_t = args.epochs * (steps_per_epoch if on_updates else 1)
    warmup_lr = args.warmup_lr
    min_lr = args.min_lr
    sched = args.sched

    def epoch_of(step):
        t = step if on_updates else step // steps_per_epoch
        return t

    if sched == "cosine":
        def fn(step):
            t = epoch_of(step).astype(jnp.float32)
            total = float(args.epochs * steps_per_epoch) if on_updates else float(args.epochs)
            wt = float(args.warmup_epochs * steps_per_epoch) if on_updates else float(args.warmup_epochs)
            warm = warmup_lr + (base_lr - warmup_lr) * jnp.minimum(t / jnp.maximum(wt, 1e-8), 1.0)
            if getattr(args, "warmup_prefix", False):
                t_c = jnp.maximum(t - wt, 0.0)
                total_c = jnp.maximum(total - wt, 1e-8)
            else:
                t_c = t
                total_c = total
            cos = min_lr + 0.5 * (base_lr - min_lr) * (
                1 + jnp.cos(jnp.pi * jnp.minimum(t_c / total_c, 1.0))
            )
            return jnp.where(t < wt, warm, cos)
        return fn
    if sched == "step":
        def fn(step):
            t = epoch_of(step).astype(jnp.float32)
            de = float(args.decay_epochs) * (steps_per_epoch if on_updates else 1)
            return jnp.asarray(base_lr, jnp.float32) * (args.decay_rate ** jnp.floor(t / de))
        return fn
    if sched == "multistep":
        milestones = jnp.asarray(
            [m * (steps_per_epoch if on_updates else 1) for m in args.decay_milestones],
            jnp.float32,
        )
        def fn(step):
            t = epoch_of(step).astype(jnp.float32)
            n = jnp.sum(t >= milestones)
            return jnp.asarray(base_lr, jnp.float32) * (args.decay_rate**n)
        return fn
    _logger.warning("Unsupported sched '%s'; falling back to constant lr", sched)
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def _no_decay_mask(params) -> Any:
    """timm excludes 1-D params (bias, norm scales) and scalars from decay."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def make_optimizer(
    args,
    schedule: Callable,
    params_example=None,
    trainable_mask=None,
) -> optax.GradientTransformation:
    opt_name = args.opt.lower()
    eps = args.opt_eps if args.opt_eps is not None else 1e-8
    betas = tuple(args.opt_betas) if args.opt_betas else (0.9, 0.999)
    opt_kwargs: Dict[str, Any] = dict(getattr(args, "opt_kwargs", {}) or {})

    chain = []
    if args.clip_grad is not None:
        if args.clip_mode == "norm":
            chain.append(optax.clip_by_global_norm(args.clip_grad))
        elif args.clip_mode == "value":
            chain.append(optax.clip(args.clip_grad))
        else:
            raise ValueError(f"unknown clip_mode {args.clip_mode}")

    if opt_name in ("adam",):
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
    elif opt_name in ("adamw",):
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        chain.append(optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask))
    elif opt_name in ("sgd", "momentum", "nesterov"):
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
        nesterov = opt_name != "momentum"
        chain.append(optax.trace(decay=args.momentum, nesterov=nesterov))
    elif opt_name == "lamb":
        return optax.inject_hyperparams(optax.lamb)(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=args.weight_decay, **opt_kwargs,
        )
    elif opt_name == "adagrad":
        chain.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps))
    elif opt_name == "rmsprop":
        chain.append(optax.scale_by_rms(decay=0.9, eps=eps))
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
    else:
        raise ValueError(f"Unsupported optimizer: {args.opt}")

    chain.append(optax.scale_by_schedule(lambda step: -schedule(step)))
    tx = optax.chain(*chain)

    if trainable_mask is not None:
        # linear-probe mode: freeze everything except the head
        # (ref train_subtyping.py:756-763) — frozen params get zero updates.
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()},
            jax.tree.map(lambda t: "trainable" if t else "frozen", trainable_mask),
        )
    if getattr(args, "grad_accum_steps", 1) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accum_steps)
    return tx
