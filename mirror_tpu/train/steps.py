"""Jitted train/eval steps for all three workloads.

Everything stateful in the reference train loops is folded into one pure
function per step, compiled once by XLA:

- per-batch prototype L2 renorm under no_grad (train_mirror.py:1133-1137)
  -> applied to params at the top of the step (idempotent);
- logit-scale clamp to [0, ln 100] post-update (train_mirror.py:1254-1256);
- EMA shadow-weight update (ModelEmaV3, train_mirror.py:787-799);
- AMP: the model computes in bf16, losses in fp32 (the survival reference
  explicitly disables AMP for the loss, train_survival.py:1266-1272 — here
  every loss is fp32 by construction).

Data parallelism: the caller jits these with the batch sharded over the
``data`` mesh axis and the state replicated; XLA turns the global-batch
mathematics into per-chip compute + ICI all-reduces. Note the contrastive
loss therefore sees GLOBAL-batch negatives (the BASELINE north-star design);
the reference's multi-GPU runs used per-rank local negatives, identical only
at world size 1.
"""

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from mirror_tpu.losses import (
    MirrorLossWeights,
    ce_surv_loss,
    info_nce,
    mirror_loss,
    nll_surv_loss,
)
from .state import TrainState

LOG_100 = math.log(100.0)


def renorm_prototypes(params: Any) -> Any:
    """L2-normalize each prototype vector. The flax kernel is (D, P) — the
    transpose of the torch (P, D) weight — so rows of the torch weight are
    columns here; normalize along axis 0."""
    if "prototypes" not in params:
        return params
    kernel = params["prototypes"]["kernel"]
    norm = jnp.linalg.norm(kernel, axis=0, keepdims=True)
    kernel = kernel / jnp.maximum(norm, 1e-12)
    return {**params, "prototypes": {**params["prototypes"], "kernel": kernel}}


def clamp_logit_scale(params: Any) -> Any:
    if "logit_scale" not in params:
        return params
    return {**params, "logit_scale": jnp.clip(params["logit_scale"], 0.0, LOG_100)}


def _ema_update(ema, params, decay):
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema, params)


def schedule_count(opt_state, fallback_step):
    """The count ``scale_by_schedule`` uses for the next update. Under
    optax.MultiSteps (grad accumulation) the inner schedule advances once per
    REAL update (``gradient_step``), not per micro-step — logging must read
    the same counter or logged lr drifts from applied lr. Outside MultiSteps
    the TRUE count is read from the ScaleByScheduleState itself: state.step
    as a proxy diverges from it exactly when it matters (a --no-resume-opt
    resume restores step but re-inits the optimizer), and the log would then
    mask the applied lr."""
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state.gradient_step
    found = []
    jax.tree.map(
        lambda s: found.append(s.count)
        if isinstance(s, optax.ScaleByScheduleState) else None,
        opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState),
    )
    if found:
        return found[0]
    return fallback_step


def applied_lr(opt_state, schedule, fallback_step):
    """The lr the optimizer actually applies this step. Plateau optimizers
    carry it as a HostLRState device scalar (the schedule fn is an identity
    placeholder there); everything else derives it from the schedule at the
    real-update count."""
    from mirror_tpu.train.optim import HostLRState

    found = []
    jax.tree.map(
        lambda s: found.append(s.lr) if isinstance(s, HostLRState) else None,
        opt_state,
        is_leaf=lambda s: isinstance(s, HostLRState),
    )
    if found:
        return found[0]
    return schedule(schedule_count(opt_state, fallback_step))


def _ema_decay_at(decay: float, warmup: bool, n_updates):
    """timm ModelEmaV3.get_decay (ref train_mirror.py:787-799 passes
    use_warmup=args.model_ema_warmup): with warmup the decay ramps as
    1 - (1 + step/gamma)^-power (gamma=1, power=2/3, the karras EMA ramp),
    clipped to [0, decay]; step<=0 -> decay 0 (first update copies params)."""
    step = jnp.asarray(n_updates, jnp.float32) - 1.0
    if warmup:
        d = 1.0 - (1.0 + step) ** (-2.0 / 3.0)
        d = jnp.clip(d, 0.0, decay)
    else:
        d = jnp.asarray(decay, jnp.float32)
    return jnp.where(step <= 0.0, 0.0, d)


def _apply_updates(
    state: TrainState,
    grads,
    tx,
    ema_decay: Optional[float],
    ema_warmup: bool = False,
):
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = clamp_logit_scale(params)
    ema_params = state.ema_params
    if ema_params is not None and ema_decay is not None:
        if isinstance(opt_state, optax.MultiStepsState):
            # grad accumulation: EMA advances exactly once per REAL update
            # (timm updates EMA per optimizer step, not per micro-batch)
            did_update = opt_state.mini_step == 0
            n_updates = opt_state.gradient_step  # post-update count
            d = _ema_decay_at(ema_decay, ema_warmup, n_updates)
            new_ema = _ema_update(ema_params, params, d)
            ema_params = jax.tree.map(
                lambda n, o: jnp.where(did_update, n, o), new_ema, ema_params
            )
        else:
            d = _ema_decay_at(ema_decay, ema_warmup, state.step + 1)
            ema_params = _ema_update(ema_params, params, d)
    return state.replace(
        step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema_params
    )


def _split_rngs(rng: jax.Array) -> Dict[str, jax.Array]:
    r = jax.random.split(rng, 3)
    return {"dropout": r[0], "masking": r[1], "style": r[2]}


def observability_metrics(params, grads) -> Dict[str, jax.Array]:
    """Global gradient/parameter L2 norms: two cheap in-step reductions that
    surface divergence/vanishing without any host sync. Logged per interval
    and averaged into summary.csv/wandb."""
    return {
        "grad_norm": optax.global_norm(grads),
        "param_norm": optax.global_norm(params),
    }


def watch_stats(params, grads) -> Dict[str, jax.Array]:
    """Per-leaf parameter/gradient distribution stats — the wandb.watch(model)
    equivalent (ref train_mirror.py:940-947 registers gradient + parameter
    HISTOGRAM watching). TPU-native [E]: pulling full tensors to host every
    log step would serialize the async dispatch chain, so each leaf logs its
    distribution moments (L2 norm + mean + std) instead of raw histogram
    buckets — computed in-step as device scalars, summed into the epoch
    accumulator like every other metric, zero extra host syncs. Keys are
    ``watch/{gradients,parameters}/<path>/<stat>`` mirroring wandb.watch's
    gradients/parameters panel split; the harness routes them to wandb only
    (not the console line or summary.csv). Opt-in via --wandb-watch."""

    def stats(kind, tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            x = leaf.astype(jnp.float32)
            out[f"watch/{kind}/{name}/norm"] = jnp.sqrt(jnp.sum(x * x))
            out[f"watch/{kind}/{name}/mean"] = jnp.mean(x)
            out[f"watch/{kind}/{name}/std"] = jnp.std(x)
        return out

    return {**stats("gradients", grads), **stats("parameters", params)}


# ---------------------------------------------------------------------------
# MIRROR pretraining
# ---------------------------------------------------------------------------

def make_mirror_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_weights: MirrorLossWeights,
    wsi_mask_ratio: float = 0.75,
    rna_mask_ratio: float = 0.75,
    ema_decay: Optional[float] = None,
    ema_warmup: bool = False,
    schedule: Optional[Callable] = None,
    alignment_loss_fn: Optional[Callable] = None,
    watch: bool = False,
) -> Callable:
    """``alignment_loss_fn`` (optional) swaps the contrastive term — pass
    ``partial(local_clip_loss, mesh=mesh)`` for the reference's per-rank
    local-negatives semantics instead of global-batch negatives.
    ``watch`` adds per-leaf param/grad stats (the wandb.watch equivalent)."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rngs = _split_rngs(rng)
        params0 = renorm_prototypes(state.params)
        state = state.replace(params=params0)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                batch["wsi"],
                batch["rna"],
                wsi_mask_ratio,
                rna_mask_ratio,
                False,  # deterministic
                rngs=rngs,
            )
            losses = mirror_loss(
                *out, weights=loss_weights, alignment_loss_fn=alignment_loss_fn
            )
            return losses[0], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params0)
        new_state = _apply_updates(state, grads, tx, ema_decay, ema_warmup)
        metrics = {
            **observability_metrics(params0, grads),
            **(watch_stats(params0, grads) if watch else {}),
            "loss": loss,
            "alignment_loss": losses[1],
            "wsi_retention_loss": losses[2],
            "rna_retention_loss": losses[3],
            "style_loss": losses[4],
            "cluster_loss": losses[5],
            "logit_scale": jnp.exp(
                jnp.clip(new_state.params["logit_scale"], 0.0, LOG_100)
            ),
        }
        if schedule is not None:
            metrics["lr"] = applied_lr(state.opt_state, schedule, state.step)
        return new_state, metrics

    return train_step


def make_mirror_eval_step(
    model,
    loss_weights: MirrorLossWeights,
    wsi_mask_ratio: float = 0.75,
    rna_mask_ratio: float = 0.75,
    alignment_loss_fn: Optional[Callable] = None,
) -> Callable:
    """Validation forward (train_mirror.py:1382-1526). Dropout is off but
    masking noise and VAE sampling stay stochastic, exactly like torch
    model.eval() which only disables dropout.

    Tail batches not divisible by the device count are padded by the loader
    and masked here via ``batch["valid"]`` — the LOSS masking is exact (incl.
    contrastive negatives) while the batch still shards over all chips and
    XLA compiles a single shape. One caveat: the model forward itself couples
    rows through the reference's GLOBAL-max pinv scaling, so padded rows can
    in principle nudge valid rows' outputs — with the loader's repeat-row
    padding this measured bit-equal, and even adversarial padding stays
    ~1e-4 (tests/test_eval_tail.py)."""

    def eval_step(params, batch: Dict, rng: jax.Array):
        rngs = _split_rngs(rng)
        out = model.apply(
            {"params": params},
            batch["wsi"], batch["rna"],
            wsi_mask_ratio, rna_mask_ratio,
            True,  # deterministic: no dropout
            rngs=rngs,
        )
        # local-negatives parity mode must eval with the SAME per-shard
        # semantics it trains with (the reference's DDP validation is also
        # per-rank) — otherwise the checkpoint-selection loss measures
        # global-batch negatives only in eval
        losses = mirror_loss(
            *out, weights=loss_weights, valid=batch.get("valid"),
            alignment_loss_fn=alignment_loss_fn,
        )
        return {
            "loss": losses[0],
            "alignment_loss": losses[1],
            "wsi_retention_loss": losses[2],
            "rna_retention_loss": losses[3],
            "style_loss": losses[4],
            "cluster_loss": losses[5],
        }

    return eval_step


# ---------------------------------------------------------------------------
# Vanilla CLIP-style pretraining (train_pretrain.py path)
# ---------------------------------------------------------------------------

def make_clip_train_step(
    model,
    tx: optax.GradientTransformation,
    temperature: float = 0.1,
    symmetric: bool = False,
    ema_decay: Optional[float] = None,
    ema_warmup: bool = False,
    schedule: Optional[Callable] = None,
    watch: bool = False,
    contrastive_loss_fn: Optional[Callable] = None,
) -> Callable:
    """InfoNCE dual-encoder pretraining (ref train_pretrain.py:1119-1122,
    873-875; expects model(wsi, rna) -> (wsi_emb, rna_emb)).

    ``contrastive_loss_fn(wsi_emb, rna_emb)`` overrides the default
    global-batch info_nce — train_pretrain passes losses.local_info_nce
    when --contrastive-negatives local on >1 data shard (reference DDP
    parity, same posture as train_mirror's alignment_loss_fn)."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rngs = _split_rngs(rng)

        def loss_fn(params):
            wsi_emb, rna_emb = model.apply(
                {"params": params}, batch["wsi"], batch["rna"], False, rngs=rngs
            )
            if contrastive_loss_fn is not None:
                return contrastive_loss_fn(wsi_emb, rna_emb)
            return info_nce(
                wsi_emb, rna_emb, temperature=temperature, symmetric=symmetric
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = _apply_updates(state, grads, tx, ema_decay, ema_warmup)
        metrics = {"loss": loss, **observability_metrics(state.params, grads)}
        if watch:
            metrics.update(watch_stats(state.params, grads))
        if schedule is not None:
            metrics["lr"] = applied_lr(state.opt_state, schedule, state.step)
        return new_state, metrics

    return train_step


def make_clip_eval_step(
    model,
    temperature: float = 0.1,
    symmetric: bool = False,
    contrastive_loss_fn: Optional[Callable] = None,
):
    """``contrastive_loss_fn(wsi_emb, rna_emb, valid=...)`` overrides the
    global info_nce (see make_clip_train_step)."""

    def eval_step(params, batch: Dict, rng: jax.Array):
        rngs = _split_rngs(rng)
        wsi_emb, rna_emb = model.apply(
            {"params": params}, batch["wsi"], batch["rna"], True, rngs=rngs
        )
        if contrastive_loss_fn is not None:
            loss = contrastive_loss_fn(
                wsi_emb, rna_emb, valid=batch.get("valid")
            )
        else:
            loss = info_nce(
                wsi_emb, rna_emb, temperature=temperature, symmetric=symmetric,
                valid=batch.get("valid"),
            )
        return {"loss": loss}

    return eval_step


# ---------------------------------------------------------------------------
# Subtyping (classification)
# ---------------------------------------------------------------------------

def smoothed_xent(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.0, valid=None
) -> jax.Array:
    """CE with label smoothing (timm LabelSmoothingCrossEntropy,
    ref train_subtyping.py:982-990). ``valid`` ([B] 0/1) drops loader-padded
    tail rows from the mean — the padded multi-chip tail batch then yields
    exactly the reference's small-tail-batch loss/gradients."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if smoothing > 0:
        nll = (1.0 - smoothing) * nll + smoothing * -jnp.mean(logp, axis=-1)
    if valid is not None:
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.mean(nll)


def make_classifier_train_step(
    model,
    tx: optax.GradientTransformation,
    smoothing: float = 0.0,
    wsi_only: bool = False,
    ema_decay: Optional[float] = None,
    ema_warmup: bool = False,
    schedule: Optional[Callable] = None,
    watch: bool = False,
) -> Callable:
    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rngs = _split_rngs(rng)
        rna = None if wsi_only else batch["rna"]

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, batch["wsi"], rna, False, rngs=rngs
            )
            return smoothed_xent(
                logits, batch["label"], smoothing, valid=batch.get("valid")
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = _apply_updates(state, grads, tx, ema_decay, ema_warmup)
        metrics = {"loss": loss, **observability_metrics(state.params, grads)}
        if watch:
            metrics.update(watch_stats(state.params, grads))
        if schedule is not None:
            metrics["lr"] = applied_lr(state.opt_state, schedule, state.step)
        return new_state, metrics

    return train_step


def make_classifier_eval_step(model, wsi_only: bool = False) -> Callable:
    """Returns fp32 logits; losses/metrics are computed host-side over the
    valid (non-padded) rows so tail-batch padding never distorts them."""

    def eval_step(params, batch: Dict):
        rna = None if wsi_only else batch["rna"]
        logits = model.apply({"params": params}, batch["wsi"], rna, True)
        return logits.astype(jnp.float32)

    return eval_step


# ---------------------------------------------------------------------------
# Survival
# ---------------------------------------------------------------------------

def make_survival_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_name: str = "nll_surv",
    loss_alpha: float = 0.0,
    wsi_only: bool = False,
    ema_decay: Optional[float] = None,
    ema_warmup: bool = False,
    schedule: Optional[Callable] = None,
    watch: bool = False,
) -> Callable:
    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rngs = _split_rngs(rng)
        rna = None if wsi_only else batch["rna"]

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, batch["wsi"], rna, False, rngs=rngs
            ).astype(jnp.float32)
            valid = batch.get("valid")
            if loss_name == "ce_surv":
                return ce_surv_loss(
                    logits, batch["label"], batch["censorship"], valid=valid
                )
            return nll_surv_loss(
                logits, batch["label"], batch["censorship"], alpha=loss_alpha,
                valid=valid,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = _apply_updates(state, grads, tx, ema_decay, ema_warmup)
        metrics = {"loss": loss, **observability_metrics(state.params, grads)}
        if watch:
            metrics.update(watch_stats(state.params, grads))
        if schedule is not None:
            metrics["lr"] = applied_lr(state.opt_state, schedule, state.step)
        return new_state, metrics

    return train_step


def make_survival_eval_step(model, wsi_only: bool = False) -> Callable:
    """Returns fp32 logits; risk = -sum_t S(t) (ref train_survival.py:1431-1436)
    and the loss are derived host-side over valid rows only."""

    def eval_step(params, batch: Dict):
        rna = None if wsi_only else batch["rna"]
        logits = model.apply({"params": params}, batch["wsi"], rna, True)
        return logits.astype(jnp.float32)

    return eval_step


def survival_risk(logits) -> jnp.ndarray:
    hazards = jax.nn.sigmoid(jnp.asarray(logits, jnp.float32))
    survival = jnp.cumprod(1.0 - hazards, axis=1)
    return -jnp.sum(survival, axis=1)
