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
- plateau: timm's PlateauLRScheduler (torch ReduceLROnPlateau semantics) is
  metric-driven, so it can't be a pure step->lr function. TPU-native design:
  the final LR transform holds the LR as a *device scalar in the optimizer
  state* (``HostLRState``); a host-side ``PlateauController`` rewrites that
  scalar at epoch boundaries (pure pytree surgery — no recompilation, the jit
  reads whatever scalar is resident).
- grad clipping: global-norm or value (``clip_mode``).
"""

import logging
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

_logger = logging.getLogger(__name__)


class HostLRState(NamedTuple):
    """Optimizer-state leaf node holding the live learning rate.

    Marker type: ``set_host_lr`` finds it anywhere in a (possibly
    MultiSteps/multi_transform-nested) opt-state pytree.
    """

    lr: jnp.ndarray


def scale_by_host_lr(init_lr: float) -> optax.GradientTransformation:
    """Like ``optax.scale(-lr)`` but with lr stored in state so the host can
    update it between steps (plateau schedule)."""

    def init_fn(params):
        del params
        return HostLRState(lr=jnp.asarray(init_lr, jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda u: (-state.lr * u).astype(u.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _is_host_lr(x) -> bool:
    return isinstance(x, HostLRState)


def set_host_lr(opt_state, lr: float):
    """Functionally replace every HostLRState leaf's lr with ``lr``."""
    return jax.tree.map(
        lambda s: HostLRState(lr=jnp.asarray(lr, jnp.float32)) if _is_host_lr(s) else s,
        opt_state,
        is_leaf=_is_host_lr,
    )


def get_host_lr(opt_state) -> float:
    found = []
    jax.tree.map(
        lambda s: found.append(float(s.lr)) if _is_host_lr(s) else None,
        opt_state,
        is_leaf=_is_host_lr,
    )
    if not found:
        raise ValueError("opt_state has no HostLRState (not a plateau optimizer)")
    return found[0]


def fast_forward_schedule(opt_state, n_updates: int):
    """Advance the schedule count to ``n_updates`` (timm fast-forwards its
    reconstructed scheduler to start_epoch on resume, ref
    train_mirror.py:971-975). Here the count lives in opt_state's
    scale_by_schedule state, so resuming with --no-resume-opt (or passing
    --start-epoch on a fresh run) would otherwise restart the schedule at
    update 0 — training the remaining epochs at warmup/epoch-0 lr while
    the logged lr (steps.applied_lr fallback on state.step) shows the
    correct value. Only counts still at 0 are touched: a count restored
    from a checkpoint is already exact (including mid-epoch recovery
    checkpoints, which a blanket overwrite would corrupt)."""

    def _is_sched(x) -> bool:
        return isinstance(x, optax.ScaleByScheduleState)

    def ff(s):
        if _is_sched(s) and int(s.count) == 0:
            return optax.ScaleByScheduleState(
                count=jnp.asarray(n_updates, jnp.int32)
            )
        return s

    return jax.tree.map(ff, opt_state, is_leaf=_is_sched)


class PlateauController:
    """Host-side plateau LR schedule, timm PlateauLRScheduler semantics
    (ref create_scheduler_v2 surface, /root/reference/train_mirror.py:952-975;
    torch ReduceLROnPlateau underneath):

    - epochs [0, warmup_epochs): linear warmup from ``warmup_lr`` to
      ``base_lr``;
    - afterwards: if the eval metric fails to improve on the best by a
      relative threshold (1e-4) for more than ``patience`` epochs, multiply
      lr by ``decay_rate`` (floored at ``min_lr``) and start a ``cooldown``
      window during which bad epochs don't count.

    Call ``step_epoch(state, epoch, metric)`` after eval; it returns the
    state with the opt-state LR scalar rewritten.
    """

    def __init__(
        self,
        base_lr: float,
        decay_rate: float = 0.1,
        patience: int = 10,
        cooldown: int = 0,
        warmup_epochs: int = 0,
        warmup_lr: float = 1e-5,
        min_lr: float = 0.0,
        mode: str = "min",
        threshold: float = 1e-4,
        noise_range=None,
        noise_pct: float = 0.67,
        noise_std: float = 1.0,
        noise_seed: int = 42,
    ) -> None:
        self.base_lr = base_lr
        self.decay_rate = decay_rate
        self.patience = patience
        self.cooldown = cooldown
        self.warmup_epochs = warmup_epochs
        self.warmup_lr = warmup_lr
        self.min_lr = min_lr
        self.mode = mode
        self.threshold = threshold
        self.noise_range = noise_range
        self.noise_pct = noise_pct
        self.noise_std = noise_std
        self.noise_seed = noise_seed
        self.current_lr = warmup_lr if warmup_epochs > 0 else base_lr
        self.applied_lr = self.current_lr
        self.best: float | None = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        # one-time warmup -> base transition: keyed on a flag, not on the
        # exact epoch equality, so a resume landing PAST warmup_epochs
        # (--no-resume-opt at epoch 50, warmup 5) still restores base_lr
        # instead of training every remaining epoch at warmup_lr
        self._warmup_exited = warmup_epochs <= 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def epoch_lr(self, epoch: int, metric: float | None) -> float:
        if epoch < self.warmup_epochs:
            t = (epoch + 1) / max(self.warmup_epochs, 1)
            self.current_lr = self.warmup_lr + t * (self.base_lr - self.warmup_lr)
            # timm PlateauLRScheduler.step applies noise only on the
            # post-warmup branch; warmup lrs are exact
            return self.current_lr
        if not self._warmup_exited:
            self.current_lr = self.base_lr
            self._warmup_exited = True
        if metric is None:
            return self._with_noise(epoch, self.current_lr)
        # torch ReduceLROnPlateau order: best/num_bad update first, then the
        # cooldown counter ticks down EVERY epoch while in cooldown (not just
        # on non-improving ones), suppressing bad-epoch counting meanwhile
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.current_lr = max(self.current_lr * self.decay_rate, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self._with_noise(epoch, self.current_lr)

    def _with_noise(self, epoch: int, lr: float) -> float:
        """timm PlateauLRScheduler._apply_noise: the APPLIED lr is perturbed,
        the internal plateau state stays noise-free (timm restores the clean
        lr before the next plateau decision)."""
        if not _noise_applies(self.noise_range, epoch):
            return lr
        return lr * (1.0 + _timm_noise(epoch, self.noise_seed,
                                       self.noise_pct, self.noise_std))

    def step_epoch(self, state, epoch: int, metric: float | None):
        lr = self.epoch_lr(epoch, metric)
        # the APPLIED value (incl. lr noise) for observability: current_lr
        # stays noise-free for plateau decisions (timm semantics), but logs
        # must show what the optimizer actually uses (harness reads this)
        self.applied_lr = lr
        return state.replace(opt_state=set_host_lr(state.opt_state, lr))

    def sync_from_state(self, state) -> None:
        """Adopt the lr restored from a checkpoint (--resume): the HostLRState
        scalar in opt_state survives serialization but this controller's
        host-side counters don't — without this, the first plateau decision
        after a resume would silently jump the lr back to base_lr."""
        self.current_lr = get_host_lr(state.opt_state)
        self.applied_lr = self.current_lr
        # the restored lr IS the post-warmup (possibly decayed) value; the
        # warmup->base transition must not overwrite it on the next epoch
        self._warmup_exited = True

    @classmethod
    def from_args(cls, args, base_lr: float, decreasing_metric: bool = True):
        return cls(
            base_lr=base_lr,
            decay_rate=args.decay_rate,
            patience=args.patience_epochs,
            cooldown=args.cooldown_epochs,
            warmup_epochs=args.warmup_epochs,
            warmup_lr=args.warmup_lr,
            min_lr=args.min_lr,
            mode="min" if decreasing_metric else "max",
            noise_range=_noise_range_t(args, float(args.epochs)),
            noise_pct=getattr(args, "lr_noise_pct", 0.67),
            noise_std=getattr(args, "lr_noise_std", 1.0),
            noise_seed=getattr(args, "seed", 42),
        )


def _timm_noise(t: int, seed: int, pct: float, std: float) -> float:
    """timm Scheduler._calculate_noise: torch.Generator seeded with seed+t,
    normal noise resampled until |x| < noise_pct (bit-exact reproduction —
    torch-cpu is installed; ref surface: create_scheduler_v2 noise_args,
    consumed at /root/reference/train_mirror.py:958-961)."""
    import torch

    g = torch.Generator()
    g.manual_seed(seed + t)
    while True:
        noise = torch.randn(1, generator=g).item() * std
        if abs(noise) < pct:
            return noise


def _noise_range_t(args, t_initial: float):
    """timm create_scheduler_v2: lr_noise fractions scale by t_initial;
    a 1-element list means 'from here on', 2 elements a half-open window."""
    lr_noise = getattr(args, "lr_noise", None)
    # `is None` (not falsy): timm treats a scalar 0.0 as "noise from t=0 on"
    if lr_noise is None or (
        isinstance(lr_noise, (list, tuple)) and len(lr_noise) == 0
    ):
        return None
    if isinstance(lr_noise, (list, tuple)):
        rng = [n * t_initial for n in lr_noise]
        return rng[0] if len(rng) == 1 else (rng[0], rng[1])
    return lr_noise * t_initial


def _noise_applies(noise_range, t: float) -> bool:
    if noise_range is None:
        return False
    if isinstance(noise_range, tuple):
        return noise_range[0] <= t < noise_range[1]
    return t >= noise_range


def _noise_table(args, t_initial: float, total_t: int):
    """Per-t multiplicative lr factor (1 + noise), precomputed host-side so
    the jitted schedule stays a pure table lookup. None when noise is off."""
    noise_range = _noise_range_t(args, t_initial)
    if noise_range is None:
        return None
    import numpy as np

    pct = getattr(args, "lr_noise_pct", 0.67)
    std = getattr(args, "lr_noise_std", 1.0)
    seed = getattr(args, "seed", 42)
    table = np.ones(max(total_t, 1), np.float32)
    for t in range(table.shape[0]):
        if _noise_applies(noise_range, t):
            table[t] = 1.0 + _timm_noise(t, seed, pct, std)
    return jnp.asarray(table)


def _cycle_span_epochs(epochs: int, mul: float, limit: int) -> int:
    """timm Scheduler.get_cycle_length(cycle_limit): total epochs covered by
    `limit` cycles of initial length `epochs` growing by `mul`."""
    import math

    if mul == 1.0:
        return epochs * max(limit, 1)
    return int(math.floor(-epochs * (mul ** max(limit, 1) - 1) / (1 - mul)))


def scheduled_epochs(args) -> int:
    """timm create_scheduler_v2 returns num_epochs = cycle_length +
    cooldown_epochs for the cycle schedules (cosine/tanh/poly; cooldown =
    extra epochs at min lr after the last cycle); step/multistep run exactly
    --epochs; plateau consumes cooldown internally (ReduceLROnPlateau)."""
    if getattr(args, "use_sched", False) and args.sched in ("cosine", "tanh", "poly"):
        span = _cycle_span_epochs(
            args.epochs,
            getattr(args, "lr_cycle_mul", 1.0),
            getattr(args, "lr_cycle_limit", 1),
        )
        return span + getattr(args, "cooldown_epochs", 0)
    return args.epochs


def make_schedule(
    args, steps_per_epoch: int, base_lr: float
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns lr(update_step) — the full timm create_scheduler_v2 surface
    (ref /root/reference/train_mirror.py:952-975): cosine/tanh/poly with
    cycle_mul/cycle_decay/cycle_limit + k_decay, step/multistep, plateau
    (host-LR, see PlateauController), linear warmup on every schedule,
    warmup_prefix, and multiplicative lr noise. When the reference steps
    per-epoch the schedule quantizes update_step -> epoch internally."""
    if not getattr(args, "use_sched", False):
        return lambda step: jnp.asarray(base_lr, jnp.float32)

    sched = args.sched
    if sched == "plateau":
        # lr lives in the optimizer state (HostLRState), adjusted by the
        # host-side PlateauController; the schedule function is identity so
        # downstream code can still query "a schedule".
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    if sched not in ("cosine", "tanh", "poly", "step", "multistep"):
        raise ValueError(
            f"Unsupported sched '{sched}' (supported: cosine, tanh, poly, "
            "step, multistep, plateau)"
        )

    on_updates = getattr(args, "sched_on_updates", False)
    unit = steps_per_epoch if on_updates else 1
    t_initial = float(args.epochs * unit)
    warmup_t = float(args.warmup_epochs * unit)
    decay_t = float(args.decay_epochs) * unit
    milestones = jnp.asarray([m * unit for m in args.decay_milestones], jnp.float32)
    warmup_lr = args.warmup_lr
    min_lr = args.min_lr
    decay_rate = args.decay_rate
    warmup_prefix = getattr(args, "warmup_prefix", False)
    cycle_mul = float(getattr(args, "lr_cycle_mul", 1.0))
    cycle_decay = float(getattr(args, "lr_cycle_decay", 0.5))
    cycle_limit = int(getattr(args, "lr_cycle_limit", 1))
    k = float(getattr(args, "lr_k_decay", 1.0))

    total_t = int(
        (
            _cycle_span_epochs(args.epochs, cycle_mul, cycle_limit)
            + getattr(args, "cooldown_epochs", 0)
        )
        * unit
    ) + 1
    noise = _noise_table(args, t_initial, total_t)

    if cycle_mul != 1.0:
        # cycle-start boundaries precomputed host-side in float64: tracing
        # timm's log-based decomposition in f32 mis-assigns the cycle index
        # at exact restart epochs (e.g. epochs=10, mul=1.1: t=21 is the
        # start of cycle 2 but f32 log gives i=1 -> min_lr for one epoch)
        import numpy as np

        _starts64 = np.array(
            [
                t_initial * (1.0 - cycle_mul**j) / (1.0 - cycle_mul)
                for j in range(cycle_limit + 1)
            ],
            np.float64,
        )
        _lens64 = np.array(
            [cycle_mul**j * t_initial for j in range(cycle_limit + 1)],
            np.float64,
        )
        _starts = jnp.asarray(_starts64, jnp.float32)
        _lens = jnp.asarray(_lens64, jnp.float32)

    def _cycle(t):
        """timm cycle decomposition: index i, cycle length t_i, offset t_curr."""
        if cycle_mul == 1.0:
            i = jnp.floor(t / t_initial)
            t_i = jnp.asarray(t_initial, jnp.float32)
            t_curr = t - i * t_initial
        else:
            i = jnp.sum(t >= _starts[1:])  # completed boundaries, in [0, limit]
            t_i = _lens[i]
            t_curr = t - _starts[i]
        return i, t_i, t_curr

    def _cycle_lr(t, shape_fn):
        """min_lr + (base·cycle_decay^i − min_lr) · shape(t_curr/t_i) inside
        the first cycle_limit cycles, min_lr afterwards."""
        i, t_i, t_curr = _cycle(t)
        lr_max = base_lr * cycle_decay**i
        val = min_lr + (lr_max - min_lr) * shape_fn(t_curr, t_i)
        return jnp.where(i < cycle_limit, val, jnp.asarray(min_lr, jnp.float32))

    if sched == "cosine":
        def base_fn(t):
            return _cycle_lr(
                t, lambda tc, ti: 0.5 * (1 + jnp.cos(jnp.pi * tc**k / ti**k))
            )
    elif sched == "tanh":
        # timm TanhLRScheduler defaults lb=-7.0, ub=3.0 (not exposed by
        # create_scheduler_v2)
        lb, ub = -7.0, 3.0
        def base_fn(t):
            return _cycle_lr(
                t, lambda tc, ti: 0.5 * (1 - jnp.tanh(lb + (ub - lb) * (tc / ti)))
            )
    elif sched == "poly":
        # timm PolyLRScheduler default power=0.5 (not exposed by the factory)
        power = 0.5
        def base_fn(t):
            return _cycle_lr(
                t, lambda tc, ti: (1.0 - tc**k / ti**k) ** power
            )
    elif sched == "step":
        def base_fn(t):
            return jnp.asarray(base_lr, jnp.float32) * (
                decay_rate ** jnp.floor(t / decay_t)
            )
    else:  # multistep
        def base_fn(t):
            # timm MultiStepLRScheduler: bisect_right(milestones, t+1) — the
            # decay lands one epoch EARLY (at t == m-1) because the reference
            # steps the scheduler with epoch+1 at epoch end; reproduced as-is
            n = jnp.sum((t + 1.0) >= milestones)
            return jnp.asarray(base_lr, jnp.float32) * (decay_rate**n)

    cyclic = sched in ("cosine", "tanh", "poly")

    def fn(step):
        t = (step if on_updates else step // steps_per_epoch).astype(jnp.float32)
        if cyclic and warmup_prefix:
            lr = base_fn(jnp.maximum(t - warmup_t, 0.0))
        else:
            lr = base_fn(t)
        if warmup_t > 0:
            warm = warmup_lr + (base_lr - warmup_lr) * (t / warmup_t)
            lr = jnp.where(t < warmup_t, warm, lr)
        if noise is not None:
            idx = jnp.clip(t.astype(jnp.int32), 0, noise.shape[0] - 1)
            lr = lr * noise[idx]
        return lr

    return fn


def _no_decay_mask(params) -> Any:
    """timm excludes 1-D params (bias, norm scales) and scalars from decay."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


# timm's AGC dispatch passes model_parameters(model, exclude_head=True) =
# list(model.parameters())[:-2] — the LAST TWO torch parameters in
# registration order are never clipped. What those are per model follows
# from the reference's __init__ order (a heuristic quirk on non-timm
# models, reproduced exactly):
# - MIRROR registers ... style_decoder, prototypes(bias-free) last
#   (/root/reference/models/mirror.py:789-828) -> style_decoder.bias and
#   prototypes.weight escape clipping;
# - MIRRORClassifier registers head last (ref :993-996) -> head.weight/bias
#   (the intended "exclude the classifier head" semantics);
# - mirror_dual (our extension, models/dual.py) -> its rna_projection.
# The union is safe: each model only contains its own leaves.
_AGC_EXCLUDE = (
    ("style_decoder", "bias"),
    ("prototypes", "kernel"),
    ("head", "kernel"),
    ("head", "bias"),
    ("rna_projection", "kernel"),
    ("rna_projection", "bias"),
)


def _agc_unitwise_norm(leaf_name: str, x) -> Any:
    """timm's unitwise_norm computes the L2 norm over every axis except
    torch dim 0 (one norm per output unit). Through the checkpoint
    converter's layout map (tools/import_torch_checkpoint.py) torch dim 0
    is the LAST flax axis for ``kernel`` leaves (dense [in, out] and conv
    HWIO [kh, kw, 1, C] both transpose) and axis 0 for everything stored
    layout-identically (res_conv_kernel [h, 1, K, 1], cls/mask tokens,
    position embeds); 0/1-D tensors take the whole-tensor norm."""
    if x.ndim <= 1:
        return jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2))
    axes = (
        tuple(range(x.ndim - 1)) if leaf_name == "kernel"
        else tuple(range(1, x.ndim))
    )
    return jnp.sqrt(
        jnp.sum(x.astype(jnp.float32) ** 2, axis=axes, keepdims=True)
    )


def adaptive_grad_clip(
    clip_factor: float, eps: float = 1e-3
) -> optax.GradientTransformation:
    """timm ``dispatch_clip_grad(mode="agc")`` == timm.utils.agc
    .adaptive_clip_grad: per output unit, when |g| >= clip_factor *
    max(|p|, eps), rescale g to clip_factor * max(|p|, eps) * g / max(|g|,
    1e-6). The reference reaches it via ``--clip-grad X --clip-mode agc``
    (/root/reference/train_mirror.py:1223-1230); the last-two-parameters
    head exclusion rides along (``_AGC_EXCLUDE``). Torch-golden:
    tests/test_optim_agc.py."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None, "agc needs params"

        def clip(path, g, p):
            names = tuple(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            if any(
                names[-len(s):] == s for s in _AGC_EXCLUDE
            ):
                return g
            p_norm = jnp.maximum(_agc_unitwise_norm(names[-1], p), eps)
            g_norm = _agc_unitwise_norm(names[-1], g)
            max_norm = p_norm * clip_factor
            clipped = g * (
                max_norm / jnp.maximum(g_norm, 1e-6)
            ).astype(g.dtype)
            return jnp.where(g_norm < max_norm, g, clipped)

        return (
            jax.tree_util.tree_map_with_path(clip, updates, params),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def _timm_layer_map(
    names, head_prefixes=None, layers_per_group: int = 12
) -> Dict[str, int]:
    """timm ``_layer_map`` semantics (timm/optim/_param_groups.py, consumed
    by ``param_groups_layer_decay`` when the model has no ``group_matcher``):
    parameters whose name starts with a head prefix — or ALL parameters when
    the model declares no ``pretrained_cfg['classifier']`` — go to the final
    (head) group; the rest group into chunks of ``layers_per_group`` in
    parameter order."""

    def in_head(n: str) -> bool:
        if not head_prefixes:
            return True  # timm: `if not hp: return True` — everything is head
        return any(n.startswith(h) for h in head_prefixes)

    trunk = [n for n in names if not in_head(n)]
    groups = [
        trunk[i : i + layers_per_group]
        for i in range(0, len(trunk), layers_per_group)
    ]
    layer_map = {n: i for i, grp in enumerate(groups) for n in grp}
    layer_map.update({n: len(groups) for n in names if in_head(n)})
    return layer_map


def _path_name(path) -> str:
    return ".".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def scale_by_layer_decay(
    layer_decay: float, head_prefixes=None, layers_per_group: int = 12
) -> optax.GradientTransformation:
    """Per-parameter lr scaling, timm ``param_groups_layer_decay`` semantics
    (group i of num_layers gets lr_scale = layer_decay**(num_layers-1-i),
    head group scale 1.0). Scaling the FINAL update leafwise is exactly
    per-group lr for every optimizer here (the whole update, including
    decoupled weight decay, is proportional to the group lr in torch).

    Reference-parity note: the reference forwards --layer-decay to timm's
    create_optimizer_v2 (/root/reference/train_mirror.py:314,742-746), but
    MIRROR-family models define neither ``group_matcher`` nor
    ``pretrained_cfg['classifier']``, so timm's ``_layer_map`` places EVERY
    parameter in the single head group with scale layer_decay**0 == 1.0 —
    i.e. the reference's own --layer-decay is inert for these models. This
    transform reproduces that (all-ones scales when head_prefixes is None)
    rather than silently dropping the flag; head_prefixes exposes the real
    grouping for models that declare a head."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree_util.tree_flatten_with_path(updates)[0]
        layer_map = _timm_layer_map(
            [_path_name(p) for p, _ in leaves], head_prefixes, layers_per_group
        )
        num_layers = max(layer_map.values()) + 1

        def scale(path, u):
            s = layer_decay ** (num_layers - 1 - layer_map[_path_name(path)])
            return u if s == 1.0 else (u * s).astype(u.dtype)

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    args,
    schedule: Callable,
    trainable_mask=None,
) -> optax.GradientTransformation:
    opt_name = args.opt.lower()
    eps = args.opt_eps if args.opt_eps is not None else 1e-8
    betas = tuple(args.opt_betas) if args.opt_betas else (0.9, 0.999)
    momentum = getattr(args, "momentum", 0.9)
    # --opt-kwargs: the reference forwards these straight to the torch
    # optimizer ctor (ref train_mirror.py:742-746 create_optimizer_v2(...,
    # **args.opt_kwargs)). Map the ctor kwargs the optax chains support and
    # REJECT anything else — silently ignoring a requested knob would make
    # the run differ from its config.
    opt_kwargs: Dict[str, Any] = dict(getattr(args, "opt_kwargs", {}) or {})
    if "eps" in opt_kwargs:
        eps = float(opt_kwargs.pop("eps"))
    if "betas" in opt_kwargs:
        betas = tuple(opt_kwargs.pop("betas"))
    if "momentum" in opt_kwargs:
        momentum = float(opt_kwargs.pop("momentum"))
    rms_alpha = float(opt_kwargs.pop("alpha", 0.9))  # torch RMSprop smoothing
    amsgrad = bool(opt_kwargs.pop("amsgrad", False))
    if opt_kwargs:
        raise ValueError(
            f"--opt-kwargs keys not supported by the optax '{opt_name}' "
            f"chain: {sorted(opt_kwargs)} (supported: eps, betas, momentum, "
            "alpha, amsgrad)"
        )

    chain = []
    if args.clip_grad is not None:
        if args.clip_mode == "norm":
            chain.append(optax.clip_by_global_norm(args.clip_grad))
        elif args.clip_mode == "value":
            chain.append(optax.clip(args.clip_grad))
        elif args.clip_mode == "agc":
            chain.append(adaptive_grad_clip(args.clip_grad))
        else:
            raise ValueError(f"unknown clip_mode {args.clip_mode}")

    if opt_name in ("adam",):
        # torch Adam COUPLES weight decay: grad += wd * p happens BEFORE the
        # moment updates (unlike AdamW's decoupled decay after) — so the
        # decay transform must precede scale_by_adam in the chain
        # (golden-tested against torch.optim.Adam in tests/test_optim.py)
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
        _adam = optax.scale_by_amsgrad if amsgrad else optax.scale_by_adam
        chain.append(_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif opt_name in ("adamw",):
        _adam = optax.scale_by_amsgrad if amsgrad else optax.scale_by_adam
        chain.append(_adam(b1=betas[0], b2=betas[1], eps=eps))
        chain.append(optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask))
    elif opt_name in ("sgd", "momentum", "nesterov"):
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
        nesterov = opt_name != "momentum"
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif opt_name == "lamb":
        # composed from optax.lamb's internals (scale_by_adam ->
        # add_decayed_weights -> scale_by_trust_ratio) so it flows through
        # the shared tail below like every other optimizer — the previous
        # early-return silently dropped grad clipping, the plateau host-LR,
        # linear-probe freezing, AND MultiSteps grad accumulation
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
        chain.append(optax.scale_by_trust_ratio())
    elif opt_name == "adagrad":
        # torch Adagrad couples weight decay into the grad like SGD/RMSprop
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
        chain.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps))
    elif opt_name == "rmsprop":
        # torch RMSprop also couples decay into the grad before scaling.
        # timm's create_optimizer_v2 builds RMSprop(alpha=0.9,
        # momentum=args.momentum): eps is added OUTSIDE the sqrt
        # (eps_in_sqrt=False) and the momentum buffer accumulates the
        # rms-scaled update (trace AFTER scale_by_rms).
        if args.weight_decay:
            chain.append(
                optax.add_decayed_weights(args.weight_decay, mask=_no_decay_mask)
            )
        chain.append(optax.scale_by_rms(decay=rms_alpha, eps=eps,
                                        eps_in_sqrt=False))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
    else:
        raise ValueError(f"Unsupported optimizer: {args.opt}")

    if getattr(args, "use_sched", False) and getattr(args, "sched", "") == "plateau":
        # metric-driven schedule: lr is a host-updatable device scalar
        base_lr = float(schedule(jnp.zeros((), jnp.int32)))
        warmup = getattr(args, "warmup_epochs", 0) > 0
        init_lr = args.warmup_lr if warmup else base_lr
        chain.append(scale_by_host_lr(init_lr))
    else:
        chain.append(optax.scale_by_schedule(lambda step: -schedule(step)))

    layer_decay = getattr(args, "layer_decay", None)
    if layer_decay is not None:
        chain.append(scale_by_layer_decay(float(layer_decay)))
        _logger.info(
            "layer_decay=%s: timm-parity grouping — MIRROR-family models "
            "have no head prefix, so every parameter lands in one group "
            "with lr scale 1.0 (the reference's --layer-decay is inert for "
            "its own models; see scale_by_layer_decay)", layer_decay,
        )
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
