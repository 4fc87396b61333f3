"""timm create_scheduler_v2 surface parity: cosine/tanh/poly cycles
(cycle_mul/cycle_decay/cycle_limit), k_decay, warmup on step/multistep,
multistep's t+1 bisect quirk, lr noise (torch-generator exact), and the
cycle-aware scheduled-epochs count.

Reference surface: /root/reference/train_mirror.py:321-492 (args) and
:952-975 (create_scheduler_v2 + scheduler_kwargs). Expected values are
hand-derived from the timm formulas cited in mirror_tpu/train/optim.py;
noise values are cross-checked against torch.Generator directly (timm's
_calculate_noise is a seeded torch.randn resample loop).
"""

import math

import jax.numpy as jnp
import pytest

from mirror_tpu.train.optim import (
    PlateauController,
    _cycle_span_epochs,
    make_schedule,
    scheduled_epochs,
)


class Args:
    use_sched = True
    sched = "cosine"
    sched_on_updates = True  # with steps_per_epoch=1 the step IS t
    lr = 1.0
    warmup_lr = 0.1
    min_lr = 0.0
    epochs = 4
    warmup_epochs = 0
    warmup_prefix = False
    decay_epochs = 3
    decay_rate = 0.1
    decay_milestones = (4, 8)
    cooldown_epochs = 0
    patience_epochs = 10
    lr_noise = None
    lr_noise_pct = 0.67
    lr_noise_std = 1.0
    lr_cycle_mul = 1.0
    lr_cycle_decay = 0.5
    lr_cycle_limit = 1
    lr_k_decay = 1.0
    seed = 42


def _lrs(a, ts, spe=1, base=1.0):
    fn = make_schedule(a, steps_per_epoch=spe, base_lr=base)
    return [float(fn(jnp.asarray(t, jnp.int32))) for t in ts]


def test_cosine_cycles_decay_and_limit():
    a = Args()
    a.lr_cycle_limit = 3
    got = _lrs(a, [0, 2, 4, 8, 12, 99])
    # cycle i: lr_max = 0.5^i; midpoint = half of it; past limit -> min_lr
    assert got == pytest.approx([1.0, 0.5, 0.5, 0.25, 0.0, 0.0], abs=1e-6)


def test_cosine_cycle_mul_growing_cycles():
    a = Args()
    a.lr_cycle_mul = 2.0
    a.lr_cycle_decay = 1.0
    a.lr_cycle_limit = 3
    got = _lrs(a, [0, 4, 8, 12])
    # cycles span [0,4), [4,12), [12,28): each restarts at base, t=8 is the
    # midpoint of cycle 1 (t_i=8)
    assert got == pytest.approx([1.0, 1.0, 0.5, 1.0], abs=1e-6)
    assert _cycle_span_epochs(4, 2.0, 3) == 28
    a.cooldown_epochs = 2
    assert scheduled_epochs(a) == 30


def test_cosine_k_decay():
    a = Args()
    a.lr_k_decay = 2.0
    (got,) = _lrs(a, [2])
    # cos(pi * t^k / T^k) = cos(pi * 4/16)
    assert got == pytest.approx(0.5 * (1 + math.cos(math.pi / 4)), abs=1e-6)


def test_poly_curve_and_endpoints():
    a = Args()
    a.sched = "poly"
    got = _lrs(a, [0, 1, 4])
    # timm PolyLRScheduler power=0.5: (1 - t/T)^0.5; past the cycle -> min_lr
    assert got == pytest.approx([1.0, math.sqrt(0.75), 0.0], abs=1e-6)


def test_tanh_endpoints_monotone():
    a = Args()
    a.sched = "tanh"
    got = _lrs(a, [0, 1, 2, 3, 4])
    # timm TanhLRScheduler lb=-7, ub=3: 0.5*(1 - tanh(lb + (ub-lb)*t/T))
    assert got[0] == pytest.approx(0.5 * (1 - math.tanh(-7.0)), abs=1e-6)
    assert got[2] == pytest.approx(0.5 * (1 - math.tanh(-2.0)), abs=1e-6)
    assert all(x > y for x, y in zip(got[:4], got[1:4]))
    assert got[4] == pytest.approx(0.0, abs=1e-6)  # i >= cycle_limit


def test_warmup_applies_to_step_sched():
    a = Args()
    a.sched = "step"
    a.warmup_epochs = 2
    got = _lrs(a, [0, 1, 2, 3, 6])
    # warmup line 0.1 -> 1.0 over 2 epochs, then decay_rate^(t//3)
    assert got == pytest.approx([0.1, 0.55, 1.0, 0.1, 0.01], abs=1e-6)


def test_multistep_timm_bisect_quirk():
    a = Args()
    a.sched = "multistep"
    got = _lrs(a, [0, 2, 3, 4, 7, 8])
    # timm bisect_right(milestones, t+1): decay lands at t == m-1
    assert got == pytest.approx([1.0, 1.0, 0.1, 0.1, 0.01, 0.01], abs=1e-6)


def test_warmup_prefix_shifts_cycle():
    a = Args()
    a.warmup_epochs = 2
    a.warmup_prefix = True
    got = _lrs(a, [2, 4, 6])
    # cycle sees t - warmup_t over the full t_initial=4
    assert got == pytest.approx([1.0, 0.5, 0.0], abs=1e-6)
    a.warmup_prefix = False
    got = _lrs(a, [2, 4])
    # non-prefix: raw t feeds the cycle; t=4 already past it
    assert got == pytest.approx([0.5, 0.0], abs=1e-6)


def test_epoch_quantization_matches_update_mode():
    a = Args()
    a.sched_on_updates = False
    by_epoch = make_schedule(a, steps_per_epoch=10, base_lr=1.0)
    # any update inside epoch 2 sees the epoch-2 lr
    v20 = float(by_epoch(jnp.asarray(20)))
    v29 = float(by_epoch(jnp.asarray(29)))
    assert v20 == v29 == pytest.approx(0.5, abs=1e-6)


def _torch_timm_noise(t, seed, pct, std):
    import torch

    g = torch.Generator()
    g.manual_seed(seed + t)
    while True:
        n = torch.randn(1, generator=g).item() * std
        if abs(n) < pct:
            return n


def test_lr_noise_window_and_values():
    a = Args()
    a.epochs = 8
    a.lr_noise = [0.25, 0.75]  # noise active for t in [2, 6)
    fn = make_schedule(a, steps_per_epoch=1, base_lr=1.0)
    clean = Args()
    clean.epochs = 8
    ref = make_schedule(clean, steps_per_epoch=1, base_lr=1.0)
    for t in range(8):
        got = float(fn(jnp.asarray(t)))
        base = float(ref(jnp.asarray(t)))
        if 2 <= t < 6:
            want = base * (1.0 + _torch_timm_noise(t, 42, 0.67, 1.0))
            assert got == pytest.approx(want, rel=1e-5), t
            assert abs(got / base - 1.0) < 0.67  # |noise| < pct by resampling
        else:
            assert got == pytest.approx(base, rel=1e-6), t


def test_lr_noise_single_fraction_means_onward():
    a = Args()
    a.epochs = 4
    a.lr_noise = [0.5]  # from t >= 2 onward
    fn = make_schedule(a, steps_per_epoch=1, base_lr=1.0)
    assert float(fn(jnp.asarray(0))) == pytest.approx(1.0, rel=1e-6)
    got = float(fn(jnp.asarray(3)))
    base = 0.5 * (1 + math.cos(math.pi * 3 / 4))
    assert got == pytest.approx(base * (1 + _torch_timm_noise(3, 42, 0.67, 1.0)),
                                rel=1e-5)


def test_plateau_noise_applied_but_state_clean():
    c = PlateauController(
        base_lr=1.0, decay_rate=0.1, patience=0, warmup_epochs=0, mode="min",
        noise_range=1.0, noise_pct=0.67, noise_std=1.0, noise_seed=42,
    )
    assert c.epoch_lr(0, 1.0) == pytest.approx(1.0)  # t=0 outside range
    noisy = c.epoch_lr(1, 0.5)  # improvement: clean lr stays 1.0
    assert noisy == pytest.approx(1.0 + _torch_timm_noise(1, 42, 0.67, 1.0),
                                  rel=1e-6)
    assert c.current_lr == pytest.approx(1.0)  # internal state noise-free


def test_config_accepts_scheduler_keys(tmp_path):
    import yaml

    from mirror_tpu.config import parse_args

    cfg = dict(lr_cycle_mul=2.0, lr_cycle_decay=0.9, lr_cycle_limit=4,
               lr_k_decay=1.5, lr_noise=[0.4, 0.9], lr_noise_pct=0.5,
               lr_noise_std=0.2, sched="poly", use_sched=True)
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    args, _ = parse_args("pretrain", ["--config", str(p)])
    assert args.lr_cycle_mul == 2.0 and args.lr_cycle_limit == 4
    assert args.lr_noise == [0.4, 0.9] and args.lr_k_decay == 1.5
    assert args.sched == "poly"


def test_cycle_restart_epoch_exact_with_fractional_mul():
    """f32-log regression: with epochs=10, mul=1.1 the start of cycle 2 is
    exactly t=21; the lr must restart at base*cycle_decay^2, not dip to
    min_lr for one epoch (timm computes the index in float64)."""
    a = Args()
    a.epochs = 10
    a.lr_cycle_mul = 1.1
    a.lr_cycle_decay = 0.5
    a.lr_cycle_limit = 4
    got = _lrs(a, [0, 10, 21])
    assert got == pytest.approx([1.0, 0.5, 0.25], abs=1e-6)


def test_plateau_warmup_is_noise_free():
    # timm PlateauLRScheduler.step applies noise only post-warmup
    c = PlateauController(
        base_lr=1.0, decay_rate=0.1, patience=0, warmup_epochs=2,
        warmup_lr=0.1, mode="min",
        noise_range=0.0, noise_pct=0.67, noise_std=1.0, noise_seed=42,
    )
    assert c.epoch_lr(0, None) == pytest.approx(0.55)
    assert c.epoch_lr(1, None) == pytest.approx(1.0)
    noisy = c.epoch_lr(2, 0.5)
    assert noisy == pytest.approx(1.0 + _torch_timm_noise(2, 42, 0.67, 1.0),
                                  rel=1e-6)


def test_scalar_zero_lr_noise_enables_noise_from_start():
    # timm checks `lr_noise is not None`: a scalar 0.0 means noise from t=0
    a = Args()
    a.lr_noise = 0.0
    got = float(make_schedule(a, steps_per_epoch=1, base_lr=1.0)(
        jnp.asarray(0)))
    assert got == pytest.approx(1.0 + _torch_timm_noise(0, 42, 0.67, 1.0),
                                rel=1e-5)


def test_applied_lr_reads_host_lr_state():
    """steps.applied_lr must report the plateau HostLRState lr, not the
    identity placeholder schedule."""
    import optax

    from mirror_tpu.train.optim import scale_by_host_lr, set_host_lr
    from mirror_tpu.train.steps import applied_lr

    tx = optax.chain(optax.scale_by_adam(), scale_by_host_lr(0.1))
    opt_state = tx.init({"w": jnp.zeros(3)})
    sched = lambda step: jnp.asarray(999.0)  # noqa: E731
    assert float(applied_lr(opt_state, sched, 0)) == pytest.approx(0.1)
    opt_state = set_host_lr(opt_state, 0.01)
    assert float(applied_lr(opt_state, sched, 0)) == pytest.approx(0.01)
    # non-plateau opt states fall back to the schedule
    tx2 = optax.adam(1e-3)
    assert float(applied_lr(tx2.init({"w": jnp.zeros(3)}), sched, 0)) == 999.0


def test_scheduled_epochs_step_has_no_cooldown_tail():
    a = Args()
    a.sched = "step"
    a.cooldown_epochs = 3
    # timm adds the cooldown tail only for the cycle schedules
    assert scheduled_epochs(a) == 4
    a.sched = "cosine"
    assert scheduled_epochs(a) == 7
