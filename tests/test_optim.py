"""Optimizer factory, LR schedules, grad accumulation, linear-probe freezing,
and functionalized train-step invariants (prototype renorm, logit clamp)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.steps import (
    clamp_logit_scale,
    renorm_prototypes,
    smoothed_xent,
)


class Args:
    opt = "adam"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 0.0
    clip_grad = None
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = False
    sched = "cosine"
    sched_on_updates = False
    lr = 1e-3
    warmup_lr = 1e-5
    min_lr = 1e-6
    epochs = 10
    warmup_epochs = 2
    warmup_prefix = False
    decay_epochs = 3
    decay_rate = 0.1
    decay_milestones = (4, 8)
    grad_accum_steps = 1
    patience_epochs = 10
    cooldown_epochs = 0


def test_constant_schedule_default():
    sched = make_schedule(Args, steps_per_epoch=10, base_lr=2e-5)
    assert float(sched(jnp.int32(0))) == pytest.approx(2e-5)
    assert float(sched(jnp.int32(999))) == pytest.approx(2e-5)


def test_cosine_schedule_warmup_and_decay():
    a = Args()
    a.use_sched = True
    sched = make_schedule(a, steps_per_epoch=10, base_lr=1e-3)
    # warmup at epoch boundary granularity
    lr0 = float(sched(jnp.int32(0)))
    lr_mid_warm = float(sched(jnp.int32(10)))  # epoch 1
    lr_peak = float(sched(jnp.int32(20)))  # epoch 2 (warmup done)
    assert lr0 == pytest.approx(1e-5, rel=1e-3)
    assert lr0 < lr_mid_warm < lr_peak
    # decays toward min_lr by the end
    lr_end = float(sched(jnp.int32(10 * 10 - 1)))
    assert lr_end < lr_peak
    assert lr_end >= a.min_lr - 1e-12


def test_step_and_multistep_schedules():
    # timm semantics: warmup (2 epochs here) applies to step/multistep too,
    # and multistep decays at t == milestone-1 (bisect_right(milestones, t+1))
    a = Args()
    a.use_sched = True
    a.sched = "step"
    sched = make_schedule(a, steps_per_epoch=1, base_lr=1.0)
    assert float(sched(jnp.int32(0))) == pytest.approx(1e-5)
    assert float(sched(jnp.int32(2))) == pytest.approx(1.0)
    assert float(sched(jnp.int32(3))) == pytest.approx(0.1)
    a2 = Args()
    a2.use_sched = True
    a2.sched = "multistep"
    sched2 = make_schedule(a2, steps_per_epoch=1, base_lr=1.0)
    assert float(sched2(jnp.int32(2))) == pytest.approx(1.0)
    assert float(sched2(jnp.int32(3))) == pytest.approx(0.1)
    assert float(sched2(jnp.int32(4))) == pytest.approx(0.1)
    assert float(sched2(jnp.int32(8))) == pytest.approx(0.01)


def test_adam_matches_optax_reference():
    a = Args()
    sched = make_schedule(a, 10, a.lr)
    tx = make_optimizer(a, sched)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.array([1.0, -2.0, 0.5])}
    updates, _ = tx.update(grads, state, params)
    ref = optax.adam(a.lr)
    ref_updates, _ = ref.update(grads, ref.init(params), params)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), np.asarray(ref_updates["w"]), rtol=1e-6
    )


def test_weight_decay_skips_1d_params():
    a = Args()
    a.opt = "adamw"
    a.weight_decay = 0.1
    sched = make_schedule(a, 10, a.lr)
    tx = make_optimizer(a, sched)
    params = {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}
    state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    # kernel decays, bias untouched
    assert float(jnp.abs(updates["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["bias"]).sum()) == 0


def test_grad_clipping():
    a = Args()
    a.clip_grad = 1.0
    sched = make_schedule(a, 10, 1.0)
    tx = make_optimizer(a, sched)
    params = {"w": jnp.zeros((4,))}
    big = {"w": jnp.full((4,), 100.0)}
    updates, _ = tx.update(big, tx.init(params), params)
    # global norm clipped to 1 then adam-normalized; must be finite and small
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_grad_accumulation_matches_large_batch():
    a = Args()
    a.grad_accum_steps = 2
    sched = make_schedule(a, 10, a.lr)
    tx = make_optimizer(a, sched)
    params = {"w": jnp.array([1.0, 2.0])}
    state = tx.init(params)
    g1 = {"w": jnp.array([1.0, 0.0])}
    g2 = {"w": jnp.array([0.0, 1.0])}
    u1, state = tx.update(g1, state, params)
    assert float(jnp.abs(u1["w"]).sum()) == 0  # no update mid-accumulation
    u2, state = tx.update(g2, state, params)
    assert float(jnp.abs(u2["w"]).sum()) > 0

    # equals a single update with the mean gradient
    a2 = Args()
    tx2 = make_optimizer(a2, make_schedule(a2, 10, a2.lr))
    mean_g = {"w": jnp.array([0.5, 0.5])}
    u_ref, _ = tx2.update(mean_g, tx2.init(params), params)
    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(u_ref["w"]), rtol=1e-6)


def test_linear_probe_freezes_everything_but_head():
    a = Args()
    sched = make_schedule(a, 10, a.lr)
    params = {"head": {"kernel": jnp.ones((2, 2))}, "enc": {"kernel": jnp.ones((2, 2))}}
    mask = {"head": {"kernel": True}, "enc": {"kernel": False}}
    tx = make_optimizer(a, sched, trainable_mask=mask)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(updates["head"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["enc"]["kernel"]).sum()) == 0


def test_prototype_renorm_and_logit_clamp():
    params = {
        "prototypes": {"kernel": jnp.array([[3.0, 0.0], [4.0, 10.0]])},
        "logit_scale": jnp.float32(9.9),
    }
    out = renorm_prototypes(params)
    norms = np.linalg.norm(np.asarray(out["prototypes"]["kernel"]), axis=0)
    np.testing.assert_allclose(norms, [1.0, 1.0], rtol=1e-6)
    clamped = clamp_logit_scale(params)
    assert float(clamped["logit_scale"]) == pytest.approx(np.log(100.0))
    low = clamp_logit_scale({"logit_scale": jnp.float32(-1.0)})
    assert float(low["logit_scale"]) == 0.0


def test_smoothed_xent_matches_torch_semantics():
    logits = jnp.array([[2.0, 0.5, -1.0], [0.0, 1.0, 0.0]])
    labels = jnp.array([0, 2])
    # smoothing=0: plain CE
    plain = float(smoothed_xent(logits, labels, 0.0))
    logp = np.log(
        np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum(1, keepdims=True)
    )
    want = -(logp[0, 0] + logp[1, 2]) / 2
    assert plain == pytest.approx(want, rel=1e-5)
    # smoothing mixes in the uniform term
    sm = float(smoothed_xent(logits, labels, 0.1))
    uni = -logp.mean(1)
    want_sm = np.mean(0.9 * np.array([-logp[0, 0], -logp[1, 2]]) + 0.1 * uni)
    assert sm == pytest.approx(want_sm, rel=1e-5)


def test_adam_weight_decay_matches_torch_coupled_l2():
    """opt=adam + weight_decay must reproduce torch.optim.Adam's COUPLED L2
    (grad += wd*p BEFORE the moment updates), not AdamW's decoupled decay —
    multi-step golden check against torch itself."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    from mirror_tpu.train.optim import make_optimizer, make_schedule

    class A:
        opt = "adam"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.1
        clip_grad = None
        clip_mode = "norm"
        opt_kwargs = {}
        use_sched = False
        grad_accum_steps = 1

    lr = 1e-2
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads_seq = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    # torch reference
    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=0.1)
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    # ours
    tx = make_optimizer(A, make_schedule(A, 1, lr))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_lamb_flows_through_shared_chain():
    """opt=lamb must not bypass clipping / grad accumulation (the old
    early-return dropped both silently)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mirror_tpu.train.optim import make_optimizer, make_schedule

    class A:
        opt = "lamb"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.01
        clip_grad = 1.0
        clip_mode = "norm"
        opt_kwargs = {}
        use_sched = False
        grad_accum_steps = 2

    tx = make_optimizer(A, make_schedule(A, 1, 1e-3))
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    assert isinstance(state, optax.MultiStepsState)  # accumulation wrapped
    g = {"w": jnp.full((4, 4), 100.0)}  # would explode without clipping
    # micro-step 1: no real update yet
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) == 0.0
    # micro-step 2: real update, finite and small (clipped + trust ratio)
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0
    assert bool(jnp.isfinite(updates["w"]).all())


def test_rmsprop_matches_torch_with_momentum():
    """opt=rmsprop must reproduce timm's torch.optim.RMSprop construction
    (alpha=0.9, momentum=args.momentum, eps OUTSIDE the sqrt) — the
    reference builds it via create_optimizer_v2 (ref train_mirror.py:742)."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp
    from mirror_tpu.train.optim import make_optimizer, make_schedule

    class A:
        opt = "rmsprop"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.05
        clip_grad = None
        clip_mode = "norm"
        opt_kwargs = {}
        use_sched = False
        grad_accum_steps = 1

    lr = 1e-2
    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads_seq = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.RMSprop(
        [wt], lr=lr, alpha=0.9, eps=1e-8, momentum=0.9, weight_decay=0.05
    )
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    tx = make_optimizer(A, make_schedule(A, 1, lr))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_opt_kwargs_consumed_or_rejected():
    """--opt-kwargs must actually reach the optimizer (the reference
    forwards them to the torch ctor) — eps/betas apply, unknown keys raise
    instead of being silently dropped."""
    import numpy as np
    import pytest

    import jax.numpy as jnp
    from mirror_tpu.train.optim import make_optimizer, make_schedule

    class A:
        opt = "adam"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.0
        clip_grad = None
        clip_mode = "norm"
        opt_kwargs = {"eps": 1.0}
        use_sched = False
        grad_accum_steps = 1

    # a huge eps visibly damps the first step vs the default
    params = {"w": jnp.ones((2, 2))}
    g = {"w": jnp.full((2, 2), 0.5)}

    def first_step(a):
        tx = make_optimizer(a, make_schedule(a, 1, 1e-2))
        st = tx.init(params)
        up, _ = tx.update(g, st, params)
        return np.asarray(up["w"])

    damped = first_step(A)

    class B(A):
        opt_kwargs = {}

    default = first_step(B)
    assert np.all(np.abs(damped) < np.abs(default) * 0.5)

    class C(A):
        opt_kwargs = {"fuser_mode": True}

    with pytest.raises(ValueError, match="opt-kwargs"):
        make_optimizer(C, make_schedule(C, 1, 1e-2))


def test_fast_forward_schedule_resume_semantics():
    """timm fast-forwards its scheduler to start_epoch on resume (ref
    train_mirror.py:971-975); our count lives in opt_state. Zero counts
    advance; restored (nonzero) counts are left exact."""
    from mirror_tpu.train.optim import fast_forward_schedule

    class A(Args):
        use_sched = True
        sched = "cosine"
        sched_on_updates = True
        lr = 1e-3
        warmup_epochs = 2
        epochs = 10

    sched = make_schedule(A, steps_per_epoch=4, base_lr=1e-3)
    tx = make_optimizer(A, sched)
    params = {"w": jnp.ones((3, 3))}
    opt_state = tx.init(params)

    # fresh state: count 0 -> fast-forward to epoch 5 (20 updates)
    ff = fast_forward_schedule(opt_state, 5 * 4)
    g = {"w": jnp.zeros((3, 3))}
    _, st = tx.update(g, ff, params)

    def sched_count(s):
        found = []
        jax.tree.map(
            lambda x: found.append(int(x.count))
            if isinstance(x, optax.ScaleByScheduleState) else None,
            s, is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        )
        return found[0]

    assert sched_count(ff) == 20
    assert sched_count(st) == 21
    # the first post-resume update uses the epoch-5 cosine lr, not warmup
    updates, _ = tx.update({"w": jnp.ones((3, 3))}, ff, params)
    lr_applied = float(-updates["w"][0, 0])
    # rel 1e-4: adam's eps shifts the unit update by ~1e-8/|g|-ish terms;
    # the point is the epoch-5 cosine lr (50x the warmup lr), not exactness
    assert lr_applied == pytest.approx(float(sched(jnp.int32(20))), rel=1e-4)
    assert lr_applied > 2 * float(sched(jnp.int32(0)))  # not the warmup lr

    # a restored count is NOT overwritten (mid-epoch recovery accuracy)
    ff2 = fast_forward_schedule(st, 5 * 4)
    assert sched_count(ff2) == 21


def test_plateau_resume_past_warmup_restores_base_lr():
    """Resume with --no-resume-opt past warmup must not pin warmup_lr
    forever (the old epoch == warmup_epochs equality never fired)."""
    from mirror_tpu.train.optim import PlateauController

    c = PlateauController(base_lr=1e-3, warmup_epochs=5, warmup_lr=1e-5)
    assert c.current_lr == pytest.approx(1e-5)
    lr = c.epoch_lr(50, None)  # resumed at epoch 50, no metric yet
    assert lr == pytest.approx(1e-3)
    # later epochs keep plateau decisions (no re-reset to base)
    c.current_lr = 5e-4  # pretend a decay happened
    assert c.epoch_lr(51, None) == pytest.approx(5e-4)

    # through step_epoch (the harness path): HostLRState AND the reported
    # applied_lr both land on base_lr, not warmup_lr
    from mirror_tpu.train.optim import get_host_lr
    from mirror_tpu.train.state import create_train_state

    class P_(Args):
        use_sched = True
        sched = "plateau"
        warmup_epochs = 5
        warmup_lr = 1e-5
        epochs = 60

    sched = make_schedule(P_, steps_per_epoch=2, base_lr=1e-3)
    tx = make_optimizer(P_, sched)
    state = create_train_state({"w": jnp.ones((2,))}, tx)
    c2 = PlateauController(base_lr=1e-3, warmup_epochs=5, warmup_lr=1e-5)
    state = c2.step_epoch(state, 50, None)
    assert get_host_lr(state.opt_state) == pytest.approx(1e-3)
    assert c2.applied_lr == pytest.approx(1e-3)


def test_plateau_contiguous_warmup_unchanged():
    from mirror_tpu.train.optim import PlateauController

    c = PlateauController(base_lr=1e-3, warmup_epochs=2, warmup_lr=1e-5)
    lrs = [c.epoch_lr(e, None) for e in range(4)]
    assert lrs[0] == pytest.approx(1e-5 + 0.5 * (1e-3 - 1e-5))
    assert lrs[1] == pytest.approx(1e-3)
    assert lrs[2] == pytest.approx(1e-3)
    assert lrs[3] == pytest.approx(1e-3)
