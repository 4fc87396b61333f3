"""Downstream (classifier) training-trajectory golden vs torch.

Composes the OTHER optimizer family the MIRROR one can't: COUPLED-decay
Adam (timm 'adam': grad += wd*p BEFORE the moment update — ordering only a
trajectory can verify), AGC clipping with the exclude_head tail
(--clip-mode agc drops the last two torch-registration params: the
classifier head), timm label-smoothed CE, per-EPOCH schedule stepping
(sched_on_updates=False quantizes the update count), and the EMA. 8 updates
of the production jitted make_classifier_train_step vs a torch loop in the
reference's order (train_subtyping.py:982-990 smoothing; the shared timm
update loop train_mirror.py:1223-1284).

Oracle forward: tests/oracle_torch.py::classifier_forward (already
logit-goldened); AGC oracle: the timm transcription from test_optim_agc.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from flax.traverse_util import flatten_dict

from mirror_tpu.models import transmil as transmil_mod
from mirror_tpu.models.classifier import MIRRORClassifier
from mirror_tpu.tools.import_torch_checkpoint import (
    convert_state_dict,
    to_torch_state_dict,
)
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_classifier_train_step

import oracle_torch as oracle
from test_optim_agc import _timm_agc

B = 4
WSI_IN, RNA_IN, E = 40, 100, 24
N_TOK = 30
N_CLASSES = 3
N_STEPS = 8
SMOOTHING = 0.1
EMA_DECAY = 0.9
CLIP = 0.02


class _Args:
    opt = "adam"  # COUPLED weight decay (unlike adamw)
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 0.05
    clip_grad = CLIP
    clip_mode = "agc"
    opt_kwargs = {}
    use_sched = True
    sched = "step"
    sched_on_updates = False  # per-EPOCH stepping (update//steps_per_epoch)
    warmup_lr = 1e-5
    min_lr = 1e-7
    epochs = 4
    warmup_epochs = 1
    warmup_prefix = False
    decay_epochs = 1
    decay_rate = 0.5
    decay_milestones = (1, 2)
    grad_accum_steps = 1


def _step_draws(t):
    rng = np.random.RandomState(500 + t)
    return dict(
        wsi=rng.randn(B, N_TOK, WSI_IN).astype(np.float32),
        rna=rng.randn(B, RNA_IN).astype(np.float32),
        label=rng.randint(0, N_CLASSES, size=B).astype(np.int32),
    )


def _run_flax():
    model = MIRRORClassifier(
        wsi_embed_dim=WSI_IN, rna_embed_dim=RNA_IN, embed_dim=E,
        num_classes=N_CLASSES, fusion="concat", rna_proj_drop_rate=0.0,
    )
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(0), 4),
    ))
    d0 = _step_draws(0)
    params = model.init(
        rngs, jnp.asarray(d0["wsi"]), jnp.asarray(d0["rna"])
    )["params"]
    schedule = make_schedule(_Args, steps_per_epoch=2, base_lr=1e-3)
    tx = make_optimizer(_Args, schedule)
    step = make_classifier_train_step(
        model, tx, smoothing=SMOOTHING, ema_decay=EMA_DECAY,
        ema_warmup=False, schedule=schedule,
    )
    state = create_train_state(params, tx, model_ema=True)
    jitted = jax.jit(step)

    mp = pytest.MonkeyPatch()
    # zero the TransLayer's hard-coded attn dropout (the oracle runs eval
    # semantics; same rationale as test_torch_trajectory)
    real_na = transmil_mod.NystromAttention
    mp.setattr(
        transmil_mod, "NystromAttention",
        lambda **kw: real_na(**{**kw, "dropout": 0.0}),
    )
    losses, lrs = [], []
    try:
        for t in range(N_STEPS):
            d = _step_draws(t)
            batch = {
                "wsi": jnp.asarray(d["wsi"]), "rna": jnp.asarray(d["rna"]),
                "label": jnp.asarray(d["label"]),
            }
            state, m = jitted(state, batch, jax.random.PRNGKey(t))
            losses.append(float(m["loss"]))
            lrs.append(float(m["lr"]))
    finally:
        mp.undo()
    return params, state, losses, lrs, schedule


def _run_torch(init_params, schedule):
    p = {k: torch.tensor(np.asarray(v), requires_grad=True)
         for k, v in to_torch_state_dict(init_params).items()}
    ema = {k: v.detach().clone() for k, v in p.items()}
    decay = [v for v in p.values() if v.ndim > 1]
    no_decay = [v for v in p.values() if v.ndim <= 1]
    opt = torch.optim.Adam(
        [
            {"params": decay, "weight_decay": _Args.weight_decay},
            {"params": no_decay, "weight_decay": 0.0},
        ],
        lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
    )
    skip = {"head.weight", "head.bias"}  # timm exclude_head: last two params

    losses, lrs = [], []
    for t in range(N_STEPS):
        d = _step_draws(t)
        lr_t = float(schedule(jnp.asarray(t, jnp.int32)))
        for g in opt.param_groups:
            g["lr"] = lr_t
        lrs.append(lr_t)
        logits = oracle.classifier_forward(
            p, torch.tensor(d["wsi"]), torch.tensor(d["rna"]),
            embed_dim=E, fusion="concat",
        )
        loss = F.cross_entropy(
            logits, torch.tensor(d["label"], dtype=torch.long),
            label_smoothing=SMOOTHING,
        )
        losses.append(float(loss.detach()))
        opt.zero_grad()
        loss.backward()
        with torch.no_grad():
            grads = {k: v.grad.clone() for k, v in p.items()}
            clipped = _timm_agc(p, grads, CLIP, skip)
            for k, v in p.items():
                v.grad.copy_(clipped[k])
        opt.step()
        with torch.no_grad():
            d_t = 0.0 if t == 0 else EMA_DECAY
            for k in ema:
                ema[k].mul_(d_t).add_(p[k].detach(), alpha=1.0 - d_t)
    return p, ema, losses, lrs


@pytest.fixture(scope="module")
def trajectories():
    init_params, state, losses_j, lrs_j, schedule = _run_flax()
    p_t, ema_t, losses_t, lrs_t = _run_torch(init_params, schedule)
    return dict(state=state, p_t=p_t, ema_t=ema_t, losses_j=losses_j,
                losses_t=losses_t, lrs_j=lrs_j, lrs_t=lrs_t)


def test_epoch_quantized_lr_sequence(trajectories):
    np.testing.assert_allclose(
        trajectories["lrs_j"], trajectories["lrs_t"], rtol=1e-5
    )
    # sched_on_updates=False + steps_per_epoch=2: the lr changes at epoch
    # boundaries, i.e. pairs of consecutive updates share an lr
    lrs = trajectories["lrs_t"]
    assert lrs[2] == lrs[3] and lrs[4] == lrs[5]
    assert len(set(np.round(lrs, 12))) >= 3


def test_per_step_loss_trajectory(trajectories):
    for t, (a, b) in enumerate(
        zip(trajectories["losses_j"], trajectories["losses_t"])
    ):
        assert a == pytest.approx(b, rel=2e-5), f"step {t}: {a} vs {b}"


def _assert_tree_close(got_tree, want_tree, what):
    flat_g = {"/".join(k): np.asarray(v, np.float64)
              for k, v in flatten_dict(got_tree).items()}
    flat_w = {"/".join(k): np.asarray(v, np.float64)
              for k, v in flatten_dict(want_tree).items()}
    assert set(flat_g) == set(flat_w)
    for k in sorted(flat_g):
        a, b = flat_g[k].ravel(), flat_w[k].ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert nb == pytest.approx(na, rel=1e-4, abs=1e-9), (
            f"{what} {k}: |p| {na} vs {nb}"
        )
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(a @ b / (na * nb))
        assert cos >= 0.9999, f"{what} {k}: cosine {cos}"


def test_final_params_match(trajectories):
    _assert_tree_close(
        trajectories["state"].params, _as_flax(trajectories["p_t"]), "param"
    )


def test_final_ema_match(trajectories):
    _assert_tree_close(
        trajectories["state"].ema_params, _as_flax(trajectories["ema_t"]),
        "ema",
    )


def _as_flax(torch_params):
    tree, unmapped = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_params.items()}
    )
    assert not unmapped, unmapped
    return tree
