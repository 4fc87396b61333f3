"""Survival training-trajectory golden vs torch — reference loss in the loop.

Completes the trajectory-golden trilogy (test_torch_trajectory: MIRROR
pretrain, AdamW decoupled + cosine + accumulation;
test_torch_trajectory_classifier: subtyping, coupled Adam + AGC + per-epoch
schedule) with the survival path's compositions none of the others touch:

- the SGD family (timm 'sgd' == torch.optim.SGD nesterov=True with COUPLED
  weight decay: grad += wd*p before the momentum buffer — make_optimizer
  orders add_decayed_weights before optax.trace),
- the NLL-surv gradient path (sigmoid -> hazards -> censorship-masked
  log-survival sums with the alpha-upweighted uncensored term,
  ref losses/nll_surv.py:5-94) — and the torch side runs the IMPORTED
  REFERENCE NLLSurvLoss module itself, not a transcription, so a shared
  misreading of the loss cannot pass,
- the 'add' fusion head (the classifier golden runs 'concat'),
- global-norm clipping composed with SGD (clip BEFORE the coupled decay,
  matching timm's loop: backward -> clip_grad_norm_ -> opt.step, ref
  train_mirror.py:1223-1230).

8 updates of the production jitted make_survival_train_step vs a torch loop
in the reference's order (train_survival.py:1240-1290 deltas on the shared
timm update loop).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mirror_tpu.models import transmil as transmil_mod
from mirror_tpu.models.classifier import MIRRORClassifier
from mirror_tpu.tools.import_torch_checkpoint import (
    convert_state_dict,
    to_torch_state_dict,
)
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_survival_train_step

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

B = 4
WSI_IN, RNA_IN, E = 40, 100, 24
N_TOK = 30
N_BINS = 4
N_STEPS = 8
ALPHA = 0.4
EMA_DECAY = 0.9
CLIP = 1.0


class _Args:
    opt = "sgd"  # nesterov momentum + COUPLED decay (torch.optim.SGD)
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 0.05
    clip_grad = CLIP
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = True
    sched = "cosine"
    sched_on_updates = True
    warmup_lr = 1e-5
    min_lr = 1e-7
    epochs = 4
    warmup_epochs = 1
    warmup_prefix = False
    decay_epochs = 1
    decay_rate = 0.5
    decay_milestones = (1, 2)
    grad_accum_steps = 1


def _load_ref_nll():
    name = "refmod_losses_nll_surv_traj"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, "losses", "nll_surv.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _step_draws(t):
    rng = np.random.RandomState(900 + t)
    return dict(
        wsi=rng.randn(B, N_TOK, WSI_IN).astype(np.float32),
        rna=rng.randn(B, RNA_IN).astype(np.float32),
        label=rng.randint(0, N_BINS, size=B).astype(np.int32),
        censorship=rng.randint(0, 2, size=B).astype(np.float32),
    )


def _run_flax():
    model = MIRRORClassifier(
        wsi_embed_dim=WSI_IN, rna_embed_dim=RNA_IN, embed_dim=E,
        num_classes=N_BINS, fusion="add", rna_proj_drop_rate=0.0,
    )
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(3), 4),
    ))
    d0 = _step_draws(0)
    params = model.init(
        rngs, jnp.asarray(d0["wsi"]), jnp.asarray(d0["rna"])
    )["params"]
    schedule = make_schedule(_Args, steps_per_epoch=2, base_lr=1e-2)
    tx = make_optimizer(_Args, schedule)
    step = make_survival_train_step(
        model, tx, loss_name="nll_surv", loss_alpha=ALPHA,
        ema_decay=EMA_DECAY, ema_warmup=False, schedule=schedule,
    )
    state = create_train_state(params, tx, model_ema=True)
    jitted = jax.jit(step)

    mp = pytest.MonkeyPatch()
    # zero the TransLayer's hard-coded 0.1 attn dropout — the torch oracle
    # runs eval semantics (same rationale as the other trajectory goldens)
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
                "censorship": jnp.asarray(d["censorship"]),
            }
            state, m = jitted(state, batch, jax.random.PRNGKey(t))
            losses.append(float(m["loss"]))
            lrs.append(float(m["lr"]))
    finally:
        mp.undo()
    return params, state, losses, lrs, schedule


def _run_torch(init_params, schedule):
    import oracle_torch as oracle

    ref_loss = _load_ref_nll().NLLSurvLoss(alpha=ALPHA)
    p = {k: torch.tensor(np.asarray(v), requires_grad=True)
         for k, v in to_torch_state_dict(init_params).items()}
    ema = {k: v.detach().clone() for k, v in p.items()}
    decay = [v for v in p.values() if v.ndim > 1]
    no_decay = [v for v in p.values() if v.ndim <= 1]
    opt = torch.optim.SGD(
        [
            {"params": decay, "weight_decay": _Args.weight_decay},
            {"params": no_decay, "weight_decay": 0.0},
        ],
        lr=1e-2, momentum=_Args.momentum, nesterov=True,
    )

    losses, lrs = [], []
    for t in range(N_STEPS):
        d = _step_draws(t)
        lr_t = float(schedule(jnp.asarray(t, jnp.int32)))
        for g in opt.param_groups:
            g["lr"] = lr_t
        lrs.append(lr_t)
        logits = oracle.classifier_forward(
            p, torch.tensor(d["wsi"]), torch.tensor(d["rna"]),
            embed_dim=E, fusion="add",
        )
        loss = ref_loss(
            logits,
            torch.tensor(d["label"], dtype=torch.long),
            torch.tensor(d["censorship"]),
        )
        losses.append(float(loss.detach()))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(list(p.values()), CLIP)
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


def test_lr_sequence_matches(trajectories):
    np.testing.assert_allclose(
        trajectories["lrs_j"], trajectories["lrs_t"], rtol=1e-5
    )
    # per-update cosine with 1 warmup epoch (2 updates): strictly rising
    # through warmup, then strictly falling
    lrs = trajectories["lrs_t"]
    assert lrs[0] < lrs[1] < lrs[2]
    assert all(a > b for a, b in zip(lrs[2:], lrs[3:]))


def test_per_step_loss_trajectory(trajectories):
    for t, (a, b) in enumerate(
        zip(trajectories["losses_j"], trajectories["losses_t"])
    ):
        assert a == pytest.approx(b, rel=2e-5), f"step {t}: {a} vs {b}"


def test_trajectory_covers_both_censorship_branches():
    seen = np.concatenate([_step_draws(t)["censorship"] for t in range(N_STEPS)])
    assert (seen == 0).any() and (seen == 1).any()


def _assert_tree_close(got_tree, want_tree, what):
    from flax.traverse_util import flatten_dict

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
