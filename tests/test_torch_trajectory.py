"""N-step training-TRAJECTORY golden: the composed flax train step vs torch.

test_torch_parity proves ONE fwd/bwd; the optimizer/schedule/EMA/AGC pieces
each have separate component goldens. Nothing composed them — and
update-ORDERING bugs (renorm -> step -> clamp -> EMA, weight-decay masking,
schedule counting) are exactly what component tests miss. This runs 10 full
updates of the PRODUCTION jitted step (make_mirror_train_step +
make_optimizer + make_schedule, the same objects the CLIs build) against a
torch loop that replays the reference's update order
(/root/reference/train_mirror.py:1126-1360):

    renorm prototypes (no_grad)            :1133-1137
    forward + MIRRORLoss                   :1144-1203
    backward + global-norm clip            :1223-1230
    optimizer.step()  (timm adamw == torch.optim.AdamW, decay only on
                       ndim>1 params — timm param_groups_weight_decay)
    logit_scale.clamp_(0, ln 100)          :1254-1256
    model_ema.update(model, step=n)        :1282-1284 (timm ModelEmaV3
                       warmup ramp 1-(1+t)^-2/3, first update copies)
    lr_scheduler.step_update(num_updates)  :1359-1360

Model forward = tests/oracle_torch.py (already 15-tuple/grad golden);
masking noise and VAE eps are injected per step into BOTH sides (through
``batch`` on the flax side so the step stays jitted — the values flow in as
device args, not baked constants). The lr sequence comes from our
make_schedule, itself bit-goldened against timm in test_sched_timm.py.

Pass bar (VERDICT r4 #4): per-step loss <= 1e-5 rel, final param cosine
>= 0.9999 per leaf (params AND EMA), norms within 1e-4 rel.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from flax.traverse_util import flatten_dict

from mirror_tpu.losses import MirrorLossWeights
from mirror_tpu.models import mirror as mirror_mod
from mirror_tpu.models import transmil as transmil_mod
from mirror_tpu.tools.import_torch_checkpoint import (
    convert_state_dict,
    to_torch_state_dict,
)
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_mirror_train_step

import oracle_torch as oracle

B = 3
WSI_IN, RNA_IN, E = 40, 100, 24
N_TOK = 30
STYLE_HID, STYLE_OUT, LATENT, PROTO = 32, 20, 16, 37
WSI_RATIO, RNA_RATIO = 0.75, 0.5
N_STEPS = 10
WEIGHTS = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
EMA_DECAY = 0.9
LOG100 = math.log(100.0)

MODEL_KW = dict(
    wsi_embed_dim=WSI_IN, rna_embed_dim=RNA_IN, embed_dim=E,
    wsi_num_tokens=N_TOK, style_mlp_hidden_dim=STYLE_HID,
    style_mlp_out_dim=STYLE_OUT, style_latent_dim=LATENT,
    num_prototypes=PROTO,
    rna_proj_drop_rate=0.0,  # the one nonzero dropout default; trajectories
    # must be dropout-free (torch masks are not injectable)
)


class _Args:
    opt = "adamw"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 0.05
    clip_grad = 1.0
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = True
    sched = "cosine"
    sched_on_updates = True
    warmup_lr = 1e-5
    min_lr = 1e-6
    epochs = 2
    warmup_epochs = 1
    warmup_prefix = False
    decay_epochs = 90
    decay_rate = 0.1
    decay_milestones = (90,)
    grad_accum_steps = 1


def _rank_mask(noise: np.ndarray, mask_ratio: float) -> np.ndarray:
    n = noise.shape[1]
    len_keep = int(n * (1 - mask_ratio))
    ranks = np.argsort(np.argsort(noise, axis=1), axis=1)
    return (ranks >= len_keep).astype(np.float32)


def _step_draws(t: int) -> dict:
    rng = np.random.RandomState(1000 + t)
    return dict(
        wsi=rng.randn(B, N_TOK, WSI_IN).astype(np.float32),
        rna=rng.randn(B, RNA_IN).astype(np.float32),
        wsi_noise=rng.rand(B, N_TOK).astype(np.float32),
        rna_noise=rng.rand(B, E).astype(np.float32),
        wsi_eps=rng.randn(B, LATENT).astype(np.float32),
        rna_eps=rng.randn(B, LATENT).astype(np.float32),
    )


# traced per-step injections, populated by the step wrapper below (tracers
# from the live jit trace — the patched fns below read them)
_INJECT: dict = {}


def _patch_stochastic(monkeypatch):
    def fixed_masking(key, batch, num_tokens, mask_ratio):
        return _INJECT["masks"][num_tokens]

    monkeypatch.setattr(transmil_mod, "random_token_masking", fixed_masking)

    # the reference hard-codes attn dropout 0.1 inside TransLayer
    # (ref mirror.py:299-309); the torch oracle runs eval semantics, so the
    # flax train step (which runs train semantics) must drop dropout too —
    # torch dropout masks are not injectable
    real_na = transmil_mod.NystromAttention

    def na_no_dropout(**kw):
        return real_na(**{**kw, "dropout": 0.0})

    monkeypatch.setattr(transmil_mod, "NystromAttention", na_no_dropout)

    def fixed_reparam(self, mu, logstd, rng):
        eps = _INJECT["eps"][_INJECT["i"] % 2]
        _INJECT["i"] += 1
        return mu + jnp.exp(0.5 * logstd) * eps.astype(mu.dtype)

    monkeypatch.setattr(mirror_mod.MIRROR, "reparameterize", fixed_reparam)


def _run_flax(accum: int = 1, n_steps: int = N_STEPS):
    args = type("_ArgsAccum", (_Args,), {"grad_accum_steps": accum})
    model = mirror_mod.MIRROR(**MODEL_KW)
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(0), 4),
    ))
    d0 = _step_draws(0)
    params = model.init(
        rngs, jnp.asarray(d0["wsi"]), jnp.asarray(d0["rna"])
    )["params"]

    schedule = make_schedule(args, steps_per_epoch=5, base_lr=1e-3)
    tx = make_optimizer(args, schedule)
    base_step = make_mirror_train_step(
        model, tx, WEIGHTS, wsi_mask_ratio=WSI_RATIO,
        rna_mask_ratio=RNA_RATIO, ema_decay=EMA_DECAY, ema_warmup=True,
        schedule=schedule,
    )

    def train_step(state, batch, rng):
        # route the injected draws (jit ARGS, so per-step values flow
        # through the one compiled graph) to the patched stochastic fns
        _INJECT["masks"] = {
            N_TOK: batch["wsi_mask_inject"], E: batch["rna_mask_inject"]
        }
        _INJECT["eps"] = [batch["wsi_eps"], batch["rna_eps"]]
        _INJECT["i"] = 0
        return base_step(state, batch, rng)

    state = create_train_state(params, tx, model_ema=True)
    jitted = jax.jit(train_step)

    mp = pytest.MonkeyPatch()
    losses, lrs = [], []
    try:
        _patch_stochastic(mp)
        for t in range(n_steps):
            d = _step_draws(t)
            batch = {
                "wsi": jnp.asarray(d["wsi"]),
                "rna": jnp.asarray(d["rna"]),
                "wsi_mask_inject": jnp.asarray(
                    _rank_mask(d["wsi_noise"], WSI_RATIO)
                ),
                "rna_mask_inject": jnp.asarray(
                    _rank_mask(d["rna_noise"], RNA_RATIO)
                ),
                "wsi_eps": jnp.asarray(d["wsi_eps"]),
                "rna_eps": jnp.asarray(d["rna_eps"]),
            }
            state, metrics = jitted(state, batch, jax.random.PRNGKey(t))
            losses.append(float(metrics["loss"]))
            lrs.append(float(metrics["lr"]))
    finally:
        mp.undo()
    return params, state, losses, lrs, schedule


def _run_torch(init_flax_params, schedule, accum: int = 1,
               n_steps: int = N_STEPS):
    sd = to_torch_state_dict(init_flax_params)
    p = {k: torch.tensor(np.asarray(v), requires_grad=True)
         for k, v in sd.items()}
    ema = {k: v.detach().clone() for k, v in p.items()}

    decay = [v for v in p.values() if v.ndim > 1]
    no_decay = [v for v in p.values() if v.ndim <= 1]
    opt = torch.optim.AdamW(
        [
            {"params": decay, "weight_decay": _Args.weight_decay},
            {"params": no_decay, "weight_decay": 0.0},
        ],
        lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
    )

    losses, lrs = [], []
    opt.zero_grad()
    for t in range(n_steps):
        d = _step_draws(t)
        with torch.no_grad():
            p["prototypes.weight"].data = F.normalize(
                p["prototypes.weight"].data, p=2, dim=1
            )
        update_idx = t // accum
        lr_t = float(schedule(jnp.asarray(update_idx, jnp.int32)))
        for g in opt.param_groups:
            g["lr"] = lr_t
        lrs.append(lr_t)

        out = oracle.mirror_forward(
            p,
            torch.tensor(d["wsi"]), torch.tensor(d["rna"]),
            torch.tensor(d["wsi_noise"]), torch.tensor(d["rna_noise"]),
            torch.tensor(d["wsi_eps"]), torch.tensor(d["rna_eps"]),
            embed_dim=E, wsi_mask_ratio=WSI_RATIO, rna_mask_ratio=RNA_RATIO,
        )
        total = oracle.mirror_loss(
            out, alignment_w=WEIGHTS.alignment,
            wsi_retention_w=WEIGHTS.wsi_retention,
            rna_retention_w=WEIGHTS.rna_retention,
            style_w=WEIGHTS.style, cluster_w=WEIGHTS.cluster,
        )[0]
        losses.append(float(total.detach()))

        # reference accumulation (train_mirror.py:1126-1284): loss/accum
        # backward each micro-batch, clip+step+EMA only at need_update;
        # logit clamp runs every micro-batch (idempotent mid-accum)
        (total / accum).backward()
        need_update = (t + 1) % accum == 0
        if need_update:
            torch.nn.utils.clip_grad_norm_(list(p.values()), _Args.clip_grad)
            opt.step()
            opt.zero_grad()
        with torch.no_grad():
            p["logit_scale"].clamp_(0.0, LOG100)
            if need_update:
                # timm ModelEmaV3 warmup ramp (ref train_mirror.py:787-799):
                # n_updates = update_idx+1, step = n_updates-1; step<=0 copies
                step_f = float(update_idx)
                d_t = 0.0 if step_f <= 0 else min(
                    1.0 - (1.0 + step_f) ** (-2.0 / 3.0), EMA_DECAY
                )
                for k in ema:
                    ema[k].mul_(d_t).add_(p[k].detach(), alpha=1.0 - d_t)
    return p, ema, losses, lrs


def _as_flax(torch_params):
    tree, unmapped = convert_state_dict(
        {k: v.detach().numpy() for k, v in torch_params.items()}
    )
    assert not unmapped, unmapped
    return tree


def _assert_tree_close(got_tree, want_tree, what, cos_min=0.9999):
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
        assert cos >= cos_min, f"{what} {k}: cosine {cos}"


@pytest.fixture(scope="module")
def trajectories():
    init_params, state, losses_j, lrs_j, schedule = _run_flax()
    p_t, ema_t, losses_t, lrs_t = _run_torch(init_params, schedule)
    return dict(
        state=state, p_t=p_t, ema_t=ema_t,
        losses_j=losses_j, losses_t=losses_t, lrs_j=lrs_j, lrs_t=lrs_t,
    )


def test_lr_sequence_identical(trajectories):
    # 1e-5: the applied lr is schedule() evaluated inside jit (fused fp32)
    # vs on host — same formula, ~2e-6 round-off
    np.testing.assert_allclose(
        trajectories["lrs_j"], trajectories["lrs_t"], rtol=1e-5
    )
    # the sequence must actually vary (warmup then cosine) or this test
    # proves nothing about schedule counting
    assert len(set(np.round(trajectories["lrs_t"], 10))) >= 5


def test_per_step_loss_trajectory(trajectories):
    for t, (a, b) in enumerate(
        zip(trajectories["losses_j"], trajectories["losses_t"])
    ):
        assert a == pytest.approx(b, rel=1e-5), f"step {t}: {a} vs {b}"
    # and training actually moved the loss (guards against a frozen state)
    assert trajectories["losses_t"][-1] != pytest.approx(
        trajectories["losses_t"][0], rel=1e-3
    )


def test_final_params_match(trajectories):
    _assert_tree_close(
        trajectories["state"].params, _as_flax(trajectories["p_t"]), "param"
    )


def test_final_ema_match(trajectories):
    _assert_tree_close(
        trajectories["state"].ema_params, _as_flax(trajectories["ema_t"]),
        "ema",
    )


def test_final_logit_scale(trajectories):
    a = float(trajectories["state"].params["logit_scale"])
    b = float(trajectories["p_t"]["logit_scale"].detach())
    assert a == pytest.approx(b, rel=1e-5, abs=1e-7)


# ---------------------------------------------------------------------------
# gradient accumulation (optax.MultiSteps vs the reference's accumulate loop)
# ---------------------------------------------------------------------------

N_MICRO = 12  # 6 real updates at accum=2


@pytest.fixture(scope="module")
def accum_trajectories():
    init_params, state, losses_j, lrs_j, schedule = _run_flax(
        accum=2, n_steps=N_MICRO
    )
    p_t, ema_t, losses_t, lrs_t = _run_torch(
        init_params, schedule, accum=2, n_steps=N_MICRO
    )
    return dict(state=state, p_t=p_t, ema_t=ema_t, losses_j=losses_j,
                losses_t=losses_t, lrs_j=lrs_j, lrs_t=lrs_t)


def test_accum_per_microstep_loss(accum_trajectories):
    for t, (a, b) in enumerate(zip(
        accum_trajectories["losses_j"], accum_trajectories["losses_t"]
    )):
        assert a == pytest.approx(b, rel=2e-5), f"micro-step {t}: {a} vs {b}"


def test_accum_lr_counts_real_updates(accum_trajectories):
    """The schedule must advance once per REAL update, not per micro-step:
    micro-step pairs share an lr, and the applied-lr metric agrees with
    torch's schedule(update_idx)."""
    lrs_j = accum_trajectories["lrs_j"]
    lrs_t = accum_trajectories["lrs_t"]
    np.testing.assert_allclose(lrs_j, lrs_t, rtol=1e-5)
    for u in range(N_MICRO // 2):
        assert lrs_t[2 * u] == lrs_t[2 * u + 1], u
    assert len(set(np.round(lrs_t, 12))) >= 4  # warmup+cosine actually move


def test_accum_final_params_and_ema(accum_trajectories):
    _assert_tree_close(
        accum_trajectories["state"].params,
        _as_flax(accum_trajectories["p_t"]), "param",
    )
    _assert_tree_close(
        accum_trajectories["state"].ema_params,
        _as_flax(accum_trajectories["ema_t"]), "ema",
    )
