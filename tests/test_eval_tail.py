"""Pad+mask eval tails (VERDICT round 1, weak #5): a padded batch with a
``valid`` mask must produce the EXACT unpadded loss — including the
contrastive term, whose negatives must not see padding — while sharding over
every chip of the mesh with a single compiled shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_tpu.losses import MirrorLossWeights, info_nce, mirror_loss
from mirror_tpu.registry import create_model

TINY = dict(
    wsi_embed_dim=32,
    rna_embed_dim=96,
    embed_dim=48,
    wsi_num_tokens=16,
    rna_mlp_ratio=2.0,
    num_prototypes=24,
    style_mlp_hidden_dim=24,
    style_mlp_out_dim=16,
    style_latent_dim=8,
)


def _rngs(seed):
    k = jax.random.PRNGKey(seed)
    return dict(zip(["params", "dropout", "masking", "style"], jax.random.split(k, 4)))


def _slice_valid(out, n_valid):
    """Restrict every per-sample output of the 15-tuple to the first n rows."""
    sliced = []
    for x in out:
        if hasattr(x, "ndim") and x.ndim >= 1:
            sliced.append(x[:n_valid])
        else:
            sliced.append(x)
    return tuple(sliced)


def test_mirror_loss_valid_mask_equals_unpadded():
    model = create_model("mirror", **TINY)
    rngs = _rngs(0)
    B, n_valid = 8, 5
    wsi = jax.random.normal(rngs["params"], (B, 16, 32))
    rna = jax.random.normal(rngs["dropout"], (B, 96))
    params = model.init(rngs, wsi, rna, 0.5, 0.5, True)["params"]
    out = model.apply({"params": params}, wsi, rna, 0.5, 0.5, True, rngs=_rngs(1))

    valid = jnp.asarray([1.0] * n_valid + [0.0] * (B - n_valid))
    weights = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    masked = mirror_loss(*out, weights=weights, valid=valid)
    unpadded = mirror_loss(*_slice_valid(out, n_valid), weights=weights)
    for name, m, u in zip(
        ["total", "align", "wsi_ret", "rna_ret", "style", "cluster"], masked, unpadded
    ):
        assert float(m) == pytest.approx(float(u), rel=1e-5), name


def test_mirror_loss_valid_all_ones_is_noop():
    model = create_model("mirror", **TINY)
    rngs = _rngs(0)
    wsi = jax.random.normal(rngs["params"], (6, 16, 32))
    rna = jax.random.normal(rngs["dropout"], (6, 96))
    params = model.init(rngs, wsi, rna, 0.5, 0.5, True)["params"]
    out = model.apply({"params": params}, wsi, rna, 0.5, 0.5, True, rngs=_rngs(1))
    a = mirror_loss(*out, valid=jnp.ones(6))
    b = mirror_loss(*out)
    assert float(a[0]) == pytest.approx(float(b[0]), rel=1e-6)


def test_info_nce_valid_mask_equals_unpadded():
    k = jax.random.PRNGKey(3)
    q = jax.random.normal(k, (8, 16))
    p = jax.random.normal(jax.random.fold_in(k, 1), (8, 16))
    valid = jnp.asarray([1.0] * 6 + [0.0] * 2)
    for symmetric in (False, True):
        masked = info_nce(q, p, symmetric=symmetric, valid=valid)
        unpadded = info_nce(q[:6], p[:6], symmetric=symmetric)
        assert float(masked) == pytest.approx(float(unpadded), rel=1e-5)


def test_pretrain_eval_tail_shards_over_mesh(tmp_path):
    """train_mirror eval with n_val not divisible by the 8-device count must
    run sharded (pad+mask) and produce a finite loss."""
    import yaml

    import train_mirror
    from mirror_tpu.data import make_synthetic_cohort

    # 4 folds over 13 patients -> val fold sizes not divisible by 8
    cohort = make_synthetic_cohort(
        str(tmp_path / "cohort"), n_patients=13, feature_dim=32, rna_dim=96,
        num_folds=4,
    )
    cfg = {
        "wsi_feature_dir": cohort["feature_dir"],
        "rna_feature_csv": cohort["rna_csv"],
        "split_dir": cohort["splits_dir"],
        "num_wsi_feature_tokens": 16,
        "batch_size": 8,
        "epochs": 1,
        "lr": 1e-4,
        "amp": False,
        "output": str(tmp_path / "runs"),
        "experiment": "tail",
        "model_kwargs": TINY,
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    results = train_mirror.main(["--config", str(cfg_path), "--fold-nb", "0"])
    assert results["best_metric"] is not None
    assert np.isfinite(results["best_metric"])


def test_model_forward_pad_coupling():
    """The loss-level valid masking is exact, but the MODEL forward couples
    batch rows through the reference's global-max pinv z0 scaling. With the
    loader's repeat-last-row padding this measures bit-equal; this test pins
    that the realistic padding keeps the eval loss within float noise of the
    unpadded value (the claim in train_mirror.py/steps.py)."""
    model = create_model("mirror", **TINY)
    rngs = _rngs(0)
    k = jax.random.PRNGKey(0)
    wsi = jax.random.normal(k, (5, 16, 32))
    rna = jax.random.normal(jax.random.fold_in(k, 1), (5, 96))
    params = model.init(rngs, wsi, rna, 0.75, 0.75, True)["params"]
    w = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    erngs = {k2: v for k2, v in _rngs(7).items() if k2 != "params"}

    out5 = model.apply({"params": params}, wsi, rna, 0.75, 0.75, True, rngs=erngs)
    l5 = float(mirror_loss(*out5, weights=w)[0])

    wsi8 = jnp.concatenate([wsi, jnp.repeat(wsi[-1:], 3, 0)])
    rna8 = jnp.concatenate([rna, jnp.repeat(rna[-1:], 3, 0)])
    valid = jnp.array([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    out8 = model.apply(
        {"params": params}, wsi8, rna8, 0.75, 0.75, True, rngs=erngs
    )
    l8 = float(mirror_loss(*out8, weights=w, valid=valid)[0])
    assert abs(l5 - l8) <= 1e-5 * abs(l5), (l5, l8)
