"""Model tests: shapes, masking invariants, attention-quirk parity vs naive
numpy, Nystrom pinv accuracy, conv semantics vs torch (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirror_tpu.models import (
    MIRROR,
    NystromAttention,
    moore_penrose_pinv,
)
from mirror_tpu.models.layers import RnaAttention
from mirror_tpu.models.transmil import random_token_masking
from mirror_tpu.registry import create_model

TINY = dict(
    wsi_embed_dim=32,
    rna_embed_dim=64,
    embed_dim=48,
    wsi_num_tokens=16,
    rna_mlp_ratio=2.0,
    num_prototypes=20,
    style_mlp_hidden_dim=24,
    style_mlp_out_dim=16,
    style_latent_dim=8,
)


def _rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return dict(zip(["params", "dropout", "masking", "style"], jax.random.split(k, 4)))


def test_mirror_forward_shapes():
    model = create_model("mirror", **TINY)
    b, t = 3, 16
    wsi = jnp.ones((b, t, 32))
    rna = jnp.ones((b, 64))
    rngs = _rngs()
    params = model.init(rngs, wsi, rna, 0.75, 0.75, False)
    out = model.apply(params, wsi, rna, 0.75, 0.75, False, rngs=rngs)
    assert out.wsi_alignment_emb.shape == (b, 48)
    assert out.wsi_retention_emb.shape == (b, t, 48)
    assert out.wsi_retention_target.shape == (b, t, 48)
    assert out.wsi_mask.shape == (b, t)
    assert out.wsi_score.shape == (b, 20)
    assert out.wsi_mu.shape == (b, 8)
    assert out.rna_alignment_emb.shape == (b, 48)
    assert out.rna_retention_emb.shape == (b, 48)
    assert out.rna_mask.shape == (b, 48)
    assert out.logit_scale.shape == ()
    assert float(out.logit_scale) == pytest.approx(1 / 0.07, rel=1e-5)
    for leaf in out:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_masking_ratio_invariant():
    for ratio in (0.25, 0.5, 0.75):
        mask = random_token_masking(jax.random.PRNGKey(1), 4, 64, ratio)
        expected = 64 - int(64 * (1 - ratio))
        assert np.all(np.asarray(mask.sum(axis=1)) == expected)
        # binary
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_masking_is_random_across_keys():
    m1 = random_token_masking(jax.random.PRNGKey(1), 2, 64, 0.5)
    m2 = random_token_masking(jax.random.PRNGKey(2), 2, 64, 0.5)
    assert not np.array_equal(np.asarray(m1), np.asarray(m2))


def test_rna_attention_quirk_matches_naive():
    """The heads-as-sequence attention + transposed merge must match a naive
    numpy re-derivation of the reference algorithm (models/mirror.py:77-99)."""
    d, heads = 24, 4
    head_dim = d // heads
    mod = RnaAttention(num_heads=heads, qkv_bias=True)
    x = jnp.array(np.random.default_rng(0).normal(size=(2, d)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(params, x))

    kernel = np.asarray(params["params"]["qkv"]["kernel"])  # (d, 3d)
    bias = np.asarray(params["params"]["qkv"]["bias"])
    proj_k = np.asarray(params["params"]["proj"]["kernel"])
    proj_b = np.asarray(params["params"]["proj"]["bias"])
    xn = np.asarray(x)
    qkv = xn @ kernel + bias  # (B, 3d)
    qkv = qkv.reshape(2, 3, heads, head_dim)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    scale = head_dim**-0.5
    attn = np.einsum("bhd,bgd->bhg", q * scale, k)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    out = np.einsum("bhg,bgd->bhd", attn, v)
    out = out.transpose(0, 2, 1).reshape(2, d)  # the quirky merge
    want = out @ proj_k + proj_b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moore_penrose_pinv_converges():
    # softmax matrices like attn2 are well-conditioned; 6 iterations should
    # closely match the true pseudo-inverse.
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    sm = np.exp(x - x.max(-1, keepdims=True))
    sm /= sm.sum(-1, keepdims=True)
    # at the reference's 6 iterations, the defining property A @ z @ A ~= A
    # already holds even though z hasn't converged to the exact pinv yet
    approx6 = np.asarray(moore_penrose_pinv(jnp.array(sm), 6))
    np.testing.assert_allclose(sm @ approx6 @ sm, sm, atol=2e-2)
    # with more iterations it converges to the true pseudo-inverse
    approx24 = np.asarray(moore_penrose_pinv(jnp.array(sm), 24))
    true = np.linalg.pinv(sm)
    assert np.abs(approx24 - true).max() < 1e-3


def test_nystrom_res_conv_matches_torch():
    """The depthwise value-conv residual must match torch Conv2d(groups=heads,
    kernel (K,1), no bias) semantics."""
    import torch
    import torch.nn as tnn

    heads, n, dh, K = 3, 10, 5, 7
    v = np.random.default_rng(4).normal(size=(2, heads, n, dh)).astype(np.float32)
    kernel = np.random.default_rng(5).normal(size=(heads, 1, K, 1)).astype(np.float32)

    conv = tnn.Conv2d(heads, heads, (K, 1), padding=(K // 2, 0), groups=heads, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel))
    with torch.no_grad():
        want = conv(torch.from_numpy(v)).numpy()

    got = jax.lax.conv_general_dilated(
        jnp.array(v), jnp.array(kernel),
        window_strides=(1, 1), padding=((K // 2, K // 2), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=heads,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_nystrom_attention_shapes_and_padding():
    # n=37 with m=16 landmarks -> front-pad to 48, trim back to 37.
    mod = NystromAttention(dim=32, dim_head=4, heads=8, num_landmarks=16)
    x = jnp.array(np.random.default_rng(6).normal(size=(2, 37, 32)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 37, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_classifier_shapes_and_fusions():
    for fusion, with_rna in (("concat", True), ("add", True), ("add", False)):
        model = create_model(
            "mirror_classifier",
            wsi_embed_dim=32, rna_embed_dim=64, embed_dim=48,
            num_classes=4, rna_mlp_ratio=2.0, fusion=fusion,
        )
        wsi = jnp.ones((2, 16, 32))
        rna = jnp.ones((2, 64)) if with_rna else None
        rngs = _rngs()
        params = model.init(rngs, wsi, rna, False)
        out = model.apply(params, wsi, rna, False, rngs=rngs)
        assert out.shape == (2, 4)


def test_registry_filters_unknown_kwargs(caplog):
    model = create_model("mirror", **TINY, bogus_kwarg=1, rna_norm_layer="layernorm")
    assert isinstance(model, MIRROR)
    assert model.rna_norm_eps == 1e-5


def test_prototypes_orthogonal_init():
    model = create_model("mirror", **TINY)
    wsi = jnp.ones((2, 16, 32))
    rna = jnp.ones((2, 64))
    params = model.init(_rngs(), wsi, rna, 0.75, 0.75, False)
    k = np.asarray(params["params"]["prototypes"]["kernel"])  # (48, 20): D < P here
    # torch orthogonal on (P, D) with P < D... here P=20 < D=48 so rows of the
    # torch weight (cols of flax kernel) can't all be orthonormal; instead
    # K^T K should be I_P when P <= D.
    np.testing.assert_allclose(k.T @ k, np.eye(20), atol=1e-4)


def test_mirror_train_vs_eval_dropout():
    model = create_model("mirror", **TINY)
    wsi = jnp.array(np.random.default_rng(7).normal(size=(2, 16, 32)), jnp.float32)
    rna = jnp.array(np.random.default_rng(8).normal(size=(2, 64)), jnp.float32)
    rngs = _rngs()
    params = model.init(rngs, wsi, rna, 0.75, 0.75, False)
    # deterministic=True (eval): same rngs -> identical outputs
    o1 = model.apply(params, wsi, rna, 0.75, 0.75, True, rngs=_rngs(1))
    o2 = model.apply(params, wsi, rna, 0.75, 0.75, True, rngs=_rngs(1))
    np.testing.assert_allclose(
        np.asarray(o1.wsi_alignment_emb), np.asarray(o2.wsi_alignment_emb)
    )
    # different masking rng -> different retention output
    o3 = model.apply(params, wsi, rna, 0.75, 0.75, True, rngs=_rngs(2))
    assert not np.allclose(np.asarray(o1.wsi_mask), np.asarray(o3.wsi_mask))


def test_trunc_normal_init_matches_timm_statistics():
    """timm trunc_normal_(std=0.02) cuts at ABSOLUTE +-2.0 (+-100 sigma —
    effectively untruncated), not +-2 sigma: the init must keep std 0.020
    and tails past 0.04 (jax's sigma-unit truncated_normal gives std 0.0176
    and a hard 0.04 cut — a 12% smaller init scale than the reference)."""
    import jax

    from mirror_tpu.models.layers import trunc_normal_init

    x = np.asarray(
        trunc_normal_init(0.02)(jax.random.PRNGKey(0), (400, 768))
    )
    assert x.std() == pytest.approx(0.02, rel=0.02)
    assert np.abs(x).max() > 0.05  # tails exist
    assert np.abs(x).max() <= 2.0  # the absolute timm cutoff
