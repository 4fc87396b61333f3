"""Golden tests for the loss functions against independent naive-numpy
implementations (slow loops, no shared code with the package)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirror_tpu.losses import (
    MirrorLossWeights,
    ce_surv_loss,
    clip_loss,
    info_nce,
    mirror_loss,
    nll_surv_loss,
)


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_xent(logits, labels):
    logits = logits.astype(np.float64)
    m = logits.max(axis=-1, keepdims=True)
    lse = m[:, 0] + np.log(np.exp(logits - m).sum(axis=-1))
    return float(np.mean([lse[i] - logits[i, labels[i]] for i in range(len(labels))]))


def test_clip_loss_matches_naive():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(6, 16)).astype(np.float32)
    r = rng.normal(size=(6, 16)).astype(np.float32)
    scale = 13.7
    got = float(clip_loss(jnp.array(w), jnp.array(r), jnp.float32(scale)))
    labels = np.arange(6)
    want = 0.5 * (np_xent(scale * w @ r.T, labels) + np_xent(scale * r @ w.T, labels))
    assert got == pytest.approx(want, rel=1e-5)


def test_clip_loss_perfect_alignment_low():
    # Identical, well-separated embeddings -> near-zero loss at high scale.
    e = np.eye(8, 16).astype(np.float32)
    loss = float(clip_loss(jnp.array(e), jnp.array(e), jnp.float32(100.0)))
    assert loss < 1e-4


def test_nll_surv_matches_naive():
    rng = np.random.default_rng(1)
    n, m = 10, 4
    logits = rng.normal(size=(n, m)).astype(np.float32)
    times = rng.integers(0, m, size=n)
    cens = rng.integers(0, 2, size=n)
    alpha = 0.3
    got = float(
        nll_surv_loss(jnp.array(logits), jnp.array(times), jnp.array(cens), alpha=alpha)
    )
    # naive per-sample computation
    h = 1.0 / (1.0 + np.exp(-logits))
    h = np.clip(h, 1e-7, 1 - 1e-7)
    losses = []
    for i in range(n):
        t = times[i]
        if cens[i] == 1:  # event at t: survive < t, fail at t
            nll = -(np.sum(np.log(1 - h[i, :t])) + np.log(h[i, t]))
            losses.append((1 - alpha) * nll + alpha * nll)
        else:  # censored: survive through t
            nll = -np.sum(np.log(1 - h[i, : t + 1]))
            losses.append((1 - alpha) * nll)
    assert got == pytest.approx(float(np.mean(losses)), rel=1e-5)


def test_ce_surv_matches_naive():
    rng = np.random.default_rng(2)
    n, m = 8, 5
    logits = rng.normal(size=(n, m)).astype(np.float32)
    times = rng.integers(0, m, size=n)
    cens = rng.integers(0, 2, size=n)
    got = float(ce_surv_loss(jnp.array(logits), jnp.array(times), jnp.array(cens)))
    h = np.clip(1.0 / (1.0 + np.exp(-logits)), 1e-7, 1 - 1e-7)
    losses = []
    for i in range(n):
        probs = []
        surv = 1.0
        for t in range(m):
            probs.append(h[i, t] * surv)
            surv *= 1 - h[i, t]
        probs.append(surv)
        probs = np.array(probs)
        probs = probs / probs.sum()
        target = times[i] if cens[i] == 1 else m
        losses.append(-np.log(max(probs[target], 1e-7)))
    assert got == pytest.approx(float(np.mean(losses)), rel=1e-5)


def test_info_nce_in_batch():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    p = rng.normal(size=(5, 8)).astype(np.float32)
    got = float(info_nce(jnp.array(q), jnp.array(p), temperature=0.1))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    want = np_xent(qn @ pn.T / 0.1, np.arange(5))
    assert got == pytest.approx(want, rel=1e-5)
    # symmetric mode averages both directions
    got_sym = float(info_nce(jnp.array(q), jnp.array(p), temperature=0.1, symmetric=True))
    want_sym = 0.5 * want + 0.5 * np_xent(pn @ qn.T / 0.1, np.arange(5))
    assert got_sym == pytest.approx(want_sym, rel=1e-5)


def test_info_nce_unpaired_and_paired():
    rng = np.random.default_rng(4)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    neg_u = rng.normal(size=(7, 8)).astype(np.float32)
    neg_p = rng.normal(size=(4, 7, 8)).astype(np.float32)
    got_u = float(info_nce(jnp.array(q), jnp.array(p), jnp.array(neg_u)))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    nn = neg_u / np.linalg.norm(neg_u, axis=1, keepdims=True)
    logits = np.concatenate([np.sum(qn * pn, axis=1, keepdims=True), qn @ nn.T], axis=1)
    want_u = np_xent(logits / 0.1, np.zeros(4, dtype=int))
    assert got_u == pytest.approx(want_u, rel=1e-5)

    got_p = float(
        info_nce(jnp.array(q), jnp.array(p), jnp.array(neg_p), negative_mode="paired")
    )
    npn = neg_p / np.linalg.norm(neg_p, axis=2, keepdims=True)
    neg_logits = np.einsum("nd,nmd->nm", qn, npn)
    logits = np.concatenate(
        [np.sum(qn * pn, axis=1, keepdims=True), neg_logits], axis=1
    )
    want_p = np_xent(logits / 0.1, np.zeros(4, dtype=int))
    assert got_p == pytest.approx(want_p, rel=1e-5)


def _random_mirror_inputs(rng, b=4, t=9, d=16, r=12, latent=5, protos=11):
    return dict(
        wsi_alignment_emb=rng.normal(size=(b, d)).astype(np.float32),
        wsi_retention_emb=rng.normal(size=(b, t, d)).astype(np.float32),
        wsi_retention_target=rng.normal(size=(b, t, d)).astype(np.float32),
        wsi_mask=(rng.random(size=(b, t)) > 0.3).astype(np.float32),
        wsi_score=rng.normal(size=(b, protos)).astype(np.float32),
        wsi_mu=rng.normal(size=(b, latent)).astype(np.float32),
        wsi_logstd=rng.normal(size=(b, latent)).astype(np.float32),
        rna_alignment_emb=rng.normal(size=(b, d)).astype(np.float32),
        rna_retention_emb=rng.normal(size=(b, r)).astype(np.float32),
        rna_retention_target=rng.normal(size=(b, r)).astype(np.float32),
        rna_mask=(rng.random(size=(b, r)) > 0.3).astype(np.float32),
        rna_score=rng.normal(size=(b, protos)).astype(np.float32),
        rna_mu=rng.normal(size=(b, latent)).astype(np.float32),
        rna_logstd=rng.normal(size=(b, latent)).astype(np.float32),
        logit_scale=np.float32(np.exp(np.log(1 / 0.07))),
    )


def test_mirror_loss_terms_match_naive():
    rng = np.random.default_rng(5)
    inp = _random_mirror_inputs(rng)
    weights = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    out = mirror_loss(**{k: jnp.array(v) for k, v in inp.items()}, weights=weights)
    total, align, wsi_ret, rna_ret, style, cluster = [float(x) for x in out]

    # naive terms
    labels = np.arange(4)
    s = float(inp["logit_scale"])
    want_align = 0.5 * (
        np_xent(s * inp["wsi_alignment_emb"] @ inp["rna_alignment_emb"].T, labels)
        + np_xent(s * inp["rna_alignment_emb"] @ inp["wsi_alignment_emb"].T, labels)
    )
    assert align == pytest.approx(want_align, rel=1e-5)

    d2 = ((inp["wsi_retention_emb"] - inp["wsi_retention_target"]) ** 2).mean(axis=-1)
    want_wsi = float((d2 * inp["wsi_mask"]).sum() / inp["wsi_mask"].sum())
    assert wsi_ret == pytest.approx(want_wsi, rel=1e-5)

    r2 = (inp["rna_retention_emb"] - inp["rna_retention_target"]) ** 2
    want_rna = float((r2 * inp["rna_mask"]).sum() / inp["rna_mask"].sum())
    assert rna_ret == pytest.approx(want_rna, rel=1e-5)

    def kl_term(mu, logstd):
        return float(
            np.mean(np.sum(np.exp(logstd) + mu**2 - 1.0 - logstd, axis=1))
        )

    want_style = 0.5 * (
        kl_term(inp["wsi_mu"], inp["wsi_logstd"])
        + kl_term(inp["rna_mu"], inp["rna_logstd"])
    )
    assert style == pytest.approx(want_style, rel=1e-5)

    wp = np_softmax(inp["wsi_score"])
    rp = np_softmax(inp["rna_score"])
    want_cluster = 0.5 * (
        float(np.sum(rp * (np.log(rp) - np.log(wp))) / 4)
        + float(np.sum(wp * (np.log(wp) - np.log(rp))) / 4)
    )
    assert cluster == pytest.approx(want_cluster, rel=1e-4)

    want_total = (
        0.5 * want_align
        + 0.15 * want_wsi
        + 0.15 * want_rna
        + 0.1 * want_style
        + 0.1 * want_cluster
    )
    assert total == pytest.approx(want_total, rel=1e-4)


def test_mirror_loss_is_differentiable():
    rng = np.random.default_rng(6)
    inp = {k: jnp.array(v) for k, v in _random_mirror_inputs(rng).items()}

    def f(w):
        out = mirror_loss(**{**inp, "wsi_alignment_emb": w})
        return out[0]

    g = jax.grad(f)(inp["wsi_alignment_emb"])
    assert np.all(np.isfinite(np.asarray(g)))


def test_valid_masked_losses_equal_unpadded_subset():
    """pad_last train tails: each loss with a valid mask over a padded batch
    must equal the loss of the unpadded prefix (the reference's small
    tail-batch semantics; --no-drop-last on >1 data shard pads + masks)."""
    from mirror_tpu.losses import ce_surv_loss
    from mirror_tpu.train.steps import smoothed_xent

    rng = np.random.default_rng(7)
    n, n_pad, m = 5, 3, 4
    logits = rng.normal(size=(n + n_pad, m)).astype(np.float32)
    labels = rng.integers(0, m, size=n + n_pad).astype(np.int32)
    cens = rng.integers(0, 2, size=n + n_pad).astype(np.float32)
    valid = np.concatenate([np.ones(n), np.zeros(n_pad)]).astype(np.float32)

    got = float(smoothed_xent(jnp.array(logits), jnp.array(labels), 0.1,
                              valid=jnp.array(valid)))
    want = float(smoothed_xent(jnp.array(logits[:n]), jnp.array(labels[:n]), 0.1))
    assert got == pytest.approx(want, rel=1e-6)

    got = float(nll_surv_loss(jnp.array(logits), jnp.array(labels),
                              jnp.array(cens), alpha=0.3,
                              valid=jnp.array(valid)))
    want = float(nll_surv_loss(jnp.array(logits[:n]), jnp.array(labels[:n]),
                               jnp.array(cens[:n]), alpha=0.3))
    assert got == pytest.approx(want, rel=1e-6)

    got = float(ce_surv_loss(jnp.array(logits), jnp.array(labels),
                             jnp.array(cens), valid=jnp.array(valid)))
    want = float(ce_surv_loss(jnp.array(logits[:n]), jnp.array(labels[:n]),
                              jnp.array(cens[:n])))
    assert got == pytest.approx(want, rel=1e-6)

    # padded rows contribute zero gradient
    g = jax.grad(lambda lg: nll_surv_loss(
        lg, jnp.array(labels), jnp.array(cens), alpha=0.3,
        valid=jnp.array(valid)))(jnp.array(logits))
    np.testing.assert_allclose(np.asarray(g)[n:], 0.0, atol=1e-8)
