"""Full-model numerical parity: flax MIRROR vs the transcribed torch oracle.

The BASELINE north star ("±0.01 AUC vs PyTorch MIRROR") is unmeasurable here
(no data, reference deps not installed), so this is the attainable proxy:
fp32 forward parity on all 15 MIRROR outputs, all 6 MIRRORLoss terms, and
end-to-end gradient parity (cosine ≥ 0.9999 per parameter), on identical
weights exported through ``to_torch_state_dict`` with identical injected
masking noise and VAE reparameterization draws. Plus MIRRORClassifier logits
for both fusion modes and the WSI-only path.

Oracle: tests/oracle_torch.py (functional transcription of
/root/reference/models/mirror.py:720-915 and losses/mirror_loss.py:55-135).
This doubles as the round-trip test of to_torch_state_dict /
convert_state_dict on every parameter the model owns.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from flax.traverse_util import flatten_dict

from mirror_tpu.losses.mirror_loss import mirror_loss as jax_mirror_loss
from mirror_tpu.models import mirror as mirror_mod
from mirror_tpu.models import transmil as transmil_mod
from mirror_tpu.models.classifier import MIRRORClassifier
from mirror_tpu.tools.import_torch_checkpoint import (
    convert_state_dict,
    to_torch_state_dict,
)

import oracle_torch as oracle

# small but fully-representative dims: embed_dim divisible by 12 (RNA heads)
# and 8 (TransMIL heads); wsi token count non-square (exercises wrap-pad) and
# non-landmark-multiple (exercises the nystrom front pad, 37 % 12 == 1)
B = 3
WSI_IN, RNA_IN, E = 40, 100, 24
N_TOK = 30  # -> side 6, add_length 6, +cls = 37 rows into nystrom
STYLE_HID, STYLE_OUT, LATENT, PROTO = 32, 20, 16, 37
WSI_RATIO, RNA_RATIO = 0.75, 0.5

MODEL_KW = dict(
    wsi_embed_dim=WSI_IN, rna_embed_dim=RNA_IN, embed_dim=E,
    wsi_num_tokens=N_TOK, style_mlp_hidden_dim=STYLE_HID,
    style_mlp_out_dim=STYLE_OUT, style_latent_dim=LATENT,
    num_prototypes=PROTO,
)


def _rank_mask(noise: np.ndarray, mask_ratio: float) -> np.ndarray:
    """mask = 1 where the token's shuffle rank >= len_keep — the closed form
    of the reference's gather dance (the oracle executes the gathers, so this
    equivalence is asserted, not assumed)."""
    n = noise.shape[1]
    len_keep = int(n * (1 - mask_ratio))
    ranks = np.argsort(np.argsort(noise, axis=1), axis=1)
    return (ranks >= len_keep).astype(np.float32)


@pytest.fixture(scope="module")
def draws():
    rng = np.random.RandomState(7)
    return dict(
        wsi=rng.randn(B, N_TOK, WSI_IN).astype(np.float32),
        rna=rng.randn(B, RNA_IN).astype(np.float32),
        wsi_noise=rng.rand(B, N_TOK).astype(np.float32),
        rna_noise=rng.rand(B, E).astype(np.float32),
        wsi_eps=rng.randn(B, LATENT).astype(np.float32),
        rna_eps=rng.randn(B, LATENT).astype(np.float32),
    )


def _patch_stochastic(monkeypatch, d):
    """Pin the flax model's two stochastic draws to the injected tensors."""
    masks = {
        N_TOK: jnp.asarray(_rank_mask(d["wsi_noise"], WSI_RATIO)),
        E: jnp.asarray(_rank_mask(d["rna_noise"], RNA_RATIO)),
    }

    def fixed_masking(key, batch, num_tokens, mask_ratio):
        assert batch == B
        return masks[num_tokens]

    monkeypatch.setattr(transmil_mod, "random_token_masking", fixed_masking)

    eps_seq = [jnp.asarray(d["wsi_eps"]), jnp.asarray(d["rna_eps"])]
    calls = {"i": 0}

    def fixed_reparam(self, mu, logstd, rng):
        eps = eps_seq[calls["i"] % 2]
        calls["i"] += 1
        return mu + jnp.exp(0.5 * logstd) * eps.astype(mu.dtype)

    monkeypatch.setattr(mirror_mod.MIRROR, "reparameterize", fixed_reparam)


def _rngs():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {"params": ks[0], "dropout": ks[1], "masking": ks[2], "style": ks[3]}


def _torch_params(flax_params):
    sd = to_torch_state_dict(flax_params)
    return {k: torch.tensor(np.asarray(v), requires_grad=True) for k, v in sd.items()}


@pytest.fixture(scope="module")
def mirror_pair(draws):
    """(flax outputs, flax grads, torch outputs, torch grads-as-flax-tree)."""
    model = mirror_mod.MIRROR(**MODEL_KW)
    mp = pytest.MonkeyPatch()
    try:
        _patch_stochastic(mp, draws)
        rngs = _rngs()
        wsi_j, rna_j = jnp.asarray(draws["wsi"]), jnp.asarray(draws["rna"])
        variables = model.init(rngs, wsi_j, rna_j)
        params = variables["params"]

        apply_rngs = {k: rngs[k] for k in ("dropout", "masking", "style")}

        def forward(p):
            return model.apply(
                {"params": p}, wsi_j, rna_j,
                wsi_mask_ratio=WSI_RATIO, rna_mask_ratio=RNA_RATIO,
                deterministic=True, rngs=apply_rngs,
            )

        out_j = forward(params)
        grads_j = jax.grad(lambda p: jax_mirror_loss(*forward(p))[0])(params)
        losses_j = jax_mirror_loss(*out_j)
    finally:
        mp.undo()

    pt = _torch_params(params)
    out_t = oracle.mirror_forward(
        pt,
        torch.tensor(draws["wsi"]), torch.tensor(draws["rna"]),
        torch.tensor(draws["wsi_noise"]), torch.tensor(draws["rna_noise"]),
        torch.tensor(draws["wsi_eps"]), torch.tensor(draws["rna_eps"]),
        embed_dim=E, wsi_mask_ratio=WSI_RATIO, rna_mask_ratio=RNA_RATIO,
    )
    losses_t = oracle.mirror_loss(out_t)
    losses_t[0].backward()
    tgrads = {k: v.grad.detach().numpy() for k, v in pt.items()}
    grads_t, unmapped = convert_state_dict(tgrads)
    assert not unmapped, f"gradient keys failed to map back: {unmapped}"
    return dict(
        out_j=out_j, out_t=out_t, grads_j=grads_j, grads_t=grads_t,
        losses_j=losses_j, losses_t=losses_t,
    )


OUTPUT_NAMES = [
    "wsi_alignment_emb", "wsi_retention_emb", "wsi_retention_target",
    "wsi_mask", "wsi_score", "wsi_mu", "wsi_logstd",
    "rna_alignment_emb", "rna_retention_emb", "rna_retention_target",
    "rna_mask", "rna_score", "rna_mu", "rna_logstd", "logit_scale",
]


def test_forward_parity_all_15_outputs(mirror_pair):
    for name, a, b in zip(
        OUTPUT_NAMES, mirror_pair["out_j"], mirror_pair["out_t"]
    ):
        a = np.asarray(a, dtype=np.float64)
        b = b.detach().numpy().astype(np.float64)
        assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
        if name.endswith("mask"):
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            # ≤1e-5 relative to the output's scale (fp32 cross-framework)
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(
                a / scale, b / scale, rtol=0, atol=1e-5, err_msg=name
            )


LOSS_NAMES = ["total", "alignment", "wsi_retention", "rna_retention", "style", "cluster"]


def test_loss_parity_all_terms(mirror_pair):
    for name, a, b in zip(
        LOSS_NAMES, mirror_pair["losses_j"], mirror_pair["losses_t"]
    ):
        a = float(a)
        b = float(b.detach())
        assert a == pytest.approx(b, rel=2e-5, abs=1e-6), (
            f"{name}: flax {a} vs torch {b}"
        )


def test_gradient_parity(mirror_pair):
    flat_j = {
        "/".join(k): np.asarray(v, np.float64)
        for k, v in flatten_dict(mirror_pair["grads_j"]).items()
    }
    flat_t = {
        "/".join(k): np.asarray(v, np.float64)
        for k, v in flatten_dict(mirror_pair["grads_t"]).items()
    }
    assert set(flat_j) == set(flat_t), (
        set(flat_j) ^ set(flat_t)
    )
    all_j, all_t = [], []
    for k in sorted(flat_j):
        a, b = flat_j[k].ravel(), flat_t[k].ravel()
        assert a.shape == b.shape, k
        all_j.append(a)
        all_t.append(b)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(a @ b / (na * nb))
        assert cos >= 0.9999, f"{k}: gradient cosine {cos}"
        # norms agree too (cosine alone misses scale bugs)
        assert na == pytest.approx(nb, rel=1e-3), f"{k}: |g| {na} vs {nb}"
    a = np.concatenate(all_j)
    b = np.concatenate(all_t)
    overall = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert overall >= 0.99999, f"overall gradient cosine {overall}"


@pytest.mark.parametrize("fusion", ["add", "concat"])
def test_classifier_parity(draws, fusion):
    model = MIRRORClassifier(
        wsi_embed_dim=WSI_IN, rna_embed_dim=RNA_IN, embed_dim=E,
        num_classes=5, fusion=fusion,
    )
    rngs = _rngs()
    wsi_j, rna_j = jnp.asarray(draws["wsi"]), jnp.asarray(draws["rna"])
    variables = model.init(rngs, wsi_j, rna_j)
    logits_j = model.apply(variables, wsi_j, rna_j, deterministic=True)

    pt = _torch_params(variables["params"])
    logits_t = oracle.classifier_forward(
        pt, torch.tensor(draws["wsi"]), torch.tensor(draws["rna"]),
        embed_dim=E, fusion=fusion,
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), rtol=0, atol=2e-5
    )


def test_classifier_wsi_only_parity(draws):
    model = MIRRORClassifier(
        wsi_embed_dim=WSI_IN, rna_embed_dim=RNA_IN, embed_dim=E,
        num_classes=5, fusion="add",
    )
    rngs = _rngs()
    wsi_j = jnp.asarray(draws["wsi"])
    variables = model.init(rngs, wsi_j, jnp.asarray(draws["rna"]))
    logits_j = model.apply(variables, wsi_j, None, deterministic=True)

    pt = _torch_params(variables["params"])
    logits_t = oracle.classifier_forward(
        pt, torch.tensor(draws["wsi"]), None, embed_dim=E, fusion="add"
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), rtol=0, atol=2e-5
    )
