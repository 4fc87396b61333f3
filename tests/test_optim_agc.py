"""Torch-golden parity for --clip-mode agc (timm adaptive gradient clipping).

The reference dispatches ``--clip-grad X --clip-mode agc`` through timm's
``dispatch_clip_grad(model_parameters(model, exclude_head=True), X, "agc")``
(/root/reference/train_mirror.py:1223-1230), where exclude_head=True means
``list(model.parameters())[:-2]`` — the last two torch parameters in
registration order are never clipped. The oracle below transcribes timm's
``adaptive_clip_grad`` (timm/utils/agc.py: unitwise L2 over all-but-dim-0,
clamp eps 1e-3, rescale when g_norm >= clip_factor * p_norm); both the
math and the last-two exclusion are asserted against
``train/optim.adaptive_grad_clip`` leaf-for-leaf through the checkpoint
converter's torch<->flax layout map.
"""

import numpy as np
import optax
import torch

import jax
import jax.numpy as jnp

from flax.traverse_util import flatten_dict

from mirror_tpu.models.classifier import MIRRORClassifier
from mirror_tpu.models.mirror import MIRROR
from mirror_tpu.tools.import_torch_checkpoint import (
    convert_state_dict,
    to_torch_state_dict,
)
from mirror_tpu.train.optim import adaptive_grad_clip, make_optimizer


def _torch_unitwise_norm(x: torch.Tensor) -> torch.Tensor:
    """timm.utils.agc unitwise_norm: whole-tensor for ndim<=1, else L2 over
    every dim except 0, keepdim."""
    if x.ndim <= 1:
        return x.norm(2.0)
    return x.norm(2.0, dim=tuple(range(1, x.ndim)), keepdim=True)


def _timm_agc(params, grads, clip_factor, skip_keys, eps=1e-3):
    """timm.utils.agc.adaptive_clip_grad on a key->tensor map, skipping the
    exclude_head tail."""
    out = {}
    for k, g in grads.items():
        if k in skip_keys:
            out[k] = g.clone()
            continue
        p = params[k]
        p_norm = _torch_unitwise_norm(p).clamp_(min=eps)
        g_norm = _torch_unitwise_norm(g)
        max_norm = p_norm * clip_factor
        clipped = g * (max_norm / g_norm.clamp(min=1e-6))
        out[k] = torch.where(g_norm < max_norm, g, clipped)
    return out


def _rngs():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return {"params": ks[0], "dropout": ks[1], "masking": ks[2], "style": ks[3]}


def _fake_grads(params, seed=1):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    # large grads so many units actually trip the clip threshold
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.normal(scale=3.0, size=l.shape).astype(np.float32))
         for l in leaves],
    )


def _assert_matches_timm(params, grads, skip_keys, clip_factor=0.02):
    got, _ = adaptive_grad_clip(clip_factor).update(
        grads, optax.EmptyState(), params
    )
    pt = {k: torch.tensor(np.asarray(v))
          for k, v in to_torch_state_dict(params).items()}
    gt = {k: torch.tensor(np.asarray(v))
          for k, v in to_torch_state_dict(grads).items()}
    want_t = _timm_agc(pt, gt, clip_factor, skip_keys)
    want, unmapped = convert_state_dict(
        {k: v.numpy() for k, v in want_t.items()}
    )
    assert not unmapped, unmapped
    flat_got = flatten_dict(got)
    flat_want = flatten_dict(want)
    assert set(flat_got) == set(flat_want)
    n_clipped = 0
    for k in flat_got:
        g0 = np.asarray(flatten_dict(grads)[k])
        a, b = np.asarray(flat_got[k]), np.asarray(flat_want[k])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg="/".join(k))
        if not np.allclose(a, g0):
            n_clipped += 1
    assert n_clipped > 5, "test vacuous: nothing tripped the clip threshold"
    return flat_got


def test_agc_matches_timm_on_mirror():
    model = MIRROR(
        wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
        rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
        style_mlp_out_dim=16, style_latent_dim=8,
    )
    wsi = jnp.zeros((2, 16, 32))
    rna = jnp.zeros((2, 96))
    params = model.init(_rngs(), wsi, rna, 0.75, 0.75, True)["params"]
    grads = _fake_grads(params)
    # reference registration order ends ... style_decoder, prototypes
    # (models/mirror.py:789-828) -> parameters()[:-2] drops these two:
    skip = {"style_decoder.bias", "prototypes.weight"}
    flat = _assert_matches_timm(params, grads, skip)
    # and the excluded leaves really pass through unclipped
    for path in (("style_decoder", "bias"), ("prototypes", "kernel")):
        np.testing.assert_array_equal(
            np.asarray(flat[path]), np.asarray(flatten_dict(grads)[path])
        )


def test_agc_matches_timm_on_classifier_head_excluded():
    model = MIRRORClassifier(
        wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, num_classes=4,
        fusion="concat", rna_mlp_ratio=2.0,
    )
    wsi = jnp.zeros((2, 16, 32))
    rna = jnp.zeros((2, 96))
    params = model.init(_rngs(), wsi, rna)["params"]
    grads = _fake_grads(params, seed=2)
    flat = _assert_matches_timm(params, grads, {"head.weight", "head.bias"})
    for path in (("head", "kernel"), ("head", "bias")):
        np.testing.assert_array_equal(
            np.asarray(flat[path]), np.asarray(flatten_dict(grads)[path])
        )


def test_clip_mode_agc_wires_through_make_optimizer():
    class _Args:
        opt = "adam"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.0
        clip_grad = 0.02
        clip_mode = "agc"
        opt_kwargs = {}
        use_sched = False
        sched = "cosine"
        sched_on_updates = False
        warmup_lr = 1e-6
        min_lr = 1e-8
        epochs = 2
        warmup_epochs = 0
        warmup_prefix = False
        decay_epochs = 90
        decay_rate = 0.1
        decay_milestones = (90,)
        grad_accum_steps = 1

    tx = make_optimizer(_Args, schedule=lambda step: 1e-3)
    params = {"dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros((8,))}}
    state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 5.0), params)
    updates, _ = tx.update(grads, state, params)
    for leaf in jax.tree_util.tree_leaves(updates):
        assert np.isfinite(np.asarray(leaf)).all()
    # units with |g|=5*sqrt(4) over |p|=2 rows must have been rescaled far
    # below the raw gradient by clip_factor=0.02
    assert float(jnp.abs(updates["dense"]["kernel"]).max()) < 1e-3
