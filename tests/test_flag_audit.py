"""Reference CLI replay audit + --layer-decay semantics.

1. Every ``--flag`` literal the reference's four training scripts define must
   parse through our ``config.parse_args`` — full command lines carry over
   unchanged (MIGRATION.md's contract). The literals are extracted from the
   reference sources themselves so new reference flags fail this test
   instead of silently rotting.
2. ``--layer-decay`` follows timm's ``param_groups_layer_decay`` grouping
   rule: inert (all scales 1.0) for models with no head prefix — which is
   every MIRROR-family model, a reference quirk documented in
   ``scale_by_layer_decay`` — and real per-depth-group scaling when a head
   prefix exists.
"""

import argparse
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_tpu import config as config_mod
from mirror_tpu.train.optim import (
    _timm_layer_map,
    make_optimizer,
    make_schedule,
    scale_by_layer_decay,
)

REF_SCRIPTS = {
    "pretrain": [
        "/root/reference/train_mirror.py",
        "/root/reference/train_pretrain.py",
    ],
    "subtyping": ["/root/reference/train_subtyping.py"],
    "survival": ["/root/reference/train_survival.py"],
}

_ADD_ARG = re.compile(r'add_argument\(\s*((?:"--?[^"]+"\s*,\s*)*"--?[^"]+")')


def _reference_literals(files):
    out = []
    for f in files:
        with open(f) as fh:
            src = fh.read()
        for m in _ADD_ARG.finditer(src):
            for opt in re.findall(r'"(--[^"]+)"', m.group(1)):
                if opt not in out:
                    out.append(opt)
    return out


def _synth_value(action) -> str:
    if action.choices:
        return str(list(action.choices)[0])
    if action.type is int:
        return "1"
    if action.type is float:
        return "0.5"
    if isinstance(action, config_mod.ParseKwargs):
        return "eps=1e-8"
    return "x"


def _synth_argv(parser, literals, config_yaml):
    argv = []
    for lit in literals:
        if lit == "--config":
            argv += [lit, config_yaml]
            continue
        action = parser._option_string_actions.get(lit)
        assert action is not None, f"reference flag {lit} is not accepted"
        if isinstance(
            action, (argparse._StoreTrueAction, argparse._StoreFalseAction)
        ) or action.nargs == 0:
            argv.append(lit)
        elif action.nargs == "?":
            argv.append(lit)
        elif action.nargs in ("+", "*") or isinstance(action.nargs, int):
            n = action.nargs if isinstance(action.nargs, int) else 1
            argv += [lit] + [_synth_value(action)] * n
        else:
            argv += [lit, _synth_value(action)]
    return argv


@pytest.mark.parametrize("task", sorted(REF_SCRIPTS))
def test_every_reference_flag_parses(task, tmp_path):
    literals = _reference_literals(REF_SCRIPTS[task])
    assert len(literals) > 60, "extraction regex broke"
    cfg = tmp_path / "empty.yaml"
    cfg.write_text("{}\n")
    parser = config_mod.build_parser(task)
    argv = _synth_argv(parser, literals, str(cfg))
    args, _ = config_mod.parse_args(task, argv)
    # the two literals the round-3 audit missed map onto the right dests
    if task in ("subtyping", "survival"):
        assert args.linear_probe is True  # --linear_probe alias
    assert args.decay_rate == 0.5  # --dr alias


def test_dr_alias_sets_decay_rate():
    args, _ = config_mod.parse_args("pretrain", ["--dr", "0.25"])
    assert args.decay_rate == 0.25


# ---------------------------------------------------------------------------
# --layer-decay
# ---------------------------------------------------------------------------

class _Args:
    opt = "adamw"
    opt_eps = None
    opt_betas = None
    momentum = 0.9
    weight_decay = 0.05
    clip_grad = None
    clip_mode = "norm"
    opt_kwargs = {}
    use_sched = False
    sched = "cosine"
    lr = 1e-3
    epochs = 3
    grad_accum_steps = 1
    layer_decay = None


def _tree():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {
        "wsi_encoder": {
            "fc1": {"kernel": jax.random.normal(ks[0], (4, 3)),
                    "bias": jax.random.normal(ks[1], (3,))},
        },
        "logit_scale": jax.random.normal(ks[2], ()),
        "prototypes": {"kernel": jax.random.normal(ks[3], (3, 5))},
    }


def test_layer_decay_inert_without_head_prefix():
    """timm _layer_map with no pretrained_cfg classifier puts every param in
    the head group (scale 1.0) — --layer-decay must not change any update
    on MIRROR-family trees, exactly like the reference's timm path."""
    params = _tree()
    grads = jax.tree.map(lambda p: p + 1.0, params)
    sched = make_schedule(_Args, 10, _Args.lr)

    a_on = type("A", (_Args,), {"layer_decay": 0.65})
    tx_off = make_optimizer(_Args, sched)
    tx_on = make_optimizer(a_on, sched)
    u_off, _ = tx_off.update(grads, tx_off.init(params), params)
    u_on, _ = tx_on.update(grads, tx_on.init(params), params)
    for a, b in zip(jax.tree.leaves(u_off), jax.tree.leaves(u_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timm_layer_map_groups():
    """Golden transcription check of timm's grouping rule
    (timm/optim/_param_groups.py::_layer_map): trunk params chunked in order,
    head params in the final group."""
    names = [f"blocks.{i}.w" for i in range(5)] + ["head.w", "head.b"]
    lm = _timm_layer_map(names, head_prefixes=("head",), layers_per_group=2)
    # 5 trunk names in chunks of 2 -> groups [0,0],[1,1],[2]; head -> 3
    assert lm == {
        "blocks.0.w": 0, "blocks.1.w": 0,
        "blocks.2.w": 1, "blocks.3.w": 1,
        "blocks.4.w": 2,
        "head.w": 3, "head.b": 3,
    }
    # no head prefix: everything is head (single group)
    assert set(_timm_layer_map(names).values()) == {0}


def test_layer_decay_scales_with_head_prefix():
    """lr_scale = layer_decay ** (num_layers - 1 - group), head = 1.0
    (timm param_groups_layer_decay's `layer_scales` rule)."""
    ld = 0.5
    updates = {
        "head": {"w": jnp.ones((2,))},
        **{f"l{i:02d}": jnp.ones((2,)) for i in range(6)},
    }
    tx = scale_by_layer_decay(ld, head_prefixes=("head",), layers_per_group=2)
    scaled, _ = tx.update(updates, tx.init(updates))
    # jax dict flatten is key-sorted: head.w first, then l00..l05; trunk
    # l00..l05 -> groups 0,0,1,1,2,2; head group 3; num_layers 4
    expect = {"head": 1.0, "l00": ld**3, "l01": ld**3, "l02": ld**2,
              "l03": ld**2, "l04": ld**1, "l05": ld**1}
    assert float(scaled["head"]["w"][0]) == pytest.approx(expect["head"])
    for i in range(6):
        key = f"l{i:02d}"
        assert float(scaled[key][0]) == pytest.approx(expect[key]), key
