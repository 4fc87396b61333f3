"""ZeRO-1 optimizer-state sharding (``--optimizer-sharding``).

The reference replicates optimizer state per DDP rank like torch does; pure
data parallelism on a TPU slice replicates the fp32 Adam moments (2x param
bytes) on every chip the same way. ``shard_state(..., zero1=True)``
(parallel/tensor_parallel.py) shards optimizer + EMA state over the ``data``
mesh axis instead — ZeRO stage 1 expressed purely as GSPMD PartitionSpecs —
and the harness's train-step jit pins those shardings on the output state so
donation keeps the layout step over step (train/harness.py::_jit_train_step).

Pinned here on an 8-device CPU mesh:

- placement: moments/EMA leaves carry ``data``; params/scalars stay
  replicated (the Pallas kernels' shard_map needs whole weights),
- training equivalence: N pinned steps bit-match the replicated layout,
- the shardings survive the donated step (no silent re-replication),
- composition with tensor parallelism (``model`` + ``data`` on one leaf)
  and with the Pallas shard_map path,
- checkpoint host-gather of a sharded state.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mirror_tpu.losses import MirrorLossWeights
from mirror_tpu.ops._common import set_spmd_mesh
from mirror_tpu.parallel import create_mesh, shard_state
from mirror_tpu.registry import create_model
from mirror_tpu.train.harness import _jit_train_step
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
    use_sched = True
    sched = "cosine"
    sched_on_updates = True
    warmup_lr = 1e-6
    min_lr = 1e-8
    epochs = 2
    warmup_epochs = 1
    warmup_prefix = False
    decay_epochs = 90
    decay_rate = 0.1
    decay_milestones = (90,)
    grad_accum_steps = 1


def _tiny(**over):
    kw = dict(
        wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
        rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
        style_mlp_out_dim=16, style_latent_dim=8,
    )
    kw.update(over)
    return create_model("mirror", **kw)


def _init(model):
    rngs = dict(zip(
        ["params", "dropout", "masking", "style"],
        jax.random.split(jax.random.PRNGKey(0), 4),
    ))
    wsi = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32), jnp.float32)
    rna = jax.random.normal(jax.random.PRNGKey(2), (8, 96), jnp.float32)
    params = model.init(rngs, wsi, rna, 0.75, 0.75, True)["params"]
    return params, wsi, rna


def _setup(use_pallas=False):
    model = _tiny(use_pallas=use_pallas)
    params, wsi, rna = _init(model)
    schedule = make_schedule(_Args, steps_per_epoch=4, base_lr=1e-3)
    tx = make_optimizer(_Args, schedule)
    step = make_mirror_train_step(
        model, tx, WEIGHTS, ema_decay=0.9, schedule=schedule
    )
    state = create_train_state(params, tx, model_ema=True)
    return state, tx, step, {"wsi": wsi, "rna": rna}


def _leaf_specs(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path
        )
        out[name] = str(leaf.sharding.spec)
    return out


def _run(mesh, state, step, batch, n, zero1):
    placed = shard_state(mesh, state, zero1=zero1)
    dev_batch = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }
    jitted = _jit_train_step(step, placed, mesh)
    for i in range(n):
        placed, metrics = jitted(placed, dev_batch, jax.random.PRNGKey(7 + i))
    return placed, metrics


def test_zero1_placement():
    assert len(jax.devices()) >= 8
    mesh = create_mesh(num_devices=8)
    state, tx, step, batch = _setup()
    placed = shard_state(mesh, state, zero1=True)
    specs = _leaf_specs(placed)
    # moments + EMA shard over data; params and scalars stay replicated
    mu = [k for k in specs if "/mu/" in k and "fc1/kernel" in k]
    assert mu and all("data" in specs[k] for k in mu), {
        k: specs[k] for k in mu
    }
    ema = [k for k in specs if k.startswith("ema_params/")
           and k.endswith("fc1/kernel")]
    assert ema and all("data" in specs[k] for k in ema)
    assert all(
        "data" not in v for k, v in specs.items() if k.startswith("params/")
    )
    assert specs["step"] == str(P())
    counts = [k for k in specs if k.endswith("/count")]
    assert counts and all(specs[k] == str(P()) for k in counts)
    # leaves that cannot divide the 8-way data axis fall back to replicated
    # rather than erroring (e.g. the 0-d logit_scale moment)
    ls = [k for k in specs if "/mu/" in k and k.endswith("logit_scale")]
    assert ls and all("data" not in specs[k] for k in ls)


def test_zero1_training_matches_replicated():
    assert len(jax.devices()) >= 8
    mesh = create_mesh(num_devices=8)
    state, tx, step, batch = _setup()
    want, m_want = _run(mesh, state, step, batch, n=3, zero1=False)
    got, m_got = _run(mesh, state, step, batch, n=3, zero1=True)
    np.testing.assert_allclose(
        float(m_got["loss"]), float(m_want["loss"]), rtol=1e-5
    )
    flat_w = jax.tree_util.tree_flatten_with_path(want.params)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(got.params)[0]
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6,
            err_msg=str(pw),
        )
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_flatten_with_path(want.ema_params)[0],
        jax.tree_util.tree_flatten_with_path(got.ema_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-6,
            err_msg=str(pw),
        )
    # the pinned out_shardings kept the ZeRO layout through donated steps
    specs = _leaf_specs(got)
    mu = [k for k in specs if "/mu/" in k and k.endswith("fc1/kernel")]
    assert mu and all("data" in specs[k] for k in mu), {
        k: specs[k] for k in mu
    }


def test_zero1_composes_with_tp_and_pallas():
    assert len(jax.devices()) >= 8
    mesh = create_mesh(num_devices=8, model_parallel=2)
    state, tx, step, batch = _setup(use_pallas=True)
    set_spmd_mesh(mesh)
    try:
        placed, metrics = _run(mesh, state, step, batch, n=2, zero1=True)
    finally:
        set_spmd_mesh(None)
    assert np.isfinite(float(metrics["loss"]))
    specs = _leaf_specs(placed)
    # the wide-GEMM moment carries BOTH axes: model (TP) + data (ZeRO-1)
    keys = [k for k in specs if "/mu/" in k
            and k.endswith("rna_encoder/embedding/fc1/kernel")]
    assert keys, sorted(specs)[:5]
    key = keys[0]
    assert "model" in specs[key] and "data" in specs[key], specs[key]
    # params stay TP-only (the Pallas shard_map consumes whole weights)
    pkey = "params/rna_encoder/embedding/fc1/kernel"
    assert "model" in specs[pkey] and "data" not in specs[pkey], specs[pkey]


def test_zero1_checkpoint_host_gather():
    from mirror_tpu.train.checkpoint import _to_host

    assert len(jax.devices()) >= 8
    mesh = create_mesh(num_devices=8)
    state, tx, step, batch = _setup()
    placed = shard_state(mesh, state, zero1=True)
    host = _to_host(placed)
    ref = _to_host(shard_state(mesh, state, zero1=False))
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_flatten_with_path(ref)[0],
        jax.tree_util.tree_flatten_with_path(host)[0],
    ):
        assert pw == pg
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
