"""Tensor parallelism over the ``model`` mesh axis (parallel/tensor_parallel).

Megatron-style GSPMD parameter shardings for the wide GEMMs (RNA embedding,
block MLPs, retention head, prototypes); activations/collectives are
propagated by XLA from the annotations alone (docs/DESIGN.md). These tests
pin on a (data=4, model=2) CPU mesh that

- the sharding rules hit the intended leaves (and fall back to replicated
  on non-divisible shapes),
- the TP eval forward equals the replicated forward (deterministic:
  dropout off, masking/style noise threefry — partition-invariant),
- gradients of the eval-mode loss match the replicated ones, and
- the full pallas-path train step runs on the 2-axis mesh (shard_map over
  ``data`` composes with model-sharded GSPMD params).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mirror_tpu.losses import MirrorLossWeights, mirror_loss
from mirror_tpu.ops._common import set_spmd_mesh
from mirror_tpu.parallel import create_mesh, shard_state
from mirror_tpu.parallel.tensor_parallel import param_spec
from mirror_tpu.registry import create_model

WEIGHTS = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)


@pytest.fixture
def mesh42():
    assert len(jax.devices()) >= 8
    mesh = create_mesh(num_devices=8, model_parallel=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2,
    }
    yield mesh
    set_spmd_mesh(None)


def _tiny(**over):
    kw = dict(
        wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
        rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
        style_mlp_out_dim=16, style_latent_dim=8,
    )
    kw.update(over)
    return create_model("mirror", **kw)


def _rngs(seed):
    k = jax.random.PRNGKey(seed)
    return dict(
        zip(["params", "dropout", "masking", "style"], jax.random.split(k, 4))
    )


def _init(model):
    rngs = _rngs(0)
    wsi = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32), jnp.float32)
    rna = jax.random.normal(jax.random.PRNGKey(2), (8, 96), jnp.float32)
    params = model.init(rngs, wsi, rna, 0.75, 0.75, True)["params"]
    return params, wsi, rna


def test_param_spec_rules():
    model = _tiny()
    params, _, _ = _init(model)
    specs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        specs[name] = param_spec(path, leaf, 2)
    assert specs["rna_encoder/embedding/fc1/kernel"] == P(None, "model")
    assert specs["rna_encoder/embedding/fc1/bias"] == P("model")
    assert specs["rna_encoder/embedding/norm/scale"] == P("model")
    assert specs["rna_encoder/embedding/fc2/kernel"] == P("model", None)
    assert specs["rna_encoder/block_0/mlp/fc1/kernel"] == P(None, "model")
    assert specs["rna_encoder/block_0/mlp/fc2/kernel"] == P("model", None)
    assert specs["rna_encoder/retention_head/kernel"] == P(None, "model")
    assert specs["prototypes/kernel"] == P(None, "model")
    # attention + WSI encoder stay replicated (pallas path sees whole weights)
    assert specs["rna_encoder/block_0/attn/qkv/kernel"] == P()
    assert specs["wsi_encoder/fc1/kernel"] == P()
    assert specs["logit_scale"] == P()


def test_param_spec_nondivisible_falls_back():
    # a col-parallel-named leaf whose out dim does not divide model=4
    path = (jax.tree_util.DictKey("mlp"), jax.tree_util.DictKey("fc1"),
            jax.tree_util.DictKey("kernel"))
    leaf = jnp.zeros((8, 6))
    assert param_spec(path, leaf, 4) == P()
    assert param_spec(path, leaf, 2) == P(None, "model")


def test_grouped_conv_weight_grad_bug_and_workaround(mesh42):
    """XLA GSPMD mis-partitions grouped-conv WEIGHT gradients: under a mesh
    axis the conv does not use (model=2 here), grad-of-kernel comes back
    exactly 2x (jax 0.9.0; forward and data grads are fine). Pins (a) the
    bug — so a jax upgrade that fixes it surfaces here and the workaround
    can be retired — and (b) that ops/depthwise_xla.depthwise_conv_nhwc
    (custom VJP: tap-loop weight grad) is immune."""
    from mirror_tpu.ops.depthwise_xla import depthwise_conv_nhwc

    K, h = 5, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 8, h))
    kern = jax.random.normal(jax.random.PRNGKey(1), (K, 1, 1, h))
    pads = ((K // 2, K // 2), (0, 0))

    def loss_grouped(kern, x):
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1), pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=h)
        return jnp.sum(y * y)

    def loss_safe(kern, x):
        return jnp.sum(depthwise_conv_nhwc(x, kern, pads) ** 2)

    g_want = np.asarray(jax.grad(loss_grouped)(kern, x))  # no mesh: correct
    xs = jax.device_put(x, NamedSharding(mesh42, P("data")))
    ks = jax.device_put(kern, NamedSharding(mesh42, P()))
    g_buggy = np.asarray(jax.jit(jax.grad(loss_grouped))(ks, xs))
    g_safe = np.asarray(jax.jit(jax.grad(loss_safe))(ks, xs))
    ratio = np.median(g_buggy / g_want)
    if abs(ratio - 1.0) < 1e-3:
        pytest.fail(
            "XLA grouped-conv weight-grad bug no longer reproduces — "
            "depthwise_xla workaround can be retired"
        )
    assert abs(ratio - 2.0) < 1e-3, ratio
    np.testing.assert_allclose(g_safe, g_want, rtol=1e-5, atol=1e-6)
    # forward + data grad parity of the workaround (any mesh)
    y_want = np.asarray(jax.jit(loss_grouped)(kern, x))
    y_safe = np.asarray(jax.jit(loss_safe)(kern, x))
    np.testing.assert_allclose(y_safe, y_want, rtol=1e-6)
    dx_want = np.asarray(jax.grad(loss_grouped, argnums=1)(kern, x))
    dx_safe = np.asarray(jax.grad(loss_safe, argnums=1)(kern, x))
    np.testing.assert_allclose(dx_safe, dx_want, rtol=1e-5, atol=1e-6)


def test_tp_eval_forward_and_grads_match_replicated(mesh42):
    from mirror_tpu.train.steps import make_mirror_eval_step

    model = _tiny()
    params, wsi, rna = _init(model)
    eval_step = make_mirror_eval_step(model, WEIGHTS)
    batch = {"wsi": wsi, "rna": rna}
    key = jax.random.PRNGKey(3)

    rep_mesh = create_mesh(num_devices=8)  # (8, 1)
    rep_params = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(rep_mesh, P())), params
    )
    rep_batch = {
        k: jax.device_put(v, NamedSharding(rep_mesh, P("data")))
        for k, v in batch.items()
    }
    want = jax.jit(eval_step)(rep_params, rep_batch, key)

    tp_params = shard_state(mesh42, params)
    spec = tp_params["rna_encoder"]["embedding"]["fc1"]["kernel"].sharding.spec
    assert "model" in str(spec), spec
    tp_batch = {
        k: jax.device_put(v, NamedSharding(mesh42, P("data")))
        for k, v in batch.items()
    }
    got = jax.jit(eval_step)(tp_params, tp_batch, key)
    for k in want:
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )

    # gradients of the (deterministic) eval-mode loss
    def loss_fn(p, wsi, rna):
        out = model.apply(
            {"params": p}, wsi, rna, 0.75, 0.75, True,
            rngs={k: v for k, v in _rngs(7).items() if k != "dropout"},
        )
        return mirror_loss(*out, weights=WEIGHTS)[0]

    g_want = jax.jit(jax.grad(loss_fn))(rep_params, rep_batch["wsi"],
                                        rep_batch["rna"])
    g_got = jax.jit(jax.grad(loss_fn))(tp_params, tp_batch["wsi"],
                                       tp_batch["rna"])
    flat_w = jax.tree_util.tree_flatten_with_path(g_want)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(g_got)[0]
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5,
            err_msg=str(pw),
        )


def test_tp_pallas_train_step_runs(mesh42):
    from mirror_tpu.train.optim import make_optimizer, make_schedule
    from mirror_tpu.train.state import create_train_state
    from mirror_tpu.train.steps import make_mirror_train_step

    model = _tiny(use_pallas=True)
    params, wsi, rna = _init(model)

    class _Args:
        opt = "adam"
        opt_eps = None
        opt_betas = None
        momentum = 0.9
        weight_decay = 0.0
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

    schedule = make_schedule(_Args, steps_per_epoch=4, base_lr=1e-4)
    tx = make_optimizer(_Args, schedule)
    step = make_mirror_train_step(
        model, tx, WEIGHTS, ema_decay=0.9998, schedule=schedule
    )
    set_spmd_mesh(mesh42)
    try:
        state = shard_state(mesh42, create_train_state(params, tx, model_ema=True))
        batch = {
            k: jax.device_put(v, NamedSharding(mesh42, P("data")))
            for k, v in {"wsi": wsi, "rna": rna}.items()
        }
        jitted = jax.jit(step, donate_argnums=0)
        state, metrics = jitted(state, batch, jax.random.PRNGKey(7))
        state, metrics = jitted(state, batch, jax.random.PRNGKey(8))
    finally:
        set_spmd_mesh(None)
    assert np.isfinite(float(metrics["loss"]))
    # the updated params kept their TP sharding (no silent reshard)
    spec = state.params["rna_encoder"]["embedding"]["fc1"]["kernel"].sharding.spec
    assert "model" in str(spec), spec


def test_placed_state_never_aliases_caller_buffers():
    """The round-4 red-test root cause, pinned as a contract: replicate()
    and shard_state() must COPY — a donated step deleting the placed
    buffers must leave the caller's original tree readable (device_put may
    alias the source buffer on some backends; parallel/mesh.py docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mirror_tpu.parallel import create_mesh, shard_state
    from mirror_tpu.parallel.mesh import replicate

    mesh = create_mesh(num_devices=8)
    for place in (
        lambda t: replicate(mesh, t),
        lambda t: shard_state(mesh, t, zero1=True),
    ):
        original = {
            "params": {"w": jnp.arange(16.0).reshape(2, 8)},
            "opt_state": {"mu": jnp.ones((2, 8))},
        }
        placed = place(original)

        consumed = jax.jit(
            lambda t: jax.tree.map(lambda x: x + 1.0, t), donate_argnums=0
        )(placed)
        jax.block_until_ready(consumed)
        # the ORIGINAL tree must still be alive and readable
        np.testing.assert_array_equal(
            np.array(original["params"]["w"]),
            np.arange(16.0).reshape(2, 8),
        )
        np.testing.assert_array_equal(
            np.array(original["opt_state"]["mu"]), np.ones((2, 8))
        )
