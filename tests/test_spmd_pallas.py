"""Pallas kernels under SPMD: the shard_map wrap (ops/_common.spmd_wrap).

XLA's SPMD partitioner cannot partition Mosaic custom calls — jitting a
Pallas op for >1 device raises ``NotImplementedError: Mosaic kernels cannot
be automatically partitioned. Please wrap the call in a shard_map.``
(jax/_src/tpu_custom_call.py). Every public kernel entry therefore
shard_maps itself over the active mesh's ``data`` axis (registered by the
train harness via ``set_spmd_mesh``). These tests pin, on the 8-virtual-
device CPU mesh, that the wrapped ops return the SAME values and gradients
as the direct (no-mesh) calls — in particular that the cotangents of
REPLICATED weight args (conv taps, PPEG kernel/bias, ViT weights) are
psummed across shards by the shard_map transpose — and that the full
pallas-path MIRROR train/eval steps run sharded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirror_tpu.ops._common import active_spmd_mesh, set_spmd_mesh
from mirror_tpu.parallel import create_mesh, shard_batch


@pytest.fixture
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must expose 8 virtual devices"
    mesh = create_mesh(num_devices=8)
    yield mesh
    set_spmd_mesh(None)


def _with_mesh(mesh, fn, *args):
    set_spmd_mesh(mesh)
    try:
        return fn(*args)
    finally:
        set_spmd_mesh(None)


def _assert_tree_close(got, want, rtol=1e-5, atol=1e-6):
    jax.tree.map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol
        ),
        got, want,
    )


def test_landmark_softmax_sharded_matches_direct(mesh8):
    from mirror_tpu.ops.landmark_pallas import landmark_softmax

    rng = np.random.default_rng(0)
    b, h, n, dh, m = 8, 2, 24, 8, 4
    q = jnp.array(rng.normal(size=(b, h, n, dh)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, h, n, dh)).astype(np.float32))

    def loss(q, k):
        ql, kl, a2 = landmark_softmax(q, k, m, 0)
        return jnp.sum(ql**2) + jnp.sum(kl**2) + jnp.sum(a2**2)

    want = jax.value_and_grad(loss, argnums=(0, 1))(q, k)
    got = _with_mesh(mesh8, jax.value_and_grad(loss, argnums=(0, 1)), q, k)
    _assert_tree_close(got, want)


@pytest.mark.parametrize("grad_mode", ["exact", "implicit"])
def test_pinv_sharded_matches_direct(mesh8, grad_mode):
    """The pinv's GLOBAL-max scale must keep reducing over the full batch
    (not per shard) — the reference quirk is one scalar for the tensor."""
    from mirror_tpu.ops.pinv_pallas import moore_penrose_pinv_pallas

    rng = np.random.default_rng(1)
    b, h, m = 8, 2, 16
    # softmax rows like the model produces (well-conditioned)
    x = jax.nn.softmax(
        jnp.array(rng.normal(size=(b, h, m, m)).astype(np.float32)), axis=-1
    )

    def loss(x):
        return jnp.sum(moore_penrose_pinv_pallas(x, 6, grad=grad_mode) ** 2)

    want = jax.value_and_grad(loss)(x)
    got = _with_mesh(mesh8, jax.value_and_grad(loss), x)
    _assert_tree_close(got, want, rtol=1e-4, atol=1e-4)


def test_fused_attn_conv_sharded_matches_direct(mesh8):
    """kern is replicated: its gradient must be the psum over all shards."""
    from mirror_tpu.ops.nystrom_pallas import fused_softmax_attn_conv

    rng = np.random.default_rng(2)
    b, h, n, m, d, K = 8, 2, 16, 8, 8, 5
    q = jnp.array(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k_l = jnp.array(rng.normal(size=(b, h, m, d)).astype(np.float32))
    w = jnp.array(rng.normal(size=(b, h, m, d)).astype(np.float32))
    v = jnp.array(rng.normal(size=(b, h, n, d)).astype(np.float32))
    kern = jnp.array(rng.normal(size=(h, K)).astype(np.float32))

    def loss(q, k_l, w, v, kern):
        return jnp.sum(fused_softmax_attn_conv(q, k_l, w, v, kern) ** 2)

    want = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(q, k_l, w, v, kern)
    got = _with_mesh(
        mesh8, jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)),
        q, k_l, w, v, kern,
    )
    _assert_tree_close(got, want, rtol=1e-4, atol=1e-4)


def test_ppeg_sharded_matches_direct(mesh8):
    from mirror_tpu.ops.ppeg_pallas import ppeg_fused

    rng = np.random.default_rng(3)
    b, H, W, C = 8, 5, 5, 16
    img = jnp.array(rng.normal(size=(b, H, W, C)).astype(np.float32))
    kern = jnp.array(rng.normal(size=(7, 7, C)).astype(np.float32))
    bias = jnp.array(rng.normal(size=(C,)).astype(np.float32))

    def loss(img, kern, bias):
        return jnp.sum(ppeg_fused(img, kern, bias) ** 2)

    want = jax.value_and_grad(loss, argnums=(0, 1, 2))(img, kern, bias)
    got = _with_mesh(
        mesh8, jax.value_and_grad(loss, argnums=(0, 1, 2)), img, kern, bias
    )
    _assert_tree_close(got, want, rtol=1e-4, atol=1e-4)


def test_conv1d_sharded_matches_direct(mesh8):
    from mirror_tpu.ops.conv1d_pallas import depthwise_conv1d_seq

    rng = np.random.default_rng(4)
    b, h, n, d, K = 8, 2, 16, 8, 5
    v = jnp.array(rng.normal(size=(b, h, n, d)).astype(np.float32))
    kern = jnp.array(rng.normal(size=(h, K)).astype(np.float32))

    def loss(v, kern):
        return jnp.sum(depthwise_conv1d_seq(v, kern) ** 2)

    want = jax.value_and_grad(loss, argnums=(0, 1))(v, kern)
    got = _with_mesh(mesh8, jax.value_and_grad(loss, argnums=(0, 1)), v, kern)
    _assert_tree_close(got, want, rtol=1e-4, atol=1e-4)


def test_vit_blocks_sharded_match_direct(mesh8):
    from mirror_tpu.ops.vit_attn_pallas import attn_block, mha_natural, mlp_block

    rng = np.random.default_rng(5)
    b, n, d, heads = 8, 12, 32, 4
    x = jnp.array(rng.normal(size=(b, n, d)).astype(np.float32))
    ln_s = jnp.ones((1, d), np.float32)
    ln_b = jnp.zeros((1, d), np.float32)
    ws = [jnp.array(rng.normal(size=(d, d)).astype(np.float32) * 0.05)
          for _ in range(4)]
    bqkv = jnp.zeros((1, 3 * d), np.float32)
    bo = jnp.zeros((1, d), np.float32)
    w1 = jnp.array(rng.normal(size=(d, 4 * d)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((1, 4 * d), np.float32)
    w2 = jnp.array(rng.normal(size=(4 * d, d)).astype(np.float32) * 0.05)
    b2 = jnp.zeros((1, d), np.float32)

    def run():
        a = attn_block(x, ln_s, ln_b, ws[0], ws[1], ws[2], bqkv, ws[3], bo,
                       heads)
        m = mlp_block(a, ln_s, ln_b, w1, b1, w2, b2)
        q = k = v = a
        return a, m, mha_natural(q, k, v, heads)

    want = run()
    got = _with_mesh(mesh8, run)
    _assert_tree_close(got, want, rtol=1e-5, atol=1e-5)


def test_wrap_emits_shard_map_and_direct_path_does_not(mesh8):
    from mirror_tpu.ops.conv1d_pallas import depthwise_conv1d_seq

    v = jnp.ones((8, 2, 16, 8), jnp.float32)
    kern = jnp.ones((2, 5), jnp.float32)
    plain = str(jax.make_jaxpr(depthwise_conv1d_seq)(v, kern))
    assert "shard_map" not in plain
    set_spmd_mesh(mesh8)
    try:
        wrapped = str(jax.make_jaxpr(depthwise_conv1d_seq)(v, kern))
    finally:
        set_spmd_mesh(None)
    assert "shard_map" in wrapped


def test_indivisible_batch_raises(mesh8):
    from mirror_tpu.ops.conv1d_pallas import depthwise_conv1d_seq

    v = jnp.ones((6, 2, 16, 8), jnp.float32)  # 6 % 8 != 0
    kern = jnp.ones((2, 5), jnp.float32)
    set_spmd_mesh(mesh8)
    try:
        with pytest.raises(ValueError, match="does not divide"):
            depthwise_conv1d_seq(v, kern)
    finally:
        set_spmd_mesh(None)


def test_set_spmd_mesh_ignores_single_device_mesh():
    mesh1 = create_mesh(num_devices=1)
    set_spmd_mesh(mesh1)
    assert active_spmd_mesh() is None


def _tiny_mirror(**over):
    from mirror_tpu.registry import create_model

    kw = dict(
        wsi_embed_dim=32, rna_embed_dim=96, embed_dim=48, wsi_num_tokens=16,
        rna_mlp_ratio=2.0, num_prototypes=24, style_mlp_hidden_dim=24,
        style_mlp_out_dim=16, style_latent_dim=8, use_pallas=True,
    )
    kw.update(over)
    return create_model("mirror", **kw)


def _rngs(seed):
    k = jax.random.PRNGKey(seed)
    return dict(
        zip(["params", "dropout", "masking", "style"], jax.random.split(k, 4))
    )


def test_mirror_eval_step_sharded_matches_single(mesh8):
    """The pallas-path EVAL step (dropout off; masking/style threefry —
    partition-invariant) must produce the same loss sharded as direct."""
    from mirror_tpu.losses import MirrorLossWeights
    from mirror_tpu.train.steps import make_mirror_eval_step

    model = _tiny_mirror()
    rngs = _rngs(0)
    wsi = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 32), jnp.float32)
    rna = jax.random.normal(jax.random.PRNGKey(2), (16, 96), jnp.float32)
    params = model.init(rngs, wsi, rna, 0.75, 0.75, True)["params"]
    eval_step = make_mirror_eval_step(
        model, MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    )
    batch = {"wsi": wsi, "rna": rna}
    want = jax.jit(eval_step)(params, batch, jax.random.PRNGKey(3))

    set_spmd_mesh(mesh8)
    try:
        sharded = shard_batch(mesh8, {k: np.asarray(v) for k, v in batch.items()})
        got = jax.jit(eval_step)(params, sharded, jax.random.PRNGKey(3))
    finally:
        set_spmd_mesh(None)
    for k in want:
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=5e-5, atol=1e-6, err_msg=k
        )


def test_full_model_lowers_for_tpu_multidevice(mesh8, monkeypatch):
    """Cross-lower the full pallas-path value_and_grad for the TPU platform
    over the 8-device mesh with interpret mode forced OFF — the Mosaic
    custom calls must survive lowering (the exact stage where unwrapped
    multi-device Pallas dies). Also pins that the UNWRAPPED path still
    raises jax's NotImplementedError, so the wrap stays justified."""
    from mirror_tpu.losses import MirrorLossWeights, mirror_loss
    from jax.sharding import NamedSharding

    for mod in ("conv1d_pallas", "landmark_pallas", "pinv_pallas",
                "nystrom_pallas", "ppeg_pallas", "vit_attn_pallas"):
        m = __import__(f"mirror_tpu.ops.{mod}", fromlist=["_use_interpret"])
        monkeypatch.setattr(m, "_use_interpret", lambda: False)

    model = _tiny_mirror()
    rngs = _rngs(0)
    weights = MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1)
    wsi_a = jax.ShapeDtypeStruct((16, 16, 32), jnp.float32)
    rna_a = jax.ShapeDtypeStruct((16, 96), jnp.float32)
    pshape = jax.eval_shape(
        lambda r, w, x: model.init(r, w, x, 0.75, 0.75, True), rngs, wsi_a, rna_a
    )
    data = NamedSharding(mesh8, jax.sharding.PartitionSpec("data"))
    repl = NamedSharding(mesh8, jax.sharding.PartitionSpec())
    wsi_s = jax.ShapeDtypeStruct((16, 16, 32), jnp.float32, sharding=data)
    rna_s = jax.ShapeDtypeStruct((16, 96), jnp.float32, sharding=data)
    params_s = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl),
        pshape["params"],
    )

    def loss(p, wsi, rna):
        out = model.apply(
            {"params": p}, wsi, rna, 0.75, 0.75, True, rngs=rngs
        )
        return mirror_loss(*out, weights=weights)[0]

    set_spmd_mesh(None)
    with pytest.raises(NotImplementedError, match="shard_map"):
        jax.jit(jax.value_and_grad(loss)).trace(params_s, wsi_s, rna_s).lower(
            lowering_platforms=("tpu",)
        )

    set_spmd_mesh(mesh8)
    try:
        lowered = jax.jit(jax.value_and_grad(loss)).trace(
            params_s, wsi_s, rna_s
        ).lower(lowering_platforms=("tpu",))
    finally:
        set_spmd_mesh(None)
    n_mosaic = lowered.as_text().count("tpu_custom_call")
    assert n_mosaic >= 20, n_mosaic  # fwd+bwd kernels of 3 layers + PPEG


def test_mirror_train_step_sharded_pallas_runs(mesh8):
    """Full pallas-path train step (grads + adam + renorm + clamp) over the
    8-device mesh — the exact path a real v5e-8 takes (which plain jit
    cannot lower: Mosaic custom calls are not GSPMD-partitionable)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mirror_tpu.losses import MirrorLossWeights
    from mirror_tpu.train.optim import make_optimizer, make_schedule
    from mirror_tpu.train.state import create_train_state
    from mirror_tpu.train.steps import make_mirror_train_step

    model = _tiny_mirror()
    rngs = _rngs(0)
    wsi = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 32), jnp.float32)
    rna = jax.random.normal(jax.random.PRNGKey(2), (16, 96), jnp.float32)
    params = model.init(rngs, wsi, rna, 0.75, 0.75, True)["params"]

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
        model, tx, MirrorLossWeights(0.5, 0.15, 0.15, 0.1, 0.1),
        ema_decay=0.9998, schedule=schedule,
    )

    set_spmd_mesh(mesh8)
    try:
        state = create_train_state(params, tx, model_ema=True)
        rep = NamedSharding(mesh8, P())
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        batch = shard_batch(
            mesh8, {"wsi": np.asarray(wsi), "rna": np.asarray(rna)}
        )
        jitted = jax.jit(step, donate_argnums=0)
        state, metrics = jitted(state, batch, jax.random.PRNGKey(7))
        state, metrics = jitted(state, batch, jax.random.PRNGKey(8))
    finally:
        set_spmd_mesh(None)
    assert np.isfinite(float(metrics["loss"]))


def test_set_spmd_mesh_equal_mesh_keeps_caches():
    """Re-registering an equal-but-distinct Mesh (predict after
    common_setup, tests re-entering a CLI) must not clear every compiled
    program — Mesh compares by content."""
    import numpy as np
    from jax.sharding import Mesh

    import mirror_tpu.ops._common as common
    from mirror_tpu.ops._common import active_spmd_mesh, set_spmd_mesh

    devices = jax.devices()[:4]
    mesh_a = Mesh(np.array(devices).reshape(4, 1), ("data", "model"))
    mesh_b = Mesh(np.array(devices).reshape(4, 1), ("data", "model"))
    # jax 0.9 interns Mesh (mesh_a IS mesh_b here); the registry compares
    # by content (!=) so the no-clear contract also holds on jax versions
    # without interning
    assert mesh_a == mesh_b

    prev = active_spmd_mesh()
    cleared = []
    mp = pytest.MonkeyPatch()
    mp.setattr(common.jax, "clear_caches", lambda: cleared.append(1))
    try:
        set_spmd_mesh(mesh_a)
        n0 = len(cleared)
        set_spmd_mesh(mesh_b)  # equal content: no cache clear
        assert len(cleared) == n0
        set_spmd_mesh(None)  # real change: clears
        assert len(cleared) == n0 + 1
    finally:
        mp.undo()
        set_spmd_mesh(prev)
