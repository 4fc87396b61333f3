"""Local-negatives contrastive parity mode: shard_map loss must equal the
mean of per-shard clip losses (== N DDP ranks), and differ from global."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mirror_tpu.losses import clip_loss, local_clip_loss


def test_local_clip_loss_equals_per_shard_mean():
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices).reshape(4, 1), ("data", "model"))
    rng = np.random.default_rng(0)
    b, d = 16, 8  # 4 samples per shard
    w = jnp.array(rng.normal(size=(b, d)).astype(np.float32))
    r = jnp.array(rng.normal(size=(b, d)).astype(np.float32))
    scale = jnp.float32(10.0)

    sharding = NamedSharding(mesh, P("data"))
    got = float(
        jax.jit(lambda w, r: local_clip_loss(w, r, scale, mesh))(
            jax.device_put(w, sharding), jax.device_put(r, sharding)
        )
    )
    # manual: mean of the 4 per-shard local losses (DDP-rank semantics,
    # ref losses/mirror_loss.py:37-50 + gradient averaging)
    want = float(
        np.mean([
            float(clip_loss(w[i * 4 : (i + 1) * 4], r[i * 4 : (i + 1) * 4], scale))
            for i in range(4)
        ])
    )
    assert abs(got - want) < 1e-5

    # and it differs from the global-negatives loss (harder problem)
    global_loss = float(clip_loss(w, r, scale))
    assert abs(got - global_loss) > 1e-4


def test_local_clip_loss_grads_flow():
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices).reshape(4, 1), ("data", "model"))
    rng = np.random.default_rng(1)
    w = jnp.array(rng.normal(size=(8, 8)).astype(np.float32))
    r = jnp.array(rng.normal(size=(8, 8)).astype(np.float32))
    sharding = NamedSharding(mesh, P("data"))

    def f(w, r):
        return local_clip_loss(w, r, jnp.float32(5.0), mesh)

    g = jax.jit(jax.grad(f))(jax.device_put(w, sharding), jax.device_put(r, sharding))
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.abs(g).sum() > 0


def test_local_info_nce_equals_per_shard_mean():
    """train_pretrain's parity mode: local_info_nce == mean of per-shard
    in-batch info_nce (the reference DDP semantics; the flag was silently
    ignored by the CLIP entry point before round 5)."""
    from mirror_tpu.losses import info_nce, local_info_nce

    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices).reshape(4, 1), ("data", "model"))
    rng = np.random.default_rng(1)
    b, d = 16, 8
    q = jnp.array(rng.normal(size=(b, d)).astype(np.float32))
    pk = jnp.array(rng.normal(size=(b, d)).astype(np.float32))

    sharding = NamedSharding(mesh, P("data"))
    got = float(
        jax.jit(lambda q, pk: local_info_nce(q, pk, mesh, temperature=0.07))(
            jax.device_put(q, sharding), jax.device_put(pk, sharding)
        )
    )
    want = float(np.mean([
        float(info_nce(q[i * 4:(i + 1) * 4], pk[i * 4:(i + 1) * 4],
                       temperature=0.07))
        for i in range(4)
    ]))
    assert abs(got - want) < 1e-5
    assert abs(got - float(info_nce(q, pk, temperature=0.07))) > 1e-4


def test_local_info_nce_grads_flow_and_padded_shard_excluded():
    from mirror_tpu.losses import local_info_nce

    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices).reshape(4, 1), ("data", "model"))
    rng = np.random.default_rng(2)
    b, d = 8, 6
    q = jnp.array(rng.normal(size=(b, d)).astype(np.float32))
    pk = jnp.array(rng.normal(size=(b, d)).astype(np.float32))
    # last shard fully padded (eval tail): must be excluded, not NaN
    valid = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)

    sharding = NamedSharding(mesh, P("data"))
    fn = jax.jit(lambda q, pk: local_info_nce(q, pk, mesh, valid=valid))
    loss = float(fn(jax.device_put(q, sharding), jax.device_put(pk, sharding)))
    assert np.isfinite(loss)
    g = jax.grad(lambda q: local_info_nce(q, pk, mesh, valid=valid))(q)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[:6]).sum() > 0
    np.testing.assert_allclose(g[6:], 0.0, atol=1e-7)  # padded rows: no grad
