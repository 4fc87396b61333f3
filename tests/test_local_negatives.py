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
