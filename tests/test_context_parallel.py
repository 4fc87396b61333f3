"""Context-parallel Nystrom attention: exact parity with the single-device
module on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mirror_tpu.models import NystromAttention
from mirror_tpu.parallel.context_parallel import nystrom_attention_cp


def test_cp_matches_single_device():
    dim, heads, dim_head, m = 32, 4, 8, 16
    n = 256  # multiple of m * 8 devices
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))

    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m,
        pinv_iterations=6, dropout=0.0,
    )
    x = jnp.array(
        np.random.default_rng(0).normal(size=(1, n, dim)).astype(np.float32)
    )
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(mod.apply({"params": params}, x))[0]

    got = np.asarray(
        nystrom_attention_cp(
            x[0], params, mesh, axis_name="data",
            dim_head=dim_head, heads=heads, num_landmarks=m,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cp_long_sequence_runs():
    # a "whole-slide" length no single batch entry would usually hold
    dim, heads, dim_head, m = 32, 4, 8, 16
    n = 16 * 8 * 32  # 4096 tokens over 8 chips
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m, dropout=0.0
    )
    x_small = jnp.zeros((1, m, dim))
    params = mod.init(jax.random.PRNGKey(0), x_small)["params"]
    x = jnp.array(
        np.random.default_rng(1).normal(size=(n, dim)).astype(np.float32)
    )
    out = nystrom_attention_cp(
        x, params, mesh, axis_name="data",
        dim_head=dim_head, heads=heads, num_landmarks=m,
    )
    assert out.shape == (n, dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cp_rejects_misaligned_length():
    dim, heads, dim_head, m = 32, 4, 8, 16
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = NystromAttention(dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, m, dim)))["params"]
    with pytest.raises(AssertionError):
        nystrom_attention_cp(
            jnp.zeros((100, dim)), params, mesh, axis_name="data",
            dim_head=dim_head, heads=heads, num_landmarks=m,
        )
