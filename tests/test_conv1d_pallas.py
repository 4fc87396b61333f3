"""Parity of the banded-matmul Pallas depthwise conv (value + both grads)
against the XLA depthwise convolution it replaces (the Nystrom res_conv
formulation in models/nystrom.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.ops.conv1d_pallas import depthwise_conv1d_seq


def _xla_ref(v, kern):
    """The existing XLA formulation: grouped conv over [b, h, n, d]."""
    h = v.shape[1]
    K = kern.shape[1]
    k4 = kern.reshape(h, 1, K, 1)  # [O, I/g, H, W]
    return jax.lax.conv_general_dilated(
        v, k4,
        window_strides=(1, 1),
        padding=((K // 2, K // 2), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=h,
    )


def _inputs(key, b=2, h=3, n=500, d=32, K=33, dtype=jnp.float32):
    kv, kk = jax.random.split(key)
    v = jax.random.normal(kv, (b, h, n, d), jnp.float32).astype(dtype)
    kern = (0.1 * jax.random.normal(kk, (h, K), jnp.float32)).astype(dtype)
    return v, kern


def test_conv1d_value_parity():
    v, kern = _inputs(jax.random.PRNGKey(0))
    out = depthwise_conv1d_seq(v, kern)
    ref = _xla_ref(v, kern)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv1d_value_parity_tile_multiple():
    # n an exact multiple of the row tile (the production case, n_pad=2688)
    v, kern = _inputs(jax.random.PRNGKey(1), n=384, d=16, K=7)
    out = depthwise_conv1d_seq(v, kern)
    ref = _xla_ref(v, kern)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv1d_grad_parity():
    v, kern = _inputs(jax.random.PRNGKey(2), n=200, d=16, K=9)
    t = jax.random.normal(jax.random.PRNGKey(3), v.shape)

    def loss_pal(v, kern):
        return jnp.sum(depthwise_conv1d_seq(v, kern) * t)

    def loss_ref(v, kern):
        return jnp.sum(_xla_ref(v, kern) * t)

    gv_p, gk_p = jax.grad(loss_pal, argnums=(0, 1))(v, kern)
    gv_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(v, kern)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=2e-3)


def test_conv1d_grouped_partial_tile():
    # b=8 exercises the gb=8 batch-grouped program path; n=416 exercises a
    # short last row tile (384 + 32) with the production K=33 halo
    v, kern = _inputs(jax.random.PRNGKey(7), b=8, h=2, n=416, d=16, K=33)
    out = depthwise_conv1d_seq(v, kern)
    ref = _xla_ref(v, kern)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    t = jax.random.normal(jax.random.PRNGKey(8), v.shape)
    gv_p, gk_p = jax.grad(
        lambda v, k: jnp.sum(depthwise_conv1d_seq(v, k) * t), argnums=(0, 1)
    )(v, kern)
    gv_r, gk_r = jax.grad(
        lambda v, k: jnp.sum(_xla_ref(v, k) * t), argnums=(0, 1)
    )(v, kern)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=2e-3)


def test_conv1d_bf16():
    v, kern = _inputs(jax.random.PRNGKey(4), n=130, d=8, K=5,
                      dtype=jnp.bfloat16)
    out = depthwise_conv1d_seq(v, kern)
    ref = _xla_ref(v, kern)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )
