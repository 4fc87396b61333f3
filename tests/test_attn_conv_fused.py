"""Parity of the attention+conv megafusion (ops/nystrom_pallas.py
fused_softmax_attn_conv) against its two constituent ops — values and all
five gradients (dq, dk_l, dw, dv, dkern)."""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.ops.conv1d_pallas import depthwise_conv1d_seq
from mirror_tpu.ops.nystrom_pallas import (
    fused_softmax_attn,
    fused_softmax_attn_conv,
)


def _inputs(key, b=2, h=3, n=500, m=64, d=32, K=33, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, n, d), jnp.float32).astype(dtype)
    k_l = jax.random.normal(ks[1], (b, h, m, d), jnp.float32).astype(dtype)
    w = jax.random.normal(ks[2], (b, h, m, d), jnp.float32).astype(dtype)
    v = jax.random.normal(ks[3], (b, h, n, d), jnp.float32).astype(dtype)
    kern = (0.1 * jax.random.normal(ks[4], (h, K), jnp.float32)).astype(dtype)
    return q, k_l, w, v, kern


def _ref(q, k_l, w, v, kern):
    return fused_softmax_attn(q, k_l, w) + depthwise_conv1d_seq(v, kern)


def test_attn_conv_value_parity():
    q, k_l, w, v, kern = _inputs(jax.random.PRNGKey(0))
    out = fused_softmax_attn_conv(q, k_l, w, v, kern)
    ref = _ref(q, k_l, w, v, kern)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_attn_conv_grad_parity():
    q, k_l, w, v, kern = _inputs(jax.random.PRNGKey(1), n=200, m=32, d=16,
                                 K=9)
    t = jax.random.normal(jax.random.PRNGKey(2), q.shape)

    def loss_fused(*a):
        return jnp.sum(fused_softmax_attn_conv(*a) * t)

    def loss_ref(*a):
        return jnp.sum(_ref(*a) * t)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k_l, w, v, kern)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k_l, w, v, kern)
    for name, a, b in zip("q k_l w v kern".split(), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_attn_conv_bf16_production_tap():
    # production K=33 halo with a partial row tile (n=416) in bf16
    q, k_l, w, v, kern = _inputs(jax.random.PRNGKey(3), b=2, h=2, n=416,
                                 m=32, d=16, K=33, dtype=jnp.bfloat16)
    out = fused_softmax_attn_conv(q, k_l, w, v, kern)
    ref = _ref(q, k_l, w, v, kern)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.05,
    )


def test_nystrom_module_fused_matches_dense():
    """NystromAttention(use_pallas=True) with the megafusion still matches
    the dense XLA path (same params)."""
    from mirror_tpu.models.nystrom import NystromAttention

    b, n, dim = 2, 130, 64
    x = jax.random.normal(jax.random.PRNGKey(4), (b, n, dim))
    kw = dict(dim=dim, dim_head=8, heads=8, num_landmarks=32,
              pinv_iterations=6, residual=True, dropout=0.0)
    m_pal = NystromAttention(**kw, use_pallas=True)
    m_dense = NystromAttention(**kw, use_pallas=False)
    params = m_dense.init(jax.random.PRNGKey(5), x)
    out_d = m_dense.apply(params, x)
    out_p = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)
