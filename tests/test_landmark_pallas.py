"""Parity of the fused landmark-mean+softmax kernel (values + grads) against
the jnp path it replaces in models/nystrom.py."""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.ops.landmark_pallas import landmark_softmax


def _ref(q, k, m):
    b, h, n_pad, dh = q.shape
    l = n_pad // m
    q_l = jnp.mean(q.reshape(b, h, m, l, dh), axis=3)
    k_l = jnp.mean(k.reshape(b, h, m, l, dh), axis=3)
    sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l,
                      preferred_element_type=jnp.float32)
    attn2 = jax.nn.softmax(sim2, axis=-1).astype(q.dtype)
    return q_l, k_l, attn2


def _inputs(key, b=2, h=3, n=256, dh=32, dtype=jnp.float32):
    kq, kk = jax.random.split(key)
    q = jax.random.normal(kq, (b, h, n, dh), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, h, n, dh), jnp.float32).astype(dtype)
    return q, k


def test_landmark_softmax_value_parity():
    q, k = _inputs(jax.random.PRNGKey(0))
    m = 64
    out = landmark_softmax(q, k, m)
    ref = _ref(q, k, m)
    for name, a, b_ in zip(["q_l", "k_l", "attn2"], out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_landmark_softmax_value_parity_bf16():
    q, k = _inputs(jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    m = 64
    out = landmark_softmax(q, k, m)
    ref = _ref(q, k, m)
    for name, a, b_ in zip(["q_l", "k_l", "attn2"], out, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=0.02, atol=0.01, err_msg=name,
        )


def test_landmark_softmax_grad_parity():
    q, k = _inputs(jax.random.PRNGKey(2), n=128, dh=16)
    m = 32
    t1 = jax.random.normal(jax.random.PRNGKey(3), (2, 3, m, 16))
    t2 = jax.random.normal(jax.random.PRNGKey(4), (2, 3, m, 16))
    t3 = jax.random.normal(jax.random.PRNGKey(5), (2, 3, m, m))

    def loss(fn):
        def f(q, k):
            ql, kl, a2 = fn(q, k, m)
            return (jnp.sum(ql * t1) + jnp.sum(kl * t2)
                    + jnp.sum(a2.astype(jnp.float32) * t3))
        return f

    gp = jax.grad(loss(landmark_softmax), argnums=(0, 1))(q, k)
    gr = jax.grad(loss(_ref), argnums=(0, 1))(q, k)
    for name, a, b_ in zip(["dq", "dk"], gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-4, err_msg=name
        )
