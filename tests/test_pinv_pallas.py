"""Parity of the fused Pallas Moore-Penrose pinv (value + gradients) against
the XLA implementation it replaces (models/nystrom.py::moore_penrose_pinv).
Runs in interpret mode on the CPU mesh; the same code path compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.models.nystrom import moore_penrose_pinv
from mirror_tpu.ops.pinv_pallas import moore_penrose_pinv_pallas


def _softmax_like_input(key, b, h, m, dtype):
    sim = jax.random.normal(key, (b, h, m, m), jnp.float32)
    return jax.nn.softmax(sim, axis=-1).astype(dtype)


def test_pinv_pallas_value_parity_bf16():
    """bf16 rounding differences get amplified through 6 Newton iterations of
    an ill-conditioned inverse, so elementwise closeness is not meaningful at
    bf16 — compare the FUNCTIONAL quality: x @ pinv(x) must approximate I at
    least as well as the XLA version's does."""
    x = _softmax_like_input(jax.random.PRNGKey(0), 2, 3, 128, jnp.bfloat16)
    xf = np.asarray(x, np.float32)
    ref = np.asarray(moore_penrose_pinv(x, 6), np.float32)
    out = np.asarray(moore_penrose_pinv_pallas(x, 6), np.float32)
    eye = np.eye(128)
    err_ref = np.abs(xf @ ref - eye).max()
    err_out = np.abs(xf @ out - eye).max()
    assert err_out < max(1.5 * err_ref, 0.05), (err_out, err_ref)
    # magnitudes agree (same algorithm, same scaling)
    assert np.abs(out).max() < 2.0 * np.abs(ref).max() + 1.0


def test_pinv_pallas_value_parity_fp32():
    x = _softmax_like_input(jax.random.PRNGKey(1), 1, 2, 128, jnp.float32)
    ref = moore_penrose_pinv(x, 6)
    out = moore_penrose_pinv_pallas(x, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=1e-4)


def test_pinv_pallas_grad_parity():
    x = _softmax_like_input(jax.random.PRNGKey(2), 1, 2, 128, jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    def loss_ref(x):
        return jnp.sum(moore_penrose_pinv(x, 6) * t)

    def loss_pal(x):
        return jnp.sum(moore_penrose_pinv_pallas(x, 6) * t)

    g_ref = jax.grad(loss_ref)(x)
    g_pal = jax.grad(loss_pal)(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=5e-3, atol=1e-3
    )


def test_pinv_pallas_grad_parity_bf16():
    x = _softmax_like_input(jax.random.PRNGKey(4), 1, 2, 128, jnp.bfloat16)
    t = jax.random.normal(jax.random.PRNGKey(5), x.shape, jnp.float32)

    def loss_ref(x):
        return jnp.sum(moore_penrose_pinv(x, 6).astype(jnp.float32) * t)

    def loss_pal(x):
        return jnp.sum(moore_penrose_pinv_pallas(x, 6).astype(jnp.float32) * t)

    g_ref = np.asarray(jax.grad(loss_ref)(x), np.float32)
    g_pal = np.asarray(jax.grad(loss_pal)(x), np.float32)
    # bf16 grads: compare direction + magnitude coarsely
    denom = np.abs(g_ref).max() + 1e-8
    assert np.abs(g_pal - g_ref).max() / denom < 0.08


def test_pinv_implicit_grad_matches_exact_when_converged():
    """The implicit-function gradient (-Z^T g Z^T) equals autodiff-through-
    iterations WHEN the 6 iterations have converged — here on a diagonally-
    dominant matrix (sharp softmax). On the near-uniform softmax the model
    produces at init the iterations are far from converged and the two
    gradients genuinely differ (cosine ~0.56 measured) — that is the
    documented deviation of the experimental pinv_grad='implicit' mode."""
    from mirror_tpu.models.nystrom import moore_penrose_pinv_implicit

    key = jax.random.PRNGKey(4)
    logits = jax.random.normal(key, (2, 2, 128, 128), jnp.float32)
    logits = logits + 12.0 * jnp.eye(128)  # sharp, diagonally dominant
    x = jax.nn.softmax(logits, axis=-1)
    # sanity: converged (x @ pinv(x) ~ I)
    z = moore_penrose_pinv(x, 6)
    conv_err = float(jnp.abs(x @ z - jnp.eye(128)).max())
    assert conv_err < 1e-3, conv_err

    t = jax.random.normal(jax.random.PRNGKey(5), x.shape, jnp.float32)
    g_exact = jax.grad(lambda x: jnp.sum(moore_penrose_pinv(x, 6) * t))(x)
    g_impl = jax.grad(
        lambda x: jnp.sum(moore_penrose_pinv_implicit(x, 6) * t)
    )(x)
    cos = float(
        jnp.sum(g_exact * g_impl)
        / (jnp.linalg.norm(g_exact) * jnp.linalg.norm(g_impl))
    )
    assert cos > 0.999, cos
    ratio = float(jnp.linalg.norm(g_impl) / jnp.linalg.norm(g_exact))
    assert 0.95 < ratio < 1.05, ratio


def test_pinv_pallas_implicit_matches_dense_implicit():
    from mirror_tpu.models.nystrom import moore_penrose_pinv_implicit

    x = _softmax_like_input(jax.random.PRNGKey(6), 1, 2, 128, jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)

    g_dense = jax.grad(
        lambda x: jnp.sum(moore_penrose_pinv_implicit(x, 6) * t)
    )(x)
    g_pal = jax.grad(
        lambda x: jnp.sum(moore_penrose_pinv_pallas(x, 6, grad="implicit") * t)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_dense), rtol=5e-3, atol=1e-3
    )


def test_pinv_pallas_rejects_unknown_grad():
    import pytest

    x = _softmax_like_input(jax.random.PRNGKey(4), 1, 1, 128, jnp.float32)
    with pytest.raises(ValueError, match="implicit"):
        moore_penrose_pinv_pallas(x, 6, grad="implict")  # typo must not
        # silently fall back to the exact sweep


def test_pinv_pallas_zero_iterations_grad():
    """iters=0: z = x^T / s with no scratch slots; the backward must
    recompute z0 instead of reading the zero-size stash."""
    x = _softmax_like_input(jax.random.PRNGKey(5), 1, 1, 128, jnp.float32)

    def f_ref(x):
        return jnp.sum(moore_penrose_pinv(x, 0) ** 2)

    def f_pl(x):
        return jnp.sum(moore_penrose_pinv_pallas(x, 0) ** 2)

    np.testing.assert_allclose(float(f_pl(x)), float(f_ref(x)), rtol=1e-5)
    g_ref = np.asarray(jax.grad(f_ref)(x))
    g_pl = np.asarray(jax.grad(f_pl)(x))
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-4, atol=1e-6)
