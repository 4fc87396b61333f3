"""Parity tests for the fused LayerNorm+qkv Pallas kernel (interpret mode on
CPU): forward and all four gradients must match the dense composition
(flax-style fast-variance LayerNorm -> bias-free qkv GEMM -> head-major
split) that models/nystrom.py uses today."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_tpu.ops.ln_qkv_pallas import ln_qkv_fused

B, N, D, HEADS = 3, 24, 32, 4
DH = D // HEADS
EPS = 1e-5


def dense_ln_qkv(x, s, b, w, heads=HEADS, eps=EPS):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)
    inner = w.shape[1] // 3
    dh = inner // heads
    wr = w.reshape(x.shape[-1], 3, heads, dh)
    q = jnp.einsum("bnd,dhe->bhne", y, wr[:, 0])
    k = jnp.einsum("bnd,dhe->bhne", y, wr[:, 1])
    v = jnp.einsum("bnd,dhe->bhne", y, wr[:, 2])
    return q, k, v


@pytest.fixture(scope="module")
def draws():
    rng = np.random.default_rng(7)
    return dict(
        x=jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)),
        s=jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)).astype(np.float32)),
        b=jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32)),
        w=jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.05),
        cq=jnp.asarray(rng.normal(size=(B, HEADS, N, DH)).astype(np.float32)),
        ck=jnp.asarray(rng.normal(size=(B, HEADS, N, DH)).astype(np.float32)),
        cv=jnp.asarray(rng.normal(size=(B, HEADS, N, DH)).astype(np.float32)),
    )


def test_forward_parity_fp32(draws):
    got = ln_qkv_fused(draws["x"], draws["s"], draws["b"], draws["w"], HEADS, EPS)
    want = dense_ln_qkv(draws["x"], draws["s"], draws["b"], draws["w"])
    for g, w_, name in zip(got, want, "qkv"):
        assert g.shape == (B, HEADS, N, DH)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_forward_bf16_close_to_dense_bf16(draws):
    xb = draws["x"].astype(jnp.bfloat16)
    wb = draws["w"].astype(jnp.bfloat16)
    got = ln_qkv_fused(xb, draws["s"], draws["b"], wb, HEADS, EPS)
    want = dense_ln_qkv(xb, draws["s"], draws["b"], wb)
    for g, w_ in zip(got, want):
        assert g.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w_, np.float32),
            rtol=0.02, atol=0.02,
        )


def test_gradient_parity_all_inputs(draws):
    def loss_fused(x, s, b, w):
        q, k, v = ln_qkv_fused(x, s, b, w, HEADS, EPS)
        return jnp.sum(q * draws["cq"]) + jnp.sum(k * draws["ck"]) + jnp.sum(
            v * draws["cv"]
        )

    def loss_dense(x, s, b, w):
        q, k, v = dense_ln_qkv(x, s, b, w)
        return jnp.sum(q * draws["cq"]) + jnp.sum(k * draws["ck"]) + jnp.sum(
            v * draws["cv"]
        )

    args = (draws["x"], draws["s"], draws["b"], draws["w"])
    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    want = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    for g, w_, name in zip(got, want, ["dx", "ds", "db", "dw"]):
        assert g.shape == w_.shape, name
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=3e-5, atol=3e-5, err_msg=name
        )


def test_batch_accumulation_matches_single(draws):
    """dw/ds/db accumulate across the sequential batch grid; summing
    per-batch-element calls must agree (catches init/accumulate bugs)."""
    def loss(x, s, b, w):
        q, k, v = ln_qkv_fused(x, s, b, w, HEADS, EPS)
        return jnp.sum(q**2) + jnp.sum(k**2) + jnp.sum(v**2)

    args = (draws["x"], draws["s"], draws["b"], draws["w"])
    full = jax.grad(loss, argnums=(1, 2, 3))(*args)
    parts = [
        jax.grad(loss, argnums=(1, 2, 3))(
            draws["x"][i : i + 1], draws["s"], draws["b"], draws["w"]
        )
        for i in range(B)
    ]
    for j, name in enumerate(["ds", "db", "dw"]):
        acc = sum(np.asarray(p[j]) for p in parts)
        np.testing.assert_allclose(
            np.asarray(full[j]), acc, rtol=3e-5, atol=3e-5, err_msg=name
        )
