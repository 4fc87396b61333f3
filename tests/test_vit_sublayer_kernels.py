"""Direct parity tests for the fused ViT half-block kernels
(ops/vit_attn_pallas) against plain-jnp reference math, interpret mode on
CPU. The full-model path is covered by tests/test_tools.py::
test_vit_pallas_matches_dense; these pin the kernel contracts themselves
(odd token counts, batch not divisible by the block size, LN epsilon, erf
accuracy)."""

import numpy as np
import jax
import jax.numpy as jnp

from mirror_tpu.ops.vit_attn_pallas import attn_block, mha_natural, mlp_block

EPS = 1e-6  # deliberately non-default to pin the eps plumbing


def _ref_ln(x, s, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + EPS) * s + b


def _ref_mha(q, k, v, heads):
    b, n, d = q.shape
    dh = d // heads
    q = q.reshape(b, n, heads, dh)
    k = k.reshape(b, n, heads, dh)
    v = v.reshape(b, n, heads, dh)
    sim = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * dh**-0.5
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn.astype(q.dtype), v).reshape(
        b, n, d
    )


def test_mha_natural_matches_reference():
    rng = np.random.default_rng(0)
    b, n, heads, dh = 3, 37, 4, 16  # odd n, b not divisible by the block
    d = heads * dh
    q, k, v = (
        jnp.array(rng.normal(size=(b, n, d)).astype(np.float32))
        for _ in range(3)
    )
    got = np.asarray(mha_natural(q, k, v, heads))
    want = np.asarray(_ref_mha(q, k, v, heads))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_attn_block_matches_reference():
    rng = np.random.default_rng(1)
    b, n, heads, dh = 2, 29, 4, 8
    d = heads * dh
    x = jnp.array(rng.normal(size=(b, n, d)).astype(np.float32))
    ln_s = jnp.array(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    ln_b = jnp.array(0.1 * rng.normal(size=(d,)).astype(np.float32))
    wq, wk, wv, wo = (
        jnp.array(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
        for _ in range(4)
    )
    bq, bk, bv, bo = (
        jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1)
        for _ in range(4)
    )
    bqkv = jnp.concatenate([bq, bk, bv])[None, :]
    got = np.asarray(
        attn_block(x, ln_s[None, :], ln_b[None, :], wq, wk, wv, bqkv, wo,
                   bo[None, :], heads, EPS)
    )
    y = _ref_ln(x, ln_s, ln_b)
    want = np.asarray(
        x + _ref_mha(y @ wq + bq, y @ wk + bk, y @ wv + bv, heads) @ wo + bo
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mlp_block_matches_reference():
    rng = np.random.default_rng(2)
    b, n, d, m = 3, 23, 32, 128
    x = jnp.array(rng.normal(size=(b, n, d)).astype(np.float32))
    ln_s = jnp.array(1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    ln_b = jnp.array(0.1 * rng.normal(size=(d,)).astype(np.float32))
    w1 = jnp.array(rng.normal(size=(d, m)).astype(np.float32) * 0.2)
    b1 = jnp.array(rng.normal(size=(m,)).astype(np.float32))
    w2 = jnp.array(rng.normal(size=(m, d)).astype(np.float32) * 0.2)
    b2 = jnp.array(rng.normal(size=(d,)).astype(np.float32))
    got = np.asarray(
        mlp_block(x, ln_s[None, :], ln_b[None, :], w1, b1[None, :], w2,
                  b2[None, :], EPS)
    )
    y = _ref_ln(x, ln_s, ln_b)
    h = y @ w1 + b1
    want = np.asarray(
        x + jax.nn.gelu(h.astype(jnp.float32), approximate=False) @ w2 + b2
    )
    # the in-kernel Abramowitz-Stegun erf differs from XLA's erf by
    # <= 1.5e-7 pre-GEMM; the fc2 contraction (m=128 terms, |w| ~ 0.2)
    # amplifies to ~1e-5
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attn_block_rejects_nondivisible_heads():
    """d % heads != 0 would leave output lanes as uninitialized VMEM on the
    compiled path (interpret mode differs, so only a loud refusal is safe)."""
    import numpy as np
    import pytest

    from mirror_tpu.ops.vit_attn_pallas import attn_block, mha_natural

    d, n, b = 48, 8, 2
    x = jnp.zeros((b, n, d), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        attn_block(
            x, jnp.ones(d), jnp.zeros(d),
            *(jnp.zeros((d, d)),) * 3, jnp.zeros(3 * d),
            jnp.zeros((d, d)), jnp.zeros(d), heads=5,
        )
    q = np.zeros((b, n, d), np.float32)
    with pytest.raises(ValueError, match="not divisible"):
        mha_natural(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), heads=7)
