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


def test_pad_aware_kv_softmax_matches_padded():
    """fused_softmax_attn with `pad` virtual zero columns == the physically
    front-padded computation (values + grads)."""
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    b, h, m, n, d, pad = 2, 2, 8, 40, 16, 24
    q_l = jax.random.normal(ks[0], (b, h, m, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    kp = jnp.pad(k, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (pad, 0), (0, 0)))

    def loss_virtual(q_l, k, v):
        return jnp.sum(fused_softmax_attn(q_l, k, v, pad) ** 2)

    def loss_padded(q_l, kp, vp):
        return jnp.sum(fused_softmax_attn(q_l, kp, vp) ** 2)

    out_v = fused_softmax_attn(q_l, k, v, pad)
    out_p = fused_softmax_attn(q_l, kp, vp)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    gv = jax.grad(loss_virtual, argnums=(0, 1, 2))(q_l, k, v)
    gp = jax.grad(loss_padded, argnums=(0, 1, 2))(q_l, kp, vp)
    # grads to 1e-4: the padded path sums `pad` separate exp(-mx) denominator
    # terms where the virtual path multiplies once — FP-order noise that the
    # softmax-VJP cancellation amplifies
    np.testing.assert_allclose(np.asarray(gv[0]), np.asarray(gp[0]),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv[1]),
                               np.asarray(gp[1][:, :, pad:]),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv[2]),
                               np.asarray(gp[2][:, :, pad:]),
                               rtol=2e-4, atol=1e-4)


def test_pad_aware_landmark_means_match_padded():
    """landmark_softmax with a virtual front pad == the physically padded
    computation (values + grads)."""
    from mirror_tpu.ops.landmark_pallas import landmark_softmax

    key = jax.random.PRNGKey(8)
    b, h, n, d, m, pad = 2, 2, 40, 16, 8, 24
    q = jax.random.normal(jax.random.split(key)[0], (b, h, n, d))
    k = jax.random.normal(jax.random.split(key)[1], (b, h, n, d))
    qp = jnp.pad(q, ((0, 0), (0, 0), (pad, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (pad, 0), (0, 0)))

    for o_v, o_p in zip(landmark_softmax(q, k, m, pad),
                        landmark_softmax(qp, kp, m)):
        np.testing.assert_allclose(np.asarray(o_v), np.asarray(o_p),
                                   rtol=1e-5, atol=1e-5)

    def loss_v(q, k):
        ql, kl, a2 = landmark_softmax(q, k, m, pad)
        return jnp.sum(ql ** 2) + jnp.sum(kl ** 2) + jnp.sum(a2 ** 2)

    def loss_p(qp, kp):
        ql, kl, a2 = landmark_softmax(qp, kp, m)
        return jnp.sum(ql ** 2) + jnp.sum(kl ** 2) + jnp.sum(a2 ** 2)

    gv = jax.grad(loss_v, argnums=(0, 1))(q, k)
    gp = jax.grad(loss_p, argnums=(0, 1))(qp, kp)
    for a, b_ in zip(gv, gp):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(b_[:, :, pad:]),
                                   rtol=1e-5, atol=1e-5)


def test_tiny_sequence_fwd_bwd():
    """Sequences shorter than the conv half-width (n <= K//2) must still
    train: the dkern tap loop skips taps with no g/v overlap (their gradient
    is exactly zero) instead of tracing negative-size slices. Regression for
    the pad-free pipeline, which feeds the kernel UNPADDED n (a slide with
    <= 9 patches gives seq = 3*3 + 1 = 10 < K//2 = 16 at the production
    K=33)."""
    for n in (10, 16, 17, 33):
        q, k_l, w, v, kern = _inputs(jax.random.PRNGKey(9), b=1, h=2, n=n,
                                     m=8, d=16, K=33)

        def loss_fused(*a):
            return jnp.sum(fused_softmax_attn_conv(*a) ** 2)

        def loss_ref(*a):
            return jnp.sum(_ref(*a) ** 2)

        out = fused_softmax_attn_conv(q, k_l, w, v, kern)
        ref = _ref(q, k_l, w, v, kern)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"value mismatch at n={n}")
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k_l, w, v, kern)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k_l, w, v, kern)
        for name, a, b in zip("q k_l w v kern".split(), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-3,
                err_msg=f"grad mismatch for {name} at n={n}",
            )


def test_tiny_slide_module_backward():
    """End-to-end jax.grad through NystromAttention(use_pallas=True,
    residual=True) on a 10-token slide — the exact crash shape from the
    round-3 review (negative-size dslice at trace time)."""
    from mirror_tpu.models.nystrom import NystromAttention

    b, n, dim = 1, 10, 64
    x = jax.random.normal(jax.random.PRNGKey(10), (b, n, dim))
    kw = dict(dim=dim, dim_head=8, heads=8, num_landmarks=32,
              pinv_iterations=6, residual=True, dropout=0.0)
    m_pal = NystromAttention(**kw, use_pallas=True)
    m_dense = NystromAttention(**kw, use_pallas=False)
    params = m_dense.init(jax.random.PRNGKey(11), x)

    def loss(fn, p):
        return jnp.sum(fn.apply(p, x) ** 2)

    gp = jax.grad(lambda p: loss(m_pal, p))(params)
    gd = jax.grad(lambda p: loss(m_dense, p))(params)
    # same param tree on both sides -> identical leaf order
    for (kp_, a), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(gp),
        jax.tree_util.tree_leaves_with_path(gd),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4,
            err_msg=f"module grad mismatch at {jax.tree_util.keystr(kp_)}",
        )
