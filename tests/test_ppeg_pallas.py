"""Parity of the fused Pallas PPEG op (merged 7x7 depthwise conv +
identity + bias, ops/ppeg_pallas.py) against the XLA formulation it
replaces (models/transmil.py PPEG, use_pallas=False): values and all
three gradients (dimg, dkern, dbias)."""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.ops.ppeg_pallas import ppeg_fused


def _xla_ref(img, kern, bias):
    c = img.shape[-1]
    dw = jax.lax.conv_general_dilated(
        img, kern[:, :, None, :],
        window_strides=(1, 1),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return img + bias + dw


def _inputs(key, b=2, h=9, w=9, c=256, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.normal(k1, (b, h, w, c), jnp.float32).astype(dtype)
    kern = (0.1 * jax.random.normal(k2, (7, 7, c), jnp.float32)).astype(dtype)
    bias = (0.1 * jax.random.normal(k3, (c,), jnp.float32)).astype(dtype)
    return img, kern, bias


def test_ppeg_value_parity():
    img, kern, bias = _inputs(jax.random.PRNGKey(0))
    out = ppeg_fused(img, kern, bias)
    ref = _xla_ref(img, kern, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ppeg_value_parity_rect_grid():
    # non-square and sublane-unaligned spatial dims (h=5, w=11)
    img, kern, bias = _inputs(jax.random.PRNGKey(1), b=1, h=5, w=11, c=128)
    out = ppeg_fused(img, kern, bias)
    ref = _xla_ref(img, kern, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ppeg_grad_parity():
    img, kern, bias = _inputs(jax.random.PRNGKey(2), b=2, h=8, w=8, c=128)
    t = jax.random.normal(jax.random.PRNGKey(3), img.shape)

    def loss_pal(img, kern, bias):
        return jnp.sum(ppeg_fused(img, kern, bias) * t)

    def loss_ref(img, kern, bias):
        return jnp.sum(_xla_ref(img, kern, bias) * t)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(img, kern, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(img, kern, bias)
    for a, b_, tol in zip(gp, gr, (1e-4, 2e-3, 2e-3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=tol)


def test_ppeg_bf16():
    img, kern, bias = _inputs(jax.random.PRNGKey(4), b=1, h=6, w=6, c=128,
                              dtype=jnp.bfloat16)
    out = ppeg_fused(img, kern, bias)
    ref = _xla_ref(img, kern, bias)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.03,
    )


def test_ppeg_module_pallas_matches_xla():
    """PPEG(use_pallas=True) == PPEG(use_pallas=False) through the module
    (same params): covers the k_eff [k,k,1,c] -> [k,k,c] wiring and the
    cls-token bypass around the fused kernel."""
    from mirror_tpu.models.transmil import PPEG

    b, h, w, c = 2, 6, 6, 128
    x = jax.random.normal(jax.random.PRNGKey(5), (b, h * w + 1, c))
    m_xla = PPEG(dim=c, use_pallas=False)
    m_pal = PPEG(dim=c, use_pallas=True)
    params = m_xla.init(jax.random.PRNGKey(6), x, h, w)
    out_x = m_xla.apply(params, x, h, w)
    out_p = m_pal.apply(params, x, h, w)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_ppeg_grads_with_mixed_primal_dtypes():
    """db/dk must match their PRIMALS' dtypes (custom_vjp aval contract):
    bf16 taps with an fp32 bias used to crash at gradient time."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 256)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(7, 7, 256)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    bias = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))  # fp32

    def loss(img, kern, bias):
        return jnp.sum(ppeg_fused(img, kern, bias) ** 2)

    dimg, dk, db = jax.grad(loss, argnums=(0, 1, 2))(img, kern, bias)
    assert dk.dtype == kern.dtype
    assert db.dtype == bias.dtype
    assert np.isfinite(np.asarray(db, np.float32)).all()
