"""Parity: the layout-optimized NystromAttention module must match a naive
test-local re-derivation of the reference algorithm (head-major [b,h,n,d]
tensors, explicit transposes) given identical weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirror_tpu.models import NystromAttention
from mirror_tpu.models.nystrom import moore_penrose_pinv


def naive_nystrom(x, qkv_kernel, out_kernel, out_bias, res_kernel,
                  heads, dim_head, m, iters):
    """Reference-shaped implementation: [b, h, n, d] layout throughout."""
    b, n, d = x.shape
    inner = heads * dim_head
    scale = dim_head**-0.5
    pad = (m - n % m) % m
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    n_pad = n + pad
    qkv = x @ qkv_kernel  # [b, n_pad, 3*inner]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(t):
        return t.reshape(b, n_pad, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    q = q * scale
    l = n_pad // m
    q_l = q.reshape(b, heads, m, l, dim_head).mean(axis=3)
    k_l = k.reshape(b, heads, m, l, dim_head).mean(axis=3)
    sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)
    sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)
    sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)
    a1 = jax.nn.softmax(sim1, -1)
    a2 = jax.nn.softmax(sim2, -1)
    a3 = jax.nn.softmax(sim3, -1)
    a2inv = moore_penrose_pinv(a2, iters)
    out = (a1 @ a2inv) @ (a3 @ v)
    # depthwise conv residual along the sequence per head
    res = jax.lax.conv_general_dilated(
        v, res_kernel, (1, 1),
        ((res_kernel.shape[2] // 2,) * 2, (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=heads,
    )
    out = out + res
    out = out.transpose(0, 2, 1, 3).reshape(b, n_pad, inner)
    out = out @ out_kernel + out_bias
    return out[:, -n:]


@pytest.mark.parametrize("n", [37, 64])
def test_nystrom_module_matches_naive(n):
    dim, heads, dim_head, m = 32, 4, 8, 16
    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m,
        pinv_iterations=6, residual=True, dropout=0.0,
    )
    x = jnp.array(
        np.random.default_rng(0).normal(size=(2, n, dim)).astype(np.float32)
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(params, x))

    p = params["params"]
    want = np.asarray(
        naive_nystrom(
            x,
            jnp.asarray(p["to_qkv"]["kernel"]),
            jnp.asarray(p["to_out"]["kernel"]),
            jnp.asarray(p["to_out"]["bias"]),
            jnp.asarray(p["res_conv_kernel"]),
            heads, dim_head, m, 6,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_and_dense_param_trees_identical():
    """The pallas path's _QKVProjection/_OutProjection must create the exact
    same param tree (paths, shapes, AND init values) as the dense path's
    nn.Dense modules — this is what makes checkpoints portable between
    backends (same scope path -> same RNG fold -> same init draw)."""
    mod_d = NystromAttention(dim=64, dim_head=8, heads=8, num_landmarks=16,
                             use_pallas=False)
    mod_p = NystromAttention(dim=64, dim_head=8, heads=8, num_landmarks=16,
                             use_pallas=True)
    x = jnp.zeros((1, 48, 64), jnp.float32)
    key = jax.random.PRNGKey(7)
    p_d = mod_d.init(key, x)["params"]
    p_p = mod_p.init(key, x)["params"]
    flat_d = dict(jax.tree_util.tree_leaves_with_path(p_d))
    flat_p = dict(jax.tree_util.tree_leaves_with_path(p_p))
    assert flat_d.keys() == flat_p.keys(), (
        set(flat_d) ^ set(flat_p)
    )
    for path, leaf in flat_d.items():
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_p[path]), err_msg=str(path)
        )
