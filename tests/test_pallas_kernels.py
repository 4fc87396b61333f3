"""Pallas fused-attention kernel parity (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mirror_tpu.models import NystromAttention
from mirror_tpu.ops.nystrom_pallas import fused_softmax_attn


def _naive(q, k, w):
    sim = jnp.einsum("bhrd,bhcd->bhrc", q, k).astype(jnp.float32)
    attn = jax.nn.softmax(sim, -1)
    return jnp.einsum("bhrc,bhcd->bhrd", attn, w.astype(jnp.float32))


def test_fused_softmax_attn_forward():
    rng = np.random.default_rng(0)
    b, r, c, h, d = 2, 64, 32, 4, 16
    q = jnp.array(rng.normal(size=(b, h, r, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, h, c, d)).astype(np.float32))
    w = jnp.array(rng.normal(size=(b, h, c, d)).astype(np.float32))
    got = np.asarray(fused_softmax_attn(q, k, w))
    want = np.asarray(_naive(q, k, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_softmax_attn_grad():
    rng = np.random.default_rng(1)
    b, r, c, h, d = 1, 16, 24, 2, 8
    q = jnp.array(rng.normal(size=(b, h, r, d)).astype(np.float32))
    k = jnp.array(rng.normal(size=(b, h, c, d)).astype(np.float32))
    w = jnp.array(rng.normal(size=(b, h, c, d)).astype(np.float32))

    def f_fused(q, k, w):
        return jnp.sum(fused_softmax_attn(q, k, w) ** 2)

    def f_naive(q, k, w):
        return jnp.sum(_naive(q, k, w) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, w)
    g_naive = jax.grad(f_naive, argnums=(0, 1, 2))(q, k, w)
    for gf, gn in zip(g_fused, g_naive):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), rtol=1e-4, atol=1e-4)


def test_nystrom_pallas_matches_dense():
    """The full NystromAttention module: use_pallas=True == dense path."""
    dim, heads, dim_head, m, n = 32, 4, 8, 16, 48
    x = jnp.array(
        np.random.default_rng(2).normal(size=(2, n, dim)).astype(np.float32)
    )
    dense_mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m, dropout=0.0
    )
    pallas_mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m, dropout=0.0,
        use_pallas=True,
    )
    params = dense_mod.init(jax.random.PRNGKey(0), x)
    out_dense = np.asarray(dense_mod.apply(params, x))
    out_pallas = np.asarray(pallas_mod.apply(params, x))
    np.testing.assert_allclose(out_pallas, out_dense, rtol=1e-4, atol=1e-4)

    # gradients agree too
    def loss(mod):
        def f(p):
            return jnp.sum(mod.apply(p, x) ** 2)
        return jax.grad(f)(params)

    gd = loss(dense_mod)
    gp = loss(pallas_mod)
    flat_d = jax.tree_util.tree_leaves(gd)
    flat_p = jax.tree_util.tree_leaves(gp)
    for a, b in zip(flat_d, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_checkpoint_portable_across_backends():
    """Params trained with use_pallas=True must load into the dense model
    (and vice versa): identical param trees, near-identical outputs."""
    from mirror_tpu.registry import create_model

    kw = dict(wsi_embed_dim=16, rna_embed_dim=32, embed_dim=24, wsi_num_tokens=8,
              rna_mlp_ratio=2.0, num_prototypes=10, style_mlp_hidden_dim=12,
              style_mlp_out_dim=8, style_latent_dim=4)
    m_pallas = create_model("mirror", **kw, use_pallas=True)
    m_dense = create_model("mirror", **kw, use_pallas=False)
    rngs = dict(zip(["params", "dropout", "masking", "style"],
                    jax.random.split(jax.random.PRNGKey(0), 4)))
    wsi = jnp.ones((2, 8, 16))
    rna = jnp.ones((2, 32))
    p1 = m_pallas.init(rngs, wsi, rna, 0.75, 0.75, False)["params"]
    p2 = m_dense.init(rngs, wsi, rna, 0.75, 0.75, False)["params"]
    # identical tree structure and shapes
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert a.shape == b.shape
    # pallas-trained params run through the dense model with matching output
    out_p = m_pallas.apply({"params": p1}, wsi, rna, 0.75, 0.75, True, rngs=rngs)
    out_d = m_dense.apply({"params": p1}, wsi, rna, 0.75, 0.75, True, rngs=rngs)
    np.testing.assert_allclose(
        np.asarray(out_p.wsi_alignment_emb), np.asarray(out_d.wsi_alignment_emb),
        rtol=1e-4, atol=1e-4,
    )


def test_feature_transmil_tiny_slide_grad_parity():
    """Full FeatureTransMIL fwd+bwd on a 9-patch slide, pallas vs dense.

    The pad-free pipeline hands the attention kernels the UNPADDED sequence
    length, so a slide with <= 9 patches (seq 3*3 + 1 = 10) exercises the
    n <= K//2 tap-skip path of the conv-fused backward through the real
    model — both gradient modes."""
    from mirror_tpu.models.transmil import FeatureTransMIL

    x = jnp.array(
        np.random.default_rng(5).normal(size=(2, 9, 16)).astype(np.float32)
    )
    dense = FeatureTransMIL(input_dim=16, embed_dim=32, use_pallas=False)
    params = dense.init(jax.random.PRNGKey(3), x)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, x) ** 2)

    gd = jax.grad(lambda p: loss(dense, p))(params)
    for mode in ("exact", "implicit"):
        pallas = FeatureTransMIL(
            input_dim=16, embed_dim=32, use_pallas=True, pinv_grad=mode
        )
        out_d = np.asarray(dense.apply(params, x))
        out_p = np.asarray(pallas.apply(params, x))
        np.testing.assert_allclose(out_p, out_d, rtol=1e-4, atol=1e-4)
        if mode == "implicit":
            continue  # implicit's gradient deviates by design (PARITY.md)
        gp = jax.grad(lambda p: loss(pallas, p))(params)
        for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gd),
            jax.tree_util.tree_leaves_with_path(gp),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}",
            )
