"""Context-parallel Nystrom attention: exact parity with the single-device
module on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mirror_tpu.models import NystromAttention
from mirror_tpu.parallel.context_parallel import nystrom_attention_cp


def test_cp_matches_single_device():
    dim, heads, dim_head, m = 32, 4, 8, 16
    n = 256  # multiple of m * 8 devices
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))

    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m,
        pinv_iterations=6, dropout=0.0,
    )
    x = jnp.array(
        np.random.default_rng(0).normal(size=(1, n, dim)).astype(np.float32)
    )
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(mod.apply({"params": params}, x))[0]

    got = np.asarray(
        nystrom_attention_cp(
            x[0], params, mesh, axis_name="data",
            dim_head=dim_head, heads=heads, num_landmarks=m,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cp_long_sequence_runs():
    # a "whole-slide" length no single batch entry would usually hold
    dim, heads, dim_head, m = 32, 4, 8, 16
    n = 16 * 8 * 32  # 4096 tokens over 8 chips
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m, dropout=0.0
    )
    x_small = jnp.zeros((1, m, dim))
    params = mod.init(jax.random.PRNGKey(0), x_small)["params"]
    x = jnp.array(
        np.random.default_rng(1).normal(size=(n, dim)).astype(np.float32)
    )
    out = nystrom_attention_cp(
        x, params, mesh, axis_name="data",
        dim_head=dim_head, heads=heads, num_landmarks=m,
    )
    assert out.shape == (n, dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cp_rejects_misaligned_length():
    dim, heads, dim_head, m = 32, 4, 8, 16
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = NystromAttention(dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, m, dim)))["params"]
    with pytest.raises(AssertionError):
        nystrom_attention_cp(
            jnp.zeros((100, dim)), params, mesh, axis_name="data",
            dim_head=dim_head, heads=heads, num_landmarks=m,
        )


def test_cp_alignment_relaxed_to_landmark_multiple():
    """n only needs to be a multiple of m (not m*P): chip boundaries still
    align with whole landmark groups, giving exact single-device parity."""
    dim, heads, dim_head, m = 32, 4, 8, 16
    n = 16 * 9  # multiple of m, NOT of m * 8
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m, dropout=0.0
    )
    x = jnp.array(
        np.random.default_rng(2).normal(size=(1, n, dim)).astype(np.float32)
    )
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(mod.apply({"params": params}, x))[0]
    got = np.asarray(
        nystrom_attention_cp(
            x[0], params, mesh, axis_name="data",
            dim_head=dim_head, heads=heads, num_landmarks=m,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cp_gradient_parity():
    """The CP path is differentiable (shard_map collectives transpose), and
    its gradients match the single-device module's (VERDICT r1 item 6)."""
    dim, heads, dim_head, m = 32, 4, 8, 16
    n = 128
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = NystromAttention(
        dim=dim, dim_head=dim_head, heads=heads, num_landmarks=m, dropout=0.0
    )
    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(1, n, dim)).astype(np.float32))
    t = jnp.array(rng.normal(size=(n, dim)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    def loss_single(params, x):
        return jnp.sum(mod.apply({"params": params}, x)[0] * t)

    def loss_cp(params, x):
        out = nystrom_attention_cp(
            x[0], params, mesh, axis_name="data",
            dim_head=dim_head, heads=heads, num_landmarks=m,
        )
        return jnp.sum(out * t)

    gp_s, gx_s = jax.grad(loss_single, argnums=(0, 1))(params, x)
    gp_c, gx_c = jax.grad(loss_cp, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gx_c), np.asarray(gx_s), rtol=5e-4, atol=5e-4
    )
    flat_s = jax.tree_util.tree_leaves_with_path(gp_s)
    flat_c = dict(jax.tree_util.tree_leaves_with_path(gp_c))
    for path, leaf_s in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_c[path]), np.asarray(leaf_s),
            rtol=5e-4, atol=5e-4, err_msg=str(path),
        )


def test_whole_slide_encoder_matches_transmil():
    """transmil_encode_cp == FeatureTransMIL.encode on every token (cls +
    grid), for a token count that isn't square or landmark-aligned."""
    from mirror_tpu.models.transmil import FeatureTransMIL
    from mirror_tpu.parallel.context_parallel import transmil_encode_cp

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = FeatureTransMIL(input_dim=24, embed_dim=32)
    rng = np.random.default_rng(4)
    tokens = jnp.array(rng.normal(size=(1, 50, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), tokens)["params"]
    want, add = mod.apply({"params": params}, tokens, True, method="encode")
    got = transmil_encode_cp(params, tokens[0], mesh, axis_name="data")
    assert got.shape == want[0].shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[0]), rtol=5e-4, atol=5e-4
    )


def test_wrap_pad_square_is_exact_and_buckets_by_side():
    """Host-side wrap_pad_square == the encoder's internal wrap pad (same
    math; outputs agree to float tolerance — XLA tiles the fc1 GEMM
    differently for the padded row count), and slides sharing ceil(sqrt(n))
    map to ONE padded shape (the jit-cache bucketing predict/encode_slide
    rely on)."""
    from mirror_tpu.models.transmil import FeatureTransMIL
    from mirror_tpu.parallel.context_parallel import (
        transmil_encode_cp,
        wrap_pad_square,
    )

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = FeatureTransMIL(input_dim=24, embed_dim=32)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 24)))["params"]
    rng = np.random.default_rng(7)
    for n in (50, 61, 64):  # side 8: pad of 14 / 3 / none
        tokens = rng.normal(size=(n, 24)).astype(np.float32)
        padded = wrap_pad_square(tokens)
        assert padded.shape == (64, 24)
        raw = transmil_encode_cp(params, jnp.asarray(tokens), mesh)
        pre = transmil_encode_cp(params, jnp.asarray(padded), mesh)
        np.testing.assert_allclose(
            np.asarray(raw), np.asarray(pre), rtol=5e-4, atol=5e-5
        )
    # tiny-n edge: add == n (wrap repeats the whole slide)
    two = rng.normal(size=(2, 24)).astype(np.float32)
    np.testing.assert_array_equal(
        wrap_pad_square(two), np.concatenate([two, two], axis=0)
    )


def test_whole_slide_encoder_long_sequence():
    from mirror_tpu.models.transmil import FeatureTransMIL
    from mirror_tpu.parallel.context_parallel import transmil_encode_cp

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8, 1), ("data", "model"))
    mod = FeatureTransMIL(input_dim=24, embed_dim=32)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 24)))["params"]
    tokens = jnp.array(
        np.random.default_rng(5).normal(size=(5000, 24)).astype(np.float32)
    )
    out = transmil_encode_cp(params, tokens, mesh, axis_name="data")
    side = 71  # ceil(sqrt(5000))
    assert out.shape == (side * side + 1, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_encode_slide_cli(tmp_path):
    """End-to-end whole-slide encoder tool: features dir + checkpoint in ->
    per-slide embedding files out."""
    from mirror_tpu.models.transmil import FeatureTransMIL
    from mirror_tpu.tools import encode_slide
    from mirror_tpu.train.checkpoint import save_checkpoint_file

    mod = FeatureTransMIL(input_dim=24, embed_dim=32)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 24)))["params"]
    ckpt = tmp_path / "wsi_model.msgpack"
    save_checkpoint_file(str(ckpt), {"state_dict": jax.tree.map(np.asarray, params)})

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(6)
    for i, n in enumerate([40, 75]):
        np.save(feat_dir / f"TCGA-XX-{i:04d}-01Z-00-DX1.npy",
                rng.normal(size=(n, 24)).astype(np.float32))
    out_dir = tmp_path / "emb"
    encode_slide.main([
        "--wsi-feature-dir", str(feat_dir),
        "--checkpoint", str(ckpt),
        "--output", str(out_dir),
    ])
    outs = sorted(out_dir.glob("*.npy"))
    assert len(outs) == 2
    for o in outs:
        emb = np.load(o)
        assert emb.shape == (32,)
        assert np.all(np.isfinite(emb))
