"""Context-parallel (sequence-parallel) Nystrom attention.

A new TPU capability beyond the reference: the reference *avoids* long WSI
sequences by subsampling 2048 patch tokens per slide
(datasets/dataset_pretrain.py:157-161) because a GPU must hold the whole
sequence. Here the patch-token axis is sharded across chips so a whole slide
(tens of thousands of patches) can be encoded with no subsampling
(SURVEY.md section 5.7).

Nystrom attention decomposes cleanly under token sharding:

- qkv / output projections are pointwise over tokens -> local;
- landmarks are means over contiguous token groups; with ``m % P == 0``
  each chip reduces its own groups and one small all_gather ([m, dh] per
  head) replicates them — this rides ICI, not the full sequence;
- ``attn3 @ v`` is a row softmax over the FULL sequence: computed flash-
  style with a global max (pmax) and sum/value psum over the axis — exact,
  not approximate;
- ``attn2`` and its Moore-Penrose pseudo-inverse involve only landmarks ->
  replicated compute;
- ``attn1 @ (pinv @ r3)`` is row-local (softmax over the m landmarks);
- the depthwise value-conv residual (kernel 33 along the sequence) needs a
  16-token halo exchange with ring neighbors (ppermute).

``nystrom_attention_cp`` computes the attention core for token-sharded
q/k/v inside ``shard_map``; ``NystromAttention`` params are reused as-is.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mirror_tpu.models.nystrom import moore_penrose_pinv


def _halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Concatenate each chip's sequence block with `halo` tokens from its
    ring neighbors (zeros at the global edges). x: [n_loc, ...]."""
    axis_size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # our left halo is the PREVIOUS chip's tail; the right halo is the NEXT
    # chip's head; global edges are zero-padded like torch Conv2d padding
    prev_tail = jax.lax.ppermute(
        x[-halo:], axis_name,
        [(i, (i + 1) % axis_size) for i in range(axis_size)],
    )
    next_head = jax.lax.ppermute(
        x[:halo], axis_name,
        [(i, (i - 1) % axis_size) for i in range(axis_size)],
    )
    zeros = jnp.zeros_like(prev_tail)
    left = jnp.where(idx == 0, zeros, prev_tail)
    right = jnp.where(idx == axis_size - 1, zeros, next_head)
    return jnp.concatenate([left, x, right], axis=0)


def _cp_core(q, k, v, res_kernel, num_landmarks, pinv_iterations, axis_name):
    """Per-shard Nystrom attention core. q/k/v: [n_loc, h, dh] token-sharded;
    returns [n_loc, h, dh]. q must already be scaled by dh**-0.5."""
    n_loc, h, dh = q.shape
    p_size = jax.lax.psum(1, axis_name)
    m = num_landmarks
    m_loc = m // p_size
    l = n_loc // m_loc  # tokens per landmark group

    # local landmark means, then replicate via all_gather (tiny: [m, h, dh])
    q_l_loc = jnp.mean(q.reshape(m_loc, l, h, dh), axis=1)
    k_l_loc = jnp.mean(k.reshape(m_loc, l, h, dh), axis=1)
    q_l = jax.lax.all_gather(q_l_loc, axis_name, tiled=True)  # [m, h, dh]
    k_l = jax.lax.all_gather(k_l_loc, axis_name, tiled=True)

    # attn2^+ : replicated landmark-only compute
    sim2 = jnp.einsum("ihd,jhd->hij", q_l, k_l, preferred_element_type=jnp.float32)
    attn2 = jax.nn.softmax(sim2, axis=-1).astype(q.dtype)
    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations)

    # r3 = softmax(q_l k^T over the FULL n) @ v  — distributed exact softmax
    sim3 = jnp.einsum("ihd,jhd->hij", q_l, k, preferred_element_type=jnp.float32)
    # global max = max over the all_gathered per-chip maxes ([P, h, m],
    # tiny). all_gather is differentiable (pmax has no AD rules at all);
    # the stop_gradient is exact — the max is only a stability shift and
    # softmax is shift-invariant, so its gradient contribution cancels.
    local_max = jnp.max(sim3, axis=-1)  # [h, m]
    gmax = jax.lax.stop_gradient(
        jnp.max(jax.lax.all_gather(local_max, axis_name), axis=0)
    )  # [h, m]
    e = jnp.exp(sim3 - gmax[..., None])
    denom = jax.lax.psum(jnp.sum(e, axis=-1), axis_name)  # [h, m]
    numer = jax.lax.psum(
        jnp.einsum("hij,jhd->hid", e.astype(v.dtype), v), axis_name
    )  # [h, m, dh]
    r3 = numer / denom[..., None].astype(v.dtype)

    w = attn2_inv @ r3  # [h, m, dh]

    # attn1: softmax over landmarks (local rows)
    sim1 = jnp.einsum("ihd,jhd->hij", q, k_l, preferred_element_type=jnp.float32)
    attn1 = jax.nn.softmax(sim1, axis=-1).astype(w.dtype)
    out = jnp.einsum("hij,hjd->ihd", attn1, w)  # [n_loc, h, dh]

    # depthwise conv residual. Normal (whole-slide) case: a ring halo
    # exchange of K//2 tokens. Degenerate case n_loc < halo (tiny shards):
    # gather the full value sequence, conv locally, keep our block.
    K = res_kernel.shape[2]
    halo = K // 2
    if n_loc >= halo:
        v_ext = _halo_exchange(v, halo, axis_name)  # [n_loc + 2*halo, h, dh]
        res = jax.lax.conv_general_dilated(
            v_ext[None].transpose(0, 2, 1, 3).astype(jnp.float32),
            res_kernel.astype(jnp.float32),
            (1, 1), ((0, 0), (0, 0)),  # VALID: halos supply the context
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=h,
        )[0].transpose(1, 0, 2).astype(out.dtype)
    else:
        v_full = jax.lax.all_gather(v, axis_name, tiled=True)  # [n, h, dh]
        res_full = jax.lax.conv_general_dilated(
            v_full[None].transpose(0, 2, 1, 3).astype(jnp.float32),
            res_kernel.astype(jnp.float32),
            (1, 1), ((halo, halo), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=h,
        )[0].transpose(1, 0, 2).astype(out.dtype)
        idx = jax.lax.axis_index(axis_name)
        res = jax.lax.dynamic_slice_in_dim(res_full, idx * n_loc, n_loc, 0)
    return out + res


def nystrom_attention_cp(
    x: jax.Array,
    params: dict,
    mesh: Mesh,
    axis_name: str = "data",
    dim_head: Optional[int] = None,
    heads: int = 8,
    num_landmarks: int = 256,
    pinv_iterations: int = 6,
    dtype=jnp.float32,
) -> jax.Array:
    """Context-parallel NystromAttention forward for ONE long sequence.

    x: [n, dim] patch tokens (n padded by the caller to a multiple of
    num_landmarks * axis_size); ``params`` is a NystromAttention param dict
    (to_qkv/to_out/res_conv_kernel). Dropout-free (inference / whole-slide
    encoding path).
    """
    n, d = x.shape
    p_size = mesh.shape[axis_name]
    dim_head = dim_head or d // heads
    inner = heads * dim_head
    # n % m == 0 and P | m imply P | n and chip boundaries align with whole
    # landmark groups — so CP uses the SAME padding/grouping as the
    # single-device NystromAttention and the outputs match exactly.
    assert n % num_landmarks == 0, (
        f"sequence {n} must be a multiple of num_landmarks ({num_landmarks})"
    )
    assert num_landmarks % p_size == 0

    qkv_kernel = params["to_qkv"]["kernel"].astype(dtype)
    out_kernel = params["to_out"]["kernel"].astype(dtype)
    out_bias = params["to_out"]["bias"].astype(dtype)
    res_kernel = params["res_conv_kernel"]
    scale = dim_head**-0.5

    def shard_fn(x_loc):
        qkv = x_loc.astype(dtype) @ qkv_kernel  # [n_loc, 3*inner]
        n_loc = qkv.shape[0]
        q = qkv[:, :inner].reshape(n_loc, heads, dim_head) * scale
        k = qkv[:, inner : 2 * inner].reshape(n_loc, heads, dim_head)
        v = qkv[:, 2 * inner :].reshape(n_loc, heads, dim_head)
        out = _cp_core(
            q, k, v, res_kernel, num_landmarks, pinv_iterations, axis_name
        )
        out = out.reshape(n_loc, inner) @ out_kernel + out_bias
        return out

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(axis_name)))
    return fn(x)


# ---------------------------------------------------------------------------
# Whole-slide TransMIL encoding (the user-facing capability): run the FULL
# FeatureTransMIL encoder over every patch of a slide — no 2048-token
# subsampling (the reference's cap, datasets/dataset_pretrain.py:157-161) —
# with the token axis sharded across chips. The attention core runs in
# shard_map (exact distributed softmax above); the pointwise pieces (fc1,
# LayerNorm, PPEG convs) are plain jnp under jit so GSPMD partitions them.
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _ppeg(x, p, side, dtype):
    """PPEG forward from raw flax params (models/transmil.py::PPEG): the
    7/5/3 pyramid merged into ONE 7x7 depthwise conv via the module's own
    merge_ppeg_pyramid helper + identity; cls bypasses."""
    from mirror_tpu.models.transmil import merge_ppeg_pyramid

    cls_t, feat = x[:1], x[1:]
    c = feat.shape[-1]
    img = feat.reshape(1, side, side, c).astype(dtype)
    k_eff, b_eff = merge_ppeg_pyramid(
        p["proj"]["kernel"], p["proj1"]["kernel"], p["proj2"]["kernel"],
        p["proj"]["bias"], p["proj1"]["bias"], p["proj2"]["bias"],
    )
    k_eff = k_eff.astype(dtype)
    b_eff = b_eff.astype(dtype)
    out = img + b_eff + jax.lax.conv_general_dilated(
        img, k_eff, (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.concatenate([cls_t, out.reshape(side * side, c).astype(x.dtype)], axis=0)


def wrap_pad_square(tokens):
    """Host-side TransMIL wrap pad: extend [n, D] raw patch features to the
    next square count side^2 (side = ceil(sqrt(n))) by repeating the leading
    rows — the reference's wrap pad (ref models/mirror.py:357-361).

    fc1 is row-wise, so padding RAW tokens computes the same values as the
    encoder's internal wrap pad of fc1 outputs (equal to float tolerance —
    XLA tiles the fc1 GEMM by the padded row count). Doing it host-side
    keys jit caches by ceil(sqrt(n)) instead of raw n: a cohort's
    whole-slide encode compiles one program per distinct SQUARE (at most
    ~sqrt(n_max) programs) instead of one per distinct patch count.
    """
    import math as _math

    import numpy as _np

    tokens = _np.asarray(tokens)
    n = tokens.shape[0]
    side = int(_math.ceil(_math.sqrt(n)))
    add = side * side - n
    if add == 0:
        return tokens
    return _np.concatenate([tokens, tokens[:add]], axis=0)


def transmil_encode_cp(
    params: dict,
    tokens: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    heads: int = 8,
    pinv_iterations: int = 6,
    dtype=jnp.float32,
) -> jax.Array:
    """Encode ONE whole slide: tokens [n, input_dim] (ALL patches, any n).

    ``params`` is a FeatureTransMIL(Hybrid) param dict (fc1 / cls_token /
    layer1 / pos_layer / layer2 / norm). Returns the full normed sequence
    [1 + side^2, embed_dim]; row 0 is the cls/slide embedding. Semantics
    match FeatureTransMIL.encode exactly (wrap square pad, ref
    models/mirror.py:357-378), sharded over the mesh's ``axis_name``.
    """
    import math as _math

    fc1_k = params["fc1"]["kernel"].astype(dtype)
    fc1_b = params["fc1"]["bias"].astype(dtype)
    d = fc1_k.shape[1]
    m = d // 2

    h = jax.nn.relu(tokens.astype(dtype) @ fc1_k + fc1_b)
    n = h.shape[0]
    side = int(_math.ceil(_math.sqrt(n)))
    add = side * side - n
    if add > 0:
        h = jnp.concatenate([h, h[:add]], axis=0)  # wrap pad (ref :357-361)
    cls = params["cls_token"][0].astype(dtype)
    x = jnp.concatenate([cls, h], axis=0)  # [side^2 + 1, d]

    def attn_block(x, layer_params):
        y = _layer_norm(x, layer_params["norm"])
        seq = y.shape[0]
        pad = (-seq) % m  # front-pad to a landmark multiple, like the module
        y = jnp.pad(y, ((pad, 0), (0, 0)))
        out = nystrom_attention_cp(
            y, layer_params["attn"], mesh, axis_name=axis_name,
            heads=heads, num_landmarks=m, pinv_iterations=pinv_iterations,
            dtype=dtype,
        )
        return x + out[pad:]

    x = attn_block(x, params["layer1"])
    x = _ppeg(x, params["pos_layer"], side, dtype)
    x = attn_block(x, params["layer2"])
    return _layer_norm(x, params["norm"])
