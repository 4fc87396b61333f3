"""Natural-layout fused multi-head attention Pallas kernel for the ViT.

Feat-gen's ViT-B/16 forward (B=512, 197 tokens) spends 74.3 ms of its
213.5 ms batch in the attention core: XLA's bhqk-batched formulation runs
the two small [197, 64] x [64, 197] matmuls at ~12 TFLOP/s effective and
round-trips the [B, 12, 197, 197] fp32 attention matrices through HBM
(attribution: scripts/exp_vit_variants.py v10/v11 probes, BASELINE.md
round-3). Two earlier fused attempts LOST: the per-(batch, head)-program
nystrom kernel (2087 vs 2477 patches/s — 6,144 tiny programs) and
head-major [b*h, n, dh] blocks (7.0 vs 5.5 ms — the XLA-side transposes
cost more than the fusion saves, scripts/exp_vit_attn_kernel.py k1*).

What wins is keeping the residual stream's NATURAL [b, n, d_model] layout
end to end: each program loads a block of images post-qkv-projection and
slices the head columns in VMEM, so XLA never transposes and the attention
matrix never touches HBM. Measured 3.71 ms vs 5.54 ms XLA per attention
call (k3g2), ~22 ms/batch across the 12 blocks.

Inference-only (feature extraction never differentiates — the backbone is
frozen, matching the reference's eval-mode extractors,
/root/reference/tools/feature_generation/gen_patch_feature.py:141-172);
differentiating through ``pallas_call`` without a VJP raises, which is the
intended guard.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(heads: int, dh: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[:, :, sl]  # [gb, n, dh]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        sim = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(sim * scale, axis=-1)  # fp32, VMEM-resident
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def mha_natural(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """softmax(q k^T / sqrt(dh)) v over ``heads`` head-slices of the last dim.

    q, k, v: [b, n, d_model] straight out of the projection GEMMs (no
    reshape/transpose). Softmax statistics in fp32 like the dense path.
    n and d_model ride the block's last-two dims at full size, satisfying
    the TPU (8, 128)-divisible-or-full-size lowering constraint for the
    odd n=197.
    """
    b, n, d = q.shape
    dh = d // heads
    gb = 2 if b % 2 == 0 else 1  # images per program (k3g2 beat k3g1)
    spec = pl.BlockSpec((gb, n, d), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads, dh, dh**-0.5),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b // gb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * dh,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
    )(q, k, v)
