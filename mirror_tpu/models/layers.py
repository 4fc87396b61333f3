"""Shared transformer building blocks (flax.linen).

These re-create the behavior of the reference's timm-derived layers
(/root/reference/models/mirror.py:50-152) with weight-init parity:

- torch ``nn.Linear``/``nn.Conv2d`` default init is U(-1/sqrt(fan_in), +..)
  for both kernel and bias -> ``torch_default_init`` / ``torch_bias_init``.
- ``trunc_normal_(std=0.02)`` truncates at +-2 sigma, same as
  ``jax.nn.initializers.truncated_normal``.

All modules take a ``dtype`` (compute dtype, bf16 on TPU) while parameters
stay fp32 — the TPU analogue of the reference's AMP-autocast
(/root/reference/train_mirror.py:748-773), without a GradScaler because bf16
has fp32-range exponents.
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_default_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); fan_in = prod(shape[:-1]).

    Equals torch's kaiming_uniform_(a=sqrt(5)) used by nn.Linear/nn.Conv2d
    reset_parameters for any kernel shape whose last axis is the output.
    """
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(std: float = 0.02, a: float = -2.0, b: float = 2.0) -> Callable:
    """timm/torch ``trunc_normal_`` semantics: ``a``/``b`` are ABSOLUTE
    cutoffs (defaults -2.0/2.0 == +-100 sigma at std 0.02 — effectively an
    UNtruncated N(0, std^2), measured std 0.0200 with tails past 0.10).
    NOT ``jax.nn.initializers.truncated_normal``, whose bounds are in sigma
    units (+-2 sigma would hard-cut at +-0.04 and shrink the std to
    0.0176 — a 12%-smaller init scale than the reference)."""

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.truncated_normal(key, a / std, b / std, shape, dtype)
        return (std * x).astype(dtype)

    return init


def normal_init(std: float = 0.02) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def scaled_init(base: Callable, scale: float) -> Callable:
    """Post-scale an initializer — the reference's fix_init/``rescale``
    divides proj/fc2 weights by sqrt(2 * layer_id) after init."""

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def dense(
    features: int,
    in_features: int,
    use_bias: bool = True,
    kernel_init: Optional[Callable] = None,
    bias_init: Optional[Callable] = None,
    name: Optional[str] = None,
    dtype=None,
) -> nn.Dense:
    """nn.Dense with torch nn.Linear default initialization.

    When ``kernel_init`` is overridden (e.g. xavier for the hybrid WSI
    encoder, ref models/mirror.py:615-619) the bias defaults to zeros,
    matching the reference's ``_init_weights``.
    """
    if bias_init is None:
        bias_init = (
            jax.nn.initializers.zeros if kernel_init is not None
            else torch_bias_init(in_features)
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=kernel_init or torch_default_init,
        bias_init=bias_init,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


def l2_normalize(x: jax.Array, eps: Optional[float] = None) -> jax.Array:
    """F.normalize(p=2, dim=-1) semantics: x / max(||x||, eps).

    The reference picks eps=1e-6 under fp16 autocast and 1e-12 otherwise
    (models/mirror.py:539); bf16 has fp32 range so 1e-12 is always safe.
    """
    if eps is None:
        eps = 1e-6 if x.dtype == jnp.float16 else 1e-12
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)


def _rbg_bernoulli(key: jax.Array, keep_prob: float, shape) -> jax.Array:
    """Bernoulli(keep_prob) mask from the TPU hardware RNG (XLA RngBitGenerator,
    rbg algorithm) instead of threefry: the counter-based threefry hash costs
    ~14 ms/step of u32[64,2304,768] xor/shift fusions across the three
    attention-dropout sites of the MIRROR train step, while rbg bits stream at
    near memory speed. Deterministic given the key (so a jax.checkpoint replay
    regenerates the identical mask); the mask *values* differ from
    jax.random.bernoulli's — dropout parity with the torch reference is
    statistical either way (SURVEY hard-parts #2)."""
    kd = key if key.dtype == jnp.uint32 else jax.random.key_data(key)
    kd = kd.reshape(-1).astype(jnp.uint32)
    rbg_key = jnp.concatenate([kd, kd])[:4]  # 128-bit key from the 64-bit fold
    _, bits = jax.lax.rng_bit_generator(
        rbg_key, shape, dtype=jnp.uint32,
        algorithm=jax.lax.RandomAlgorithm.RNG_DEFAULT,  # TPU hw generator
    )
    # P(bits < t) = t / 2^32; clamp so a keep_prob that ROUNDS to 1.0
    # (rate < ~1.2e-10) can't wrap uint32 to 0 and invert the mask
    thresh = jnp.uint32(min(int(round(keep_prob * 4294967296.0)), 2**32 - 1))
    return bits < thresh


class RematDropout(nn.Module):
    """nn.Dropout-equivalent whose bernoulli mask is REMATERIALIZED in the
    backward pass via jax.checkpoint instead of being stored: XLA was keeping
    a [b, n_pad, d] pred tensor per dropout site for the backward (7.4 ms of
    fusions + copies per MIRROR train step across the three attention sites).

    On CPU (tests) the mask is bit-identical to nn.Dropout's (same scope path
    -> same make_rng fold -> same threefry bits); on TPU the bits come from
    the hardware rbg generator instead (see _rbg_bernoulli)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep_prob = 1.0 - self.rate
        use_rbg = jax.default_backend() == "tpu"

        def _drop(x, key):
            if use_rbg:
                mask = _rbg_bernoulli(key, keep_prob, x.shape)
            else:
                mask = jax.random.bernoulli(key, keep_prob, x.shape)
            return jax.lax.select(
                mask, x / jnp.asarray(keep_prob, x.dtype), jnp.zeros_like(x)
            )

        return jax.checkpoint(_drop)(x, rng)


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> act -> drop -> [norm] -> fc2 -> drop.

    The optional mid-norm matters: the reference RNA embedding MLP passes a
    norm layer (models/mirror.py:217-224 via timm Mlp), so the 10k->1536->768
    projection has a LayerNorm after the activation.
    """

    hidden_features: int
    out_features: int
    use_norm: bool = False
    norm_eps: float = 1e-6
    drop: float = 0.0
    fc2_init_scale: float = 1.0  # fix_init rescale (ref models/mirror.py:262-268)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_features = x.shape[-1]
        x = dense(self.hidden_features, in_features, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic, name="drop1")(x)
        if self.use_norm:
            x = nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                name="norm",
            )(x)
        fc2_kernel_init = None
        if self.fc2_init_scale != 1.0:
            fc2_kernel_init = scaled_init(torch_default_init, self.fc2_init_scale)
        x = dense(
            self.out_features, self.hidden_features, kernel_init=fc2_kernel_init,
            bias_init=torch_bias_init(self.hidden_features), name="fc2",
            dtype=self.dtype,
        )(x)
        x = nn.Dropout(self.drop, deterministic=deterministic, name="drop2")(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (timm DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class RnaAttention(nn.Module):
    """Single-vector self-attention with the reference's heads-as-sequence
    quirk (models/mirror.py:50-102).

    Input is [B, D]; qkv reshapes to [B, heads, head_dim] and the softmax
    attention runs over the *heads* axis (12 "tokens" of 64-d for D=768).
    The output merge transposes to [B, head_dim, heads] before flattening —
    a feature-order scramble relative to the qkv split; reproduced exactly.
    """

    num_heads: int = 8
    qkv_bias: bool = False
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    norm_eps: float = 1e-6
    proj_init_scale: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, d = x.shape
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads
        scale = head_dim**-0.5

        qkv = dense(d * 3, d, use_bias=self.qkv_bias, name="qkv", dtype=self.dtype)(x)
        qkv = qkv.reshape(b, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        if self.qk_norm:
            q = nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                name="q_norm",
            )(q)
            k = nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                name="k_norm",
            )(k)

        attn = jnp.einsum("bhd,bgd->bhg", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic, name="attn_dropout")(attn)
        out = jnp.einsum("bhg,bgd->bhd", attn, v)

        # Reference merge: (B, heads, head_dim).transpose(1, 2).reshape(B, D)
        out = jnp.transpose(out, (0, 2, 1)).reshape(b, d)
        proj_kernel_init = None
        if self.proj_init_scale != 1.0:
            proj_kernel_init = scaled_init(torch_default_init, self.proj_init_scale)
        out = dense(
            d, d, kernel_init=proj_kernel_init, bias_init=torch_bias_init(d),
            name="proj", dtype=self.dtype,
        )(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic, name="proj_dropout")(out)
        return out


class LayerScale(nn.Module):
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init_values, jnp.float32), (dim,)
        )
        return x * gamma.astype(x.dtype)


class RnaBlock(nn.Module):
    """Pre-norm transformer block over the single RNA vector
    (models/mirror.py:105-152)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_norm: bool = False
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    rescale_init: float = 1.0  # 1/sqrt(2*layer_id) for retention decoders
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]

        def ln(name):
            return nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )

        y = ln("norm1")(x)
        y = RnaAttention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            norm_eps=self.norm_eps,
            proj_init_scale=self.rescale_init,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic)
        if self.init_values is not None:
            y = LayerScale(self.init_values, name="ls1")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)

        y = ln("norm2")(x)
        y = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            out_features=dim,
            drop=self.proj_drop,
            fc2_init_scale=self.rescale_init,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic)
        if self.init_values is not None:
            y = LayerScale(self.init_values, name="ls2")(y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x
