"""MIRROR-TPU: a TPU-native JAX/Pallas framework for multi-modal pathological
self-supervised representation learning.

A from-scratch rebuild of the capabilities of TianyiFranklinWang/MIRROR
(IEEE TMI 2025, arXiv:2503.00374) designed TPU-first:

- models are pure-functional flax.linen modules compiled once under ``jax.jit``
- mixed precision is bf16-compute / fp32-params (no GradScaler needed on TPU)
- data parallelism is SPMD over a ``jax.sharding.Mesh`` (XLA emits ICI
  collectives from sharding annotations; no NCCL/DDP process groups)
- the hot attention op (Nystrom attention over 2k+ patch tokens) has a fused
  Pallas TPU kernel with a dense jnp reference implementation for parity
- all mutable-state hacks of the reference (per-step prototype renorm,
  logit-scale clamping, EMA) live *inside* the jitted train step as pure
  functional updates

Reference layer map: /root/repo/SURVEY.md
"""

__version__ = "0.1.0"
