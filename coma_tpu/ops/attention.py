"""Attention dispatch: Pallas TPU flash attention for long sequences,
plain XLA elsewhere.

The UNet's 64x64-latent self-attention (seq 4096) is the FLOPs hot spot of
the inpainting loop (reference hot loop:
``utils/adaptive_mask_inpainting.py:1001-1017``); on TPU it routes to the
Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu), which keeps
the (L, L) score matrix in VMEM tiles instead of HBM. Short sequences and
CPU runs use the einsum path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v):  # (B, H, L, D)
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_supported(q, k) -> bool:
    if jax.default_backend() == "cpu":
        return False
    Lq, Lk = q.shape[2], k.shape[2]
    D = q.shape[3]
    # The TPU kernel wants block-aligned seq lens and lane-aligned head dim.
    # Measured on v5e: at SD-1.x head dims the lane padding makes flash
    # SLOWER than the XLA einsum path (L=4096 D=40: 17.8 ms vs 7.5 ms;
    # L=1024 D=80: 4.9 ms vs 3.5 ms), so the D % 128 gate is also the
    # performance-correct routing, not just a constraint.
    return Lq == Lk and Lq >= 1024 and Lq % 512 == 0 and D % 128 == 0


def scaled_dot_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, D), softmax(QK^T/sqrt(D))V."""
    if _flash_supported(q, k):
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=False)
    return _xla_attention(q, k, v)
