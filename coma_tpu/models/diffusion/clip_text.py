"""CLIP text encoder (ViT-L/14 text tower) in Flax.

Reference parity: the prompt encoder of the SD pipeline
(``utils/adaptive_mask_inpainting.py:_encode_prompt:405``): 77-token causal
transformer, 768 wide, 12 layers, quick-GELU, final layer norm; CFG encodes
the prompt and the empty string. Tokenization uses the standard CLIP BPE
(vocab ships with the model weights; see ``tokenizer.py``).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    # OpenAI CLIP (SD-1.x) uses quick_gelu; OpenCLIP ViT-H (SD-2.x) uses gelu
    hidden_act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32


def sd2_clip_text_config(dtype=jnp.float32) -> CLIPTextConfig:
    """Text encoder of ``stabilityai/stable-diffusion-2-inpainting``: OpenCLIP
    ViT-H trimmed to 23 layers (diffusers ships the penultimate-layer stack),
    hidden 1024, 16 heads, plain gelu."""
    return CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                          hidden_act="gelu", dtype=dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _act(cfg: CLIPTextConfig):
    if cfg.hidden_act == "quick_gelu":
        return quick_gelu
    # HF "gelu" is the exact erf form, not jax.nn.gelu's default tanh approx
    return lambda x: jax.nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        B, L, C = x.shape
        H = cfg.num_heads
        D = C // H
        proj = lambda name: nn.Dense(C, dtype=cfg.dtype, name=name)
        split = lambda a: a.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        q, k, v = split(proj("q_proj")(x)), split(proj("k_proj")(x)), split(proj("v_proj")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D).astype(x.dtype)
        scores = scores + mask  # causal
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return proj("out_proj")(out.transpose(0, 2, 1, 3).reshape(B, L, C))


class CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        x = x + CLIPAttention(cfg, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x), mask
        )
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(cfg.hidden_size * 4, dtype=cfg.dtype, name="fc1")(h)
        h = _act(cfg)(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Token ids (B, 77) -> last hidden states (B, 77, 768)."""

    config: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        B, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
            cfg.dtype,
        )
        x = tok + pos[None, :L]
        causal = jnp.triu(
            jnp.full((L, L), jnp.finfo(cfg.dtype).min, dtype=cfg.dtype), k=1
        )[None, None]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, name=f"layer_{i}")(x, causal)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


def tiny_clip_config(dtype=jnp.float32) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4, dtype=dtype
    )
