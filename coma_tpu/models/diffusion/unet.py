"""Stable-Diffusion UNet (UNet2DConditionModel) in Flax, NHWC.

Reference parity: the 9-channel SD-inpainting UNet driven by
``utils/adaptive_mask_inpainting.py:1001-1017`` (via HF diffusers). This is a
ground-up flax.linen implementation in TPU-native NHWC layout (diffusers is
NCHW; the weight loader in ``weights.py`` transposes). Architecture follows
the SD-1.x config: block_out_channels (320, 640, 1280, 1280), 2 layers per
down block, cross-attention dim 768, 8 heads, GEGLU feed-forwards.

Attention runs through :func:`coma_tpu.ops.attention.scaled_dot_attention`,
which dispatches to the Pallas TPU flash-attention kernel for long
self-attention sequences and to plain XLA otherwise.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from coma_tpu.ops.attention import scaled_dot_attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9           # 4 latent + 1 mask + 4 masked-image latents
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8    # SD-1.x: number of heads (naming quirk kept)
    # SD-2.x: diffusers stores per-block HEAD COUNTS (e.g. (5, 10, 20, 20));
    # when set this overrides attention_head_dim
    heads_per_block: Optional[Tuple[int, ...]] = None
    norm_num_groups: int = 32
    # which down/up blocks carry cross-attention (SD-1.x: all but the last down)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    dtype: jnp.dtype = jnp.float32

    @property
    def num_heads(self) -> int:
        return self.attention_head_dim

    def heads_for(self, block_index: Optional[int]) -> int:
        """Head count for the attention blocks of down/up block
        ``block_index`` (``None`` = the mid block, which diffusers runs at
        the deepest block's head count).

        SD-1.x checkpoints use one global head count; SD-2.x stores
        per-block counts (``unet/config.json``'s ``attention_head_dim``
        list, e.g. ``(5, 10, 20, 20)``)."""
        if self.heads_per_block is None:
            return self.attention_head_dim
        return self.heads_per_block[-1 if block_index is None else block_index]


def sd2_inpaint_unet_config(dtype=jnp.bfloat16) -> UNetConfig:
    """UNet config of ``stabilityai/stable-diffusion-2-inpainting`` — the
    reference's default inpainting checkpoint
    (``constants/generation/inpaint_ldm.py:4-15``): OpenCLIP conditioning
    (cross-dim 1024) and 64-wide heads -> (5, 10, 20, 20) per block."""
    return UNetConfig(cross_attention_dim=1024,
                      heads_per_block=(5, 10, 20, 20), dtype=dtype)


def timestep_embedding(t: jax.Array, dim: int, dtype=jnp.float32) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding:
    flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1).astype(dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    config: UNetConfig

    @nn.compact
    def __call__(self, x, temb):
        cfg = self.config
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=cfg.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=cfg.dtype, name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    query_dim: int
    heads: int
    config: UNetConfig
    context_dim: Optional[int] = None  # None -> self-attention

    @nn.compact
    def __call__(self, x, context=None):
        cfg = self.config
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="to_v")(context)
        B, Lq = q.shape[:2]
        Lk = k.shape[1]
        split = lambda a, L: a.reshape(B, L, self.heads, head_dim).transpose(0, 2, 1, 3)
        out = scaled_dot_attention(split(q, Lq), split(k, Lk), split(v, Lk))
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, inner)
        return nn.Dense(inner, dtype=cfg.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    config: UNetConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 8, dtype=self.config.dtype, name="proj_in")(x)
        a, b = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: diffusers' GEGLU uses F.gelu's default, not the
        # tanh approximation (flax's default) — ~1e-3 drift at SD widths
        return nn.Dense(self.dim, dtype=self.config.dtype, name="proj_out")(
            a * nn.gelu(b, approximate=False)
        )


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    config: UNetConfig

    @nn.compact
    def __call__(self, x, context):
        cfg = self.config
        x = x + Attention(self.dim, self.heads, cfg, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        )
        x = x + Attention(self.dim, self.heads, cfg, context_dim=cfg.cross_attention_dim, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context
        )
        x = x + GEGLUFeedForward(self.dim, cfg, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    channels: int
    config: UNetConfig
    block: Optional[int] = None   # down/up block index (None = mid block)

    @nn.compact
    def __call__(self, x, context):
        cfg = self.config
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="norm")(x)
        h = nn.Conv(self.channels, (1, 1), dtype=cfg.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, self.channels)
        h = TransformerBlock(self.channels, cfg.heads_for(self.block), cfg,
                             name="block0")(h, context)
        h = h.reshape(B, H, W, self.channels)
        h = nn.Conv(self.channels, (1, 1), dtype=cfg.dtype, name="proj_out")(h)
        return h + residual


class Downsample(nn.Module):
    channels: int
    config: UNetConfig

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=1, dtype=self.config.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    channels: int
    config: UNetConfig

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.config.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    """The full conditioned UNet. Input NHWC latents (B, h, w, in_channels),
    timesteps (B,), context (B, 77, 768); output (B, h, w, 4)."""

    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, sample, timesteps, context):
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        temb = timestep_embedding(timesteps, ch0, cfg.dtype)
        temb = nn.Dense(temb_dim, dtype=cfg.dtype, name="time_embed_0")(temb)
        temb = nn.Dense(temb_dim, dtype=cfg.dtype, name="time_embed_2")(nn.silu(temb))

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(sample)

        # --- down blocks ---
        skips = [h]
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg, name=f"down_{i}_res_{j}")(h, temb)
                if cfg.cross_attn_blocks[i]:
                    h = SpatialTransformer(ch, cfg, block=i, name=f"down_{i}_attn_{j}")(h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, cfg, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock(mid_ch, cfg, name="mid_res_0")(h, temb)
        h = SpatialTransformer(mid_ch, cfg, name="mid_attn")(h, context)
        h = ResnetBlock(mid_ch, cfg, name="mid_res_1")(h, temb)

        # --- up blocks (reversed; layers_per_block + 1 resnets each) ---
        for i, ch in list(enumerate(cfg.block_out_channels))[::-1]:
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, cfg, name=f"up_{i}_res_{j}")(h, temb)
                if cfg.cross_attn_blocks[i]:
                    h = SpatialTransformer(ch, cfg, block=i, name=f"up_{i}_attn_{j}")(h, context)
            if i > 0:
                h = Upsample(ch, cfg, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(h)


def tiny_unet_config(dtype=jnp.float32) -> UNetConfig:
    """A miniature config for tests / CI (same topology, ~1000x fewer params)."""
    return UNetConfig(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=2,
        norm_num_groups=8,
        dtype=dtype,
    )
