"""AutoencoderKL (SD VAE) in Flax, NHWC.

Reference parity: the VAE used by the adaptive-mask pipeline for latent
encode/decode — including the ~21 in-loop decodes of the predicted x̂0 and
the mask-latent re-encodes (``utils/adaptive_mask_inpainting.py:1028-1155``).
SD-1.x config: 4 latent channels, block_out_channels (128, 256, 512, 512),
2 layers per block, mid-block self-attention, scaling factor 0.18215.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from coma_tpu.ops.attention import scaled_dot_attention

SD_VAE_SCALING = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SD_VAE_SCALING
    dtype: jnp.dtype = jnp.float32


class VAEResnet(nn.Module):
    out_channels: int
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=cfg.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        B, H, W, C = x.shape
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=cfg.dtype, name="to_q")(h)[:, None]  # 1 head
        k = nn.Dense(C, dtype=cfg.dtype, name="to_k")(h)[:, None]
        v = nn.Dense(C, dtype=cfg.dtype, name="to_v")(h)[:, None]
        out = scaled_dot_attention(q, k, v)[:, 0]
        out = nn.Dense(C, dtype=cfg.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, cfg, name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers downsampler: asymmetric (0,1) pad + valid stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=2, padding="VALID", dtype=cfg.dtype,
                    name=f"down_{i}_downsample",
                )(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, cfg, name="mid_res_0")(h)
        h = VAEAttention(ch, cfg, name="mid_attn")(h)
        h = VAEResnet(ch, cfg, name="mid_res_1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype, name="quant_conv")(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        h = nn.Conv(cfg.latent_channels, (1, 1), dtype=cfg.dtype, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(h)
        h = VAEResnet(ch, cfg, name="mid_res_0")(h)
        h = VAEAttention(ch, cfg, name="mid_attn")(h)
        h = VAEResnet(ch, cfg, name="mid_res_1")(h)
        for i, ch in list(enumerate(cfg.block_out_channels))[::-1]:
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, cfg, name=f"up_{i}_res_{j}")(h)
            if i > 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(h)


def sample_latents(moments: jax.Array, rng: jax.Array, scaling: float) -> jax.Array:
    """DiagonalGaussian sample from encoder moments (mean ‖ logvar), scaled."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return (mean + std * jax.random.normal(rng, mean.shape, mean.dtype)) * scaling


def tiny_vae_config(dtype=jnp.float32) -> VAEConfig:
    return VAEConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        norm_num_groups=8, dtype=dtype,
    )
