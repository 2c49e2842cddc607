"""Torch mirrors of the diffusers SD-inpaint UNet / AutoencoderKL.

VERDICT r1 gap #2: ``tests/test_weights.py`` only round-trips naming — it
cannot catch an architectural mismatch vs the real diffusers models the
reference drives (``utils/adaptive_mask_inpainting.py:1001-1017,1086``).
These modules re-implement the diffusers forward semantics in torch with the
EXACT checkpoint state-dict key layout (``down_blocks.{i}.resnets.{j}...``),
so ``convert_unet``/``convert_vae`` consume their ``state_dict()`` exactly
as they would a downloaded ``diffusion_pytorch_model.safetensors``. Written
independently from the diffusers architecture spec — the point is a second
derivation, not a re-export of our flax code.

Semantics mirrored (the bug-prone spots):
- timestep embedding: flip_sin_to_cos=True, downscale_freq_shift=0 -> [cos|sin]
- ResnetBlock2D: norm->silu->conv1 -> +time_emb(silu->linear) -> norm->silu->conv2
- Transformer2DModel: GroupNorm(eps 1e-6) -> 1x1 conv proj_in -> tokens ->
  (attn1 self, attn2 cross, GEGLU ff with EXACT erf gelu) -> proj_out + residual
- attention scale 1/sqrt(head_dim); SD-1.x attention_head_dim=8 == num heads
- UNet downsample: stride-2 conv pad 1; VAE downsample: (0,1,0,1) pad, valid conv
- upsample: nearest 2x -> conv
- VAE mid attention: single head over channels, scale 1/sqrt(C)
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- shared ----

def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    # flip_sin_to_cos=True
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=False)
        self.to_k = nn.Linear(context_dim, query_dim, bias=False)
        self.to_v = nn.Linear(context_dim, query_dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        B, Lq, C = x.shape
        h, d = self.heads, C // self.heads
        q = self.to_q(x).view(B, Lq, h, d).transpose(1, 2)
        k = self.to_k(context).view(B, -1, h, d).transpose(1, 2)
        v = self.to_v(context).view(B, -1, h, d).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(d)
        out = torch.matmul(scores.softmax(dim=-1), v)
        out = out.transpose(1, 2).reshape(B, Lq, C)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact erf gelu


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * 4), nn.Dropout(0.0), nn.Linear(dim * 4, dim)]
        )

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, context_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, channels, context_dim, heads, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, context_dim, heads)]
        )
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, context):
        B, C, H, W = x.shape
        residual = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, context)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + residual


class Downsample2D(nn.Module):
    def __init__(self, ch, vae=False):
        super().__init__()
        self.vae = vae
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0 if vae else 1)

    def forward(self, x):
        if self.vae:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# ----------------------------------------------------------------- UNet ----

class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, layers, attn, ctx, heads, groups,
                 downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_dim, groups)
             for j in range(layers)]
        )
        if attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, ctx, heads, groups) for _ in range(layers)]
            )
        if downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])

    def forward(self, h, temb, context, skips):
        for j, res in enumerate(self.resnets):
            h = res(h, temb)
            if hasattr(self, "attentions"):
                h = self.attentions[j](h, context)
            skips.append(h)
        if hasattr(self, "downsamplers"):
            h = self.downsamplers[0](h)
            skips.append(h)
        return h


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_dim, ctx, heads, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_dim, groups) for _ in range(2)]
        )
        self.attentions = nn.ModuleList([Transformer2DModel(ch, ctx, heads, groups)])

    def forward(self, h, temb, context):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, context)
        return self.resnets[1](h, temb)


class _UpBlock(nn.Module):
    def __init__(self, prev_ch, skip_chs, out_ch, temb_dim, attn, ctx, heads,
                 groups, upsample):
        super().__init__()
        resnets = []
        in_ch = prev_ch
        for skip in skip_chs:
            resnets.append(ResnetBlock2D(in_ch + skip, out_ch, temb_dim, groups))
            in_ch = out_ch
        self.resnets = nn.ModuleList(resnets)
        if attn:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, ctx, heads, groups)
                 for _ in range(len(skip_chs))]
            )
        if upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])

    def forward(self, h, temb, context, skips):
        for j, res in enumerate(self.resnets):
            h = torch.cat([h, skips.pop()], dim=1)
            h = res(h, temb)
            if hasattr(self, "attentions"):
                h = self.attentions[j](h, context)
        if hasattr(self, "upsamplers"):
            h = self.upsamplers[0](h)
        return h


class TimeEmbedding(nn.Module):
    def __init__(self, ch0, temb_dim):
        super().__init__()
        self.linear_1 = nn.Linear(ch0, temb_dim)
        self.linear_2 = nn.Linear(temb_dim, temb_dim)

    def forward(self, emb):
        return self.linear_2(F.silu(self.linear_1(emb)))


class UNetMirror(nn.Module):
    """UNet2DConditionModel mirror (SD-1.x topology, configurable widths)."""

    def __init__(self, in_channels=9, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
                 cross_attention_dim=768, heads=8, groups=32,
                 cross_attn_blocks=(True, True, True, False)):
        super().__init__()
        chs = block_out_channels
        n = len(chs)
        # diffusers SD-2.x: attention_head_dim is a per-block head-count list
        per_block = (tuple(heads) if isinstance(heads, (list, tuple))
                     else (heads,) * n)
        ch0 = chs[0]
        temb_dim = ch0 * 4
        self.ch0 = ch0
        self.conv_in = nn.Conv2d(in_channels, ch0, 3, padding=1)
        self.time_embedding = TimeEmbedding(ch0, temb_dim)

        self.down_blocks = nn.ModuleList()
        skip_chs = [[ch0]]  # per down block: channels pushed onto the skip stack
        in_ch = ch0
        for i, ch in enumerate(chs):
            down = i < n - 1
            self.down_blocks.append(
                _DownBlock(in_ch, ch, temb_dim, layers_per_block,
                           cross_attn_blocks[i], cross_attention_dim,
                           per_block[i], groups, down)
            )
            skip_chs.append([ch] * layers_per_block + ([ch] if down else []))
            in_ch = ch

        self.mid_block = _MidBlock(chs[-1], temb_dim, cross_attention_dim, per_block[-1], groups)

        flat_skips = [c for blk in skip_chs for c in blk]
        self.up_blocks = nn.ModuleList()
        prev = chs[-1]
        for k in range(n):
            i = n - 1 - k  # channel-config index
            pops = [flat_skips.pop() for _ in range(layers_per_block + 1)]
            self.up_blocks.append(
                _UpBlock(prev, pops, chs[i], temb_dim, cross_attn_blocks[i],
                         cross_attention_dim, per_block[i], groups,
                         upsample=i > 0)
            )
            prev = chs[i]

        self.conv_norm_out = nn.GroupNorm(groups, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context):
        temb = self.time_embedding(timestep_embedding(timesteps, self.ch0))
        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            h = blk(h, temb, context, skips)
        h = self.mid_block(h, temb, context)
        for blk in self.up_blocks:
            h = blk(h, temb, context, skips)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ------------------------------------------------------------------ VAE ----

class VAEAttentionMirror(nn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).view(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(C)
        h = torch.matmul(scores.softmax(dim=-1), v)
        h = self.to_out[0](h)
        return x + h.transpose(1, 2).view(B, C, H, W)


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, groups, eps=1e-6) for _ in range(2)]
        )
        self.attentions = nn.ModuleList([VAEAttentionMirror(ch, groups)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, groups, eps=1e-6)
             for j in range(layers)]
        )
        if downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch, vae=True)])

    def forward(self, h):
        for res in self.resnets:
            h = res(h)
        if hasattr(self, "downsamplers"):
            h = self.downsamplers[0](h)
        return h


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, groups, eps=1e-6)
             for j in range(layers + 1)]
        )
        if upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])

    def forward(self, h):
        for res in self.resnets:
            h = res(h)
        if hasattr(self, "upsamplers"):
            h = self.upsamplers[0](h)
        return h


class VAEEncoderMirror(nn.Module):
    def __init__(self, in_channels, chs, layers, groups):
        super().__init__()
        n = len(chs)
        self.conv_in = nn.Conv2d(in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chs[0]
        for i, ch in enumerate(chs):
            self.down_blocks.append(
                _VAEDownBlock(in_ch, ch, layers, groups, downsample=i < n - 1)
            )
            in_ch = ch
        self.mid_block = _VAEMid(chs[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 8, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class VAEDecoderMirror(nn.Module):
    def __init__(self, out_channels, chs, layers, groups, latent=4):
        super().__init__()
        n = len(chs)
        rev = list(reversed(chs))
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = _VAEMid(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        in_ch = rev[0]
        for k, ch in enumerate(rev):
            self.up_blocks.append(
                _VAEUpBlock(in_ch, ch, layers, groups, upsample=k < n - 1)
            )
            in_ch = ch
        self.conv_norm_out = nn.GroupNorm(groups, chs[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[0], out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            h = blk(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class AutoencoderKLMirror(nn.Module):
    """AutoencoderKL mirror: encoder/decoder + quant convs (checkpoint keys
    ``encoder.*``, ``decoder.*``, ``quant_conv``, ``post_quant_conv``)."""

    def __init__(self, in_channels=3, chs=(128, 256, 512, 512),
                 layers_per_block=2, groups=32, latent=4):
        super().__init__()
        self.encoder = VAEEncoderMirror(in_channels, chs, layers_per_block, groups)
        self.decoder = VAEDecoderMirror(in_channels, chs, layers_per_block, groups,
                                        latent)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
