"""Diffusers-checkpoint -> Flax parameter mapping.

Loads a standard diffusers SD-inpainting checkpoint directory (the exact
artifacts the reference pulls from HF, ``constants/generation/inpaint_ldm.py``:
``unet/diffusion_pytorch_model.safetensors``, ``vae/...``,
``text_encoder/model.safetensors``, ``tokenizer/{vocab.json,merges.txt}``)
into the parameter pytrees of our NHWC Flax models.

Conversions: torch Conv (O, I, kh, kw) -> flax (kh, kw, I, O); Linear
(O, I) -> (I, O); norms map directly. Up-block index k in diffusers
corresponds to our ``up_{N-1-k}`` (we iterate channel configs in reverse).
Missing keys raise immediately — a loud fidelity check against silent
architecture drift.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax.numpy as jnp


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as fh:
        for key in fh.keys():
            out[key] = fh.get_tensor(key)
    return out


def _conv(sd, name, dtype):
    w = np.asarray(sd[f"{name}.weight"])
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype=dtype),
        "bias": jnp.asarray(sd[f"{name}.bias"], dtype=dtype),
    }


def _dense(sd, name, dtype, bias=True):
    out = {"kernel": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T, dtype=dtype)}
    if bias:
        out["bias"] = jnp.asarray(sd[f"{name}.bias"], dtype=dtype)
    return out


def _norm(sd, name, dtype):
    return {
        "scale": jnp.asarray(sd[f"{name}.weight"], dtype=dtype),
        "bias": jnp.asarray(sd[f"{name}.bias"], dtype=dtype),
    }


# ---------------------------------------------------------------- UNet ----

def _attention(sd, prefix, dtype):
    return {
        "to_q": _dense(sd, f"{prefix}.to_q", dtype, bias=False),
        "to_k": _dense(sd, f"{prefix}.to_k", dtype, bias=False),
        "to_v": _dense(sd, f"{prefix}.to_v", dtype, bias=False),
        "to_out": _dense(sd, f"{prefix}.to_out.0", dtype),
    }


def _transformer(sd, prefix, dtype):
    tb = f"{prefix}.transformer_blocks.0"
    return {
        "norm": _norm(sd, f"{prefix}.norm", dtype),
        "proj_in": _conv(sd, f"{prefix}.proj_in", dtype),
        "proj_out": _conv(sd, f"{prefix}.proj_out", dtype),
        "block0": {
            "norm1": _norm(sd, f"{tb}.norm1", dtype),
            "attn1": _attention(sd, f"{tb}.attn1", dtype),
            "norm2": _norm(sd, f"{tb}.norm2", dtype),
            "attn2": _attention(sd, f"{tb}.attn2", dtype),
            "norm3": _norm(sd, f"{tb}.norm3", dtype),
            "ff": {
                "proj_in": _dense(sd, f"{tb}.ff.net.0.proj", dtype),
                "proj_out": _dense(sd, f"{tb}.ff.net.2", dtype),
            },
        },
    }


def _resnet(sd, prefix, dtype):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1", dtype),
        "conv1": _conv(sd, f"{prefix}.conv1", dtype),
        "time_emb_proj": _dense(sd, f"{prefix}.time_emb_proj", dtype),
        "norm2": _norm(sd, f"{prefix}.norm2", dtype),
        "conv2": _conv(sd, f"{prefix}.conv2", dtype),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut", dtype)
    return out


def convert_unet(sd: Dict[str, np.ndarray], config=None, dtype=jnp.bfloat16):
    """diffusers UNet2DConditionModel state dict -> our UNet2DCondition params."""
    from coma_tpu.models.diffusion.unet import UNetConfig

    cfg = config or UNetConfig()
    n_blocks = len(cfg.block_out_channels)
    params = {
        "conv_in": _conv(sd, "conv_in", dtype),
        "time_embed_0": _dense(sd, "time_embedding.linear_1", dtype),
        "time_embed_2": _dense(sd, "time_embedding.linear_2", dtype),
        "conv_norm_out": _norm(sd, "conv_norm_out", dtype),
        "conv_out": _conv(sd, "conv_out", dtype),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0", dtype),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1", dtype),
        "mid_attn": _transformer(sd, "mid_block.attentions.0", dtype),
    }
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}", dtype)
            if cfg.cross_attn_blocks[i]:
                params[f"down_{i}_attn_{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", dtype
                )
        if i < n_blocks - 1:
            params[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", dtype)
            }
    for k in range(n_blocks):  # diffusers up_blocks[k] == our up_{n-1-k}
        ours = n_blocks - 1 - k
        for j in range(cfg.layers_per_block + 1):
            params[f"up_{ours}_res_{j}"] = _resnet(sd, f"up_blocks.{k}.resnets.{j}", dtype)
            if cfg.cross_attn_blocks[ours]:
                params[f"up_{ours}_attn_{j}"] = _transformer(
                    sd, f"up_blocks.{k}.attentions.{j}", dtype
                )
        if ours > 0:
            params[f"up_{ours}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{k}.upsamplers.0.conv", dtype)
            }
    return {"params": params}


# ----------------------------------------------------------------- VAE ----

def _vae_resnet(sd, prefix, dtype):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1", dtype),
        "conv1": _conv(sd, f"{prefix}.conv1", dtype),
        "norm2": _norm(sd, f"{prefix}.norm2", dtype),
        "conv2": _conv(sd, f"{prefix}.conv2", dtype),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut", dtype)
    return out


def _vae_attention(sd, prefix, dtype):
    return {
        "group_norm": _norm(sd, f"{prefix}.group_norm", dtype),
        "to_q": _dense(sd, f"{prefix}.to_q", dtype),
        "to_k": _dense(sd, f"{prefix}.to_k", dtype),
        "to_v": _dense(sd, f"{prefix}.to_v", dtype),
        "to_out": _dense(sd, f"{prefix}.to_out.0", dtype),
    }


def convert_vae(sd: Dict[str, np.ndarray], config=None, dtype=jnp.float32):
    """Returns (encoder_vars, decoder_vars)."""
    from coma_tpu.models.diffusion.vae import VAEConfig

    cfg = config or VAEConfig()
    n = len(cfg.block_out_channels)
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in", dtype),
        "mid_res_0": _vae_resnet(sd, "encoder.mid_block.resnets.0", dtype),
        "mid_attn": _vae_attention(sd, "encoder.mid_block.attentions.0", dtype),
        "mid_res_1": _vae_resnet(sd, "encoder.mid_block.resnets.1", dtype),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out", dtype),
        "conv_out": _conv(sd, "encoder.conv_out", dtype),
        "quant_conv": _conv(sd, "quant_conv", dtype),
    }
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _vae_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", dtype)
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype
            )
    dec = {
        "post_quant_conv": _conv(sd, "post_quant_conv", dtype),
        "conv_in": _conv(sd, "decoder.conv_in", dtype),
        "mid_res_0": _vae_resnet(sd, "decoder.mid_block.resnets.0", dtype),
        "mid_attn": _vae_attention(sd, "decoder.mid_block.attentions.0", dtype),
        "mid_res_1": _vae_resnet(sd, "decoder.mid_block.resnets.1", dtype),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out", dtype),
        "conv_out": _conv(sd, "decoder.conv_out", dtype),
    }
    # diffusers decoder up_blocks[k] runs deepest-first == our up_{n-1-k}
    for k in range(n):
        ours = n - 1 - k
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{ours}_res_{j}"] = _vae_resnet(sd, f"decoder.up_blocks.{k}.resnets.{j}", dtype)
        if ours > 0:
            dec[f"up_{ours}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{k}.upsamplers.0.conv", dtype
            )
    return {"params": enc}, {"params": dec}


# ---------------------------------------------------------------- CLIP ----

def convert_clip_text(sd: Dict[str, np.ndarray], config=None, dtype=jnp.float32):
    from coma_tpu.models.diffusion.clip_text import CLIPTextConfig

    cfg = config or CLIPTextConfig()
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    params = {
        "token_embedding": {
            "embedding": jnp.asarray(sd[f"{pre}embeddings.token_embedding.weight"], dtype=dtype)
        },
        "position_embedding": jnp.asarray(
            sd[f"{pre}embeddings.position_embedding.weight"], dtype=dtype
        ),
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm", dtype),
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm1": _norm(sd, f"{lp}.layer_norm1", dtype),
            "self_attn": {
                "q_proj": _dense(sd, f"{lp}.self_attn.q_proj", dtype),
                "k_proj": _dense(sd, f"{lp}.self_attn.k_proj", dtype),
                "v_proj": _dense(sd, f"{lp}.self_attn.v_proj", dtype),
                "out_proj": _dense(sd, f"{lp}.self_attn.out_proj", dtype),
            },
            "layer_norm2": _norm(sd, f"{lp}.layer_norm2", dtype),
            "fc1": _dense(sd, f"{lp}.mlp.fc1", dtype),
            "fc2": _dense(sd, f"{lp}.mlp.fc2", dtype),
        }
    return {"params": params}


def infer_sd_configs(weights_dir: str):
    """Read diffusers ``config.json`` files and build matching native configs.

    Returns ``(UNetConfig, CLIPTextConfig)`` — exactly what
    ``stabilityai/stable-diffusion-2-inpainting`` (the reference's default,
    ``constants/generation/inpaint_ldm.py:4-15``) or SD-1.x-inpaint dirs
    declare. Falls back to the SD-1.x defaults when the json files are absent
    (e.g. a bare safetensors drop)."""
    import json

    from coma_tpu.models.diffusion.clip_text import CLIPTextConfig
    from coma_tpu.models.diffusion.unet import UNetConfig

    ucfg, ccfg = UNetConfig(), CLIPTextConfig()

    upath = os.path.join(weights_dir, "unet", "config.json")
    if os.path.exists(upath):
        with open(upath) as f:
            u = json.load(f)
        head_dim = u.get("attention_head_dim", 8)
        heads_per_block = None
        if isinstance(head_dim, (list, tuple)):  # SD-2.x: per-block counts
            heads_per_block, head_dim = tuple(head_dim), 8
        ucfg = UNetConfig(
            in_channels=u.get("in_channels", 9),
            out_channels=u.get("out_channels", 4),
            block_out_channels=tuple(u.get("block_out_channels",
                                           (320, 640, 1280, 1280))),
            layers_per_block=u.get("layers_per_block", 2),
            cross_attention_dim=u.get("cross_attention_dim", 768),
            attention_head_dim=head_dim,
            heads_per_block=heads_per_block,
            norm_num_groups=u.get("norm_num_groups", 32),
            cross_attn_blocks=tuple(
                t.startswith("CrossAttn")
                for t in u.get("down_block_types",
                               ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",))
            ),
        )

    cpath = os.path.join(weights_dir, "text_encoder", "config.json")
    if os.path.exists(cpath):
        with open(cpath) as f:
            c = json.load(f)
        ccfg = CLIPTextConfig(
            vocab_size=c.get("vocab_size", 49408),
            hidden_size=c.get("hidden_size", 768),
            num_layers=c.get("num_hidden_layers", 12),
            num_heads=c.get("num_attention_heads", 12),
            max_positions=c.get("max_position_embeddings", 77),
            hidden_act=c.get("hidden_act", "quick_gelu"),
        )
    return ucfg, ccfg


def load_sd_params(weights_dir: str, dtype=jnp.bfloat16) -> Dict:
    """Load a diffusers checkpoint directory into our pipeline's params dict."""
    from coma_tpu.models.diffusion.tokenizer import CLIPTokenizer

    ucfg, ccfg = infer_sd_configs(weights_dir)
    unet_sd = _load_safetensors(
        os.path.join(weights_dir, "unet", "diffusion_pytorch_model.safetensors")
    )
    vae_sd = _load_safetensors(
        os.path.join(weights_dir, "vae", "diffusion_pytorch_model.safetensors")
    )
    clip_sd = _load_safetensors(
        os.path.join(weights_dir, "text_encoder", "model.safetensors")
    )
    enc, dec = convert_vae(vae_sd, dtype=jnp.float32)
    params = dict(
        unet=convert_unet(unet_sd, ucfg, dtype=dtype),
        vae_encoder=enc,
        vae_decoder=dec,
        clip=convert_clip_text(clip_sd, ccfg, dtype=jnp.float32),
        tokenizer=CLIPTokenizer(
            os.path.join(weights_dir, "tokenizer", "vocab.json"),
            os.path.join(weights_dir, "tokenizer", "merges.txt"),
        ),
        segmenter=None,  # person segmenter weights are separate (see
        # coma_tpu.models.segmentation); plug in when trained/converted
    )
    return params
