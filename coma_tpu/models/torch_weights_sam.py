"""Official ``sam_vit_b_01ec64.pth`` -> Flax params for
:mod:`coma_tpu.models.sam`.

Key layout follows the segment-anything package's module tree (the reference
loads it via ``segment_anything.sam_model_registry`` for its SAM-based
adaptive-mask predictors, ``utils/adaptive_mask_inpainting.py:1246-1455``).
Conversion conventions are shared with :mod:`coma_tpu.models.torch_weights`
(Linear transpose, Conv OIHW->HWIO, ConvTranspose flip; verified in
``tests/test_sam.py``). ``prompt_encoder.mask_downscaling`` and
``not_a_point_embed`` are intentionally dropped — the box-prompt inference
path never uses them.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from coma_tpu.models.torch_weights import (
    _np,
    t2f_conv,
    t2f_conv_transpose,
    t2f_linear,
)


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _decoder_attn(sd: Mapping, prefix: str) -> Dict:
    return {
        "q_proj": t2f_linear(sd, f"{prefix}.q_proj"),
        "k_proj": t2f_linear(sd, f"{prefix}.k_proj"),
        "v_proj": t2f_linear(sd, f"{prefix}.v_proj"),
        "out_proj": t2f_linear(sd, f"{prefix}.out_proj"),
    }


def _mlp(sd: Mapping, prefix: str, depth: int = 3) -> Dict:
    return {f"lin{i}": t2f_linear(sd, f"{prefix}.layers.{i}") for i in range(depth)}


def convert_sam(sd: Mapping, depth: int = None, num_mask_tokens: int = 4) -> Dict:
    """Full checkpoint state dict -> ``{'params': ...}`` for
    :class:`coma_tpu.models.sam.SAM`. ``depth`` defaults to the block count
    found in the checkpoint (12 for vit_b, 32 for vit_h)."""
    if depth is None:
        depth = 1 + max(
            (int(k.split(".")[2]) for k in sd
             if k.startswith("image_encoder.blocks.")),
            default=11,
        )
    enc: Dict = {
        "patch_embed": t2f_conv(sd, "image_encoder.patch_embed.proj"),
        # SAM's ViT runs NHWC internally; pos_embed is already (1, g, g, C)
        "pos_embed": jnp.asarray(_np(sd["image_encoder.pos_embed"])),
        "neck_conv1": t2f_conv(sd, "image_encoder.neck.0"),
        "neck_ln1": _ln(sd, "image_encoder.neck.1"),
        "neck_conv2": t2f_conv(sd, "image_encoder.neck.2"),
        "neck_ln2": _ln(sd, "image_encoder.neck.3"),
    }
    for i in range(depth):
        t = f"image_encoder.blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "attn": {
                "qkv": t2f_linear(sd, f"{t}.attn.qkv"),
                "proj": t2f_linear(sd, f"{t}.attn.proj"),
                "rel_pos_h": jnp.asarray(_np(sd[f"{t}.attn.rel_pos_h"])),
                "rel_pos_w": jnp.asarray(_np(sd[f"{t}.attn.rel_pos_w"])),
            },
            "mlp_lin1": t2f_linear(sd, f"{t}.mlp.lin1"),
            "mlp_lin2": t2f_linear(sd, f"{t}.mlp.lin2"),
        }

    prompt = {
        "pe_gaussian": jnp.asarray(
            _np(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])
        ),
        "point_embed": jnp.asarray(
            np.stack(
                [
                    _np(sd[f"prompt_encoder.point_embeddings.{i}.weight"])[0]
                    for i in range(4)
                ]
            )
        ),
        "no_mask_embed": jnp.asarray(_np(sd["prompt_encoder.no_mask_embed.weight"])[0]),
    }

    dec: Dict = {
        "iou_token": jnp.asarray(_np(sd["mask_decoder.iou_token.weight"])),
        "mask_tokens": jnp.asarray(_np(sd["mask_decoder.mask_tokens.weight"])),
        "norm_final": _ln(sd, "mask_decoder.transformer.norm_final_attn"),
        "final_attn": _decoder_attn(
            sd, "mask_decoder.transformer.final_attn_token_to_image"
        ),
        "upscale1": t2f_conv_transpose(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln(sd, "mask_decoder.output_upscaling.1"),
        "upscale2": t2f_conv_transpose(sd, "mask_decoder.output_upscaling.3"),
        "iou_head": _mlp(sd, "mask_decoder.iou_prediction_head"),
    }
    for i in range(2):
        t = f"mask_decoder.transformer.layers.{i}"
        dec[f"layer_{i}"] = {
            "self_attn": _decoder_attn(sd, f"{t}.self_attn"),
            "cross_attn_t2i": _decoder_attn(sd, f"{t}.cross_attn_token_to_image"),
            "cross_attn_i2t": _decoder_attn(sd, f"{t}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "norm3": _ln(sd, f"{t}.norm3"),
            "norm4": _ln(sd, f"{t}.norm4"),
            "mlp_lin1": t2f_linear(sd, f"{t}.mlp.lin1"),
            "mlp_lin2": t2f_linear(sd, f"{t}.mlp.lin2"),
        }
    for i in range(num_mask_tokens):
        dec[f"hyper_{i}"] = _mlp(sd, f"mask_decoder.output_hypernetworks_mlps.{i}")

    return {
        "params": {
            "image_encoder": enc,
            "prompt_encoder": prompt,
            "mask_decoder": dec,
        }
    }
