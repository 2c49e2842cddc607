"""torch-checkpoint -> Flax parameter conversion for the non-diffusion models.

The reference ships torch checkpoints for its imported models — Hand4Whole
``snapshot_6.pth.tar`` (``imports/hand4whole/main/model.py:14``, loaded by
``src/generation/predict_human.py``) and COAP ``last.ckpt``
(``imports/coap/coap.py:597``). This module maps those state dicts onto the
Flax parameter trees of :mod:`coma_tpu.models.hand4whole`,
:mod:`coma_tpu.models.resnet` and :mod:`coma_tpu.models.coap`, so the
published weights run on TPU unchanged. (The SD/VAE/CLIP mapping lives in
:mod:`coma_tpu.models.diffusion.weights`; VPoser in
``coma_tpu.models.vposer.load_torch_weights``.)

Layout conventions (all verified numerically in ``tests/test_weights.py``):
- Linear (O, I) -> Dense kernel (I, O): transpose.
- Conv2d (O, I, kH, kW) -> Conv kernel (kH, kW, I, O): ``transpose(2,3,1,0)``.
- ConvTranspose2d (I, O, kH, kW) -> ConvTranspose kernel (kH, kW, I, O)
  SPATIALLY FLIPPED: ``transpose(2,3,0,1)[::-1, ::-1]`` (torch computes the
  gradient-of-conv, flax's ``transpose_kernel=False`` a fractionally strided
  correlation). torch's (k=4, s=2, p=1) corresponds to flax padding='SAME'.
- BatchNorm -> params {scale, bias} + batch_stats {mean, var}. Where the
  reference puts a biased Conv in front of a BatchNorm
  (``nets/layer.py:make_conv_layers`` uses Conv2d's default bias=True), the
  conv bias is folded into the BN running mean (``mean' = mean - b``) so our
  bias-free conv+BN computes the identical function.

Tensors are accepted as torch tensors or numpy arrays (state dicts loaded
with ``torch.load(..., map_location='cpu')``).
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def t2f_linear(sd: Mapping, prefix: str) -> Dict:
    """torch ``{prefix}.weight/bias`` -> Dense {kernel, bias}."""
    out = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def t2f_conv(sd: Mapping, prefix: str) -> Dict:
    """torch Conv2d -> Conv {kernel[, bias]} (OIHW -> HWIO)."""
    out = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def t2f_conv_transpose(sd: Mapping, prefix: str) -> Dict:
    """torch ConvTranspose2d -> ConvTranspose {kernel[, bias]} (IOHW ->
    flipped HWIO)."""
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": jnp.asarray(np.ascontiguousarray(w))}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def t2f_bn(sd: Mapping, prefix: str, fold_conv_bias=None) -> Tuple[Dict, Dict]:
    """torch BatchNorm2d -> (params, batch_stats). ``fold_conv_bias``
    subtracts a preceding conv's bias from the running mean."""
    mean = _np(sd[f"{prefix}.running_mean"])
    if fold_conv_bias is not None:
        mean = mean - _np(fold_conv_bias)
    params = {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }
    stats = {
        "mean": jnp.asarray(mean),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }
    return params, stats


def t2f_conv_bn(sd: Mapping, conv_prefix: str, bn_prefix: str) -> Tuple[Dict, Dict, Dict]:
    """Biased torch Conv2d + BatchNorm2d -> (bias-free conv params, bn
    params, bn stats) with the conv bias folded into the BN mean."""
    w = {"kernel": jnp.asarray(_np(sd[f"{conv_prefix}.weight"]).transpose(2, 3, 1, 0))}
    bias = sd.get(f"{conv_prefix}.bias")
    bn_params, bn_stats = t2f_bn(sd, bn_prefix, fold_conv_bias=bias)
    return w, bn_params, bn_stats


def strip_prefix(sd: Mapping, prefix: str = "module.") -> Dict:
    """Remove a DataParallel-style key prefix."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


# --------------------------------------------------------------------------
# ResNet backbones (coma_tpu.models.resnet.ResNet)
# --------------------------------------------------------------------------

def convert_resnet(
    sd: Mapping,
    prefix: str,
    stage_sizes: Tuple[int, ...],
    bottleneck: bool,
) -> Tuple[Dict, Dict]:
    """torchvision-style ResNetBackbone state dict
    (``imports/hand4whole/common/nets/resnet.py:7``) -> (params, batch_stats)
    for :class:`coma_tpu.models.resnet.ResNet`."""
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = t2f_conv(sd, f"{prefix}conv1")
    p["bn1"], s["bn1"] = t2f_bn(sd, f"{prefix}bn1")
    n_convs = 3 if bottleneck else 2
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t = f"{prefix}layer{i + 1}.{j}"
            name = f"layer{i + 1}_{j}"
            bp: Dict = {}
            bs: Dict = {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = t2f_conv(sd, f"{t}.conv{c}")
                bp[f"bn{c}"], bs[f"bn{c}"] = t2f_bn(sd, f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                bp["down_conv"] = t2f_conv(sd, f"{t}.downsample.0")
                bp["down_bn"], bs["down_bn"] = t2f_bn(sd, f"{t}.downsample.1")
            p[name], s[name] = bp, bs
    return p, s


# --------------------------------------------------------------------------
# Hand4Whole (coma_tpu.models.hand4whole.Hand4Whole)
# --------------------------------------------------------------------------

def convert_hand4whole(sd: Mapping) -> Dict:
    """``snapshot_6.pth.tar``'s ``state_dict['network']``
    (``main/model.py:14`` module tree) -> ``{'params': ..., 'batch_stats':
    ...}`` for :class:`coma_tpu.models.hand4whole.Hand4Whole`."""
    sd = strip_prefix(sd)
    p: Dict = {}
    s: Dict = {}

    p["body_backbone"], s["body_backbone"] = convert_resnet(
        sd, "backbone.", (3, 4, 6, 3), True
    )
    p["hand_backbone"], s["hand_backbone"] = convert_resnet(
        sd, "hand_roi_net.backbone.", (3, 4, 6, 3), True
    )
    p["face_backbone"], s["face_backbone"] = convert_resnet(
        sd, "face_roi_net.backbone.", (2, 2, 2, 2), False
    )

    # PositionNets: make_conv_layers([feat, J*D], bnrelu_final=False) -> a
    # single biased Conv2d at Sequential index 0
    p["body_position_net"] = {"conv": t2f_conv(sd, "body_position_net.conv.0")}
    p["hand_position_net"] = {"conv": t2f_conv(sd, "hand_position_net.conv.0")}

    # RotationNet('body'): {body,lhand,rhand}_conv are biased conv+BN+ReLU;
    # the four heads are single Linears at Sequential index 0
    brn: Dict = {}
    brs: Dict = {}
    for tower in ("body", "lhand", "rhand"):
        conv, bn, st = t2f_conv_bn(
            sd, f"body_rotation_net.{tower}_conv.0", f"body_rotation_net.{tower}_conv.1"
        )
        brn[f"{tower}_conv"] = conv
        brn[f"{tower}_bn"] = bn
        brs[f"{tower}_bn"] = st
    for head in ("root_pose_out", "body_pose_out", "shape_out", "cam_out"):
        brn[head] = t2f_linear(sd, f"body_rotation_net.{head}.0")
    p["body_rotation_net"], s["body_rotation_net"] = brn, brs

    hrn: Dict = {}
    hrs: Dict = {}
    conv, bn, st = t2f_conv_bn(
        sd, "hand_rotation_net.hand_conv.0", "hand_rotation_net.hand_conv.1"
    )
    hrn["hand_conv"], hrn["hand_bn"], hrs["hand_bn"] = conv, bn, st
    hrn["hand_pose_out"] = t2f_linear(sd, "hand_rotation_net.hand_pose_out.0")
    p["hand_rotation_net"], s["hand_rotation_net"] = hrn, hrs

    # BoxNet: make_deconv_layers -> Sequential indices (0 ConvT, 1 BN, 3
    # ConvT, 4 BN, 6 ConvT, 7 BN); size heads are Linear at indices 0 and 2
    bn_p: Dict = {}
    bn_s: Dict = {}
    for i, (ct, b) in enumerate(((0, 1), (3, 4), (6, 7))):
        bn_p[f"deconv_{i}"] = t2f_conv_transpose(sd, f"box_net.deconv.{ct}")
        bn_p[f"deconv_bn_{i}"], bn_s[f"deconv_bn_{i}"] = t2f_bn(sd, f"box_net.deconv.{b}")
    bn_p["bbox_center"] = t2f_conv(sd, "box_net.bbox_center.0")
    for head in ("lhand_size", "rhand_size", "face_size"):
        bn_p[f"{head}_fc0"] = t2f_linear(sd, f"box_net.{head}.0")
        bn_p[f"{head}_fc1"] = t2f_linear(sd, f"box_net.{head}.2")
    p["box_net"], s["box_net"] = bn_p, bn_s

    p["face_regressor"] = {
        "expr_out": t2f_linear(sd, "face_regressor.expr_out.0"),
        "jaw_pose_out": t2f_linear(sd, "face_regressor.jaw_pose_out.0"),
    }
    return {"params": p, "batch_stats": s}


# --------------------------------------------------------------------------
# COAP (coma_tpu.models.coap.COAPOccupancy)
# --------------------------------------------------------------------------

def convert_resnet_pointnet(sd: Mapping, prefix: str) -> Dict:
    """``modules.py:ResnetPointnet`` -> params for
    :class:`coma_tpu.models.coap.ResnetPointnet` (blocks 0/1/3/4; block_2
    only exists with ``use_block2``, which COAP does not use)."""
    out = {
        "fc_pos": t2f_linear(sd, f"{prefix}fc_pos"),
        "fc_c": t2f_linear(sd, f"{prefix}fc_c"),
    }
    for b in ("block_0", "block_1", "block_3", "block_4"):
        blk = {
            "fc_0": t2f_linear(sd, f"{prefix}{b}.fc_0"),
            "fc_1": t2f_linear(sd, f"{prefix}{b}.fc_1"),
        }
        if f"{prefix}{b}.shortcut.weight" in sd:
            blk["shortcut"] = t2f_linear(sd, f"{prefix}{b}.shortcut")
        out[b] = blk
    return out


def convert_implicit_net(sd: Mapping, prefix: str) -> Dict:
    """``modules.py:ImplicitNet`` -> params (layers ``lin{i}``)."""
    out: Dict = {}
    i = 0
    while f"{prefix}lin{i}.weight" in sd:
        out[f"lin{i}"] = t2f_linear(sd, f"{prefix}lin{i}")
        i += 1
    if i == 0:
        raise KeyError(f"no ImplicitNet layers under '{prefix}'")
    return out


def convert_coap(sd: Mapping, prefix: str = "") -> Dict:
    """COAP checkpoint module tree (``coap.py:606-620``: encoder /
    query_encoder / decoder) -> ``{'params': ...}`` for
    :class:`coma_tpu.models.coap.COAPOccupancy`. Pass ``prefix='coap.'`` etc.
    if the checkpoint nests the body model."""
    sd = strip_prefix(sd)
    return {
        "params": {
            "encoder": convert_resnet_pointnet(sd, f"{prefix}encoder."),
            "query_encoder": convert_implicit_net(sd, f"{prefix}query_encoder."),
            "decoder": convert_implicit_net(sd, f"{prefix}decoder."),
        }
    }
