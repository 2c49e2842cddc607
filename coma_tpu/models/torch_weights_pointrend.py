"""detectron2 PointRend checkpoint -> Flax parameter conversion.

The reference's person segmenter is the published COCO PointRend checkpoint
``model_final_edd263.pkl`` (R50-FPN 3x; config
``/root/reference/imports/pointrend/config/pointrend_rcnn_R_50_FPN_3x_coco.yaml``,
download per ``INSTALL.md:56-69``). This maps that checkpoint's state dict
(detectron2 key layout) onto :class:`coma_tpu.models.pointrend.PointRendModel`
so the reference's out-of-the-box person segmentation runs natively on TPU.

Accepts either a torch ``state_dict()`` of the d2 ``GeneralizedRCNN`` or the
raw ``.pkl``'s ``{"model": {...}}`` numpy dict (d2 checkpoints are pickled
numpy). Key layout (mirrored by ``tests/torch_pointrend_mirror.py``, which
the conversion is parity-tested against):

- ``backbone.bottom_up.stem.conv1.{weight,norm.*}``; blocks
  ``backbone.bottom_up.res{2..5}.{i}.conv{1,2,3}.{weight,norm.*}`` with
  ``.shortcut.{weight,norm.*}`` on block 0
- ``backbone.fpn_lateral{2..5}.{weight,bias}``, ``backbone.fpn_output{2..5}``
- ``proposal_generator.rpn_head.{conv,objectness_logits,anchor_deltas}``
- ``roi_heads.box_head.fc{1,2}``, ``roi_heads.box_predictor.{cls_score,bbox_pred}``
- ``roi_heads.mask_head.coarse_head.{reduce_channel_dim_conv,
  reduce_spatial_dim_conv,fc1,fc2,prediction}``
- ``roi_heads.mask_head.point_head.{fc1,fc2,fc3,predictor}`` (Conv1d, k=1)
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from coma_tpu.models.torch_weights import _np, t2f_conv, t2f_linear


def _frozen_bn(sd: Mapping, prefix: str) -> Dict:
    return {
        "weight": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        "running_mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "running_var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }


def _conv_norm(sd: Mapping, prefix: str) -> Dict:
    return {"conv": t2f_conv(sd, prefix), "norm": _frozen_bn(sd, f"{prefix}.norm")}


def _conv1d_as_dense(sd: Mapping, prefix: str) -> Dict:
    """torch Conv1d(k=1) (O, I, 1) -> Dense {kernel (I, O), bias}."""
    w = _np(sd[f"{prefix}.weight"])[:, :, 0].T
    return {"kernel": jnp.asarray(w), "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def convert_pointrend(sd: Mapping) -> Dict:
    """Full detectron2 PointRend state dict -> flax ``{'params': ...}``."""
    if "model" in sd and not any(k.startswith("backbone") for k in sd):
        sd = sd["model"]

    bottom_up: Dict = {"stem_conv1": _conv_norm(sd, "backbone.bottom_up.stem.conv1")}
    for stage, n_blocks in (("res2", 3), ("res3", 4), ("res4", 6), ("res5", 3)):
        for i in range(n_blocks):
            p = f"backbone.bottom_up.{stage}.{i}"
            blk = {f"conv{j}": _conv_norm(sd, f"{p}.conv{j}") for j in (1, 2, 3)}
            if f"{p}.shortcut.weight" in sd:
                blk["shortcut"] = _conv_norm(sd, f"{p}.shortcut")
            bottom_up[f"{stage}_{i}"] = blk

    fpn = {}
    for lvl in (2, 3, 4, 5):
        fpn[f"fpn_lateral{lvl}"] = t2f_conv(sd, f"backbone.fpn_lateral{lvl}")
        fpn[f"fpn_output{lvl}"] = t2f_conv(sd, f"backbone.fpn_output{lvl}")

    rpn = {
        "conv": t2f_conv(sd, "proposal_generator.rpn_head.conv"),
        "objectness_logits": t2f_conv(sd, "proposal_generator.rpn_head.objectness_logits"),
        "anchor_deltas": t2f_conv(sd, "proposal_generator.rpn_head.anchor_deltas"),
    }

    box = {
        "fc1": t2f_linear(sd, "roi_heads.box_head.fc1"),
        "fc2": t2f_linear(sd, "roi_heads.box_head.fc2"),
        "cls_score": t2f_linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": t2f_linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }

    ch = "roi_heads.mask_head.coarse_head"
    coarse = {
        "reduce_channel_dim_conv": t2f_conv(sd, f"{ch}.reduce_channel_dim_conv"),
        "reduce_spatial_dim_conv": t2f_conv(sd, f"{ch}.reduce_spatial_dim_conv"),
        "fc1": t2f_linear(sd, f"{ch}.fc1"),
        "fc2": t2f_linear(sd, f"{ch}.fc2"),
        "prediction": t2f_linear(sd, f"{ch}.prediction"),
    }

    ph = "roi_heads.mask_head.point_head"
    point = {
        f"fc{k}": _conv1d_as_dense(sd, f"{ph}.fc{k}") for k in (1, 2, 3)
    }
    point["predictor"] = _conv1d_as_dense(sd, f"{ph}.predictor")

    return {
        "params": {
            "bottom_up": bottom_up,
            "fpn": fpn,
            "rpn_head": rpn,
            "box": box,
            "coarse_head": coarse,
            "point_head": point,
        }
    }


def load_d2_pickle(path: str) -> Dict[str, np.ndarray]:
    """Load a detectron2 ``.pkl`` checkpoint (numpy arrays under 'model')."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    return data["model"] if "model" in data else data
