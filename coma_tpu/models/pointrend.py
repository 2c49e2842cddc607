"""PointRend R50-FPN instance segmentation, native Flax (NHWC, jittable).

Reference parity: the reference's person segmenter is detectron2 PointRend
``pointrend_rcnn_R_50_FPN_3x_coco`` (configs in
``/root/reference/imports/pointrend/config/``), used (a) inside the
adaptive-mask diffusion loop (``utils/adaptive_mask_inpainting.py:1182-1243``)
and (b) by the ``segment_human`` stage (``src/generation/segment_human.py:24``).
detectron2 is torch + C++/CUDA ops (ROIAlign, NMS, point_sample); this module
is the TPU-native re-design: every stage is static-shape XLA — padded top-K
proposals instead of dynamic box lists, ``lax.fori_loop`` greedy NMS, ROIAlign
as fused bilinear gathers (``coma_tpu.ops.sampling``), and the PointRend
subdivision loop unrolled over its 5 static steps.

Weight layout mirrors detectron2's checkpoint keys (see
``coma_tpu/models/torch_weights_pointrend.py``) so the published
``model_final_edd263.pkl`` COCO checkpoint converts mechanically.

Architecture (from the reference YAMLs):
- ResNet-50, FrozenBN, stride-in-1x1 (MSRA/caffe convention), out res2..res5
- FPN with lateral/output convs, p6 = stride-2 maxpool of p5
- RPN: shared 3x3 conv head; anchors sizes (32..512) x ratios (0.5, 1, 2);
  pre/post NMS topk 1000, NMS 0.7
- Box head: 7x7 ROIAlignV2 on p2..p5, 2 fc (1024), 80 classes,
  class-specific box deltas (10, 10, 5, 5), score 0.05, NMS 0.5, top 100
- PointRend mask head: coarse ConvFCHead (14x14 point-sampled p2 -> 7x7
  logits) + 3-fc point head with coarse-logit concat at every layer,
  subdivision 7->224 with 28^2 uncertain points per step
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from coma_tpu.ops.sampling import (
    grid_sample_bilinear,
    multilevel_roi_align,
    point_sample,
)

# -------------------------------------------------------------------------
# detectron2-layout ResNet-50 (FrozenBN, stride_in_1x1) + FPN
# -------------------------------------------------------------------------


class FrozenBN(nn.Module):
    """FrozenBatchNorm2d: affine transform with frozen statistics. Params are
    stored exactly as the checkpoint's (weight, bias, running_mean,
    running_var) so conversion is copy-through."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        rm = self.param("running_mean", nn.initializers.zeros, (self.features,))
        rv = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = w * jax.lax.rsqrt(rv + self.eps)
        return x * scale + (b - rm * scale)


class ConvNorm(nn.Module):
    """Conv2d(bias=False) + FrozenBN, named to mirror d2's ``conv.norm``."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        return FrozenBN(self.features, name="norm")(x)


class D2Bottleneck(nn.Module):
    """detectron2 BottleneckBlock with stride_in_1x1=True (the MSRA R-50
    convention baked into the COCO checkpoints): the stage stride lives on
    conv1 (1x1), not conv2."""

    bottleneck: int
    out_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.relu(ConvNorm(self.bottleneck, 1, self.stride, name="conv1")(x))
        out = nn.relu(ConvNorm(self.bottleneck, 3, 1, padding=1, name="conv2")(out))
        out = ConvNorm(self.out_channels, 1, 1, name="conv3")(out)
        if self.has_shortcut:
            sc = ConvNorm(self.out_channels, 1, self.stride, name="shortcut")(x)
        else:
            sc = x
        return nn.relu(out + sc)


class D2ResNet50(nn.Module):
    """Outputs {res2, res3, res4, res5} with strides 4/8/16/32."""

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        x = ConvNorm(64, 7, 2, padding=3, name="stem_conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = {}
        specs = [("res2", 3, 64, 256, 1), ("res3", 4, 128, 512, 2),
                 ("res4", 6, 256, 1024, 2), ("res5", 3, 512, 2048, 2)]
        for name, n_blocks, bottleneck, out_ch, stride in specs:
            for i in range(n_blocks):
                x = D2Bottleneck(
                    bottleneck,
                    out_ch,
                    stride=stride if i == 0 else 1,
                    has_shortcut=(i == 0),
                    name=f"{name}_{i}",
                )(x)
            feats[name] = x
        return feats


class FPN(nn.Module):
    """detectron2 FPN: 1x1 laterals + 3x3 outputs (both with bias, no norm),
    top-down nearest upsampling, p6 = 1x1/2 maxpool of p5."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"fpn_lateral{i+2}")(feats[n])
            for i, n in enumerate(names)
        ]
        out = {}
        prev = laterals[-1]
        out["p5"] = nn.Conv(self.out_channels, (3, 3), padding=1, name="fpn_output5")(prev)
        for lvl in (4, 3, 2):
            lat = laterals[lvl - 2]
            B, H, W, C = lat.shape
            prev = jax.image.resize(prev, (B, H, W, C), "nearest") + lat
            out[f"p{lvl}"] = nn.Conv(
                self.out_channels, (3, 3), padding=1, name=f"fpn_output{lvl}"
            )(prev)
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out


class RPNHead(nn.Module):
    """Shared 3x3 conv -> objectness (A) + anchor deltas (A*4) per level."""

    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats: List[jax.Array]):
        conv = nn.Conv(256, (3, 3), padding=1, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="anchor_deltas")
        outs = []
        for f in feats:
            t = nn.relu(conv(f))
            outs.append((obj(t), deltas(t)))
        return outs


class BoxHead(nn.Module):
    """FastRCNNConvFCHead (2 fc) + FastRCNNOutputLayers."""

    num_classes: int = 80

    @nn.compact
    def __call__(self, roi_feats: jax.Array):
        R = roi_feats.shape[0]
        # d2 flattens NCHW (R, C*7*7); our ROI features are NHWC
        x = roi_feats.transpose(0, 3, 1, 2).reshape(R, -1)
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


class CoarseMaskHead(nn.Module):
    """PointRend ConvFCHead: 14x14 point-sampled p2 features -> 7x7 coarse
    per-class mask logits (d2 ``point_rend/mask_head.py:ConvFCHead``)."""

    num_classes: int = 80
    conv_dim: int = 256
    fc_dim: int = 1024
    output_side: int = 7
    input_side: int = 14

    @nn.compact
    def __call__(self, x: jax.Array):  # (R, 14, 14, C)
        R = x.shape[0]
        x = nn.Conv(self.conv_dim, (1, 1), name="reduce_channel_dim_conv")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.conv_dim, (2, 2), strides=2, name="reduce_spatial_dim_conv"
        )(x)
        x = nn.relu(x)
        # d2 flattens NCHW: (R, C, 7, 7) -> (R, C*49); transpose to match
        x = x.transpose(0, 3, 1, 2).reshape(R, -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, name="fc2")(x))
        x = nn.Dense(
            self.num_classes * self.output_side**2, name="prediction"
        )(x)
        return x.reshape(R, self.num_classes, self.output_side, self.output_side)


class PointHead(nn.Module):
    """StandardPointHead: 3 x conv1d(256) over points, coarse logits
    re-concatenated at every layer (``coarse_pred_each_layer=True``)."""

    num_classes: int = 80
    fc_dim: int = 256
    num_fc: int = 3

    @nn.compact
    def __call__(self, fine: jax.Array, coarse: jax.Array):
        # fine (R, P, 256), coarse (R, P, num_classes) -> (R, P, num_classes)
        x = jnp.concatenate([fine, coarse], axis=-1)
        for k in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{k+1}")(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, name="predictor")(x)


# -------------------------------------------------------------------------
# Box arithmetic (detectron2 Box2BoxTransform / pairwise IoU / greedy NMS)
# -------------------------------------------------------------------------

_SCALE_CLAMP = math.log(1000.0 / 16)


def decode_deltas(anchors: jax.Array, deltas: jax.Array, weights) -> jax.Array:
    """Box2BoxTransform.apply_deltas: anchors (..., 4) xyxy, deltas (..., 4)."""
    wx, wy, ww, wh = weights
    w = anchors[..., 2] - anchors[..., 0]
    h = anchors[..., 3] - anchors[..., 1]
    cx = anchors[..., 0] + 0.5 * w
    cy = anchors[..., 1] + 0.5 * h
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = jnp.exp(dw) * w, jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix (Na, Nb) for xyxy boxes (d2 area convention, no +1)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def greedy_nms(boxes: jax.Array, scores: jax.Array, iou_thresh: float):
    """Static-shape greedy NMS. Inputs already sorted by score descending.
    Returns a boolean keep mask (suppressed or invalid -> False). Boxes with
    score == -inf are treated as padding and never kept."""
    K = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)
    valid = scores > -jnp.inf
    idx = jnp.arange(K)

    def body(i, keep):
        sup = jnp.any(keep & (iou[i] > iou_thresh) & (idx < i))
        return keep.at[i].set(~sup & valid[i])

    return jax.lax.fori_loop(0, K, body, jnp.zeros((K,), bool))


# -------------------------------------------------------------------------
# Anchors
# -------------------------------------------------------------------------

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
FPN_STRIDES = (4, 8, 16, 32, 64)


def generate_anchors(hw_per_level: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
    """d2 DefaultAnchorGenerator (offset 0): per level, centers on the stride
    grid, cell anchors ordered by aspect ratio. Returns (H*W*A, 4) per level
    in H, W, A order — matching the RPN head's NHWC channel flatten."""
    out = []
    for (H, W), stride, size in zip(hw_per_level, FPN_STRIDES, ANCHOR_SIZES):
        cell = []
        for r in ANCHOR_RATIOS:
            w = math.sqrt(size * size / r)
            h = w * r
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
        cell = np.asarray(cell, np.float32)  # (A, 4)
        sx = np.arange(W, dtype=np.float32) * stride
        sy = np.arange(H, dtype=np.float32) * stride
        shift = np.stack(
            np.broadcast_arrays(sx[None, :, None], sy[:, None, None]), axis=-1
        )  # (H, W, 1, 2) after broadcast
        shifts = np.concatenate([shift, shift], axis=-1)  # (H, W, 1, 4) x y x y
        out.append((shifts + cell[None, None]).reshape(-1, 4))
    return out


# -------------------------------------------------------------------------
# Full inference pipeline
# -------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointRendConfig:
    num_classes: int = 80
    pre_nms_topk: int = 1000
    post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    max_detections: int = 100
    box_candidates: int = 500  # flattened class-score candidates fed to NMS
    subdivision_steps: int = 5
    subdivision_points: int = 28 * 28
    coarse_side: int = 7
    # preprocessing (d2 DefaultPredictor): shortest edge 800, BGR, mean only
    test_size: int = 800
    pixel_mean: Tuple[float, float, float] = (103.530, 116.280, 123.675)  # BGR


class PointRendModel(nn.Module):
    """The full GeneralizedRCNN graph as one Flax module. ``__call__`` maps a
    preprocessed image to padded detections + PointRend masks."""

    cfg: PointRendConfig = PointRendConfig()

    def setup(self):
        self.backbone = D2ResNet50(name="bottom_up")
        self.fpn = FPN(name="fpn")
        self.rpn_head = RPNHead(name="rpn_head")
        self.box_head = BoxHead(self.cfg.num_classes, name="box")
        self.coarse_head = CoarseMaskHead(self.cfg.num_classes, name="coarse_head")
        self.point_head = PointHead(self.cfg.num_classes, name="point_head")

    # -- stages, individually callable for parity tests ------------------

    def features(self, image: jax.Array) -> Dict[str, jax.Array]:
        """image (H, W, 3) preprocessed BGR -> FPN maps p2..p6 (unbatched)."""
        feats = self.backbone(image[None])
        return {k: v[0] for k, v in self.fpn(feats).items()}

    def rpn(self, fpn: Dict[str, jax.Array], image_hw: Tuple[int, int]):
        """FPN maps -> (post_nms_topk, 4) proposals + validity mask."""
        cfg = self.cfg
        levels = [fpn[f"p{i}"] for i in range(2, 7)]
        outs = self.rpn_head([f[None] for f in levels])
        anchors = generate_anchors([f.shape[:2] for f in levels])
        all_boxes, all_scores = [], []
        for (obj, deltas), anc in zip(outs, anchors):
            obj = obj[0].reshape(-1)  # (H*W*A,)
            deltas = deltas[0].reshape(-1, 4)
            k = min(cfg.pre_nms_topk, obj.shape[0])
            score, idx = jax.lax.top_k(obj, k)
            boxes = decode_deltas(jnp.asarray(anc)[idx], deltas[idx], (1, 1, 1, 1))
            boxes = clip_boxes(boxes, image_hw)
            # pad each level to pre_nms_topk for a static concat
            pad = cfg.pre_nms_topk - k
            boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
            score = jnp.pad(score, (0, pad), constant_values=-jnp.inf)
            keep = greedy_nms(boxes, score, cfg.rpn_nms_thresh)
            all_boxes.append(boxes)
            all_scores.append(jnp.where(keep, score, -jnp.inf))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        top, idx = jax.lax.top_k(scores, cfg.post_nms_topk)
        return boxes[idx], top > -jnp.inf

    def detect(self, fpn, proposals, prop_valid, image_hw):
        """Proposals -> padded (max_detections) boxes/scores/classes/valid."""
        cfg = self.cfg
        feats = [fpn[f"p{i}"] for i in range(2, 6)]
        roi = multilevel_roi_align(feats, proposals, 7, (4, 8, 16, 32))
        scores, deltas = self.box_head(roi)
        probs = jax.nn.softmax(scores, axis=-1)[:, :-1]  # drop background
        probs = jnp.where(prop_valid[:, None], probs, 0.0)
        deltas = deltas.reshape(-1, cfg.num_classes, 4)
        boxes = decode_deltas(
            proposals[:, None, :], deltas, (10.0, 10.0, 5.0, 5.0)
        )  # (R, C, 4)
        boxes = clip_boxes(boxes, image_hw)
        flat_scores = probs.reshape(-1)
        flat_scores = jnp.where(flat_scores > cfg.box_score_thresh, flat_scores, 0.0)
        k = min(cfg.box_candidates, flat_scores.shape[0])
        cand_scores, cand_idx = jax.lax.top_k(flat_scores, k)
        cand_boxes = boxes.reshape(-1, 4)[cand_idx]
        cand_cls = cand_idx % cfg.num_classes
        cand_scores = jnp.where(cand_scores > 0, cand_scores, -jnp.inf)
        # batched per-class NMS via the coordinate-offset trick
        offset = cand_cls.astype(jnp.float32)[:, None] * 10000.0
        keep = greedy_nms(cand_boxes + offset, cand_scores, cfg.box_nms_thresh)
        kept_scores = jnp.where(keep, cand_scores, -jnp.inf)
        top, idx = jax.lax.top_k(kept_scores, cfg.max_detections)
        return dict(
            boxes=cand_boxes[idx],
            scores=jnp.where(top > -jnp.inf, top, 0.0),
            classes=cand_cls[idx],
            valid=top > -jnp.inf,
        )

    def coarse_masks(self, p2: jax.Array, boxes: jax.Array) -> jax.Array:
        """Boxes -> (R, C, 7, 7) coarse logits. Features are point-sampled on
        a regular 14x14 in-box grid from p2 (POOLER_TYPE '' in the config)."""
        side = self.coarse_head.input_side
        grid = regular_grid_coords(side)  # (side*side, 2) in [0, 1]
        feats = sample_in_box_points(p2, boxes, grid, stride=4)  # (R, P, 256)
        R = boxes.shape[0]
        feats = feats.reshape(R, side, side, -1)
        return self.coarse_head(feats)

    def point_rend_masks(self, p2, boxes, classes):
        """The subdivision inference (d2 ``_subdivision_inference``):
        start from the point head on a regular 7x7 grid, then 5 rounds of
        2x bilinear upsample + re-evaluate the 784 most uncertain points.
        Returns (R, 224, 224) per-instance mask logits for ``classes``."""
        cfg = self.cfg
        coarse = self.coarse_masks(p2, boxes)  # (R, C, 7, 7)
        R = boxes.shape[0]
        cls_onehot = jax.nn.one_hot(classes, cfg.num_classes)  # (R, C)

        def coarse_at(coords):  # (R, P, 2) -> (R, P, C)
            def per_roi(cr, co):
                return point_sample(cr.transpose(1, 2, 0), co)

            return jax.vmap(per_roi)(coarse, coords)

        def fine_at(coords):  # (R, P, 2) -> (R, P, 256)
            return sample_in_box_points(p2, boxes, coords, stride=4)

        # first pass: regular coarse_side grid
        side = cfg.coarse_side
        grid = jnp.broadcast_to(
            regular_grid_coords(side)[None], (R, side * side, 2)
        )
        logits_pts = self.point_head(fine_at(grid), coarse_at(grid))  # (R, P, C)
        logits_cls = jnp.einsum("rpc,rc->rp", logits_pts, cls_onehot)
        mask = logits_cls.reshape(R, side, side)

        for _ in range(cfg.subdivision_steps):
            side = side * 2
            mask = jax.image.resize(mask, (R, side, side), "linear")
            if side * side <= cfg.subdivision_points:
                coords = jnp.broadcast_to(
                    regular_grid_coords(side)[None], (R, side * side, 2)
                )
                logits_pts = self.point_head(fine_at(coords), coarse_at(coords))
                mask = jnp.einsum("rpc,rc->rp", logits_pts, cls_onehot).reshape(
                    R, side, side
                )
                continue
            uncertainty = -jnp.abs(mask.reshape(R, -1))
            _, pidx = jax.lax.top_k(uncertainty, cfg.subdivision_points)
            py = (pidx // side).astype(jnp.float32)
            px = (pidx % side).astype(jnp.float32)
            coords = jnp.stack([(px + 0.5) / side, (py + 0.5) / side], axis=-1)
            logits_pts = self.point_head(fine_at(coords), coarse_at(coords))
            vals = jnp.einsum("rpc,rc->rp", logits_pts, cls_onehot)
            flat = mask.reshape(R, -1)
            flat = jax.vmap(lambda m, i, v: m.at[i].set(v))(flat, pidx, vals)
            mask = flat.reshape(R, side, side)
        return mask

    def __call__(self, image: jax.Array):
        """Preprocessed image (H, W, 3) BGR-normalized -> padded detections
        with (max_detections, 224, 224) mask logits."""
        hw = image.shape[:2]
        fpn = self.features(image)
        proposals, prop_valid = self.rpn(fpn, hw)
        det = self.detect(fpn, proposals, prop_valid, hw)
        det["mask_logits"] = self.point_rend_masks(
            fpn["p2"], det["boxes"], det["classes"]
        )
        return det


def clip_boxes(boxes: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    H, W = hw
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, W),
            jnp.clip(boxes[..., 1], 0, H),
            jnp.clip(boxes[..., 2], 0, W),
            jnp.clip(boxes[..., 3], 0, H),
        ],
        axis=-1,
    )


def regular_grid_coords(side: int) -> jax.Array:
    """d2 ``generate_regular_grid_point_coords``: an affine_grid regular
    side x side grid over [0, 1]^2 — i.e. align_corners=False cell centers."""
    step = 1.0 / side
    c = (jnp.arange(side, dtype=jnp.float32) + 0.5) * step
    gy, gx = jnp.meshgrid(c, c, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def sample_in_box_points(
    feat: jax.Array, boxes: jax.Array, coords: jax.Array, stride: int
) -> jax.Array:
    """d2 ``point_sample_fine_grained_features``: in-box normalized point
    coords -> image coords -> feature-grid sample. ``feat`` (H, W, C), boxes
    (R, 4) image-space xyxy, coords (P, 2) or (R, P, 2) in [0, 1] within the
    box -> (R, P, C)."""
    H, W, _ = feat.shape
    if coords.ndim == 2:
        coords = jnp.broadcast_to(coords[None], (boxes.shape[0],) + coords.shape)
    x0, y0 = boxes[:, None, 0], boxes[:, None, 1]
    bw = boxes[:, None, 2] - boxes[:, None, 0]
    bh = boxes[:, None, 3] - boxes[:, None, 1]
    ix = x0 + coords[..., 0] * bw  # image-space points
    iy = y0 + coords[..., 1] * bh
    # normalize by the feature map's image extent (d2 divides by size*stride)
    norm = jnp.stack([ix / (W * stride), iy / (H * stride)], axis=-1)
    return grid_sample_bilinear(feat, norm)


# -------------------------------------------------------------------------
# Image pre/post processing (host side, numpy)
# -------------------------------------------------------------------------


def preprocess_image(rgb_uint8: np.ndarray, cfg: PointRendConfig = PointRendConfig()):
    """d2 DefaultPredictor preprocessing: RGB uint8 (H, W, 3) -> BGR float,
    shortest edge resized to ``test_size``, mean-subtracted. Returns the
    network input and the (scale_y, scale_x) back to original pixels."""
    H, W = rgb_uint8.shape[:2]
    scale = cfg.test_size / min(H, W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    img = jax.image.resize(
        jnp.asarray(rgb_uint8, jnp.float32), (nh, nw, 3), "linear"
    )
    bgr = img[..., ::-1] - jnp.asarray(cfg.pixel_mean)
    # pad to a multiple of 32 (FPN divisibility), zeros like d2's batch pad
    ph = (32 - nh % 32) % 32
    pw = (32 - nw % 32) % 32
    bgr = jnp.pad(bgr, ((0, ph), (0, pw), (0, 0)))
    return bgr, (H / nh, W / nw)


def merged_person_mask(
    det: Dict[str, jax.Array],
    image_hw: Tuple[int, int],
    box_scale: Tuple[float, float],
    score_thresh: float = 0.8,
    person_class: int = 0,
    paste_stride: int = 1,
) -> jax.Array:
    """Jittable paste + merge: detector output -> one binary person mask at
    ``image_hw``. This is the reference's ``merge_mode='merge'``
    (``adaptive_mask_inpainting.py:1210-1215``) fused into XLA so the
    adaptive-mask provoke step never leaves the device. ``box_scale`` maps
    detector coordinates back to image pixels (sy, sx).

    ``paste_stride > 1`` pastes on a coarser pixel grid (sampling at the
    coarse pixel centers) and nearest-upsamples back to ``image_hw`` — the
    in-loop accelerator: the provoke step immediately ANDs the mask with the
    default mask and downsamples it to latent resolution (stride 8), so
    pasting at stride <= 8 can only change latent cells whose 8x8 pixel
    block straddles the stride-1 mask's pixel-level boundary (property
    tested in ``tests/test_pointrend.py``)."""
    H, W = image_hw
    s = paste_stride
    ph, pw = H // s, W // s
    sy, sx = box_scale
    boxes = det["boxes"] * jnp.asarray([sx, sy, sx, sy])
    keep = det["valid"] & (det["classes"] == person_class) & (
        det["scores"] >= score_thresh
    )
    logits = det["mask_logits"]  # (R, S, S)
    R, S, _ = logits.shape
    ys = (jnp.arange(ph, dtype=jnp.float32) + 0.5) * (H / ph)
    xs = (jnp.arange(pw, dtype=jnp.float32) + 0.5) * (W / pw)

    taps = jnp.arange(S, dtype=jnp.float32)

    def paste_one(l, b, k):
        u = (xs - b[0]) / jnp.maximum(b[2] - b[0], 1e-6)  # (pw,)
        v = (ys - b[1]) / jnp.maximum(b[3] - b[1], 1e-6)  # (ph,)
        # Bilinear sampling is separable: the grid_sample at continuous
        # position p = coord*S - 0.5 with zero padding equals
        # sum_a relu(1 - |p - a|) * l[a] over the S taps, so the whole
        # (ph, pw) paste is two matmuls (MXU) instead of 4 gathers per pixel
        # (gathers don't vectorize on TPU; the 1.7 s/batch stage measured in
        # docs/KERNELS.md was exactly this).
        wy = jnp.maximum(0.0, 1.0 - jnp.abs((v * S - 0.5)[:, None] - taps))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs((u * S - 0.5)[:, None] - taps))
        vals = wy @ l.astype(jnp.float32) @ wx.T  # (ph, pw)
        inside = ((v > 0) & (v < 1))[:, None] & ((u > 0) & (u < 1))[None, :]
        return (vals > 0) & inside & k

    # scan-accumulate rather than vmap+any: only one (ph, pw) paste is live
    # at a time, so the fused provoke-step graph never materializes the
    # (R, ph, pw) stack through the merge reduction
    merged, _ = jax.lax.scan(
        lambda acc, xs_: (acc | paste_one(*xs_), None),
        jnp.zeros((ph, pw), bool),
        (logits, boxes, keep),
    )
    if s > 1:
        merged = jax.image.resize(
            merged.astype(jnp.float32), (H, W), "nearest"
        ) > 0.5
    return merged


def make_pointrend_segment_fn(
    model: "PointRendModel",
    score_thresh: float = 0.8,
    compute_dtype=None,
    paste_stride: int = 1,
):
    """Batched in-scan segment_fn — (params, images (B, H, W, 3) RGB in
    [0, 1]) -> (B, H, W) float masks — the PointRend counterpart of the
    U-Net ``person_fn`` in ``cli/inpaint.py``. Fully jittable; the whole
    detector runs inside the diffusion scan at every provoke step, exactly
    the reference's in-loop PointRendPredictor.

    ``compute_dtype=jnp.bfloat16`` casts params + activations so the R50-FPN
    convolutions hit the MXU in bf16 (box/score refinement stays in the mixed
    promotion, so NMS ordering is f32); ``paste_stride`` coarsens the mask
    paste grid (see :func:`merged_person_mask`)."""
    cfg = model.cfg
    mean_rgb = jnp.asarray(cfg.pixel_mean)[::-1]

    def one(variables, img):
        H, W, _ = img.shape
        scale = cfg.test_size / min(H, W)
        nh, nw = int(round(H * scale)), int(round(W * scale))
        net = jax.image.resize(img * 255.0, (nh, nw, 3), "linear")
        net = (net - mean_rgb)[..., ::-1]  # BGR, mean-subtracted
        ph, pw = (32 - nh % 32) % 32, (32 - nw % 32) % 32
        net = jnp.pad(net, ((0, ph), (0, pw), (0, 0)))
        if compute_dtype is not None:
            net = net.astype(compute_dtype)
        det = model.apply(variables, net)
        mask = merged_person_mask(
            det, (H, W), (H / nh, W / nw), score_thresh,
            paste_stride=paste_stride,
        )
        return mask.astype(jnp.float32)

    def segment_fn(prm, imgs):
        variables = prm["pointrend"]
        if compute_dtype is not None:
            variables = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                variables,
            )
        return jax.vmap(lambda im: one(variables, im))(imgs)

    return segment_fn


class PointRendPersonSegmenter:
    """Instance-mask adapter: RGB image -> person instances, the ``MaskModel``
    interface consumed by ``coma_tpu.models.mask_predictors`` and the
    ``segment_human`` stage (the reference's PointRendPredictor role,
    ``utils/adaptive_mask_inpainting.py:1182``). The detector runs as one
    jitted XLA program; only paste-to-image runs on host."""

    PERSON_CLASS = 0  # COCO

    def __init__(self, variables, cfg: PointRendConfig = PointRendConfig(),
                 score_thresh: float = 0.05):
        model = PointRendModel(cfg)
        self.cfg = cfg
        self.variables = variables
        self.score_thresh = score_thresh
        self._apply = jax.jit(lambda v, img: model.apply(v, img))

    def __call__(self, image: np.ndarray) -> list:
        rgb = np.asarray(image)
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        net_in, (sy, sx) = preprocess_image(rgb, self.cfg)
        det = jax.device_get(self._apply(self.variables, net_in))
        keep = (
            det["valid"]
            & (det["classes"] == self.PERSON_CLASS)
            & (det["scores"] >= self.score_thresh)
        )
        boxes_img = det["boxes"][keep] * np.array([sx, sy, sx, sy], np.float32)
        masks = paste_masks(det["mask_logits"][keep], boxes_img, rgb.shape[:2])
        return [
            dict(mask=m, bbox=b.astype(np.float32), score=float(s), pred_class=0)
            for m, b, s in zip(masks, boxes_img, det["scores"][keep])
        ]


def paste_masks(
    mask_logits: np.ndarray,
    boxes: np.ndarray,
    image_hw: Tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """d2 ``paste_masks_in_image``: per-instance 224x224 logits -> binary
    masks at image resolution (host numpy; offline stage only)."""
    R, S, _ = mask_logits.shape
    H, W = image_hw
    out = np.zeros((R, H, W), bool)
    for i in range(R):
        x0, y0, x1, y1 = boxes[i]
        ix0, iy0 = max(int(np.floor(x0)), 0), max(int(np.floor(y0)), 0)
        ix1, iy1 = min(int(np.ceil(x1)), W), min(int(np.ceil(y1)), H)
        if ix1 <= ix0 or iy1 <= iy0:
            continue
        xs = (np.arange(ix0, ix1) + 0.5 - x0) / max(x1 - x0, 1e-6)
        ys = (np.arange(iy0, iy1) + 0.5 - y0) / max(y1 - y0, 1e-6)
        gx = np.clip(xs * S - 0.5, 0, S - 1)
        gy = np.clip(ys * S - 0.5, 0, S - 1)
        x0i = np.floor(gx).astype(int)
        y0i = np.floor(gy).astype(int)
        x1i = np.minimum(x0i + 1, S - 1)
        y1i = np.minimum(y0i + 1, S - 1)
        wx = gx - x0i
        wy = gy - y0i
        m = mask_logits[i]
        vals = (
            m[np.ix_(y0i, x0i)] * (1 - wy)[:, None] * (1 - wx)[None, :]
            + m[np.ix_(y0i, x1i)] * (1 - wy)[:, None] * wx[None, :]
            + m[np.ix_(y1i, x0i)] * wy[:, None] * (1 - wx)[None, :]
            + m[np.ix_(y1i, x1i)] * wy[:, None] * wx[None, :]
        )
        out[i, iy0:iy1, ix0:ix1] = vals > np.log(threshold / (1 - threshold))
    return out
