"""Person segmentation: TPU-resident segmenter + instance utilities.

Reference parity: the PointRend person segmentation used (a) inside the
adaptive-mask diffusion loop ~21x per image
(``utils/adaptive_mask_inpainting.py:PointRendPredictor:1182``), and (b) by
the ``segment_human`` stage (``src/generation/segment_human.py:24``). The
reference crosses GPU->CPU->detectron2(C++/CUDA)->CPU->GPU at every provoke
step; here the segmenter is a jittable Flax model that fuses into the same
XLA program as the denoiser (SURVEY §2.5: "these run inside the diffusion
hot loop so they must be TPU-resident").

Architecture: a U-Net semantic segmenter (person-vs-background). Instance
decomposition (boxes/scores per person) is connected components on host —
only the offline ``segment_human`` stage needs instances; the in-loop
predictor consumes the merged mask exactly as the reference's
``merge_mode='merge'`` does.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    base_channels: int = 32
    depth: int = 4
    dtype: jnp.dtype = jnp.float32


class ConvBlock(nn.Module):
    channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"norm{i}")(x)
            x = nn.silu(x)
        return x


class PersonSegmenter(nn.Module):
    """U-Net: images (B, H, W, 3) in [0, 1] -> person logits (B, H, W)."""

    config: SegmenterConfig = SegmenterConfig()

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        x = images
        skips = []
        ch = cfg.base_channels
        for d in range(cfg.depth):
            x = ConvBlock(ch << d, cfg.dtype, name=f"down_{d}")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(ch << cfg.depth, cfg.dtype, name="bottleneck")(x)
        for d in reversed(range(cfg.depth)):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
            x = jnp.concatenate([x, skips[d]], axis=-1)
            x = ConvBlock(ch << d, cfg.dtype, name=f"up_{d}")(x)
        return nn.Conv(1, (1, 1), dtype=cfg.dtype, name="head")(x)[..., 0]


def probs_to_mask(logits: jax.Array, threshold: float = 0.5) -> jax.Array:
    return (jax.nn.sigmoid(logits) >= threshold).astype(jnp.float32)


def person_probs_canonical(
    model: PersonSegmenter,
    params,
    images: jax.Array,          # (B, H, W, 3) float in [0, 1]
    work_res: int = 128,
) -> jax.Array:
    """Person probabilities at the input resolution via the model's
    TRAINING scale.

    The committed checkpoint is trained at ``work_res``² (``cli/
    train_segmenter.py``); an FCN's features are scale-sensitive, so
    inference at other resolutions (the pipeline runs at 512²) must resize
    to the canonical scale, predict, and upsample the probabilities —
    the same normalize-then-predict shape detectron2's ResizeShortestEdge
    gives the reference's PointRend (``segment_human.py:24``).
    """
    B, H, W, _ = images.shape
    x = images
    if (H, W) != (work_res, work_res):
        x = jax.image.resize(x, (B, work_res, work_res, 3), "linear")
    probs = jax.nn.sigmoid(model.apply(params, x))
    if (H, W) != (work_res, work_res):
        probs = jax.image.resize(probs, (B, H, W), "linear")
    return probs


def make_person_segment_fn(
    model: PersonSegmenter, work_res: int = 128, threshold: float = 0.5
):
    """A jit-friendly ``(params, images) -> (B, H, W) float mask`` closure
    for the adaptive-mask loop and the CLIs."""

    def fn(params, images):
        return (
            person_probs_canonical(model, params, images, work_res) >= threshold
        ).astype(jnp.float32)

    return fn


# ----------------------------------------------------------------------
# Instance utilities (host-side, for the segment_human stage)
# ----------------------------------------------------------------------

def connected_instances(
    mask: np.ndarray, min_area: int = 64
) -> List[Dict[str, np.ndarray]]:
    """Split a binary person mask into instances via connected components.

    Returns [{'mask' (H, W) bool, 'bbox' xyxy, 'score', 'area'}] — the
    fields the downstream postprocess/predict stages consume from the
    reference's detectron2 Instances pickles.
    """
    from scipy import ndimage

    labeled, n = ndimage.label(mask > 0)
    out = []
    for i in range(1, n + 1):
        inst = labeled == i
        area = int(inst.sum())
        if area < min_area:
            continue
        ys, xs = np.nonzero(inst)
        bbox = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)
        # score proxy: mean sigmoid within the instance is filled by callers
        out.append(dict(mask=inst, bbox=bbox, area=area))
    return out


def seg2bbox(mask: np.ndarray) -> np.ndarray:
    """Tight xyxy bbox of a binary mask (reference:
    ``adaptive_mask_inpainting.py:seg2bbox:1160-1166``)."""
    ys, xs = np.nonzero(mask)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])


def merge_bbox(bboxes: List[np.ndarray]) -> np.ndarray:
    """Union of xyxy bboxes (reference: ``merge_bbox:1169-1180``)."""
    assert len(bboxes) > 0
    all_b = np.stack(bboxes, axis=0)
    return np.array(
        [all_b[:, 0].min(), all_b[:, 1].min(), all_b[:, 2].max(), all_b[:, 3].max()]
    )
