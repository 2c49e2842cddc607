"""Segment Anything (SAM) in Flax (NHWC) — box-prompted mask prediction.

Reference parity: the reference's SAM-based adaptive-mask predictors
(``utils/adaptive_mask_inpainting.py:1246-1455``) call
``segment_anything.SamPredictor.predict(box=...)`` on a ``sam_vit_b``
checkpoint. This module implements the full inference path natively:

- :class:`ImageEncoderViT` — ViT-B/16: 16x16 patch embed, learned absolute
  position embedding, 12 transformer blocks with 14x14 windowed attention
  (global attention at blocks {2, 5, 8, 11}) and decomposed relative
  position embeddings, followed by a 2-conv neck to 256 channels.
- :class:`PromptEncoder` — random-Fourier positional encoding; a box becomes
  two corner points with learned corner-type embeddings.
- :class:`MaskDecoder` — a 2-layer two-way transformer (token self-attn,
  token->image and image->token cross-attn), 4x output upscaling, and
  hypernetwork MLPs producing mask logits + IoU predictions.

TPU-first: the whole predict path is one jittable function
(:func:`sam_predict_box`) with static shapes (fixed 1024x1024 input), so it
can be fused into the adaptive-mask inpainting scan as a ``box_model``
backend for :mod:`coma_tpu.models.mask_predictors`. Weights load from the
official ``sam_vit_b_01ec64.pth`` via
:func:`coma_tpu.models.torch_weights_sam.convert_sam`.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768          # ViT-B
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    prompt_dim: int = 256
    num_multimask_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def tiny_sam_config() -> SAMConfig:
    """Small config for hermetic tests (64x64 input)."""
    return SAMConfig(img_size=64, patch_size=8, embed_dim=32, depth=2,
                     num_heads=2, window_size=2, global_attn_indexes=(1,))


def sam_vit_h_config() -> SAMConfig:
    """ViT-H — the checkpoint the reference registers for every SAM key
    (``utils/adaptive_mask_inpainting.py:1240-1242``:
    ``sam_vit_h_4b8939.pth``)."""
    return SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                     global_attn_indexes=(7, 15, 23, 31))


# --------------------------------------------------------------------------
# image encoder
# --------------------------------------------------------------------------

def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Slice/interpolate the relative position table to (q, k, C).

    Matches segment-anything's ``get_rel_pos``: the table has
    2*max(q,k)-1 rows; entry [i, j] is table[(i - j) + k - 1] under equal
    sizes (general form uses size-ratio scaled coords)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """attn (B, qh*qw, kh*kw) += einsum of q with axial rel-pos tables."""
    qh, qw = q_hw
    kh, kw = k_hw
    Rh = get_rel_pos(qh, kh, rel_pos_h)            # (qh, kh, C)
    Rw = get_rel_pos(qw, kw, rel_pos_w)            # (qw, kw, C)
    B = q.shape[0]
    r_q = q.reshape(B, qh, qw, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)  # (B, qh, qw, kh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)  # (B, qh, qw, kw)
    attn = attn.reshape(B, qh, qw, kh, kw)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(B, qh * qw, kh * kw)


class ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative position embeddings."""

    num_heads: int

    @nn.compact
    def __call__(self, x):                          # (B, H, W, C)
        B, H, W, C = x.shape
        head = C // self.num_heads
        qkv = nn.Dense(3 * C, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads, H * W, head)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (head ** -0.5)) @ k.transpose(0, 2, 1)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * H - 1, head))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * W - 1, head))
        attn = add_decomposed_rel_pos(attn, q, rel_h, rel_w, (H, W), (H, W))
        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(B, self.num_heads, H * W, head)
        x = x.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, name="proj")(x)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, win, win, C) with bottom/right padding."""
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(wins, window: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // ((Hp // window) * (Wp // window))
    x = wins.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float
    window_size: int          # 0 = global attention

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
        x = ViTAttention(self.num_heads, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), name="mlp_lin1")(y)
        y = nn.Dense(C, name="mlp_lin2")(nn.gelu(y, approximate=False))
        return x + y


class ImageEncoderViT(nn.Module):
    config: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, x):                          # (B, S, S, 3) normalized
        cfg = self.config
        g = cfg.grid
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size,) * 2, strides=cfg.patch_size,
                    padding="VALID", name="patch_embed")(x)      # (B, g, g, C)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, cfg.embed_dim))
        x = x + pos
        for i in range(cfg.depth):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = ViTBlock(cfg.num_heads, cfg.mlp_ratio, ws, name=f"block_{i}")(x)
        # neck: 1x1 conv + LN2d + 3x3 conv + LN2d (LayerNorm over channels)
        x = nn.Conv(cfg.prompt_dim, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = nn.LayerNorm(name="neck_ln1")(x)
        x = nn.Conv(cfg.prompt_dim, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(x)
        x = nn.LayerNorm(name="neck_ln2")(x)
        return x                                     # (B, g, g, 256)


# --------------------------------------------------------------------------
# prompt encoder
# --------------------------------------------------------------------------

class PromptEncoder(nn.Module):
    """Box prompts only (the reference predictors prompt SAM with bboxes)."""

    config: SAMConfig = SAMConfig()

    def setup(self):
        d = self.config.prompt_dim
        # PositionEmbeddingRandom's gaussian matrix (2, d/2), scale 1
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2)
        )
        # point_embeddings: 0/1 = pos/neg click, 2/3 = box corners
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, d)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (d,)
        )

    def _pe(self, coords01):
        """coords in [0, 1] -> random-Fourier features (…, d)."""
        c = (2.0 * coords01 - 1.0) @ self.pe_gaussian
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self):
        g = self.config.grid
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self._pe(jnp.stack([gx, gy], axis=-1))          # (g, g, d)

    def __call__(self, boxes):                                  # (B, 4) xyxy px
        """Returns (sparse (B, 2, d), dense (B, g, g, d), dense_pe (g, g, d))."""
        cfg = self.config
        B = boxes.shape[0]
        corners = (boxes.reshape(B, 2, 2) + 0.5) / cfg.img_size
        sparse = self._pe(corners) + self.point_embed[2:4][None]
        dense = jnp.broadcast_to(
            self.no_mask_embed, (B, cfg.grid, cfg.grid, cfg.prompt_dim)
        )
        return sparse, dense, self.dense_pe()


# --------------------------------------------------------------------------
# mask decoder (two-way transformer)
# --------------------------------------------------------------------------

class DecoderAttention(nn.Module):
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = q.shape[-1] // self.downsample
        head = d // self.num_heads

        def split(x):
            B, L, _ = x.shape
            return x.reshape(B, L, self.num_heads, head).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(d, name="q_proj")(q))
        kh = split(nn.Dense(d, name="k_proj")(k))
        vh = split(nn.Dense(d, name="v_proj")(v))
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(head), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(q.shape[-1], name="out_proj")(out)


class TwoWayBlock(nn.Module):
    num_heads: int
    skip_first_layer_pe: bool = False
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DecoderAttention(self.num_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(self.num_heads, name="self_attn")(
                q, q, queries
            )
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.num_heads, 2, name="cross_attn_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        mlp = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        queries = queries + nn.Dense(queries.shape[-1], name="mlp_lin2")(
            nn.relu(mlp)
        )
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(self.num_heads, 2, name="cross_attn_i2t")(
            k, q, queries
        )
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class MLP(nn.Module):
    hidden: int
    out: int
    depth: int = 3
    sigmoid_out: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"lin{i}")(x))
        x = nn.Dense(self.out, name=f"lin{self.depth - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class MaskDecoder(nn.Module):
    config: SAMConfig = SAMConfig()

    @nn.compact
    def __call__(self, image_embed, dense_pe, sparse_prompt, dense_prompt):
        """image_embed (B, g, g, d); returns (masks (B, M+1, 4g, 4g),
        iou_pred (B, M+1)) — slot 0 is the single-mask output."""
        cfg = self.config
        d = cfg.prompt_dim
        n_masks = cfg.num_multimask_outputs + 1
        B, g, _, _ = image_embed.shape

        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_masks, d)
        )
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens, (B,) + out_tokens.shape), sparse_prompt],
            axis=1,
        )

        src = (image_embed + dense_prompt).reshape(B, g * g, d)
        pos = jnp.broadcast_to(dense_pe.reshape(1, g * g, d), (B, g * g, d))

        queries, keys = tokens, src
        for i in range(2):
            queries, keys = TwoWayBlock(
                8, skip_first_layer_pe=(i == 0), name=f"layer_{i}"
            )(queries, keys, tokens, pos)
        q = queries + tokens
        k = keys + pos
        queries = queries + DecoderAttention(8, 2, name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + n_masks]

        up = keys.reshape(B, g, g, d)
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), name="upscale1")(up)
        up = nn.gelu(nn.LayerNorm(name="upscale_ln")(up), approximate=False)
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), name="upscale2")(up)
        up = nn.gelu(up, approximate=False)                    # (B, 4g, 4g, d/8)

        hyper = jnp.stack(
            [
                MLP(d, d // 8, name=f"hyper_{i}")(mask_out[:, i])
                for i in range(n_masks)
            ],
            axis=1,
        )                                                       # (B, n, d/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
        iou_pred = MLP(d, n_masks, name="iou_head")(iou_out)
        return masks, iou_pred


# --------------------------------------------------------------------------
# full predict path
# --------------------------------------------------------------------------

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SAM(nn.Module):
    config: SAMConfig = SAMConfig()

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.config)
        self.prompt_encoder = PromptEncoder(self.config)
        self.mask_decoder = MaskDecoder(self.config)

    def __call__(self, image, boxes):
        """image (B, S, S, 3) already mean/std normalized; boxes (B, 4) xyxy
        in input pixels. Returns (mask_logits (B, 4S/p, 4S/p... ) sized
        (B, S/4, S/4) for the single-mask slot, iou (B,))."""
        embed = self.image_encoder(image)
        sparse, dense, dense_pe = self.prompt_encoder(boxes)
        masks, iou = self.mask_decoder(embed, dense_pe, sparse, dense)
        return masks[:, 0], iou[:, 0]    # multimask_output=False -> slot 0


def preprocess_image(image_uint8: np.ndarray, img_size: int = 1024) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (1, S, S, 3) normalized, longest-side resize + pad
    (segment-anything's ResizeLongestSide + pad-to-square)."""
    h, w = image_uint8.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = jax.image.resize(
        jnp.asarray(image_uint8, jnp.float32), (nh, nw, 3), method="bilinear"
    )
    img = (img - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    img = jnp.pad(img, ((0, img_size - nh), (0, img_size - nw), (0, 0)))
    return img[None]


def sam_predict_box(
    model: SAM,
    variables,
    image_uint8: np.ndarray,
    box_xyxy: np.ndarray,
    threshold: float = 0.0,
) -> np.ndarray:
    """Full SamPredictor.predict(box=...) equivalent: returns a binary
    (H, W) mask at the original image resolution."""
    h, w = image_uint8.shape[:2]
    S = model.config.img_size
    scale = S / max(h, w)
    img = preprocess_image(image_uint8, S)
    box = jnp.asarray(box_xyxy, jnp.float32)[None] * scale
    logits, _ = model.apply(variables, img, box)               # (1, S/4, S/4)
    logits = jax.image.resize(logits[0], (S, S), method="bilinear")
    logits = logits[: int(round(h * scale)), : int(round(w * scale))]
    logits = jax.image.resize(logits, (h, w), method="bilinear")
    return np.asarray(logits > threshold).astype(np.uint8)


def make_box_model(model: SAM, variables):
    """Adapter for :mod:`coma_tpu.models.mask_predictors`' BoxPromptModel."""
    def box_model(image: np.ndarray, box: np.ndarray) -> np.ndarray:
        return sam_predict_box(model, variables, image, box)

    return box_model


# --------------------------------------------------------------------------
# in-scan 'ps' segmentation: person seg -> bbox -> SAM refine, all traced
# --------------------------------------------------------------------------

def mask_to_bbox_traced(mask: jax.Array) -> jax.Array:
    """(H, W) binary -> (4,) xyxy bbox, fully traceable (static shapes).
    Empty masks map to the full-image box."""
    H, W = mask.shape
    on = mask > 0
    rows = jnp.any(on, axis=1)
    cols = jnp.any(on, axis=0)
    y0 = jnp.argmax(rows)
    y1 = H - 1 - jnp.argmax(rows[::-1])
    x0 = jnp.argmax(cols)
    x1 = W - 1 - jnp.argmax(cols[::-1])
    box = jnp.stack([x0, y0, x1, y1]).astype(jnp.float32)
    full = jnp.asarray([0.0, 0.0, W - 1.0, H - 1.0])
    return jnp.where(jnp.any(on), box, full)


def make_sam_segment_fn(sam: "SAM", seed_fn):
    """Build a jittable pipeline ``segment_fn`` implementing the reference's
    'ps' adaptive-mask mode (``adaptive_mask_inpainting.py:1246-1293``):
    ``seed_fn(params, images)`` produces coarse person masks (B, H, W); each
    mask's bbox prompts SAM for the refined mask. Runs entirely inside the
    denoise scan (the reference leaves the GPU for detectron2 + SAM on every
    provoke step).

    ``params`` passed through ``generate_p`` must carry the SAM variables
    under ``params['sam']``.
    """
    S = sam.config.img_size

    def segment_fn(params, images):                      # images (B,H,W,3) in [0,1]
        B, H, W, _ = images.shape
        coarse = seed_fn(params, images)                 # (B, H, W)
        x = jax.image.resize(images * 255.0, (B, S, S, 3), method="bilinear")
        x = (x - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        boxes = jax.vmap(mask_to_bbox_traced)(coarse)    # (B, 4) in (W, H) px
        scale = jnp.asarray([S / W, S / H, S / W, S / H], jnp.float32)
        logits, _ = sam.apply(params["sam"], x, boxes * scale)  # (B, S/4, S/4)
        refined = jax.image.resize(logits, (B, H, W), method="bilinear") > 0.0
        return refined.astype(images.dtype)

    return segment_fn
