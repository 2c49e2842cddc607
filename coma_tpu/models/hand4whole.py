"""Hand4Whole whole-body 3D human regressor in Flax (NHWC).

Reference parity: ``imports/hand4whole/main/model.py:14-394`` +
``common/nets/module.py`` — ResNet-50 body/hand towers + ResNet-18 face
tower, PositionNet (soft-argmax 3D joint heatmaps), BoxNet (hand/face bbox
regression from body features), RotationNet (6D rotations from
joint-sampled features), FaceRegressor, and the virtual-focal camera
translation. Config dims from ``main/config.py:19-30``: input 512x384, body
crop 256x192, hm (8, 8, 6), hand crop 256x256 hm (8, 8, 8), face 192x192,
virtual focal (5000, 5000).

The published ``snapshot_6.pth.tar`` weights are an external download; this
module defines the faithful architecture and a functional forward that
returns SMPL-X parameters + camera translation, consumed by
:mod:`coma_tpu.pipelines.mocap` (the ``prepare_bodymocap`` equivalent).
ROI extraction uses a dense bilinear crop-resample (torchvision
roi_align(aligned=False) differs at most by half-pixel sampling phase).
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from coma_tpu.geometry.transforms import rot6d_to_rotmat
from coma_tpu.models.resnet import ResNet
from coma_tpu.models.vposer import matrot_to_aa

# --- config (reference: main/config.py) ---
INPUT_IMG_SHAPE = (512, 384)     # (H, W)
INPUT_BODY_SHAPE = (256, 192)
OUTPUT_HM_SHAPE = (8, 8, 6)      # (D, H, W)
INPUT_HAND_SHAPE = (256, 256)
OUTPUT_HAND_HM_SHAPE = (8, 8, 8)
INPUT_FACE_SHAPE = (192, 192)
FOCAL = (5000.0, 5000.0)
PRINCPT = (INPUT_BODY_SHAPE[1] / 2, INPUT_BODY_SHAPE[0] / 2)
CAMERA_3D_SIZE = 2.5

NUM_BODY_POS_JOINTS = 25         # smpl_x.pos_joint_part['body']
NUM_HAND_POS_JOINTS = 20         # per hand
NUM_BODY_ROT_JOINTS = 21         # orig body joints minus root
NUM_HAND_ROT_JOINTS = 15
SHAPE_PARAM_DIM = 10
EXPR_CODE_DIM = 10
# MCP joint indices within each hand's 20 pos joints (human_models.py:496-506)
L_MCP = (4, 8, 12, 16)
R_MCP = (4, 8, 12, 16)


def rot6d_to_axis_angle(x6d: jax.Array) -> jax.Array:
    """(N, 6) -> (N, 3) axis-angle (reference: transforms.rot6d_to_axis_angle)."""
    return matrot_to_aa(rot6d_to_rotmat(x6d))


def soft_argmax_3d(hm: jax.Array) -> jax.Array:
    """(B, J, D, H, W) -> (B, J, 3) expected (x, y, z) coords.

    Reference: ``transforms.py:soft_argmax_3d:617-640``.
    """
    B, J, D, H, W = hm.shape
    p = jax.nn.softmax(hm.reshape(B, J, -1), axis=2).reshape(B, J, D, H, W)
    # expectation as an einsum contraction, NOT a broadcast-multiply-reduce:
    # the axon AOT pass miscompiles the fused reduce's output layout
    # ("expected f32[64,3], actual f32[3,64]{1,0:T(4,128)}" post-optimization
    # error on the real chip), and a dot maps onto the MXU anyway
    idx = lambda n: jnp.arange(n, dtype=hm.dtype)
    x = jnp.einsum("bjdhw,w->bj", p, idx(W))
    y = jnp.einsum("bjdhw,h->bj", p, idx(H))
    z = jnp.einsum("bjdhw,d->bj", p, idx(D))
    return jnp.stack([x, y, z], axis=2), p


def soft_argmax_2d(hm: jax.Array) -> jax.Array:
    """(B, J, H, W) -> (B, J, 2) expected (x, y)."""
    B, J, H, W = hm.shape
    p = jax.nn.softmax(hm.reshape(B, J, -1), axis=2).reshape(B, J, H, W)
    # einsum instead of multiply-reduce: see soft_argmax_3d (axon AOT
    # layout bug workaround; the (b j) output stays contraction-shaped)
    x = jnp.einsum("bjhw,w->bj", p, jnp.arange(W, dtype=hm.dtype))
    y = jnp.einsum("bjhw,h->bj", p, jnp.arange(H, dtype=hm.dtype))
    return jnp.stack([x, y], axis=2)


def sample_joint_features(feat: jax.Array, joint_xy: jax.Array) -> jax.Array:
    """Bilinear feature sampling at joint coordinates.

    feat (B, H, W, C) NHWC; joint_xy (B, J, 2) in feature-map pixel coords
    (align_corners=True convention, reference ``transforms.py:587-594``).
    Returns (B, J, C).
    """
    B, H, W, C = feat.shape

    def sample_one(f, xy):
        x = jnp.clip(xy[:, 0], 0.0, W - 1.0)
        y = jnp.clip(xy[:, 1], 0.0, H - 1.0)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        fx = x - x0
        fy = y - y0
        v00 = f[y0, x0]
        v01 = f[y0, x0 + 1]
        v10 = f[y0 + 1, x0]
        v11 = f[y0 + 1, x0 + 1]
        return (
            v00 * ((1 - fx) * (1 - fy))[:, None]
            + v01 * (fx * (1 - fy))[:, None]
            + v10 * ((1 - fx) * fy)[:, None]
            + v11 * (fx * fy)[:, None]
        )

    return jax.vmap(sample_one)(feat, joint_xy)


def crop_and_resize(
    images: jax.Array,        # (B, H, W, C)
    boxes_xyxy: jax.Array,    # (B, 4) in pixel coords of the image
    out_shape: Tuple[int, int],
) -> jax.Array:
    """Dense bilinear ROI crop (roi_align(aligned=False) approximation)."""
    B, H, W, C = images.shape
    oh, ow = out_shape

    def one(img, box):
        x0, y0, x1, y1 = box
        xs = x0 + (jnp.arange(ow, dtype=img.dtype) + 0.5) / ow * (x1 - x0) - 0.5
        ys = y0 + (jnp.arange(oh, dtype=img.dtype) + 0.5) / oh * (y1 - y0) - 0.5
        gx, gy = jnp.meshgrid(xs, ys)
        grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)[None]  # (1, oh*ow, 2)
        out = sample_joint_features(img[None], grid)[0]            # (oh*ow, C)
        return out.reshape(oh, ow, C)

    return jax.vmap(one)(images, boxes_xyxy)


def restore_bbox(center: jax.Array, size: jax.Array, aspect: float, extension: float) -> jax.Array:
    """bbox center+size -> aspect-corrected, extended xyxy
    (reference: ``main/model.py:restore_bbox``)."""
    w = size[:, 0:1]
    h = size[:, 1:2]
    # aspect correction: keep the larger of (w, h*aspect)
    w = jnp.maximum(w, h * aspect)
    h = w / aspect
    w = w * extension
    h = h * extension
    return jnp.concatenate(
        [center[:, 0:1] - w / 2, center[:, 1:2] - h / 2,
         center[:, 0:1] + w / 2, center[:, 1:2] + h / 2],
        axis=1,
    )


def get_camera_trans(cam_param: jax.Array) -> jax.Array:
    """cam (B, 3) -> translation (B, 3) with the virtual-focal k-value
    (reference: ``main/model.py:get_camera_trans:46-53``)."""
    t_xy = cam_param[:, :2]
    gamma = jax.nn.sigmoid(cam_param[:, 2])
    k = math.sqrt(
        FOCAL[0] * FOCAL[1] * CAMERA_3D_SIZE * CAMERA_3D_SIZE
        / (INPUT_BODY_SHAPE[0] * INPUT_BODY_SHAPE[1])
    )
    return jnp.concatenate([t_xy, (k * gamma)[:, None]], axis=1)


class PositionNet(nn.Module):
    joint_num: int
    hm_shape: Tuple[int, int, int]

    @nn.compact
    def __call__(self, feat):  # (B, h, w, 2048)
        D, H, W = self.hm_shape
        hm = nn.Conv(self.joint_num * D, (1, 1), name="conv")(feat)
        B = hm.shape[0]
        hm = hm.transpose(0, 3, 1, 2).reshape(B, self.joint_num, D, H, W)
        coord, prob = soft_argmax_3d(hm)
        return prob, coord


class RotationNetBody(nn.Module):
    @nn.compact
    def __call__(self, img_feat, joint_img, lhand_feat, lhand_mcp, rhand_feat, rhand_mcp):
        pooled = img_feat.mean(axis=(1, 2))
        shape = nn.Dense(SHAPE_PARAM_DIM, name="shape_out")(pooled)
        cam = nn.Dense(3, name="cam_out")(pooled)

        def conv_bn_relu(x, name):
            x = nn.Conv(512, (1, 1), use_bias=False, name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=True, name=f"{name}_bn")(x)
            return nn.relu(x)

        body = conv_bn_relu(img_feat, "body")
        bfeat = jnp.concatenate(
            [sample_joint_features(body, joint_img[:, :, :2]), joint_img], axis=2
        )
        lh = conv_bn_relu(lhand_feat, "lhand")
        lfeat = jnp.concatenate(
            [sample_joint_features(lh, lhand_mcp[:, :, :2]), lhand_mcp], axis=2
        )
        rh = conv_bn_relu(rhand_feat, "rhand")
        rfeat = jnp.concatenate(
            [sample_joint_features(rh, rhand_mcp[:, :, :2]), rhand_mcp], axis=2
        )
        feat = jnp.concatenate([bfeat, lfeat, rfeat], axis=1)
        flat = feat.reshape(feat.shape[0], -1)
        root_pose = nn.Dense(6, name="root_pose_out")(flat)
        body_pose = nn.Dense(NUM_BODY_ROT_JOINTS * 6, name="body_pose_out")(flat)
        return root_pose, body_pose, shape, cam


class RotationNetHand(nn.Module):
    @nn.compact
    def __call__(self, img_feat, joint_img):
        x = nn.Conv(512, (1, 1), use_bias=False, name="hand_conv")(img_feat)
        x = nn.BatchNorm(use_running_average=True, name="hand_bn")(x)
        x = nn.relu(x)
        feat = jnp.concatenate(
            [sample_joint_features(x, joint_img[:, :, :2]), joint_img], axis=2
        )
        return nn.Dense(NUM_HAND_ROT_JOINTS * 6, name="hand_pose_out")(
            feat.reshape(feat.shape[0], -1)
        )


class BoxNet(nn.Module):
    @nn.compact
    def __call__(self, img_feat, joint_hm, joint_img):
        B = img_feat.shape[0]
        D, Hh, Wh = OUTPUT_HM_SHAPE
        hm = joint_hm.reshape(B, NUM_BODY_POS_JOINTS * D, Hh, Wh).transpose(0, 2, 3, 1)
        x = jnp.concatenate([img_feat, hm], axis=-1)
        # torch ConvTranspose2d(k=4, s=2, p=1) doubles H exactly; in flax
        # that is padding='SAME' (explicit ((1,1),(1,1)) would give 2H-2 and
        # break the /8 coordinate rescale below)
        for i in range(3):
            x = nn.ConvTranspose(256, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, name=f"deconv_{i}")(x)
            x = nn.BatchNorm(use_running_average=True, name=f"deconv_bn_{i}")(x)
            x = nn.relu(x)
        center_hm = nn.Conv(3, (1, 1), name="bbox_center")(x)          # (B, h, w, 3)
        center = soft_argmax_2d(center_hm.transpose(0, 3, 1, 2))       # (B, 3, 2)

        def size_head(name, c):
            f = sample_joint_features(x, c[:, None, :])[:, 0]
            h = nn.relu(nn.Dense(256, name=f"{name}_fc0")(f))
            return nn.Dense(2, name=f"{name}_fc1")(h)

        lc, rc, fc = center[:, 0], center[:, 1], center[:, 2]
        lsize = size_head("lhand_size", lc)
        rsize = size_head("rhand_size", rc)
        fsize = size_head("face_size", fc)
        return lc / 8, lsize, rc / 8, rsize, fc / 8, fsize


class FaceRegressor(nn.Module):
    @nn.compact
    def __call__(self, feat):
        pooled = feat.mean(axis=(1, 2))
        expr = nn.Dense(EXPR_CODE_DIM, name="expr_out")(pooled)
        jaw = nn.Dense(6, name="jaw_pose_out")(pooled)
        return expr, jaw


class Hand4Whole(nn.Module):
    """Full regressor: image (B, 512, 384, 3) normalized -> SMPL-X params.

    Returns dict(root_pose, body_pose, lhand_pose, rhand_pose, jaw_pose (aa),
    shape, expr, cam_trans, body_joint_img).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        B = img.shape[0]
        body_img = jax.image.resize(
            img, (B, INPUT_BODY_SHAPE[0], INPUT_BODY_SHAPE[1], 3), "bilinear"
        )
        img_feat = ResNet(
            (3, 4, 6, 3), True, self.dtype, name="body_backbone"
        )(body_img)                                                     # (B, 8, 6, 2048)

        joint_hm, joint_img = PositionNet(
            NUM_BODY_POS_JOINTS, OUTPUT_HM_SHAPE, name="body_position_net"
        )(img_feat)

        lc, lsize, rc, rsize, fc, fsize = BoxNet(name="box_net")(
            img_feat, jax.lax.stop_gradient(joint_hm), jax.lax.stop_gradient(joint_img)
        )
        aspect_hand = INPUT_HAND_SHAPE[1] / INPUT_HAND_SHAPE[0]
        lhand_bbox = jax.lax.stop_gradient(restore_bbox(lc, lsize, aspect_hand, 2.0))
        rhand_bbox = jax.lax.stop_gradient(restore_bbox(rc, rsize, aspect_hand, 2.0))
        face_bbox = jax.lax.stop_gradient(
            restore_bbox(fc, fsize, INPUT_FACE_SHAPE[1] / INPUT_FACE_SHAPE[0], 1.5)
        )

        # bbox coords live in body-crop space; scale to full-image pixels
        scale = jnp.asarray(
            [
                INPUT_IMG_SHAPE[1] / INPUT_BODY_SHAPE[1],
                INPUT_IMG_SHAPE[0] / INPUT_BODY_SHAPE[0],
            ] * 2,
            img.dtype,
        )
        lhand_img = crop_and_resize(img, lhand_bbox * scale, INPUT_HAND_SHAPE)
        lhand_img = lhand_img[:, :, ::-1, :]  # flip left -> right-hand canonical
        rhand_img = crop_and_resize(img, rhand_bbox * scale, INPUT_HAND_SHAPE)
        hand_imgs = jnp.concatenate([lhand_img, rhand_img], axis=0)
        hand_feat = ResNet(
            (3, 4, 6, 3), True, self.dtype, name="hand_backbone"
        )(hand_imgs)                                                     # (2B, 8, 8, 2048)

        _, hand_joint_img = PositionNet(
            NUM_HAND_POS_JOINTS, OUTPUT_HAND_HM_SHAPE, name="hand_position_net"
        )(hand_feat)
        hand_pose6d = RotationNetHand(name="hand_rotation_net")(
            hand_feat, jax.lax.stop_gradient(hand_joint_img)
        )
        hand_pose = rot6d_to_axis_angle(hand_pose6d.reshape(-1, 6)).reshape(2 * B, -1)

        lhand_joint_img = hand_joint_img[:B]
        lhand_joint_img = jnp.concatenate(
            [OUTPUT_HAND_HM_SHAPE[2] - 1 - lhand_joint_img[:, :, 0:1],
             lhand_joint_img[:, :, 1:]], axis=2,
        )
        rhand_joint_img = hand_joint_img[B:]
        lhand_pose = hand_pose[:B].reshape(B, NUM_HAND_ROT_JOINTS, 3)
        lhand_pose = jnp.concatenate(
            [lhand_pose[:, :, 0:1], -lhand_pose[:, :, 1:3]], axis=2
        ).reshape(B, -1)
        rhand_pose = hand_pose[B:]
        lhand_feat = hand_feat[:B, :, ::-1, :]
        rhand_feat = hand_feat[B:]

        root6d, body6d, shape, cam = RotationNetBody(name="body_rotation_net")(
            img_feat,
            jax.lax.stop_gradient(joint_img),
            lhand_feat,
            jax.lax.stop_gradient(lhand_joint_img[:, list(L_MCP), :]),
            rhand_feat,
            jax.lax.stop_gradient(rhand_joint_img[:, list(R_MCP), :]),
        )
        root_pose = rot6d_to_axis_angle(root6d)
        body_pose = rot6d_to_axis_angle(body6d.reshape(-1, 6)).reshape(B, -1)
        cam_trans = get_camera_trans(cam)

        face_img = crop_and_resize(img, face_bbox * scale, INPUT_FACE_SHAPE)
        face_feat = ResNet(
            (2, 2, 2, 2), False, self.dtype, name="face_backbone"
        )(face_img)
        expr, jaw6d = FaceRegressor(name="face_regressor")(face_feat)
        jaw_pose = rot6d_to_axis_angle(jaw6d)

        return dict(
            root_pose=root_pose,
            body_pose=body_pose,
            lhand_pose=lhand_pose,
            rhand_pose=rhand_pose,
            jaw_pose=jaw_pose,
            shape=shape,
            expr=expr,
            cam_trans=cam_trans,
            body_joint_img=joint_img,
            lhand_bbox=lhand_bbox,
            rhand_bbox=rhand_bbox,
            face_bbox=face_bbox,
        )
