"""Mocap adapter: Hand4Whole regression -> pixel-space mesh.

Reference parity: ``utils/prepare_bodymocap.py:Hand4Whole_Regressor:24-157``
— crop the person bbox (square-expanded to the 512x384 aspect), run the
regressor, run SMPL-X with the predicted params, and convert the
camera-space mesh into image space with the virtual-focal scaling:
per-bbox focal f = 5000/body_shape * bbox_size, principal point at the bbox
center, x/y/z scaled by f/z_mean, then shifted by (princpt, 500 - z̄).
Downstream geometry (depth init/opt) depends on these conventions exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.models.hand4whole import (
    FOCAL,
    INPUT_BODY_SHAPE,
    INPUT_IMG_SHAPE,
    Hand4Whole,
)
from coma_tpu.models.keypoints import append_vertex_landmarks
from coma_tpu.models.smplx import SMPLXModel, smplx_forward


def process_bbox(bbox_xywh, img_width: int, img_height: int, ratio: float = 1.25):
    """Square-expand a person bbox to the model's input aspect
    (reference: Hand4Whole ``common/utils_hand4whole/preprocessing.py:process_bbox``)."""
    x, y, w, h = bbox_xywh
    x1 = np.max((0, x))
    y1 = np.max((0, y))
    x2 = np.min((img_width - 1, x1 + np.max((0, w - 1))))
    y2 = np.min((img_height - 1, y1 + np.max((0, h - 1))))
    if w * h <= 0 or x2 < x1 or y2 < y1:
        return None
    w, h = x2 - x1, y2 - y1
    c_x, c_y = x1 + w / 2.0, y1 + h / 2.0
    aspect = INPUT_IMG_SHAPE[1] / INPUT_IMG_SHAPE[0]
    if w > aspect * h:
        h = w / aspect
    elif w < aspect * h:
        w = h * aspect
    w *= ratio
    h *= ratio
    return np.array([c_x - w / 2.0, c_y - h / 2.0, w, h], dtype=np.float32)


def crop_patch(image_rgb: np.ndarray, bbox_xywh: np.ndarray) -> np.ndarray:
    """Bilinear crop of the bbox resized to (512, 384), values in [0, 1]."""
    from coma_tpu.models.hand4whole import crop_and_resize

    x, y, w, h = bbox_xywh
    box = jnp.asarray([[x, y, x + w, y + h]], jnp.float32)
    img = jnp.asarray(image_rgb, jnp.float32)[None] / 255.0
    patch = crop_and_resize(img, box, INPUT_IMG_SHAPE)
    return np.asarray(patch[0])


@dataclasses.dataclass
class MocapOutput:
    pred_vertices_img: np.ndarray   # (V, 3) pixel-space mesh
    pelvis_xyz: np.ndarray          # (3,)
    faces: np.ndarray               # (F, 3)
    smplx_data: Dict[str, np.ndarray]
    joints_proj: np.ndarray         # (J, 2) pixel-space joints
    joints_img: np.ndarray          # (J, 3) pixel-space joints WITH depth
    convert_data: Dict[str, Any]    # focals, princpt, z_mean


class Hand4WholeRegressor:
    """Functional regressor: Flax params + SMPL-X weights pytree."""

    def __init__(self, params, smplx_model: SMPLXModel):
        self.model = Hand4Whole()
        self.params = params
        self.smplx_model = smplx_model
        self._apply = jax.jit(self.model.apply)

    def regress(self, image_rgb: np.ndarray, body_bbox_list) -> list:
        """image_rgb (H, W, 3) uint8; bboxes xywh. Returns [MocapOutput]."""
        H, W = image_rgb.shape[:2]
        outputs = []
        for bbox in body_bbox_list:
            bbox = process_bbox(np.asarray(bbox, np.float32), W, H)
            if bbox is None:
                continue
            patch = crop_patch(image_rgb, bbox)
            out = self._apply(self.params, jnp.asarray(patch)[None])

            smplx_data = dict(
                betas=np.asarray(out["shape"]),
                global_orient=np.asarray(out["root_pose"]),
                transl=np.asarray(out["cam_trans"]),
                left_hand_pose=np.asarray(out["lhand_pose"]),
                right_hand_pose=np.asarray(out["rhand_pose"]),
                jaw_pose=np.asarray(out["jaw_pose"]),
                body_pose=np.asarray(out["body_pose"]),
                expression=np.asarray(out["expr"]),
                leye_pose=np.zeros((1, 3), np.float32),
                reye_pose=np.zeros((1, 3), np.float32),
            )

            verts, joints = smplx_forward(
                self.smplx_model,
                betas=out["shape"],
                global_orient=out["root_pose"],
                body_pose=out["body_pose"],
                left_hand_pose=out["lhand_pose"],
                right_hand_pose=out["rhand_pose"],
                jaw_pose=out["jaw_pose"],
                expression=out["expr"],
            )
            # append the 21 vertex-picked landmarks (joint rows 55-75): the
            # downstream OpenPose permutations (optimize_depth's 67-joint
            # triangulation set) index into them
            joints = append_vertex_landmarks(verts, joints)
            cam_trans = np.asarray(out["cam_trans"])[0]
            mesh_cam = np.asarray(verts)[0] + cam_trans[None]
            joints_cam = np.asarray(joints)[0] + cam_trans[None]

            outputs.append(
                convert_mesh_to_image_space(mesh_cam, joints_cam, bbox,
                                            self.smplx_model.faces_array, smplx_data)
            )
        return outputs


def convert_mesh_to_image_space(
    mesh_cam: np.ndarray,     # (V, 3) camera-space mesh (incl. cam_trans)
    joints_cam: np.ndarray,   # (J, 3) camera-space joints
    bbox: np.ndarray,         # processed xywh bbox in the original image
    faces: np.ndarray,
    smplx_data: Dict[str, np.ndarray],
) -> MocapOutput:
    """The pixel-space conversion downstream geometry depends on
    (reference: ``prepare_bodymocap.py:89-144``)."""
    focal = [
        FOCAL[0] / INPUT_BODY_SHAPE[1] * bbox[2],
        FOCAL[1] / INPUT_BODY_SHAPE[0] * bbox[3],
    ]
    princpt = [
        (INPUT_BODY_SHAPE[1] / 2) / INPUT_BODY_SHAPE[1] * bbox[2] + bbox[0],
        (INPUT_BODY_SHAPE[0] / 2) / INPUT_BODY_SHAPE[0] * bbox[3] + bbox[1],
    ]
    z_mean = float(mesh_cam[:, 2].mean())

    def to_img(pts):
        out = pts.copy()
        out[:, 0] *= focal[0] / z_mean
        out[:, 1] *= focal[1] / z_mean
        if out.shape[1] > 2:
            out[:, 2] *= ((focal[0] + focal[1]) / 2.0) / z_mean
        return out

    mesh_img = to_img(mesh_cam)
    joints_img = to_img(joints_cam)
    z_mean_img = mesh_img[:, 2].mean()
    for arr in (mesh_img, joints_img):
        arr[:, 0] += princpt[0]
        arr[:, 1] += princpt[1]
        arr[:, 2] += 500.0 - z_mean_img

    pelvis_xyz = joints_img[0].copy()
    return MocapOutput(
        pred_vertices_img=mesh_img,
        pelvis_xyz=pelvis_xyz,
        faces=faces.astype(np.int64),
        smplx_data=smplx_data,
        joints_proj=joints_img[:, :2].copy(),
        joints_img=joints_img.copy(),
        convert_data=dict(focals=focal, princpt=princpt, z_mean=z_mean),
    )
