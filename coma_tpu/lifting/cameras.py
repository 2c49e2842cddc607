"""Orthographic camera model + coordinate-compat transforms (pure JAX).

Reference parity: the Blender orthographic camera the whole 3D stage is
built around — ``utils/blenderproc.py:set_camera_config:60-80`` (ortho_scale
semantics), the OpenGL->Blender compat matrix
(``constants/generation/visualizers.py:4``), world->pixel projection
(``optimize_depth.py:get_view2joints_render:185-198``), the DLT projection
matrix (``optimize_depth.py:get_projection_matrix:165-183``), and the
camera->world conversion of regressed humans
(``optimize_depth.py:convert_cam2real:79-103``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# constants/generation/visualizers.py (coordinate-compat data)
COMPATIBILITY_MATRIX_TRIMESH_P3D_TO_BLENDER = np.array(
    [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]]
)
COMPATIBILITY_MATRIX_OPENGL_TO_BLENDER = np.array(
    [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["R", "t"],
    meta_fields=["scale", "resolution"],
)
@dataclasses.dataclass(frozen=True)
class OrthoCamera:
    """Blender-convention orthographic camera.

    ``R``/``t``: camera-to-world rotation/translation as stored in the
    reference's camera pickles; ``scale``: ortho_scale (world units seen
    across max(resolution) pixels); ``resolution``: (W, H).
    """

    R: jax.Array                  # (3, 3)
    t: jax.Array                  # (3,)
    scale: float = 1.0
    resolution: Tuple[int, int] = (512, 512)

    @property
    def front(self) -> jax.Array:
        """The camera viewing direction in world space (−Z of the camera)."""
        return -self.R[:, 2]


def _gl2bl(dtype) -> jax.Array:
    return jnp.asarray(COMPATIBILITY_MATRIX_OPENGL_TO_BLENDER, dtype=dtype)


def project_points(camera: OrthoCamera, points: jax.Array) -> jax.Array:
    """World points (..., 3) -> (..., 3): pixel x, pixel y, pixel-scale depth.

    Reference: ``optimize_depth.py:get_view2joints_render:185-198``.
    """
    M = camera.R @ _gl2bl(points.dtype)
    cam = points @ M - (camera.t @ M)[None, :]
    W, H = camera.resolution
    m = float(max(camera.resolution))
    x = cam[..., 0] / camera.scale * m + W / 2.0
    y = cam[..., 1] / camera.scale * m + H / 2.0
    z = cam[..., 2] / camera.scale * m
    return jnp.stack([x, y, z], axis=-1)


def dlt_projection(camera: OrthoCamera) -> Tuple[jax.Array, jax.Array]:
    """(rotation (3,3), translation (3,)) of the pixel-scale origin-centred
    affine projection used for DLT (reference:
    ``optimize_depth.py:get_projection_matrix:165-183``)."""
    m = float(max(camera.resolution))
    gl = _gl2bl(camera.R.dtype)
    rotation = (gl @ camera.R.T) / camera.scale * m
    translation = (-gl @ camera.R.T @ camera.t) / camera.scale * m
    return rotation, translation


def triangulate_pair(
    cam_a: OrthoCamera,
    cam_b: OrthoCamera,
    joints_a: jax.Array,  # (J, 2) pixel coords in view a
    joints_b: jax.Array,  # (J, 2) pixel coords in view b
) -> jax.Array:
    """Two-view DLT triangulation of corresponding 2-D joints -> (J, 3) world.

    Reference: ``optimize_depth.py:solve_DLT:200-238`` — stack the two views'
    first two projection rows into A (4x3), b from origin-centred pixels,
    least-squares via pinv. A depends only on the view pair, so the pinv is
    computed once and applied to all joints (the reference recomputes the
    pinv per joint on CPU — the hot spot its profile showed).
    """
    rot_a, tr_a = dlt_projection(cam_a)
    rot_b, tr_b = dlt_projection(cam_b)
    Wa, Ha = cam_a.resolution
    Wb, Hb = cam_b.resolution
    pa = joints_a - jnp.asarray([Wa / 2.0, Ha / 2.0], joints_a.dtype)
    pb = joints_b - jnp.asarray([Wb / 2.0, Hb / 2.0], joints_b.dtype)

    A = jnp.concatenate([rot_a[:2], rot_b[:2]], axis=0)            # (4, 3)
    b = jnp.concatenate(
        [pa - tr_a[None, :2], pb - tr_b[None, :2]], axis=-1
    )                                                               # (J, 4)
    A_pinv = jnp.linalg.pinv(A)                                     # (3, 4)
    return b @ A_pinv.T                                             # (J, 3)


def reprojection_mse(
    camera: OrthoCamera, world_joints: jax.Array, joints_2d: jax.Array
) -> jax.Array:
    """mean_j ||project(X_j).xy − x_j||² (the reference's joints_MSE)."""
    proj = project_points(camera, world_joints)[..., :2]
    return jnp.mean(jnp.sum((proj - joints_2d) ** 2, axis=-1))


def convert_cam2real(
    verts: jax.Array,         # (B, V, 3) SMPL-X camera-space vertices
    transl: jax.Array,        # (B, 3)
    camera: OrthoCamera,
    focals: Tuple[float, float],
    princpt: Tuple[float, float],
    z_mean: float,
) -> jax.Array:
    """Regressed-human camera space -> world space.

    Reference: ``optimize_depth.py:convert_cam2real:79-103`` (also the
    pixel->world transform in ``initialize_depth.py:312-319``).
    """
    W, H = camera.resolution
    m = float(max(camera.resolution))
    v = verts + transl[:, None, :]
    fx, fy = focals
    v = v * jnp.asarray([fx / z_mean, fy / z_mean, (fx + fy) / 2.0 / z_mean], v.dtype)
    z_mean_img = jnp.mean(v[:, :, 2])
    v = v + jnp.asarray([princpt[0], princpt[1], 0.0], v.dtype)
    v = v.at[:, :, 2].add(500.0 - z_mean_img)
    v = (
        v - jnp.asarray([W / 2.0, H / 2.0, 0.0], v.dtype)
    ) / m * camera.scale
    return v @ (_gl2bl(v.dtype) @ camera.R.T) + camera.t


def pixels_to_world(points_px: jax.Array, camera: OrthoCamera) -> jax.Array:
    """Pixel-scale points (..., 3) -> world (the inverse of project_points).

    Reference: ``initialize_depth.py:311-319`` — (p - res/2)/max(res)·scale
    (z un-centered), then ``@ (GL2BL @ R.T) + t``.
    """
    W, H = camera.resolution
    m = float(max(camera.resolution))
    p = (
        points_px - jnp.asarray([W / 2.0, H / 2.0, 0.0], points_px.dtype)
    ) / m * camera.scale
    return p @ (_gl2bl(p.dtype) @ camera.R.T) + camera.t
