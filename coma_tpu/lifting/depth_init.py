"""Depth initialization: silhouette-IoU search along the camera ray.

Reference parity: ``src/generation/initialize_depth.py`` —
``compute_nearest_point:41`` (object point nearest the pelvis ray),
``extract_candidates:92`` (2*retrieval_range+1 displacement candidates along
the camera front axis), ``select_human:134-201`` (per-candidate Blender
segmap render + IoU vs the PointRend human mask, argmax by
(IoU, -interval_from_center)).

TPU-first: all candidates rasterize in one vmapped jit (the reference runs
7 sequential Blender renders per sample).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.lifting.cameras import OrthoCamera
from coma_tpu.lifting.rasterizer import render_silhouettes_batch, silhouette_iou


def compute_directional_size(mesh_verts: jax.Array, direction: jax.Array) -> jax.Array:
    """Extent of a mesh along a direction (``initialize_depth.py:31-38``)."""
    d = direction / jnp.linalg.norm(direction)
    proj = mesh_verts @ d
    return jnp.max(proj) - jnp.min(proj)


def compute_nearest_point(
    asset_verts: jax.Array, point: jax.Array, direction: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Asset vertex nearest the ray (point, direction); returns the ray point
    closest to it and the signed distance from ``point`` along ``direction``.

    Reference: ``initialize_depth.py:compute_nearest_point:41-63``.
    """
    d = (direction / jnp.linalg.norm(direction)).reshape(1, 3)
    p = point.reshape(1, 3)
    disp = p - asset_verts                                   # (N, 3)
    perp = disp - (disp @ d.T) * d                           # (N, 3)
    idx = jnp.argmin(jnp.linalg.norm(perp, axis=1))
    selected = asset_verts[idx]
    disp_sel = p - selected                                  # (1, 3)
    nearest = p - (disp_sel @ d.T) * d
    distance = -(disp_sel @ d.T)[0, 0]
    return nearest.reshape(3), distance


def candidate_displacements(
    distance_from_center: jax.Array,
    retrieval_range: int,
    stride: float,
) -> jax.Array:
    """2*retrieval_range+1 displacement magnitudes centred on the nearest
    object point along the camera front axis."""
    offsets = jnp.arange(-retrieval_range, retrieval_range + 1, dtype=jnp.float32)
    return distance_from_center + offsets * stride


def initialize_depth_for_sample(
    camera: OrthoCamera,
    human_verts: jax.Array,     # (V, 3) world, at the initial (unshifted) depth
    human_faces: jax.Array,     # (F, 3)
    gt_human_mask: jax.Array,   # (H, W) binary PointRend mask
    displacements: jax.Array,   # (C,) candidate magnitudes along camera front
    occluder_verts: Optional[jax.Array] = None,  # asset (+ground) geometry
    occluder_faces: Optional[jax.Array] = None,
    direction: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Render every depth candidate, pick argmax (IoU, -|dist from center|).

    The occluders are what make depth observable under an orthographic
    camera: the reference renders the candidate human INTO the scene (asset
    + ground plane) so the instance segmap loses the occluded parts.
    ``direction`` defaults to the reference's convention R[:, 2]
    (``initialize_depth.py:306`` — NOT the viewing direction −R[:, 2]); the
    same vector must be used for the nearest-point distance, the candidates,
    and the downstream optimizer. Returns dict(best_index, best_iou,
    best_displacement, ious, best_verts).
    """
    if direction is None:
        direction = camera.R[:, 2]
    direction = direction / jnp.linalg.norm(direction)
    cand_verts = human_verts[None] + displacements[:, None, None] * direction[None, None]
    masks = render_silhouettes_batch(
        camera, cand_verts, human_faces,
        occluder_verts=occluder_verts, occluder_faces=occluder_faces,
    )                                                                   # (C, H, W)
    ious = jax.vmap(lambda m: silhouette_iou(m, gt_human_mask))(masks)  # (C,)

    C = displacements.shape[0]
    # reference's tie-break: interval_from_center = |idx - C| -> among equal
    # IoUs prefer the LARGEST index, i.e. the farthest candidate
    # (initialize_depth.py:182,200). Under an orthographic camera all
    # candidates behind the nearest occluder tie at the same IoU, so the
    # tie-break is load-bearing. 1e-6 stays representable next to f32 IoUs.
    center_penalty = jnp.abs(jnp.arange(C) - C)
    score = ious - 1e-6 * center_penalty.astype(ious.dtype)
    best = jnp.argmax(score)
    return dict(
        best_index=best,
        best_iou=ious[best],
        best_displacement=displacements[best],
        ious=ious,
        best_verts=cand_verts[best],
    )
