"""Multiview object rendering stage (Blender-free).

Reference parity: ``src/generation/render_objects.py`` — per asset: place on
the ground plane, build a ring of orthographic cameras
(``:125-135``), sample per-category rotation/displacement perturbations
(``:143-236``), rasterize the grid of candidate human-placement bbox masks
(``:274-303`` via ``utils/blenderproc.py:render_points:183-198`` + convex
hull fill), render the object segmentation (``:314-318``, alpha-channel
handler), and save camera extrinsics + object pose pickles (``:330-347``).

Everything except the photoreal RGB render is pure geometry; the segmap and
mask rasterization run through :mod:`coma_tpu.lifting.rasterizer` on device.
For RGB, a flat-Lambertian preview render is provided; a real PBR renderer
(Blender) remains optional for photorealism and plugs in behind the same
paths.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from coma_tpu.lifting.cameras import OrthoCamera
from coma_tpu.lifting.rasterizer import rasterize_depth, render_silhouette
from coma_tpu.lifting.cameras import project_points


def euler_xyz_to_matrix(rx: float, ry: float, rz: float) -> np.ndarray:
    """Blender 'XYZ' euler -> rotation matrix (R = Rz @ Ry @ Rx)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def build_camera_ring(
    length_z: float,
    ortho_scale_world: float,
    view_num: int,
    elevation_deg: float = 15.0,
    azimuth_deg: float = 0.0,
    z_scale: float = 1.0,
    radius: float = 10.0,
    resolution: Tuple[int, int] = (512, 512),
) -> List[OrthoCamera]:
    """The ring of orthographic cameras around the asset.

    Reference: ``render_objects.py:125-135`` — camera view_idx at azimuth
    a_i = azimuth + 2π i / view_num, location on a circle of ``radius`` at
    height radius·sin(elev) + length_z·z_scale, rotation_euler XYZ =
    (π/2 − elev, 0, π/2 + a_i). ``ortho_scale_world`` is the precomputed
    ``max_extent * config.ortho_scale * 2`` (``:107``).
    """
    elevation = np.deg2rad(elevation_deg)
    azimuth = np.deg2rad(azimuth_deg)
    cameras = []
    for view_idx in range(view_num):
        a = azimuth + (2 * np.pi / view_num) * view_idx
        location = np.array(
            [
                radius * np.cos(elevation) * np.cos(a),
                radius * np.cos(elevation) * np.sin(a),
                radius * np.sin(elevation) + length_z * z_scale,
            ]
        )
        R = euler_xyz_to_matrix(np.pi / 2 - elevation, 0.0, np.pi / 2 + a)
        cameras.append(
            OrthoCamera(
                R=jnp.asarray(R, jnp.float32),
                t=jnp.asarray(location, jnp.float32),
                scale=float(ortho_scale_world),
                resolution=resolution,
            )
        )
    return cameras


def _sample_interval_list(intervals, n, rng) -> np.ndarray:
    """The reference's interval sampler (``render_objects.py:155-162``):
    per draw, sample a uniform from each interval and pick one with
    probability ∝ (start − end) normalized (kept verbatim, quirk included)."""
    prob = np.array([start - end for start, end in intervals], dtype=np.float64)
    prob = prob / prob.sum()
    out = []
    for _ in range(n):
        draws = [rng.uniform(lo, hi) for lo, hi in intervals]
        out.append(rng.choice(draws, p=prob) if len(draws) > 1 else draws[0])
    return np.asarray(out)


def sample_perturbations(
    perturb_config: Dict, perturb_sample_num: int, rng: np.random.Generator
) -> List[Dict[str, np.ndarray]]:
    """Rotation/displacement perturbations per category config.

    Reference: ``render_objects.py:143-236``. Returns a list of dicts with
    rotation matrices (x/y/z) and fractional displacements.
    """
    if not perturb_config.get("need_perturb", False):
        return [
            dict(
                rotation_matrix=np.eye(3),
                displacement_frac=np.zeros(3),
            )
        ]

    def rot_list(key, builder):
        if perturb_config.get(key) is not None:
            angles = _sample_interval_list(perturb_config[key], perturb_sample_num, rng)
            return [builder(np.deg2rad(a)) for a in angles]
        return [np.eye(3)] * perturb_sample_num

    def rot_x(a):
        return np.array(
            [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
        )

    def rot_y(a):  # NOTE: reference's y-rotation has the sign of sin flipped
        return np.array(
            [[np.cos(a), 0, -np.sin(a)], [0, 1, 0], [np.sin(a), 0, np.cos(a)]]
        )

    def rot_z(a):
        return np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
        )

    rx = rot_list("rotation_x", rot_x)
    ry = rot_list("rotation_y", rot_y)
    rz = rot_list("rotation_z", rot_z)

    disp = []
    for key in ("displacement_x", "displacement_y", "displacement_z"):
        if perturb_config.get(key) is not None:
            disp.append(_sample_interval_list(perturb_config[key], perturb_sample_num, rng))
        else:
            disp.append(np.zeros(perturb_sample_num))

    return [
        dict(
            rotation_matrix=rx[i] @ ry[i] @ rz[i],
            displacement_frac=np.array([disp[0][i], disp[1][i], disp[2][i]]),
        )
        for i in range(perturb_sample_num)
    ]


def render_points_px(camera: OrthoCamera, points: np.ndarray) -> np.ndarray:
    """World points -> pixel coords with the mask-grid path's convention.

    Reference: ``utils/blenderproc.py:render_points:183-198`` — NOTE this
    path scales x by W and y by H separately (the lifting path uses
    max(W, H) for both; they agree at the square 512x512 the pipeline uses).
    """
    W, H = camera.resolution
    R = np.asarray(camera.R, np.float64)
    t = np.asarray(camera.t, np.float64)
    compat = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=np.float64)
    cam = (points - t) @ R @ compat.T  # inverse of matrix_world, then flip y/z
    px = cam[..., 0] * W / camera.scale + W / 2.0
    py = cam[..., 1] * H / camera.scale + H / 2.0
    return np.stack([px, py], axis=-1)


def candidate_mask_grid(
    camera: OrthoCamera,
    asset_bounds: Tuple[np.ndarray, np.ndarray],  # (min_xyz, max_xyz) on-plane
    bbox_size: Tuple[float, float, float],
    stride_x: float,
    stride_y: float,
    azimuth_z: float,
) -> np.ndarray:
    """The grid of candidate human-placement bbox masks, (M, H, W) uint8.

    Reference: ``render_objects.py:254-303`` — ground-plane grid of standing
    bboxes (4 world points per cell: ±bbox_y along the camera-aligned x axis
    at heights 0 and 2·bbox_z), projected and filled as convex polygons.
    """
    import cv2

    (x_min, y_min, _), (x_max, y_max, _) = asset_bounds
    bbox_x, bbox_y, bbox_z = bbox_size
    xs = np.arange(np.ceil((x_min - bbox_x) / stride_x) * stride_x, x_max + bbox_x, stride_x)
    ys = np.arange(np.ceil((y_min - bbox_y) / stride_y) * stride_y, y_max + bbox_y, stride_y)
    gx, gy = np.meshgrid(xs, ys)
    centers = np.column_stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)])  # (M, 3)

    axis_x = np.array([np.cos(azimuth_z), np.sin(azimuth_z), 0.0])
    axis_z = np.array([0.0, 0.0, 1.0])
    four = np.stack(
        [
            centers + axis_x * bbox_y,
            centers + axis_x * bbox_y + axis_z * bbox_z * 2,
            centers - axis_x * bbox_y + axis_z * bbox_z * 2,
            centers - axis_x * bbox_y,
        ],
        axis=1,
    )  # (M, 4, 3)
    px = render_points_px(camera, four)  # (M, 4, 2)

    W, H = camera.resolution
    masks = np.zeros((len(centers), H, W), dtype=np.uint8)
    for i, quad in enumerate(px):
        hull = cv2.convexHull(quad.astype(np.int32))
        cv2.fillConvexPoly(masks[i], hull, 255)
    return masks


def render_object_views(
    camera: OrthoCamera,
    verts: np.ndarray,
    faces: np.ndarray,
    light_dir: Tuple[float, float, float] = (0.3, 0.2, -0.9),
) -> Tuple[np.ndarray, np.ndarray]:
    """Object segmentation mask + flat-Lambertian preview RGB.

    The segmap replaces the reference's Cycles alpha-channel render
    (``render_objects.py:314-318``); the preview render stands in for the
    photoreal RGB (a PBR renderer can substitute without schema changes).
    Returns (seg (H,W) uint8 in {0,255}, rgb (H,W,3) uint8).
    """
    verts_j = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces)
    seg = np.asarray(render_silhouette(camera, verts_j, faces_j)).astype(np.uint8) * 255

    # Lambertian shade from the z-buffer normal of the nearest face
    W, H = camera.resolution
    pz = project_points(camera, verts_j)
    zbuf = np.asarray(rasterize_depth(pz[faces_j], H, W))
    covered = np.isfinite(zbuf)
    # approximate normals from the z-buffer gradient (screen space)
    gz = np.where(covered, zbuf, np.nanmax(np.where(covered, zbuf, np.nan)) if covered.any() else 1.0)
    gy, gx = np.gradient(gz)
    n = np.stack([-gx, -gy, np.ones_like(gz)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    l = -np.asarray(light_dir, dtype=np.float64)
    l /= np.linalg.norm(l)
    shade = np.clip(n @ l, 0.15, 1.0)
    rgb = np.where(covered[..., None], (shade[..., None] * 220).astype(np.uint8), 255)
    return seg, np.repeat(rgb, 3, axis=-1) if rgb.shape[-1] == 1 else rgb.astype(np.uint8)


def render_object_views_textured(
    camera: OrthoCamera,
    verts: np.ndarray,          # (V, 3) world (already perturbed/placed)
    tmesh,                       # geometry.mesh.TexturedMesh (topology/UV/mats)
    ground_z: float = 0.0,
    ground_color: float = 0.78,
    shadows: bool = True,
    ao_samples: int = 0,
    light_samples: int = 1,
    light_cone_deg: float = 0.0,
    specular: float = 0.0,
    roughness: float = 0.35,
    sky_env: bool = False,
    tonemap: bool = False,
    gi_samples: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Object segmap + textured Lambertian RGB over a ground plane.

    The RGB counterpart of the reference's Cycles render with MTL textures
    (``render_objects.py:90,309``; scene = asset + plane + area light,
    ``utils/blenderproc.py:100-113``). ``shadows`` adds the shadow-mapped
    directional light (contact shadow under grounded objects — what the
    reference's Cycles area light produces); ``ao_samples > 0`` adds
    hemispheric ambient occlusion (the GI contact darkening, that many
    extra depth passes); ``specular > 0`` adds a GGX lobe against the view
    direction (Cycles Principled BSDF default specular); ``sky_env`` swaps
    the flat ambient for a sky/ground environment term; ``tonemap`` applies
    the ACES filmic curve (Cycles' Filmic view transform); ``gi_samples >
    0`` adds one-bounce indirect light via a reflective shadow map (color
    bleeding / bounce fill — the single-bounce slice of Cycles' GI).
    Returns (seg uint8, rgb uint8)."""
    from coma_tpu.lifting.rasterizer import render_textured

    verts_j = jnp.asarray(verts, jnp.float32)
    faces = np.asarray(tmesh.faces)
    seg = np.asarray(
        render_silhouette(camera, verts_j, jnp.asarray(faces))
    ).astype(np.uint8) * 255

    pz = np.asarray(project_points(camera, verts_j))  # (V, 3)
    tri_px = pz[faces]
    # per-corner UVs (0 where the face has none -> constant layer anyway)
    fuv = np.asarray(tmesh.face_uvs)
    uvs = tmesh.uvs if len(tmesh.uvs) else np.zeros((1, 2), np.float32)
    tri_uv = uvs[np.clip(fuv, 0, len(uvs) - 1)].astype(np.float32)
    tri_mat = np.asarray(tmesh.face_material, np.int32)
    # world-space face normals for shading
    v = np.asarray(verts, np.float64)
    e1 = v[faces[:, 1]] - v[faces[:, 0]]
    e2 = v[faces[:, 2]] - v[faces[:, 0]]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    # ground plane: two large triangles at z=ground_z on an extra material
    W, H = camera.resolution
    ext = 1e4
    gverts = np.array(
        [[-ext, -ext, ground_z], [ext, -ext, ground_z],
         [ext, ext, ground_z], [-ext, ext, ground_z]], np.float32
    )
    gpz = np.asarray(project_points(camera, jnp.asarray(gverts)))
    g_tri = gpz[np.array([[0, 1, 2], [0, 2, 3]])]
    M = tmesh.textures.shape[0]
    textures = np.concatenate(
        [tmesh.textures,
         np.full((1,) + tmesh.textures.shape[1:], ground_color, np.float32)],
        axis=0,
    )
    tri_px = np.concatenate([tri_px, g_tri], axis=0).astype(np.float32)
    tri_uv = np.concatenate([tri_uv, np.zeros((2, 3, 2), np.float32)], axis=0)
    tri_mat = np.concatenate([tri_mat, np.full(2, M, np.int32)])
    tri_n = np.concatenate([n, np.tile([[0.0, 0.0, 1.0]], (2, 1))]).astype(np.float32)

    shadow_kw = {}
    if shadows:
        # world-space receivers = object + ground; casters = object only
        # (a flat ground quad cannot cast onto anything above it, and its
        # 1e4 extent would otherwise dwarf the shadow-map footprint)
        tri_w = np.concatenate(
            [v.astype(np.float32)[faces], gverts[np.array([[0, 1, 2], [0, 2, 3]])]]
        )
        shadow_kw = dict(
            tri_w=jnp.asarray(tri_w),
            shadow_casters=jnp.asarray(v.astype(np.float32)[faces]),
        )
    photoreal_kw = {}
    if specular > 0.0:
        # surface -> camera in world space: the ortho camera's -front
        photoreal_kw.update(
            specular=specular, roughness=roughness,
            view_dir=tuple(np.asarray(-camera.front, np.float32)),
        )
    if sky_env:
        from coma_tpu.lifting.rasterizer import make_sky_env

        photoreal_kw["env_map"] = make_sky_env()
    rgb, _ = render_textured(
        jnp.asarray(tri_px), jnp.asarray(tri_uv), jnp.asarray(tri_mat),
        jnp.asarray(tri_n), jnp.asarray(textures), H, W,
        ao_samples=ao_samples, light_samples=light_samples,
        light_cone_deg=light_cone_deg, tonemap=tonemap,
        gi_samples=gi_samples if shadows else 0,
        **shadow_kw, **photoreal_kw,
    )
    return seg, (np.asarray(rgb) * 255).astype(np.uint8)


def save_camera_pickle(
    path: str,
    camera: OrthoCamera,
    obj_rotation: np.ndarray,
    obj_perturb_R: np.ndarray,
    obj_location: np.ndarray,
    obj_displacement: np.ndarray,
) -> None:
    """Reference camera pickle schema (``render_objects.py:330-347``)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    R = np.asarray(camera.R, np.float64)
    euler = _matrix_to_euler_xyz(obj_rotation)
    with open(path, "wb") as handle:
        pickle.dump(
            dict(
                R=R,
                t=np.asarray(camera.t, np.float64),
                scale=camera.scale,
                resolution=tuple(camera.resolution),
                obj_rotation=np.asarray(obj_rotation).reshape(3, 3),
                obj_R=np.asarray(obj_perturb_R).reshape(3, 3),
                obj_euler=np.asarray(euler).reshape(3, 1),
                obj_location=np.asarray(obj_location).reshape(3, 1),
                obj_t=np.asarray(obj_displacement).reshape(3, 1),
            ),
            handle,
            protocol=pickle.HIGHEST_PROTOCOL,
        )


def _matrix_to_euler_xyz(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> Blender 'XYZ' euler angles."""
    sy = -R[2, 0]
    cy = np.sqrt(max(0.0, 1.0 - sy * sy))
    if cy > 1e-8:
        rx = np.arctan2(R[2, 1], R[2, 2])
        ry = np.arcsin(np.clip(sy, -1, 1))
        rz = np.arctan2(R[1, 0], R[0, 0])
    else:  # gimbal lock
        rx = np.arctan2(-R[1, 2], R[1, 1])
        ry = np.arcsin(np.clip(sy, -1, 1))
        rz = 0.0
    return np.array([rx, ry, rz])
