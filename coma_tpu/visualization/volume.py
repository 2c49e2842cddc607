"""Ray-marched 3-D occupancy volume rendering (TPU-native mayavi stand-in).

Reference parity: ``src/visualization/visualize_occupancy.py:27-66`` renders
the occupancy ``prob_field`` with ``mayavi.mlab.pipeline.volume`` (GPU/VTK
emission-absorption volume rendering) and composites the canonicalized
object mesh into the same scene. This module reproduces that as one jitted
XLA program: a fixed-step front-to-back emission-absorption ray march over
the voxel grid (trilinear sampling, ``lax.scan`` over depth slabs) with the
object mesh composited depth-correctly from the package's own z-buffer
rasterizer — no VTK, no GUI, static shapes throughout.

Semantics kept from the reference:
* ``ignore_percentage = 0.1`` — field values below 10% of the max are
  zeroed before rendering (``visualize_occupancy.py:26-28``).
* the mesh is drawn in VOXEL coordinates: ``verts / voxel_size + R / 2``
  (``visualize_occupancy.py:52-56``), uniform light-gray (0.8, 0.8, 0.8).
* white background, ~square viewport (``mlab.figure(size=(1000, 1000),
  bgcolor=(1, 1, 1))``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["render_occupancy_volume", "save_occupancy_volume_render"]

IGNORE_PERCENTAGE = 0.1  # visualize_occupancy.py:26


def _jet(v: jax.Array) -> jax.Array:
    """Piecewise-linear jet over [0, 1] -> (..., 3); jit-friendly."""
    r = jnp.clip(1.5 - jnp.abs(4.0 * v - 3.0), 0.0, 1.0)
    g = jnp.clip(1.5 - jnp.abs(4.0 * v - 2.0), 0.0, 1.0)
    b = jnp.clip(1.5 - jnp.abs(4.0 * v - 1.0), 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def _orbit_axes(elev_deg: float, azim_deg: float, dtype=jnp.float32):
    """Right/up/forward unit vectors of an orbit camera looking at the
    grid center (forward points INTO the scene)."""
    el = jnp.deg2rad(jnp.asarray(elev_deg, dtype))
    az = jnp.deg2rad(jnp.asarray(azim_deg, dtype))
    fwd = -jnp.stack([
        jnp.cos(el) * jnp.cos(az),
        jnp.cos(el) * jnp.sin(az),
        jnp.sin(el),
    ])
    world_up = jnp.asarray([0.0, 0.0, 1.0], dtype)
    right = jnp.cross(fwd, world_up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-6)
    up = jnp.cross(right, fwd)
    return right, up, fwd


def _trilinear(field: jax.Array, pts: jax.Array) -> jax.Array:
    """Trilinearly sample ``field`` (X, Y, Z) at voxel-space ``pts``
    (..., 3); zero outside the grid (matches an absorbing boundary)."""
    X, Y, Z = field.shape
    p = pts - 0.5  # voxel centers at integer+0.5
    lo = jnp.floor(p)
    frac = p - lo
    lo = lo.astype(jnp.int32)
    acc = jnp.zeros(pts.shape[:-1], field.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = lo[..., 0] + dx
                iy = lo[..., 1] + dy
                iz = lo[..., 2] + dz
                w = (
                    jnp.where(dx, frac[..., 0], 1.0 - frac[..., 0])
                    * jnp.where(dy, frac[..., 1], 1.0 - frac[..., 1])
                    * jnp.where(dz, frac[..., 2], 1.0 - frac[..., 2])
                )
                inb = (
                    (ix >= 0) & (ix < X)
                    & (iy >= 0) & (iy < Y)
                    & (iz >= 0) & (iz < Z)
                )
                flat = (
                    jnp.clip(ix, 0, X - 1) * (Y * Z)
                    + jnp.clip(iy, 0, Y - 1) * Z
                    + jnp.clip(iz, 0, Z - 1)
                )
                acc = acc + jnp.where(inb, w, 0.0) * field.reshape(-1)[flat]
    return acc


@partial(jax.jit, static_argnames=("resolution", "num_steps", "slab"))
def render_occupancy_volume(
    prob_field: jax.Array,                       # (X, Y, Z) occupancy field
    mesh_zbuf: Optional[jax.Array] = None,       # (H, W) cam-depth or None
    mesh_rgb: Optional[jax.Array] = None,        # (H, W, 3) shaded mesh
    *,
    resolution: int = 512,
    num_steps: int = 192,
    slab: int = 16,
    elev_deg: float = 20.0,
    azim_deg: float = 35.0,
    density: float = 60.0,
    ignore_percentage: float = IGNORE_PERCENTAGE,
) -> jax.Array:
    """Emission-absorption render of the occupancy field -> (H, W, 3).

    Front-to-back compositing over ``num_steps`` fixed steps, scanned in
    depth slabs of ``slab`` steps so only a (slab, H, W) sample block is
    live at once. A mesh pass (``mesh_zbuf``/``mesh_rgb`` from
    :func:`save_occupancy_volume_render`) is composited depth-correctly:
    volume samples behind the surface are occluded, the surface color is
    attenuated by the transmittance accumulated in front of it.
    """
    # the slab scan below reshapes to (num_steps // slab, slab): round the
    # step count UP to the next slab multiple so any num_steps works (the
    # marched depth range is identical; only the step density changes)
    num_steps = ((num_steps + slab - 1) // slab) * slab

    f = prob_field.astype(jnp.float32)
    vmax = jnp.maximum(f.max(), 1e-12)
    f = jnp.where(f > ignore_percentage * vmax, f, 0.0) / vmax

    X, Y, Z = prob_field.shape
    R = max(X, Y, Z)
    H = W = resolution
    center = jnp.asarray([X, Y, Z], jnp.float32) / 2.0
    right, up, fwd = _orbit_axes(elev_deg, azim_deg)

    # orthographic footprint covering the grid diagonal
    span = 1.05 * float(np.sqrt(3.0)) * R
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W - 0.5
    ys = 0.5 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    origin = (
        center[None, None]
        + (px * span)[..., None] * right[None, None]
        + (py * span)[..., None] * up[None, None]
        - (0.5 * span) * fwd[None, None]
    )                                             # (H, W, 3) on near plane
    dt = span / num_steps

    if mesh_zbuf is None:
        mesh_zbuf = jnp.full((H, W), jnp.inf, jnp.float32)
        mesh_rgb = jnp.zeros((H, W, 3), jnp.float32)

    ts = (jnp.arange(num_steps, dtype=jnp.float32) + 0.5) * dt

    def slab_step(carry, t_slab):                 # t_slab: (slab,)
        color, trans = carry
        pos = origin[None] + t_slab[:, None, None, None] * fwd  # (S, H, W, 3)
        v = _trilinear(f, pos)                                  # (S, H, W)
        # samples at/behind the mesh surface are occluded by it
        v = jnp.where(t_slab[:, None, None] < mesh_zbuf[None], v, 0.0)
        alpha = 1.0 - jnp.exp(-density * v * dt / R)
        rgb = _jet(v)
        # sequential front-to-back compositing within the slab
        def comp(c, sv):
            a, col = sv
            c_color, c_trans = c
            c_color = c_color + (c_trans * a)[..., None] * col
            return (c_color, c_trans * (1.0 - a)), None
        (color, trans), _ = jax.lax.scan(comp, (color, trans), (alpha, rgb))
        return (color, trans), None

    color0 = jnp.zeros((H, W, 3), jnp.float32)
    trans0 = jnp.ones((H, W), jnp.float32)
    (color, trans), _ = jax.lax.scan(
        slab_step, (color0, trans0),
        ts.reshape(num_steps // slab, slab),
    )

    # composite the mesh surface, then the white background
    hit = jnp.isfinite(mesh_zbuf)
    color = color + jnp.where(hit, trans, 0.0)[..., None] * mesh_rgb
    trans = jnp.where(hit, 0.0, trans)
    color = color + trans[..., None]  # white background
    return jnp.clip(color, 0.0, 1.0)


def save_occupancy_volume_render(
    path: str,
    prob_field: np.ndarray,
    mesh: Optional[Tuple[np.ndarray, np.ndarray]] = None,  # verts(world), faces
    voxel_size: float = 1.0,
    resolution: int = 512,
    num_steps: int = 192,
    elev_deg: float = 20.0,
    azim_deg: float = 35.0,
) -> np.ndarray:
    """Render and write a PNG; returns the (H, W, 3) float image.

    ``mesh`` vertices are world-space canonicalized coordinates; they are
    placed in voxel space exactly as the reference does
    (``verts / voxel_size + R / 2``, ``visualize_occupancy.py:52-56``) and
    shaded uniform light-gray with a headlight Lambert term.
    """
    from coma_tpu.lifting.rasterizer import rasterize_attributes

    H = W = resolution
    mesh_zbuf = mesh_rgb = None
    if mesh is not None:
        verts, faces = mesh
        X, Y, Z = prob_field.shape
        grid_shape = np.array([X, Y, Z], np.float32)
        vvox = np.asarray(verts, np.float32) / voxel_size + grid_shape / 2.0

        right, up, fwd = (np.asarray(a) for a in _orbit_axes(elev_deg, azim_deg))
        center = grid_shape / 2.0
        span = 1.05 * float(np.sqrt(3.0)) * float(grid_shape.max())
        rel = vvox - center
        cx = rel @ right
        cy = rel @ up
        cz = rel @ fwd + 0.5 * span   # depth from the near plane
        pxv = (cx / span + 0.5) * W
        pyv = (0.5 - cy / span) * H
        f = np.asarray(faces, np.int64)
        tri_px = np.stack(
            [np.stack([pxv[f[:, k]], pyv[f[:, k]], cz[f[:, k]]], -1)
             for k in range(3)], 1,
        )
        e1 = vvox[f[:, 1]] - vvox[f[:, 0]]
        e2 = vvox[f[:, 2]] - vvox[f[:, 0]]
        n = np.cross(e1, e2)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        T = len(f)
        zbuf, _, mat, nrm = rasterize_attributes(
            jnp.asarray(tri_px), jnp.zeros((T, 3, 2), jnp.float32),
            jnp.zeros((T,), jnp.int32), jnp.asarray(n, jnp.float32),
            height=H, width=W, flip_y=False,
        )[:4]
        lambert = jnp.abs(jnp.einsum("hwc,c->hw", nrm, -jnp.asarray(fwd)))
        shade = 0.8 * (0.35 + 0.65 * lambert)      # (0.8, 0.8, 0.8) gray
        mesh_zbuf = zbuf
        mesh_rgb = jnp.repeat(shade[..., None], 3, axis=-1)

    img = np.asarray(render_occupancy_volume(
        jnp.asarray(prob_field), mesh_zbuf, mesh_rgb,
        resolution=resolution, num_steps=num_steps,
        elev_deg=elev_deg, azim_deg=azim_deg,
    ))
    if path:
        from PIL import Image

        Image.fromarray((img * 255).astype(np.uint8)).save(path)
    return img
