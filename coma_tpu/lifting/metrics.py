"""Sample-quality metrics: intersection-volume ratio + silhouette IoU.

Reference parity: ``src/generation/compute_metrics.py:compute_metrics:85-112``
— per optimized human: (1) |volume(human ∩ asset)| / |volume(human)| via
``trimesh.boolean.intersection(engine="blender")`` (a per-sample shell-out
to Blender's C++ boolean), and (2) silhouette IoU of the re-rendered human
vs the PointRend mask.

The boolean volume is replaced by a voxel parity estimator: a regular grid
over the human's bbox, point-in-mesh via +z ray-crossing parity, ratio =
#(inside A ∧ inside B) / #(inside A). Fully batched on device; resolution 64
gives ~1e-2 relative accuracy on the 0.05 threshold the post-filter applies
(``filter.py:80``). A C++ exact boolean can slot in behind the same
interface for bit-parity needs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from coma_tpu.lifting.rasterizer import silhouette_iou  # re-export for the stage


def _crossings(points: jax.Array, verts: jax.Array, faces: jax.Array, chunk: int = 256):
    """#(+z ray crossings) per point. points (P, 3); returns (P,) int32."""
    F = faces.shape[0]
    Fp = ((F + chunk - 1) // chunk) * chunk
    tri = verts[faces]                                    # (F, 3, 3)
    tri = jnp.pad(tri, ((0, Fp - F), (0, 0), (0, 0)))

    def chunk_count(count, tri_c):                        # tri_c (chunk, 3, 3)
        v0, v1, v2 = tri_c[:, 0], tri_c[:, 1], tri_c[:, 2]
        # 2D barycentric in xy, for all (point, tri) pairs
        d = lambda a, b: a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
        e0 = (v1 - v0)[None, :, :2]                       # (1, C, 2)
        e1 = (v2 - v0)[None, :, :2]
        p = points[:, None, :2] - v0[None, :, :2]         # (P, C, 2)
        denom = d(e0, e1)                                 # (1, C)
        safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        u = d(p, e1) / safe
        v = d(e0, p) / safe
        inside2d = (u >= 0) & (v >= 0) & (u + v <= 1) & (jnp.abs(denom) > 1e-12)
        z_hit = (
            v0[None, :, 2]
            + u * (v1 - v0)[None, :, 2]
            + v * (v2 - v0)[None, :, 2]
        )
        crossing = inside2d & (z_hit > points[:, None, 2])
        return count + jnp.sum(crossing, axis=1), None

    count0 = jnp.zeros(points.shape[0], dtype=jnp.int32)
    count, _ = jax.lax.scan(
        chunk_count, count0, tri.reshape(Fp // chunk, chunk, 3, 3)
    )
    return count


def points_inside_mesh(points: jax.Array, verts: jax.Array, faces: jax.Array) -> jax.Array:
    """(P,) bool: ray-parity inside test (mesh assumed watertight).

    Query xy is nudged by a tiny irrational offset so rays through shared
    triangle edges (e.g. the diagonal of a quad) don't double-count.
    """
    eps = jnp.asarray([7.3e-6, 3.1e-6, 0.0], points.dtype)
    return _crossings(points + eps, verts, faces) % 2 == 1


@partial(jax.jit, static_argnames=("resolution",))
def intersection_volume_ratio(
    verts_a: jax.Array, faces_a: jax.Array,
    verts_b: jax.Array, faces_b: jax.Array,
    resolution: int = 64,
) -> jax.Array:
    """|V(A ∩ B)| / |V(A)| via voxel parity sampling over A's bbox."""
    lo = jnp.min(verts_a, axis=0)
    hi = jnp.max(verts_a, axis=0)
    n = resolution
    axes = [(jnp.arange(n) + 0.5) / n * (hi[k] - lo[k]) + lo[k] for k in range(3)]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)  # (n³, 3)
    in_a = points_inside_mesh(pts, verts_a, faces_a)
    in_b = points_inside_mesh(pts, verts_b, faces_b)
    count_a = jnp.sum(in_a)
    count_ab = jnp.sum(in_a & in_b)
    return count_ab / jnp.maximum(count_a, 1)


def intersection_volume_ratio_adaptive(
    verts_a: jax.Array, faces_a: jax.Array,
    verts_b: jax.Array, faces_b: jax.Array,
    threshold: float = 0.05,
    gray_zone: float = 0.012,
    resolution: int = 64,
    fine_resolution: int = 128,
) -> float:
    """Threshold-aware estimate: evaluate at ``resolution``; if the estimate
    falls inside ``threshold ± gray_zone`` — where a sampling error could
    flip the post-filter's accept/reject (``filter.py:76-87``) — re-evaluate
    at ``fine_resolution`` and use that.

    Tolerance analysis (docs/TOLERANCE.md): on 14 closed-form oracle pairs
    (axis box-box overlaps + icosphere lenses) straddling the 0.05 filter
    threshold, res-64 max |error| = 0.0053 (mean 0.0022); error scales ~1/n,
    so the res-128 refinement bounds decision error at ~0.003 — decisions
    are reliable for samples whose true ratio is ≥ 6% of the threshold away
    from it. ``gray_zone`` = 0.012 > 2x the res-64 max error, so every case
    that could flip is refined."""
    coarse = float(
        intersection_volume_ratio(
            verts_a, faces_a, verts_b, faces_b, resolution=resolution
        )
    )
    if abs(coarse - threshold) > gray_zone:
        return coarse
    return float(
        intersection_volume_ratio(
            verts_a, faces_a, verts_b, faces_b, resolution=fine_resolution
        )
    )


def mesh_volume(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Exact signed volume via the divergence theorem (watertight mesh)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    return jnp.abs(jnp.sum(jnp.einsum("fi,fi->f", v0, jnp.cross(v1, v2))) / 6.0)
