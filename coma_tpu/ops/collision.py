"""Triangle-collision counting — the torch-mesh-isect BVH equivalent.

Reference parity: ``src/generation/initialize_depth.py`` —
``compute_collision:74-89`` (count of intersecting triangle pairs from a
CUDA BVH, capped by its ``max_collisions`` output buffer) and the
``filter_out`` candidate pre-filter (``extract_candidates:96-125``). Both
are dead code upstream — ``filter_out`` is never passed (``:356-358``
defaults it False) and the BVH import is absent from INSTALL — closed here
so the inventory row stops being a justified "no".

TPU-first: a pointer-chasing BVH is hostile to XLA (dynamic shapes, data-
dependent traversal). Instead the all-pairs test runs as a blocked double
``lax.scan``: per (block_a, block_b) tile an AABB-overlap gate masks a
vectorized segment-vs-triangle battery (Möller–Trumbore, 6 edge tests per
pair — two non-coplanar triangles intersect iff an edge of one pierces the
other). At the reference's scales (SMPL-X 20k faces x asset ~4k faces,
~10^8 pairs) the brute force is a few fused VPU blocks; the BVH's only job
on a GPU was avoiding exactly this O(F^2) that a TPU happily eats.

Coplanar triangle pairs are counted as non-intersecting (the edge battery's
parallel guard rejects them); exactly-touching configurations are measure-
zero and resolve by f32 rounding, same as any fixed-precision collision
backend.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

_EPS = 1e-9


def pack_triangles(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """(V, 3) + (F, 3) int -> (F, 3, 3) triangle corner array."""
    return jnp.asarray(verts, jnp.float32)[jnp.asarray(faces, jnp.int32)]


def _edge_hits_tri(p, d, v0, e1, e2):
    """Möller–Trumbore segment test, broadcast over a pair tile.

    ``p``/``d``: segment origin and (q - p) direction; ``v0``/``e1``/``e2``:
    triangle origin corner and its two edge vectors. All inputs broadcast to
    (..., 3); returns a (...,) bool — True iff the segment crosses the
    triangle's interior with the hit parameter t in [0, 1].
    """
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    near_parallel = jnp.abs(a) < _EPS
    inv = jnp.where(near_parallel, 1.0, a)
    f = jnp.where(near_parallel, 0.0, 1.0 / inv)
    s = p - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    return (~near_parallel & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= 0.0) & (t <= 1.0))


def _tile_intersects(tri_a: jax.Array, tri_b: jax.Array) -> jax.Array:
    """(Ba, 3, 3) x (Bb, 3, 3) -> (Ba, Bb) bool pairwise intersection."""
    amin = tri_a.min(axis=1)[:, None]          # (Ba, 1, 3)
    amax = tri_a.max(axis=1)[:, None]
    bmin = tri_b.min(axis=1)[None]             # (1, Bb, 3)
    bmax = tri_b.max(axis=1)[None]
    aabb = jnp.all((amin <= bmax) & (bmin <= amax), axis=-1)   # (Ba, Bb)

    v0b = tri_b[:, 0][None]
    e1b = (tri_b[:, 1] - tri_b[:, 0])[None]
    e2b = (tri_b[:, 2] - tri_b[:, 0])[None]
    v0a = tri_a[:, 0][:, None]
    e1a = (tri_a[:, 1] - tri_a[:, 0])[:, None]
    e2a = (tri_a[:, 2] - tri_a[:, 0])[:, None]

    hit = jnp.zeros(aabb.shape, bool)
    for k in range(3):                          # edges of A vs triangle B
        p = tri_a[:, k][:, None]
        d = tri_a[:, (k + 1) % 3][:, None] - p
        hit |= _edge_hits_tri(p, d, v0b, e1b, e2b)
    for k in range(3):                          # edges of B vs triangle A
        p = tri_b[:, k][None]
        d = (tri_b[:, (k + 1) % 3] - tri_b[:, k])[None]
        hit |= _edge_hits_tri(p, d, v0a, e1a, e2a)
    return hit & aabb


def _pad_blocks(arrs: Sequence[jax.Array], block: int, pad_vals: Sequence[int]):
    """Pad each array's leading dim up to a block multiple.

    ``pad_vals`` gives the fill per array — the global-index arrays must pad
    with -1 so padded rows fail the (idx >= 0) validity gate.
    """
    n = arrs[0].shape[0]
    n_pad = (-n) % block
    return [jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=v) for a, v in zip(arrs, pad_vals)]


@partial(jax.jit, static_argnames=("self_mode", "block_a", "block_b"))
def _count_pairs(tri_a, idx_a, face_ids_a, tri_b, idx_b, face_ids_b,
                 self_mode: bool = False, block_a: int = 128,
                 block_b: int = 1024) -> jax.Array:
    """Blocked all-pairs intersection count.

    ``idx_*``: global face index, -1 on padding rows (also masks validity).
    ``face_ids_*``: (F, 3) vertex ids, used in ``self_mode`` to exclude
    pairs sharing a vertex (torch-mesh-isect's adjacency exclusion) and the
    (i >= j) half to count unordered pairs once.
    """
    tri_a, idx_a, face_ids_a = _pad_blocks(
        [tri_a, idx_a, face_ids_a], block_a, (0, -1, -1))
    tri_b, idx_b, face_ids_b = _pad_blocks(
        [tri_b, idx_b, face_ids_b], block_b, (0, -1, -1))
    na = tri_a.shape[0] // block_a
    nb = tri_b.shape[0] // block_b
    tb = (tri_b.reshape(nb, block_b, 3, 3),
          idx_b.reshape(nb, block_b),
          face_ids_b.reshape(nb, block_b, 3))
    ta = (tri_a.reshape(na, block_a, 3, 3),
          idx_a.reshape(na, block_a),
          face_ids_a.reshape(na, block_a, 3))

    def inner(carry, b):
        ta_blk, ia_blk, fa_blk = carry[1]
        tb_blk, ib_blk, fb_blk = b
        hit = _tile_intersects(ta_blk, tb_blk)
        mask = (ia_blk[:, None] >= 0) & (ib_blk[None] >= 0)
        if self_mode:
            mask &= ia_blk[:, None] < ib_blk[None]
            shared = jnp.any(
                fa_blk[:, None, :, None] == fb_blk[None, :, None, :],
                axis=(-1, -2))
            mask &= ~shared
        return (carry[0] + jnp.sum(hit & mask, dtype=jnp.int32), carry[1]), None

    def outer(count, a):
        (count, _), _ = jax.lax.scan(inner, (count, a), tb)
        return count, None

    total, _ = jax.lax.scan(outer, jnp.int32(0), ta)
    return total


def count_self_collisions(verts, faces, max_collisions: int = 1000,
                          block_a: int = 128, block_b: int = 1024) -> int:
    """Intersecting triangle pairs within one mesh, excluding pairs that
    share a vertex. Mirrors ``compute_collision:74-89`` (count of BVH output
    rows, clipped at the ``max_collisions`` buffer size).
    """
    faces = jnp.asarray(faces, jnp.int32)
    tris = pack_triangles(verts, faces)
    idx = jnp.arange(tris.shape[0], dtype=jnp.int32)
    n = _count_pairs(tris, idx, faces, tris, idx, faces,
                     self_mode=True, block_a=block_a, block_b=block_b)
    return int(jnp.minimum(n, max_collisions))


def count_cross_collisions(verts_a, faces_a, verts_b, faces_b,
                           max_collisions: int = 1000,
                           block_a: int = 128, block_b: int = 1024) -> int:
    """Intersecting (triangle-of-A, triangle-of-B) pairs across two meshes.

    Equals the reference's fused-mesh difference
    ``compute_collision(fused) - compute_collision(A) - compute_collision(B)``
    (``extract_candidates:99-112``): a rigid shift preserves each mesh's own
    self-collision count, so the fused-minus-default residue is exactly the
    cross-mesh pair count.
    """
    tris_a = pack_triangles(verts_a, jnp.asarray(faces_a, jnp.int32))
    tris_b = pack_triangles(verts_b, jnp.asarray(faces_b, jnp.int32))
    dummy_a = jnp.zeros((tris_a.shape[0], 3), jnp.int32)
    dummy_b = jnp.zeros((tris_b.shape[0], 3), jnp.int32)
    idx_a = jnp.arange(tris_a.shape[0], dtype=jnp.int32)
    idx_b = jnp.arange(tris_b.shape[0], dtype=jnp.int32)
    n = _count_pairs(tris_a, idx_a, dummy_a, tris_b, idx_b, dummy_b,
                     self_mode=False, block_a=block_a, block_b=block_b)
    return int(jnp.minimum(n, max_collisions))


@partial(jax.jit, static_argnames=("block_a", "block_b"))
def collision_curve(human_verts, human_faces, asset_verts, asset_faces,
                    displacements, direction,
                    block_a: int = 128, block_b: int = 1024) -> jax.Array:
    """Cross-mesh collision count per depth candidate, one jitted sweep.

    The reference rebuilds + BVHs the fused mesh once per displacement
    (``extract_candidates:103-112``, 2*retrieval_range+1 sequential CUDA
    launches); here the displacement axis is a ``lax.map`` over one blocked
    count, and only the human triangles move (rigid shift along
    ``direction``).  Returns (D,) int32 — NOT clipped by max_collisions (the
    local-minimum filter wants the raw curve; clip at the call site for
    strict parity with the BVH buffer cap).
    """
    direction = direction / jnp.linalg.norm(direction)
    tris_h = pack_triangles(human_verts, jnp.asarray(human_faces, jnp.int32))
    tris_a = pack_triangles(asset_verts, jnp.asarray(asset_faces, jnp.int32))
    idx_h = jnp.arange(tris_h.shape[0], dtype=jnp.int32)
    idx_a = jnp.arange(tris_a.shape[0], dtype=jnp.int32)
    dummy_h = jnp.zeros((tris_h.shape[0], 3), jnp.int32)
    dummy_a = jnp.zeros((tris_a.shape[0], 3), jnp.int32)

    def one(disp):
        shifted = tris_h + disp * direction
        return _count_pairs(shifted, idx_h, dummy_h, tris_a, idx_a, dummy_a,
                            self_mode=False, block_a=block_a, block_b=block_b)

    return jax.lax.map(one, jnp.asarray(displacements, jnp.float32))


def filter_candidate_indices(collisions, kernel_size: int) -> np.ndarray:
    """Local-minimum displacement filter -> kept CENTER indices.

    Window semantics of ``extract_candidates:118-125`` exactly: for each
    center c in [k/2, D-k/2): skip when both immediate neighbours are zero;
    else keep c when collisions[c] <= min(collisions[c-k/2 : c-1] +
    collisions[c+1 : c+k/2]) — the reference's asymmetric window (immediate
    LEFT neighbour excluded from the min, immediate right included) is
    reproduced. Two reference quirks are deliberately NOT reproduced, both
    artifacts of dead code: it appends the candidate at ``displacements[idx]``
    (off by kernel_size//2 from the collision count it just tested) and
    stores a stale loop variable as the displacement
    (``extract_candidates:125``); we return the center index c itself.
    """
    collisions = np.asarray(collisions, np.float64)
    half = kernel_size // 2
    kept = []
    for c in range(half, len(collisions) - half):
        if collisions[c - 1] == 0.0 and collisions[c + 1] == 0.0:
            continue
        surrounding = np.concatenate(
            [collisions[c - half:c - 1], collisions[c + 1:c + half]])
        if surrounding.size and collisions[c] <= surrounding.min():
            kept.append(c)
    return np.asarray(kept, np.int64)
