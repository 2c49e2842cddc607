"""COAP body partitioning: per-bone parts, local frames, bbox gating.

Reference parity: ``imports/coap/coap.py:Partitioner:162-560`` — SMPL-X
vertices partition into per-bone parts by LBS-weight argmax with the merge
list (face->neck, toes->feet, stomach/shoulder merges,
``MERGE_BODY_PARTS['smplx']``), each part gets a bone-local frame from the
kinematic transforms (``compute_abs_transformations:562``), and occupancy
queries are gated by padded per-part bboxes (``coap.py:encode_body:639``,
``query:688``). This module produces exactly the inputs
:class:`coma_tpu.models.coap.COAPOccupancy` consumes.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# coap.py:178-189 (smplx): joints merged into their parents
MERGE_BODY_PARTS_SMPLX = (15, 10, 11, 3, 13, 14, 9)
NUM_BODY_JOINTS_COAP = 22  # pelvis .. wrists (orig_joint_part['body'])


def build_part_mapping(parents: Tuple[int, ...]) -> np.ndarray:
    """(22,) joint -> part index map after merging (merged joints inherit
    their parent's part; parts re-indexed densely)."""
    part_of = np.arange(NUM_BODY_JOINTS_COAP)
    for j in sorted(MERGE_BODY_PARTS_SMPLX, reverse=True):
        part_of[j] = parents[j]
    # resolve chains (a merged joint whose parent is also merged)
    for j in range(NUM_BODY_JOINTS_COAP):
        while part_of[part_of[j]] != part_of[j]:
            part_of[j] = part_of[part_of[j]]
    kept = sorted(set(part_of.tolist()))
    reindex = {k: i for i, k in enumerate(kept)}
    return np.asarray([reindex[p] for p in part_of], dtype=np.int64)


def partition_vertices(lbs_weights: np.ndarray, parents: Tuple[int, ...]) -> Tuple[np.ndarray, int]:
    """(V,) part index per vertex via body-joint argmax of the LBS weights
    (hand/face joint weights fold into their wrist/neck ancestors first)."""
    W = np.asarray(lbs_weights).copy()
    J = W.shape[1]
    # fold non-body joints' weights into their body-joint ancestor
    for j in range(NUM_BODY_JOINTS_COAP, J):
        anc = j
        while anc >= NUM_BODY_JOINTS_COAP:
            anc = parents[anc]
        W[:, anc] += W[:, j]
    part_of_joint = build_part_mapping(parents)
    joint_arg = np.argmax(W[:, :NUM_BODY_JOINTS_COAP], axis=1)
    parts = part_of_joint[joint_arg]
    return parts, int(part_of_joint.max()) + 1


@dataclasses.dataclass
class BodyPartition:
    """Static per-model partition tables (computed once per SMPL-X model)."""

    vertex_part: np.ndarray       # (V,) part index
    part_joint: np.ndarray        # (K,) representative joint per part
    num_parts: int
    max_part_size: int
    part_vertex_ids: np.ndarray   # (K, max_part_size) padded vertex selectors
    part_vertex_valid: np.ndarray  # (K, max_part_size) 1/0


def build_partition(lbs_weights, parents) -> BodyPartition:
    vertex_part, num_parts = partition_vertices(lbs_weights, parents)
    part_of_joint = build_part_mapping(parents)
    part_joint = np.zeros(num_parts, np.int64)
    for j in range(NUM_BODY_JOINTS_COAP):
        # representative = the first (shallowest) joint mapped to the part
        if part_joint[part_of_joint[j]] == 0 and part_of_joint[j] != part_of_joint[0]:
            part_joint[part_of_joint[j]] = j
    sizes = [(vertex_part == k).sum() for k in range(num_parts)]
    m = int(max(sizes))
    ids = np.zeros((num_parts, m), np.int64)
    valid = np.zeros((num_parts, m), np.float32)
    for k in range(num_parts):
        idx = np.flatnonzero(vertex_part == k)
        ids[k, : len(idx)] = idx
        valid[k, : len(idx)] = 1.0
        if len(idx):
            ids[k, len(idx):] = idx[0]  # pad with a real vertex
    return BodyPartition(
        vertex_part=vertex_part,
        part_joint=part_joint,
        num_parts=num_parts,
        max_part_size=m,
        part_vertex_ids=ids,
        part_vertex_valid=valid,
    )


def bone_local_frames(
    rel_transforms: jax.Array,   # (J, 4, 4) from batch_rigid_transform
    rest_joints: jax.Array,      # (J, 3)
    part_joint: np.ndarray,      # (K,)
) -> jax.Array:
    """(K, 4, 4): world -> bone-local transforms for each part.

    The part's world transform is its representative joint's posed rigid
    transform composed with the rest-pose joint offset
    (reference: ``coap.py:compute_abs_transformations:562``); the local
    frame is its inverse.
    """
    K = len(part_joint)
    idx = jnp.asarray(part_joint)
    T = rel_transforms[idx]                      # (K, 4, 4) verts-space transforms
    # re-add the rest joint so the transform maps rest-local -> world
    rj = rest_joints[idx]                        # (K, 3)
    offset = jnp.eye(4)[None].repeat(K, axis=0)
    offset = offset.at[:, :3, 3].set(rj)
    world = T @ offset                           # rest-local -> world
    R = world[:, :3, :3]
    t = world[:, :3, 3]
    R_inv = jnp.swapaxes(R, 1, 2)
    t_inv = -jnp.einsum("kij,kj->ki", R_inv, t)
    inv = jnp.concatenate(
        [jnp.concatenate([R_inv, t_inv[:, :, None]], axis=2),
         jnp.tile(jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]]), (K, 1, 1))],
        axis=1,
    )
    return inv


def to_part_local(points: jax.Array, local_frames: jax.Array) -> jax.Array:
    """World points (Q, 3) -> per-part local coords (K, Q, 3)."""
    homo = jnp.concatenate([points, jnp.ones((points.shape[0], 1), points.dtype)], 1)
    out = jnp.einsum("kij,qj->kqi", local_frames, homo)
    return out[:, :, :3]


def part_bbox_gate(
    part_points_local: jax.Array,   # (K, M, 3) part clouds in their local frames
    part_valid: jax.Array,          # (K, M)
    query_local: jax.Array,         # (K, Q, 3)
    bbox_padding: float = 1.2,      # coap.py:77 (bbox_padding)
) -> jax.Array:
    """(K, Q) 1/0: queries inside each part's padded local bbox
    (reference: ``coap.py:get_bbox_bounds`` + the inside_bbox gate in query)."""
    big = 1e9
    masked_lo = jnp.where(part_valid[..., None] > 0, part_points_local, big)
    masked_hi = jnp.where(part_valid[..., None] > 0, part_points_local, -big)
    lo = jnp.min(masked_lo, axis=1, keepdims=True)
    hi = jnp.max(masked_hi, axis=1, keepdims=True)
    center = (lo + hi) / 2
    half = (hi - lo) / 2 * bbox_padding
    inside = jnp.all(
        (query_local >= center - half) & (query_local <= center + half), axis=-1
    )
    return inside.astype(query_local.dtype)
