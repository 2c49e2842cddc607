"""Human-occupancy voxel aggregation (pure JAX).

Reference parity: ``utils/coma_occupancy.py:ComA_Occupancy`` —
``aggregate_single_sample_for_occupancy:272-295``,
``normalize_prob_grid_for_spatials:297-300``,
``return_aggregated_spatial_grids:305-312``.

The voxel grid is anchored at one selected object vertex; each sample adds a
boolean "human vertex within rel_dist_thres of voxel center" hit per
(human vertex, voxel). The (H, R³) grid (up to 10475×27000 fp32 ≈ 1.1 GB)
shards over H like the contact grids.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from coma_tpu.affordance.state import OccupancyState


def occupancy_contribution(
    state: OccupancyState,
    human_verts: jax.Array,  # (H, 3)
    obj_verts: jax.Array,    # (O, 3)
) -> jax.Array:
    """One sample's (H, R, R, R) boolean hit grid (as float).

    Reference: ``aggregate_single_sample_for_occupancy`` — translate human
    vertices into the frame of the selected object vertex, then threshold
    the distance to each voxel center.
    """
    anchor = obj_verts[state.selected_obj_idx]                      # (3,)
    human_canon = human_verts - anchor[None, :]                     # (H, 3)
    # (H, 3, R, R, R) diff is big; compute ||x||² = ||g||² - 2 g·x + ||x||²
    # instead so the large intermediate is a single (H, R³) matmul output
    # (MXU-friendly) rather than an elementwise (H, 3, R³) tensor.
    R = state.spatial_res
    grid = state.spatial_grid.reshape(3, -1)                        # (3, R³)
    g_sq = jnp.sum(grid * grid, axis=0)                             # (R³,)
    x_sq = jnp.sum(human_canon * human_canon, axis=-1)              # (H,)
    cross = jnp.matmul(
        human_canon, grid, precision=jax.lax.Precision.HIGHEST
    )                                                               # (H, R³) — MXU
    d_sq = g_sq[None, :] - 2.0 * cross + x_sq[:, None]              # (H, R³)
    hits = d_sq < state.rel_dist_thres * state.rel_dist_thres
    return hits.astype(state.spatial_occupancy_grids.dtype).reshape(-1, R, R, R)


def occupancy_update(
    state: OccupancyState, human_verts: jax.Array, obj_verts: jax.Array
) -> OccupancyState:
    """Aggregate one sample's occupancy hits."""
    hits = occupancy_contribution(state, human_verts, obj_verts)
    return dataclasses.replace(
        state,
        spatial_occupancy_grids=state.spatial_occupancy_grids + hits,
        used_count=state.used_count + 1.0,
        anchor_vert=obj_verts[state.selected_obj_idx],
    )


def occupancy_update_batch(
    state: OccupancyState,
    human_verts: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,    # (B, O, 3)
    valid: Optional[jax.Array] = None,  # (B,)
) -> OccupancyState:
    """Scan a batch of samples (padding-aware, see contact_update_batch)."""
    if valid is None:
        valid = jnp.ones(human_verts.shape[0], dtype=human_verts.dtype)

    def step(s, batch):
        hv, ov, v = batch
        hits = occupancy_contribution(s, hv, ov)
        anchor = jnp.where(v > 0, ov[s.selected_obj_idx], s.anchor_vert)
        s = dataclasses.replace(
            s,
            spatial_occupancy_grids=s.spatial_occupancy_grids
            + jnp.where(v > 0, hits, 0.0),
            used_count=s.used_count + v,
            anchor_vert=anchor,
        )
        return s, None

    state, _ = jax.lax.scan(step, state, (human_verts, obj_verts, valid))
    return state


def merge_occupancy_states(*states: OccupancyState) -> OccupancyState:
    """Cross-shard reduction of occupancy accumulators (associative sum)."""
    first = states[0]
    if len(states) == 1:
        return first
    return dataclasses.replace(
        first,
        spatial_occupancy_grids=sum(s.spatial_occupancy_grids for s in states),
        used_count=sum(s.used_count for s in states),
    )


def normalized_occupancy(state: OccupancyState) -> jax.Array:
    """Per-human-vertex probability field over voxels, (H, R, R, R).

    Reference: ``normalize_prob_grid_for_spatials:297-300`` (divide by the
    per-vertex total hit mass). NOTE the reference has no eps here: a human
    vertex that never hit any voxel yields NaN there too; we reproduce the
    math but map the 0/0 rows to 0 so the downstream max is well-defined.
    """
    flat = state.spatial_occupancy_grids.reshape(state.human_res, -1)
    total = jnp.sum(flat, axis=-1, keepdims=True)
    out = jnp.where(total > 0.0, flat / jnp.where(total > 0.0, total, 1.0), 0.0)
    return out.reshape(state.spatial_occupancy_grids.shape)


def aggregated_occupancy(
    state: OccupancyState, human_indices: Optional[jax.Array] = None
) -> jax.Array:
    """(R, R, R) occupancy probability field: max over (selected) human
    vertices of the normalized grids.

    Reference: ``return_aggregated_spatial_grids:305-312``.
    """
    grids = normalized_occupancy(state)
    if human_indices is not None:
        grids = grids[human_indices]
    return jnp.max(grids, axis=0)


def occupancy_product(state: OccupancyState) -> jax.Array:
    """The shipped occupancy product: max-normalized then scaled by 0.7
    (reference: ``src/coma/extract_coma.py:473-483``)."""
    field = aggregated_occupancy(state)
    return 0.7 * field / jnp.max(field)
