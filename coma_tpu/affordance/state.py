"""ComA accumulator state as pytrees (functional, shard-friendly).

The reference keeps the affordance statistics as mutable tensors on a class
(``utils/coma.py:176-251``, ``utils/coma_occupancy.py:187-249``). Here the
statistics are an immutable pytree, the per-sample update is a pure function
``state' = update(state, sample)``, and multi-chip aggregation is a single
``psum`` of the accumulators over the data axis — the only collective this
workload fundamentally needs (SURVEY.md §2.6).

Shard layout: every accumulator's leading axis is H (human vertices), so a
``NamedSharding(mesh, P('data'))`` on H splits both memory (the H×O×N grid is
the reference's scale limit, up to 470M fp32) and compute across chips.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.affordance.sphere import fibonacci_sphere


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "canon_normal_grid",
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "contact_dist_expectation_grid_denom",
        "significant_contact_count",
        "used_count",
        "principle_vec",
        "sub_principle_vec",
    ],
    meta_fields=[
        "human_res",
        "obj_res",
        "normal_res",
        "spatial_grid_size",
        "spatial_grid_thres",
        "normal_gaussian_sigma",
        "eps",
    ],
)
@dataclasses.dataclass(frozen=True)
class ComAState:
    """Contact/orientation affordance accumulators.

    Reference parity: the tensor state of ``utils/coma.py:ComA.__init__``
    (spatial_res == 0 mode, the only one the reference implements).
    """

    # --- accumulators (pytree leaves) ---
    canon_normal_grid: jax.Array                 # (N, 3)
    prob_grid_canon_human_wrt_obj: jax.Array     # (H, O, N)
    prob_grid_canon_obj_wrt_human: jax.Array     # (H, O, N)
    contact_dist_expectation_grid_nom: jax.Array   # (H, O)
    contact_dist_expectation_grid_denom: jax.Array  # (H, O)
    significant_contact_count: jax.Array         # (H, O)
    used_count: jax.Array                        # () f32 — number of aggregated samples
    principle_vec: jax.Array                     # (3,)
    sub_principle_vec: jax.Array                 # (3,)

    # --- static config (hashable metadata) ---
    human_res: int = 0
    obj_res: int = 0
    normal_res: int = 0
    spatial_grid_size: float = 0.06   # proximity kernel length scale
    spatial_grid_thres: float = 0.24  # significant-contact distance threshold
    normal_gaussian_sigma: float = 0.2
    eps: float = 1e-10


def init_coma_state(
    human_res: int,
    obj_res: int,
    normal_res: int,
    spatial_grid_size: float,
    spatial_grid_thres: float,
    normal_gaussian_sigma: float = 0.2,
    principle_vec=(0.0, 0.0, 1.0),
    sub_principle_vec=(0.0, 1.0, 0.0),
    eps: float = 1e-10,
    dtype=jnp.float32,
) -> ComAState:
    """Fresh zeroed accumulators (reference: ``utils/coma.py:209-227``)."""
    H, O, N = human_res, obj_res, normal_res
    grid = jnp.asarray(fibonacci_sphere(N), dtype=dtype)
    zeros_hon = jnp.zeros((H, O, N), dtype=dtype)
    zeros_ho = jnp.zeros((H, O), dtype=dtype)
    return ComAState(
        canon_normal_grid=grid,
        prob_grid_canon_human_wrt_obj=zeros_hon,
        prob_grid_canon_obj_wrt_human=zeros_hon,
        contact_dist_expectation_grid_nom=zeros_ho,
        contact_dist_expectation_grid_denom=zeros_ho,
        significant_contact_count=zeros_ho,
        used_count=jnp.zeros((), dtype=dtype),
        principle_vec=jnp.asarray(principle_vec, dtype=dtype),
        sub_principle_vec=jnp.asarray(sub_principle_vec, dtype=dtype),
        human_res=H,
        obj_res=O,
        normal_res=N,
        spatial_grid_size=float(spatial_grid_size),
        spatial_grid_thres=float(spatial_grid_thres),
        normal_gaussian_sigma=float(normal_gaussian_sigma),
        eps=float(eps),
    )


# ---------------------------------------------------------------------------
# Occupancy variant
# ---------------------------------------------------------------------------

def make_voxel_grid(
    gridsize: float = 2.4, resolution: int = 30, center=(0.0, 0.0, 0.0)
) -> Tuple[np.ndarray, Dict[str, Any]]:
    """Regular voxel grid of cell centers, ``(3, R, R, R)`` float32.

    Reference parity: ``utils/coma_occupancy.py:load_voxelgrid:160-183``
    (cell center = start + size*ijk + size/2).
    """
    voxel_size = gridsize / resolution
    center = np.asarray(center, dtype=np.float64)
    start = center - gridsize / 2.0
    ijk = np.mgrid[0:resolution, 0:resolution, 0:resolution].astype(np.float32)
    grid = start.reshape(3, 1, 1, 1).astype(np.float32) + voxel_size * ijk + voxel_size / 2.0
    metadata = dict(
        length_x=gridsize, length_y=gridsize, length_z=gridsize,
        N_x=resolution, N_y=resolution, N_z=resolution,
        start_point=start, voxel_size=voxel_size,
    )
    return grid, metadata


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["spatial_grid", "spatial_occupancy_grids", "used_count", "anchor_vert"],
    meta_fields=["human_res", "obj_res", "spatial_res", "rel_dist_thres", "selected_obj_idx"],
)
@dataclasses.dataclass(frozen=True)
class OccupancyState:
    """Human-occupancy voxel accumulators.

    Reference parity: ``utils/coma_occupancy.py:ComA_Occupancy``. The grid is
    a ``gridsize=2.4`` cube at ``spatial_res³`` centered on one selected
    object vertex (index 0 in the reference, ``selected_obj_idxs=[0]``).
    """

    spatial_grid: jax.Array            # (3, R, R, R) cell centers
    spatial_occupancy_grids: jax.Array  # (H, R, R, R) accumulated hit counts
    used_count: jax.Array              # ()
    anchor_vert: jax.Array             # (3,) the selected object vertex (for cross-sample checks)

    human_res: int = 0
    obj_res: int = 0
    spatial_res: int = 0
    rel_dist_thres: float = 0.0        # voxel_size * scale_tolerance
    selected_obj_idx: int = 0


def init_occupancy_state(
    human_res: int,
    obj_res: int,
    spatial_res: int,
    scale_tolerance: float,
    gridsize: float = 2.4,
    selected_obj_idx: int = 0,
    dtype=jnp.float32,
) -> OccupancyState:
    grid, metadata = make_voxel_grid(gridsize=gridsize, resolution=spatial_res)
    return OccupancyState(
        spatial_grid=jnp.asarray(grid, dtype=dtype),
        spatial_occupancy_grids=jnp.zeros(
            (human_res, spatial_res, spatial_res, spatial_res), dtype=dtype
        ),
        used_count=jnp.zeros((), dtype=dtype),
        anchor_vert=jnp.full((3,), jnp.nan, dtype=dtype),
        human_res=human_res,
        obj_res=obj_res,
        spatial_res=spatial_res,
        rel_dist_thres=float(metadata["voxel_size"] * scale_tolerance),
        selected_obj_idx=selected_obj_idx,
    )
