"""Affordance product derivation + saving (shared by extract and inference).

Reference parity: the product branches of ``src/coma/extract_coma.py:428-483``
and ``src/coma/inference.py:95-147`` — four products:
- ``human_contact.npy``         max-normalized aggregated human contact (H,)
- ``object_contact.ply``        jet-colored point cloud of object contact (O,)
- ``orientational_tendency.npy`` min-max normalized entropy score (H,)
- ``occupancy.npy``             dict(prob_field (R,R,R) scaled by 0.7, grid metadata)
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from coma_tpu.affordance.contact import aggregate_contact, nonphysical_response
from coma_tpu.affordance.occupancy import aggregated_occupancy
from coma_tpu.affordance.state import ComAState, OccupancyState, make_voxel_grid
from coma_tpu.utils.colormap import jet_rgb
from coma_tpu.utils.ply import write_ply_pointcloud


def _max_normalize(agg: np.ndarray, what: str) -> np.ndarray:
    """Max-normalize; an all-zero map (no significant contact anywhere) stays
    zero with a warning — the reference silently saves NaN here
    (``extract_coma.py:436`` divides by a zero max)."""
    peak = agg.max()
    if peak <= 0:
        import warnings

        warnings.warn(
            f"{what}: no significant contact pairs survived "
            "(spatial_grid_thres/significant_contact_ratio too strict for this "
            "data); saving a zero map."
        )
        return np.zeros_like(agg)
    return agg / peak


def save_human_contact(state: ComAState, significant_contact_ratio: float, out_dir: str) -> str:
    agg, _ = aggregate_contact(state, "human", significant_contact_ratio)
    agg = np.asarray(agg)
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/human_contact.npy"
    np.save(path, _max_normalize(agg, "human_contact"))
    return path


def save_object_contact(
    state: ComAState,
    significant_contact_ratio: float,
    object_downsample_metadata: Dict[str, Any],
    out_dir: str,
) -> str:
    agg, _ = aggregate_contact(state, "obj", significant_contact_ratio)
    score = _max_normalize(np.asarray(agg), "object_contact")
    points = np.asarray(object_downsample_metadata["downsampled_pcd_points_raw"])
    normals = np.asarray(object_downsample_metadata["downsampled_pcd_normal_raw"])
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/object_contact.ply"
    write_ply_pointcloud(path, points, normals=normals, colors=jet_rgb(score))
    return path


def save_orientation(state: ComAState, out_dir: str, obj_index: int = 0) -> str:
    score = np.asarray(nonphysical_response(state, n_bin=1e6, which="human"))[:, obj_index]
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/orientational_tendency.npy"
    np.save(path, (score - score.min()) / (score.max() - score.min()))
    return path


def save_occupancy(state: OccupancyState, out_dir: str) -> str:
    field = np.asarray(aggregated_occupancy(state))
    field = 0.7 * field / field.max()
    _, metadata = make_voxel_grid(gridsize=2.4, resolution=state.spatial_res)
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/occupancy.npy"
    np.save(path, dict(prob_field=field, spatial_grid_metadata=metadata))
    return path


def save_product(state, visualize_type: str, hyperparams: Dict[str, Any],
                 object_downsample_metadata, out_dir: str) -> str:
    """Dispatch on the hyperparams' visualize_type (the product selector)."""
    if visualize_type == "aggr-human-contact":
        return save_human_contact(state, hyperparams["significant_contact_ratio"], out_dir)
    if visualize_type == "aggr-object-contact":
        return save_object_contact(
            state, hyperparams["significant_contact_ratio"], object_downsample_metadata, out_dir
        )
    if visualize_type == "orientation":
        return save_orientation(state, out_dir)
    if visualize_type == "occupancy":
        return save_occupancy(state, out_dir)
    raise ValueError(f"unknown visualize_type: {visualize_type}")
