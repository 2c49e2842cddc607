"""Affordance-extraction hyperparameter registries.

Reference parity: ``constants/coma/qual.py`` and ``constants/coma/quant.py``
— these are experiment *data* (the published configs for the BEHAVE-backpack
affordance products), ported with the same keys, values, and default-fill
inheritance semantics (``qual.py:70-75``: every registry entry inherits
missing keys from the base entry).
"""
from __future__ import annotations

from copy import deepcopy
from typing import Any, Dict


def _with_inheritance(registry: Dict[str, Dict[str, Any]], base_key: str) -> Dict[str, Dict[str, Any]]:
    """Fill each entry's missing keys from the base entry (reference:
    ``constants/coma/qual.py:70-75``)."""
    base = registry[base_key]
    out = {}
    for key, entry in registry.items():
        merged = deepcopy(base)
        merged.update(entry)
        out[key] = merged
    return out


_QUAL_BASE = dict(
    human_res="FULL",            # 'FULL' | '2000' | '1000' | ...
    human_use_downsample_pcd_raw=False,
    object_res="180",            # '1500' | '180' | ...
    object_use_downsample_pcd_raw=True,
    principle_vec=[0, 0, 1],
    sub_principle_vec=[0, 1, 0],
    rel_dist_method="dist",
    spatial_grid_size=0.06,      # smpl-x body is usually within the radius-1 sphere
    spatial_grid_thres=0.24,
    normal_gaussian_sigma=0.2,
    normal_res=250,
    spatial_res=0,               # 0 -> discrete (contact) representation
    eps=1e-10,
    significant_contact_ratio=0.3,
    enable_postfilter=True,
    standardize_human_scale=False,
    scaler_range=(0.75, 1.25),
    visualize_type="aggr-human-contact",
    vis_example_num=0,
    quant_mode=False,
    quant_keys=[],
)

QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT = _with_inheritance(
    {
        "qual:001": dict(_QUAL_BASE),
        "qual:backpack_human_contact": dict(
            spatial_grid_size=0.07,
            spatial_grid_thres=0.03,
            normal_gaussian_sigma=0.25,
            significant_contact_ratio=0.1,
            standardize_human_scale=False,
            scaler_range=(0.75, 1.25),
            visualize_type="aggr-human-contact",
        ),
        "qual:backpack_object_contact": dict(
            spatial_grid_size=0.15,
            spatial_grid_thres=0.05,
            normal_gaussian_sigma=0.25,
            significant_contact_ratio=0.1,
            standardize_human_scale=False,
            scaler_range=(0.75, 1.25),
            human_res="1000",
            human_use_downsample_pcd_raw=False,
            object_res="1500",
            object_use_downsample_pcd_raw=True,
            visualize_type="aggr-object-contact",
        ),
        "qual:backpack_occupancy": dict(
            spatial_res=30,
            normal_res=0,
            standardize_human_scale=False,
            scaler_range=(0.75, 1.25),
            human_res="FULL",
            human_use_downsample_pcd_raw=False,
            object_res="1500",
            object_use_downsample_pcd_raw=False,
            visualize_type="occupancy",
        ),
        "qual:backpack_orientation": dict(
            spatial_grid_size=0.03,
            spatial_grid_thres=0.1,
            normal_gaussian_sigma=0.2,
            significant_contact_ratio=0.1,
            standardize_human_scale=False,
            scaler_range=(0.75, 1.25),
            visualize_type="orientation",
            vis_example_num=1,
        ),
    },
    base_key="qual:001",
)

_QUANT_BASE = dict(
    human_res="750",
    human_use_downsample_pcd_raw=False,
    object_res="2048",
    object_use_downsample_pcd_raw=True,
    principle_vec=[0, 0, 1],
    sub_principle_vec=[0, 1, 0],
    rel_dist_method="dist",
    spatial_grid_size=0.04,
    spatial_grid_thres=0.1,
    normal_gaussian_sigma=0.2,
    normal_res=250,
    spatial_res=0,
    eps=1e-10,
    significant_contact_ratio=0.0,
    enable_prefilter=False,
    enable_postfilter=True,
    standardize_human_scale=False,
    scaler_range=(0.75, 1.25),
    visualize_type="none",
    vis_example_num=0,
    quant_mode=True,
    quant_keys=[
        "aggr_object_contact_metrics",
        "aggr_human_contact_metrics",
    ],
)

QUANT_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT = _with_inheritance(
    {"quant:full": dict(_QUANT_BASE)},
    base_key="quant:full",
)


def get_hyperparams(key: str) -> Dict[str, Any]:
    """Resolve a ``--hyperparams_key`` against both registries (reference:
    ``src/coma/extract_coma.py:549-552``)."""
    if key.startswith("qual:"):
        return QUAL_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT[key]
    return QUANT_AFFORDANCE_EXTRACTION_HYPERPARAMS_DICT[key]
