"""Candidate-mask selection by segmentation-overlap band.

Reference parity: ``src/generation/select_mask.py:select_masks:17-110`` —
keep candidate masks whose intersection-over-segmentation ratio lies within
the per-category [min, max] band (``constants/generation/assets.py:112-132``),
write ``valid_mask_ids`` pickles.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Sequence

import numpy as np


def select_valid_masks(
    asset_seg: np.ndarray,             # (H, W) object segmentation, >0 = object
    candidate_masks: Sequence[np.ndarray],  # list of (H, W) masks, >0 = candidate
    minimum_seg_overlap_ratio: float,
    maximum_seg_overlap_ratio: float,
) -> List[int]:
    """Indices of masks whose overlap-with-segmentation ratio is in band."""
    seg = asset_seg > 0
    seg_area = float(seg.sum())
    if seg_area == 0:
        return []
    valid = []
    for i, mask in enumerate(candidate_masks):
        inter = float(np.logical_and(seg, mask > 0).sum())
        ratio = inter / seg_area
        if minimum_seg_overlap_ratio <= ratio <= maximum_seg_overlap_ratio:
            valid.append(i)
    return valid


def save_valid_mask_ids(
    path: str,
    supercategory: str,
    category: str,
    asset_id: str,
    view_id: str,
    valid_mask_ids: List[str],
) -> None:
    """Reference pickle schema (``select_mask.py:89-91``)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as handle:
        pickle.dump(
            {
                "supercategory": supercategory,
                "category": category,
                "asset_id": asset_id,
                "view_id": view_id,
                "valid_mask_ids": valid_mask_ids,
            },
            handle,
            protocol=pickle.HIGHEST_PROTOCOL,
        )
