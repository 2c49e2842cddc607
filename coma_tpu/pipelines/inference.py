"""Inference: re-derive affordance products from a trained ComA pickle.

Reference parity: ``src/coma/inference.py:26-147`` — the public
"reproduce pre-trained results" entry (README.md:96-158). This is the
cheapest end-to-end-verifiable path: load a ComA pickle + the downsample
metadata pickles, derive the requested product, save to ``output/``.

(The reference's copy has a broken import — ``constants.coma.coma_basic_settings``
does not exist in-tree, ``inference.py:17`` — fixed here per SURVEY §7.)
"""
from __future__ import annotations

import os
from typing import Any, Dict

from coma_tpu.affordance.io import load_coma_state, load_occupancy_state, load_pickle
from coma_tpu.pipelines.products import save_product


def inference(
    supercategory: str,
    category: str,
    coma_path: str,
    smplx_downsample_pth: str,
    asset_downsample_pth: str,
    visualize_type: str,
    hyperparams: Dict[str, Any],
    output_dir: str = "output",
) -> str:
    """Derive one product from a trained ComA pickle; returns the saved path."""
    object_downsample_metadata = load_pickle(asset_downsample_pth)

    if visualize_type == "occupancy":
        state = load_occupancy_state(coma_path)
    else:
        state = load_coma_state(coma_path)

    out_dir = f"{output_dir}/{supercategory}/{category}"
    os.makedirs(out_dir, exist_ok=True)
    return save_product(
        state, visualize_type, hyperparams, object_downsample_metadata, out_dir
    )
