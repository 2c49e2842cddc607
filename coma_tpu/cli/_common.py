"""Shared CLI plumbing: seeding, filter-list normalization.

The reference accepts ``--parallel_idx/--parallel_num`` everywhere (static
work-list sharding across processes, SURVEY.md §2.6); we accept them for
flag compatibility but the mesh-sharded execution supersedes them (a single
process drives all local devices). They still shard the *work list* when
used, for multi-host launches without jax.distributed.
"""
from __future__ import annotations

import argparse
import random
from typing import List, Optional

import numpy as np

from coma_tpu.config.metadata import DEFAULT_SEED


def seed_everything(seed: int = DEFAULT_SEED) -> None:
    """Reference parity: ``utils/reproducibility.py:seed_everything:11``."""
    random.seed(seed)
    np.random.seed(seed)


def lower_all(values: Optional[List[str]]) -> Optional[List[str]]:
    return [v.lower() for v in values] if values is not None else None


def add_common_flags(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--supercategories", type=str, nargs="+")
    parser.add_argument("--categories", type=str, nargs="+")
    parser.add_argument("--skip_done", action="store_true")
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--parallel_num", type=int, default=1)
    parser.add_argument("--parallel_idx", type=int, default=0)


def shard_worklist(items: list, parallel_idx: int, parallel_num: int) -> list:
    """The reference's static index sharding (``inpaint.py:271-278``):
    ``sub_length = len(X)//n + 1; X[i*sub_length:(i+1)*sub_length]``."""
    if parallel_num <= 1:
        return items
    sub = len(items) // parallel_num + 1
    return items[parallel_idx * sub : (parallel_idx + 1) * sub]


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Persist XLA compilations across processes (the big rasterizer/UNet
    programs take minutes to compile on first use; subsequent runs hit the
    cache)."""
    import os

    import jax

    cache_dir = cache_dir or os.path.expanduser("~/.cache/coma_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
