"""Shared CLI plumbing: seeding, filter-list normalization.

The reference accepts ``--parallel_idx/--parallel_num`` everywhere (static
work-list sharding across processes, SURVEY.md §2.6); we accept them for
flag compatibility but the mesh-sharded execution supersedes them (a single
process drives all local devices). They still shard the *work list* when
used, for multi-host launches without jax.distributed.
"""
from __future__ import annotations

import argparse
import os
import random
from typing import List, Optional

import numpy as np

from coma_tpu.config.metadata import DEFAULT_SEED

# Platform escape hatch for every CLI: the axon image's sitecustomize
# force-sets jax.config.jax_platforms='axon,cpu' at interpreter start, so the
# standard JAX_PLATFORMS env var CANNOT select CPU — only the config API can.
# COMA_PLATFORM=cpu gives hermetic/functional CLI runs off-TPU.
if os.environ.get("COMA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["COMA_PLATFORM"])


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


def filter_known_args(parser, argv):
    """Keep only the options (with their values) that ``parser`` defines.

    The orchestrators (generate_2d_hoi_images / generate_3d_hoi_samples /
    learn_coma) accept one mixed flag list for all their stages — like the
    reference's bash scripts, where each python stage only reads its own
    flags. Each stage main re-parses, so unknown flags must be dropped here.
    """
    by_option = {}
    for action in parser._actions:
        for opt in action.option_strings:
            by_option[opt] = action

    def value_count(action):
        if action.nargs == 0:
            return 0
        if action.nargs in (None, "?"):
            return 1
        if isinstance(action.nargs, int):
            return action.nargs
        return -1  # '*' / '+': greedy until the next option

    out, i = [], 0
    while i < len(argv):
        tok = argv[i]
        opt = tok.split("=", 1)[0]
        action = by_option.get(opt)
        keep = action is not None
        if keep:
            out.append(tok)
        if "=" in tok or (action is not None and value_count(action) == 0):
            i += 1
            continue
        # consume this option's value tokens (greedy for */+ and unknowns)
        n = value_count(action) if action is not None else -1
        j = i + 1
        taken = 0
        while j < len(argv) and not argv[j].startswith("--") and (n < 0 or taken < n):
            if keep:
                out.append(argv[j])
            j += 1
            taken += 1
        i = j
    return out
