"""In-program multi-chip execution of the flagship adaptive-mask pipeline.

The reference scales stage 1 by launching one process per GPU over a
statically index-sharded work list (``scripts/generation/inpaint.sh:204-268``).
The TPU-native answer is a device mesh INSIDE the program: every array the
pipeline touches is batch-leading and per-image independent (the scan carry
is per-image latents/mask latents), so the full 50-step adaptive-mask scan —
UNet + CFG + DDIM + in-loop segmenter + VAE re-encode — partitions over a
1-D ``data`` mesh with zero collectives. XLA's SPMD partitioner does the
work; this module just pins the shardings and handles ragged batches.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coma_tpu.parallel.sharding import default_mesh, round_up


def data_parallel_generate(
    pipe,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    return_intermediates: bool = False,
):
    """jit ``pipe.generate_p`` with the batch dimension sharded over ``mesh``.

    Returns ``fn(params, rng, init_image, default_mask, prompt_embeds,
    negative_embeds)`` where every image-batch argument is placed
    ``P(axis_name)`` and params/rng replicate. The batch size must be a
    multiple of the mesh size — use :func:`pad_ragged_batch` for the last
    work-list chunk.
    """
    mesh = mesh or default_mesh(axis_name)
    dp = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    gen = functools.partial(pipe.generate_p, return_intermediates=return_intermediates)
    out_shardings = None if return_intermediates else dp
    return jax.jit(
        gen,
        in_shardings=(rep, rep, dp, dp, dp, dp),
        out_shardings=out_shardings,
    )


def pad_ragged_batch(arrays, n_devices: int):
    """Pad leading batch dims up to a multiple of ``n_devices`` by repeating
    the last element (repeat, not zero: zero images still flow through the
    whole UNet at the same cost, and repeated work keeps every device's
    numerics in-distribution). Returns (padded_arrays, real_batch)."""
    B = arrays[0].shape[0]
    B_pad = round_up(B, n_devices)
    if B_pad == B:
        return list(arrays), B
    out = []
    for a in arrays:
        a = jnp.asarray(a)
        reps = jnp.repeat(a[-1:], B_pad - B, axis=0)
        out.append(jnp.concatenate([a, reps], axis=0))
    return out, B


def resolve_mesh(spec: Optional[str], axis_name: str = "data") -> Optional[Mesh]:
    """CLI ``--mesh`` value -> Mesh. ``None``/"1" -> no mesh (single-device
    path); "all" -> every local device; an integer -> that many devices."""
    if spec is None or spec == "1":
        return None
    devices = jax.devices()
    if spec == "all":
        n = len(devices)
    else:
        n = int(spec)
        if n > len(devices):
            raise SystemExit(
                f"--mesh {n} but only {len(devices)} local devices are attached"
            )
    if n <= 1:
        return None
    return Mesh(np.asarray(devices[:n]), (axis_name,))
