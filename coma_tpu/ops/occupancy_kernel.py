"""Pallas TPU kernel: fused voxel-occupancy hit accumulation.

The occupancy twin of :mod:`coma_tpu.ops.contact_kernel` (reference hot
loop: ``utils/coma_occupancy.py:aggregate_single_sample_for_occupancy:
272-295``): for each (human vertex h, voxel g) add 1 when
``||x_h - anchor - g|| < thres`` into the (H, R³) accumulator.

Why a kernel: the XLA scan re-reads/re-writes the 1.13 GB (10475 × 27000)
accumulator once PER SAMPLE and materializes the (H, R³) distance
intermediate in HBM — measured 50 samples/s. Here a slab of S samples
accumulates per HBM pass of the grid: the distance test is 8 cheap VPU ops
per element (d² expansion, no transcendentals), so the kernel approaches
the HBM roofline instead.

Layout (same playbook as the contact kernel): h-tiles on the leading dim
(cheap dynamic index), voxels in lanes (R³ padded to a lane multiple; padded
lanes accumulate garbage that the caller's final slice drops), samples
statically unrolled with per-sample (TH,) sublane vectors broadcast against
(1, L) voxel rows — both broadcasts layout-natural.

Measured dead end (don't retry): computing d² as a packed (TH, 8) @ (8, Lp)
MXU matmul per sample (HIGHEST precision for exact hit counts) is SLOWER
(171 vs 190 samples/s) — the K-padded multi-pass matmul costs more than the
three VPU broadcast madds it replaces.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coma_tpu.affordance.state import OccupancyState


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _occupancy_kernel(
    hx_ref, hy_ref, hz_ref, xsq_ref,   # (TH, S8): anchored human comps + ||x||²
    g_ref,                              # (8, Lp): rows 0-2 voxel xyz, row 3 ||g||²
    v_ref,                              # (S, 1) SMEM validity
    acc_in, acc_out,                    # aliased (TH, Lp)
    *, S: int, TH: int, thres_sq: float, lane_chunk: int = 4096,
):
    # Lane-axis register blocking (same finding as the contact kernel's v3,
    # docs/KERNELS.md): the full (TH, Lp=27008) accumulator block is ~211
    # vregs — loading it whole spills every step. Walk lane chunks so one
    # (TH, CH) block plus its temporaries stays inside the vreg file.
    Lp = g_ref.shape[1]
    CH = min(lane_chunk, Lp)
    for lb in range(Lp // CH):
        lo, hi = lb * CH, (lb + 1) * CH
        gx = g_ref[0, lo:hi][None, :]
        gy = g_ref[1, lo:hi][None, :]
        gz = g_ref[2, lo:hi][None, :]
        gsq = g_ref[3, lo:hi][None, :]
        acc = acc_in[:, lo:hi]
        for s in range(S):              # static unroll (small slab)
            v = v_ref[s, 0]
            # d² = ||g||² - 2 g·x + ||x||²  (per (h, voxel) outer broadcast)
            cross = (
                hx_ref[:, s][:, None] * gx
                + hy_ref[:, s][:, None] * gy
                + hz_ref[:, s][:, None] * gz
            )
            d_sq = gsq - 2.0 * cross + xsq_ref[:, s][:, None]
            acc = acc + v * (d_sq < thres_sq).astype(acc.dtype)
        acc_out[:, lo:hi] = acc


def occupancy_accumulate_padded(
    acc_p: jax.Array,       # (Hp, Lp) PRE-PADDED flat accumulator
    human_canon: jax.Array,  # (S, H, 3) human verts minus per-sample anchor
    grid_flat: jax.Array,   # (3, R³) voxel centers
    valid: jax.Array,       # (S,)
    thres: float,
    tile_h: int = 8,
) -> jax.Array:
    """Accumulate S samples' voxel hits into the padded grid, one HBM pass."""
    S, H, _ = human_canon.shape
    L = grid_flat.shape[1]
    Hp, Lp = acc_p.shape
    assert Hp % tile_h == 0 and Lp % 128 == 0
    assert Lp <= 4096 or Lp % 4096 == 0, "pad L to a 4096 lane-chunk multiple"

    S8 = _round_up(S, 8)
    relayout = lambda x: jnp.pad(jnp.swapaxes(x, 0, 1), ((0, Hp - H), (0, S8 - S)))
    hx = relayout(human_canon[..., 0])
    hy = relayout(human_canon[..., 1])
    hz = relayout(human_canon[..., 2])
    xsq = relayout(jnp.sum(human_canon * human_canon, axis=-1))
    g = jnp.zeros((8, Lp), grid_flat.dtype)
    g = g.at[:3, :L].set(grid_flat)
    # padded voxels get ||g||² = +inf so they never register hits... except
    # inf*0 traps; a huge finite value keeps d² above any threshold instead
    g = g.at[3, :L].set(jnp.sum(grid_flat * grid_flat, axis=0))
    g = g.at[3, L:].set(1e30)
    v = valid.reshape(S, 1).astype(acc_p.dtype)

    comp_spec = pl.BlockSpec((tile_h, S8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((tile_h, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _occupancy_kernel, S=S, TH=tile_h, thres_sq=float(thres) * float(thres)
    )
    return pl.pallas_call(
        kernel,
        grid=(Hp // tile_h,),
        in_specs=[comp_spec] * 4
        + [
            pl.BlockSpec((8, Lp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            acc_spec,
        ],
        out_specs=acc_spec,
        out_shape=jax.ShapeDtypeStruct(acc_p.shape, acc_p.dtype, vma=jax.typeof(acc_p).vma),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=S * Hp * Lp * 9,
            bytes_accessed=2 * Hp * Lp * 4 + 4 * S * Hp * 4,
            transcendentals=0,
        ),
    )(hx, hy, hz, xsq, g, v, acc_p)


def fused_occupancy_update_batch(
    state: OccupancyState,
    human_verts: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,    # (B, O, 3)
    valid: Optional[jax.Array] = None,
    slab: int = 8,
) -> OccupancyState:
    """Drop-in replacement for ``occupancy_update_batch`` with the hit
    accumulation fused (pad the grid once, scan slabs with the aliased
    kernel, slice at the end)."""
    B, H, _ = human_verts.shape
    if valid is None:
        valid = jnp.ones(B, human_verts.dtype)
    Bp = _round_up(B, slab)
    pad = Bp - B
    if pad:
        z = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        human_verts, obj_verts = z(human_verts), z(obj_verts)
        valid = jnp.pad(valid, (0, pad))

    R = state.spatial_res
    L = R * R * R
    tile_h = 8
    Hp, Lp = _round_up(H, tile_h), _round_up(L, 128)
    if Lp > 4096:
        Lp = _round_up(Lp, 4096)   # lane-chunk blocking (see _occupancy_kernel)
    flat = state.spatial_occupancy_grids.reshape(H, L)
    acc_p = jnp.pad(flat, ((0, Hp - H), (0, Lp - L)))
    grid_flat = state.spatial_grid.reshape(3, L)

    anchors = obj_verts[:, state.selected_obj_idx]            # (Bp, 3)

    def slab_step(carry, slabs):
        acc_p, used, anchor = carry
        hv, anc, v = slabs
        canon = hv - anc[:, None, :]
        acc_p = occupancy_accumulate_padded(
            acc_p, canon, grid_flat, v, thres=state.rel_dist_thres, tile_h=tile_h
        )
        # last valid sample's anchor wins (reference overwrites every sample)
        new_anchor = anchor
        for s in range(v.shape[0]):
            new_anchor = jnp.where(v[s] > 0, anc[s], new_anchor)
        return (acc_p, used + jnp.sum(v), new_anchor), None

    reshape = lambda a: a.reshape((Bp // slab, slab) + a.shape[1:])
    (acc_p, used, anchor), _ = jax.lax.scan(
        slab_step,
        (acc_p, state.used_count, state.anchor_vert),
        (reshape(human_verts), reshape(anchors), reshape(valid)),
    )
    return dataclasses.replace(
        state,
        spatial_occupancy_grids=acc_p[:H, :L].reshape(H, R, R, R),
        used_count=used,
        anchor_vert=anchor,
    )
