"""Device-mesh sharding of ComA aggregation.

The TPU-native replacement for the reference's parallelism story (SURVEY.md
§2.6): instead of bash launching one process per GPU with a statically
index-sharded work list (``src/generation/inpaint.py:271-278``,
``scripts/generation/inpaint.sh:204-268``), the sample batch shards over a
``jax.sharding.Mesh`` data axis, every chip aggregates its shard with the
same jitted program, and the accumulators are combined with one ``psum`` —
the only collective this workload fundamentally needs.

Scaling axes:
- ``data``: samples (embarrassingly parallel, matches the reference).
- The H (human-vertex) axis of the accumulators can additionally be sharded
  for grids exceeding one chip's HBM (the reference's scale limit was the
  10475×180×250 grid on one GPU); see :func:`shard_state_over_h`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coma_tpu.affordance.contact import contact_update_batch
from coma_tpu.affordance.occupancy import occupancy_update_batch
from coma_tpu.affordance.state import ComAState, OccupancyState


def default_mesh(axis_name: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def pad_batch(arrays, batch_axis_size: int):
    """Pad a list of (B, ...) arrays to ``batch_axis_size`` and return the
    padded arrays plus the (B_padded,) validity mask.

    Mirrors the reference's ragged work-list sharding
    (``sub_length = len(X)//parallel_num + 1`` gives the last worker a short
    shard, ``inpaint.py:271-278``) — here the shard is padded instead and the
    pad is masked out of the accumulators.
    """
    B = arrays[0].shape[0]
    assert batch_axis_size >= B
    pad = batch_axis_size - B
    padded = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrays]
    valid = jnp.concatenate([jnp.ones(B, padded[0].dtype), jnp.zeros(pad, padded[0].dtype)])
    return padded, valid


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def sharded_contact_aggregate(
    state: ComAState,
    human_verts: jax.Array,    # (B, H, 3)
    human_normals: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,      # (B, O, 3)
    obj_normals: jax.Array,    # (B, O, 3)
    mesh: Optional[Mesh] = None,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
    use_fused: Optional[bool] = None,
) -> ComAState:
    """Aggregate a sample batch sharded over the mesh's data axis.

    Pads B up to a multiple of the axis size, scans each shard on its chip,
    and ``psum``s the accumulators. Bitwise-equivalent (up to f32 reduction
    order) to the sequential aggregation of the same samples.

    ``use_fused`` routes each shard through the fused Pallas splat kernel
    (:func:`coma_tpu.ops.contact_kernel.fused_contact_update_batch`, ~28x
    the XLA path on one chip); default: on iff the backend is TPU (Mosaic
    kernels do not run on the CPU mesh used in tests).
    """
    mesh = mesh or default_mesh(axis_name)
    n_dev = mesh.shape[axis_name]
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"

    B = human_verts.shape[0]
    B_pad = round_up(B, n_dev)
    if valid is None:
        valid = jnp.ones(B, human_verts.dtype)
    padded, pad_mask = pad_batch(
        [human_verts, human_normals, obj_verts, obj_normals, valid], B_pad
    )
    hv, hn, ov, on, valid_padded = padded
    valid_padded = valid_padded * pad_mask  # caller mask ∧ pad mask

    accum_fields = (
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "contact_dist_expectation_grid_denom",
        "significant_contact_count",
        "used_count",
    )

    def shard_fn(s, hv, hn, ov, on, v):
        # Each shard accumulates its contribution into ZEROED accumulators
        # (the updates are pure additions), the per-shard DELTAS are psum-ed,
        # and the incoming state is added back exactly once. Updating the
        # replicated incoming state in place and psum-ing the result would
        # multiply the carried-in accumulators by the device count — correct
        # only for a fresh (all-zero) state, silently wrong when chained
        # batch-over-batch as the streaming extraction does. The zeroed
        # accumulators are promoted to "varying" for shard_map's vma
        # tracking; the constant fields (canon grid, principal vecs) stay
        # replicated.
        import dataclasses

        s0 = dataclasses.replace(
            s, **{f: jax.lax.pcast(jnp.zeros_like(getattr(s, f)),
                                   (axis_name,), to="varying")
                  for f in accum_fields}
        )
        if use_fused:
            from coma_tpu.ops.contact_kernel import fused_contact_update_batch

            upd = fused_contact_update_batch(s0, hv, hn, ov, on, valid=v)
        else:
            upd = contact_update_batch(s0, hv, hn, ov, on, valid=v)
        return dataclasses.replace(
            s,
            **{f: getattr(s, f) + jax.lax.psum(getattr(upd, f), axis_name)
               for f in accum_fields},
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
    )
    return fn(state, hv, hn, ov, on, valid_padded)


def sharded_occupancy_aggregate(
    state: OccupancyState,
    human_verts: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,    # (B, O, 3)
    mesh: Optional[Mesh] = None,
    valid: Optional[jax.Array] = None,
    axis_name: str = "data",
    use_fused: Optional[bool] = None,
) -> OccupancyState:
    """Occupancy counterpart of :func:`sharded_contact_aggregate`
    (``use_fused``: per-shard Pallas hit kernel, default on iff TPU)."""
    mesh = mesh or default_mesh(axis_name)
    n_dev = mesh.shape[axis_name]
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"

    B = human_verts.shape[0]
    B_pad = round_up(B, n_dev)
    if valid is None:
        valid = jnp.ones(B, human_verts.dtype)
    padded, pad_mask = pad_batch([human_verts, obj_verts, valid], B_pad)
    hv, ov, valid_padded = padded
    valid_padded = valid_padded * pad_mask

    def shard_fn(s, hv, ov, v):
        import dataclasses

        # Additive accumulators start ZEROED per shard and only the deltas
        # are psum-ed (adding the incoming state back once) — psum-ing the
        # updated replicated state would scale the carried-in accumulators
        # by the device count when chained batch-over-batch (see
        # sharded_contact_aggregate). anchor_vert is NOT additive: it passes
        # through so an already-set anchor (chained call) is kept.
        add_fields = ("spatial_occupancy_grids", "used_count")
        s0 = dataclasses.replace(
            s,
            anchor_vert=jax.lax.pcast(s.anchor_vert, (axis_name,), to="varying"),
            **{f: jax.lax.pcast(jnp.zeros_like(getattr(s, f)),
                                (axis_name,), to="varying")
               for f in add_fields},
        )
        if use_fused:
            from coma_tpu.ops.occupancy_kernel import fused_occupancy_update_batch

            upd = fused_occupancy_update_batch(s0, hv, ov, valid=v)
        else:
            upd = occupancy_update_batch(s0, hv, ov, valid=v)
        # anchor_vert is identical on every shard (same object vertex, the
        # reference asserts this across samples); take any shard's copy via
        # pmax rather than psum (which would scale it by the device count).
        # Shards that saw only padding still hold the NaN init — mask those
        # to -inf so they lose the pmax (and restore NaN if all were empty).
        anchor = jnp.where(jnp.isnan(upd.anchor_vert), -jnp.inf, upd.anchor_vert)
        anchor = jax.lax.pmax(anchor, axis_name)
        anchor = jnp.where(jnp.isinf(anchor), jnp.nan, anchor)
        return dataclasses.replace(
            s,
            spatial_occupancy_grids=s.spatial_occupancy_grids
            + jax.lax.psum(upd.spatial_occupancy_grids, axis_name),
            used_count=s.used_count + jax.lax.psum(upd.used_count, axis_name),
            anchor_vert=anchor,
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
    )
    return fn(state, hv, ov, valid_padded)


def shard_state_over_h(state, mesh: Optional[Mesh] = None, axis_name: str = "data"):
    """Lay out the accumulators sharded over the H (human-vertex) axis.

    For grids too large for one chip (reference limit: H×O×N = 10475×180×250
    fp32 ≈ 470 MB ×2 grids plus activations), place each accumulator with
    ``NamedSharding(mesh, P('data'))`` on its leading (H) axis; the
    per-sample update is elementwise in H so jit partitions it with zero
    communication.
    """
    mesh = mesh or default_mesh(axis_name)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 2:  # H-leading accumulators
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return x

    import dataclasses

    fields = {}
    for f in (
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "contact_dist_expectation_grid_denom",
        "significant_contact_count",
        "spatial_occupancy_grids",
    ):
        if hasattr(state, f):
            fields[f] = place(getattr(state, f))
    return dataclasses.replace(state, **fields)


def mesh_2d(
    n_data: int, n_model: int, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, model) 2-D mesh: samples shard over 'data', the H
    (human-vertex) axis of the accumulators shards over 'model'."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def sharded_contact_aggregate_2d(
    state: ComAState,
    human_verts: jax.Array,    # (B, H, 3)
    human_normals: jax.Array,  # (B, H, 3)
    obj_verts: jax.Array,      # (B, O, 3)
    obj_normals: jax.Array,    # (B, O, 3)
    mesh: Mesh,
    valid: Optional[jax.Array] = None,
) -> ComAState:
    """Data-parallel over samples AND model-parallel over the H axis.

    The full 'training step' of this framework: each (data, model) tile scans
    its sample shard against its H-slice of the accumulators, then one psum
    over 'data' combines the sample shards. No collective is needed on
    'model' — the update is elementwise in H (each H-row of the grids depends
    only on that row's human vertices), so H-sharding is communication-free;
    this is what lets the reference's single-GPU-bound 470M-element grid
    (SURVEY.md §6) scale past one chip's HBM.
    """
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    H = human_verts.shape[1]
    assert H % n_model == 0, f"H={H} must divide over model={n_model}"

    B = human_verts.shape[0]
    B_pad = round_up(B, n_data)
    if valid is None:
        valid = jnp.ones(B, human_verts.dtype)
    padded, pad_mask = pad_batch(
        [human_verts, human_normals, obj_verts, obj_normals, valid], B_pad
    )
    hv, hn, ov, on, valid_padded = padded
    valid_padded = valid_padded * pad_mask

    accum_fields = (
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "contact_dist_expectation_grid_denom",
        "significant_contact_count",
        "used_count",
    )
    # H-leading accumulators shard over 'model'; scalars/constants replicate.
    h_sharded = P("model")
    state_specs = ComAState(
        canon_normal_grid=P(),
        prob_grid_canon_human_wrt_obj=h_sharded,
        prob_grid_canon_obj_wrt_human=h_sharded,
        contact_dist_expectation_grid_nom=h_sharded,
        contact_dist_expectation_grid_denom=h_sharded,
        significant_contact_count=h_sharded,
        used_count=P(),
        principle_vec=P(),
        sub_principle_vec=P(),
        human_res=state.human_res,
        obj_res=state.obj_res,
        normal_res=state.normal_res,
        spatial_grid_size=state.spatial_grid_size,
        spatial_grid_thres=state.spatial_grid_thres,
        normal_gaussian_sigma=state.normal_gaussian_sigma,
        eps=state.eps,
    )
    # samples: B shards over 'data', the H axis of human arrays over 'model'
    human_spec = P("data", "model")
    obj_spec = P("data")

    def shard_fn(s, hv, hn, ov, on, v):
        import dataclasses

        s = dataclasses.replace(
            s,
            **{
                f: jax.lax.pcast(getattr(s, f), ("data",), to="varying")
                for f in accum_fields
            },
        )
        s = contact_update_batch(s, hv, hn, ov, on, valid=v)
        return dataclasses.replace(
            s, **{f: jax.lax.psum(getattr(s, f), "data") for f in accum_fields}
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(state_specs, human_spec, human_spec, obj_spec, obj_spec, P("data")),
        out_specs=state_specs,
    )
    return fn(state, hv, hn, ov, on, valid_padded)
