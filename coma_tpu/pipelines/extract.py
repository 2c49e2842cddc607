"""ComA extraction driver: samples on disk -> aggregated state -> products.

Reference parity: ``src/coma/extract_coma.py:run_affordance_extraction:66-503``
with the TPU-first execution model: samples are loaded and prepped on host,
stacked into one (B, ·, 3) batch, and aggregated by a single jitted scan
(sharded over the device mesh when more than one device is present) instead
of the reference's per-sample eager GPU updates.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.affordance.contact import contact_update_batch
from coma_tpu.affordance.io import (
    load_coma_state,
    load_occupancy_state,
    load_pickle,
    save_coma_state,
    save_occupancy_state,
)
from coma_tpu.affordance.occupancy import occupancy_update_batch
from coma_tpu.affordance.state import init_coma_state, init_occupancy_state
from coma_tpu.core.paths import ResultsTree, SampleKey, smplx_downsample_path
from coma_tpu.core.sentinels import is_sentinel
from coma_tpu.parallel.sharding import (
    sharded_contact_aggregate,
    sharded_occupancy_aggregate,
)
from coma_tpu.pipelines.affordance_inputs import prepare_affordance_extraction_inputs
from coma_tpu.pipelines.products import save_product


def load_postfilter_whitelist(tree: ResultsTree, sc, cat, asset, mainprompt):
    path = tree.postfilter_json(sc, cat, asset, mainprompt)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"postfilter whitelist missing: {path} (run the filter stage first)"
        )
    with open(path, "r") as rf:
        return {tuple(entry) for entry in json.load(rf)}


def collect_scam_samples(
    tree: ResultsTree,
    supercategories: Optional[List[str]],
    categories: Optional[List[str]],
    prompts: Optional[List[str]],
    enable_postfilter: bool,
) -> Dict[tuple, List[SampleKey]]:
    """Group surviving samples by SCAM = (supercategory, category, asset,
    mainprompt) (reference: ``extract_coma.py:147-260``)."""
    scams: Dict[tuple, List[SampleKey]] = {}
    whitelists: Dict[tuple, set] = {}
    for key, path in tree.iter_human_samples(supercategories, categories, prompts):
        if enable_postfilter:
            scam = key.scam
            if scam not in whitelists:
                whitelists[scam] = load_postfilter_whitelist(
                    tree, key.supercategory, key.category, key.asset_id, key.mainprompt
                )
            checker = (key.view_id, key.asset_mask_id, key.prompt, key.inpaint_id)
            if checker not in whitelists[scam]:
                continue
        else:
            payload = load_pickle(path)
            if is_sentinel(payload):
                continue
        scams.setdefault(key.scam, []).append(key)
    return scams


def aggregate_samples_tpu(state, samples: List[Dict[str, np.ndarray]], occupancy: bool):
    """Stack prepped samples and aggregate in one jitted program; shard over
    the mesh when multiple devices are available."""
    stack = lambda field: jnp.asarray(
        np.stack([s[field] for s in samples]), dtype=jnp.float32
    )
    hv = stack("human_verts")
    ov = stack("obj_verts")
    multi = len(jax.devices()) > 1
    if occupancy:
        if multi:
            return sharded_occupancy_aggregate(state, hv, ov)
        if jax.default_backend() != "cpu":
            from coma_tpu.ops.occupancy_kernel import fused_occupancy_update_batch

            return jax.jit(fused_occupancy_update_batch)(state, hv, ov)
        return jax.jit(occupancy_update_batch)(state, hv, ov)
    hn = stack("human_normals")
    on = stack("obj_normals")
    if multi:
        return sharded_contact_aggregate(state, hv, hn, ov, on)
    if jax.default_backend() != "cpu":
        # the Pallas fused splat kernel (Mosaic only compiles for TPU)
        from coma_tpu.ops.contact_kernel import fused_contact_update_batch

        return jax.jit(fused_contact_update_batch)(state, hv, hn, ov, on)
    return jax.jit(contact_update_batch)(state, hv, hn, ov, on)


def aggregate_samples_streaming(
    state, keys, prepare_fn, occupancy: bool, batch_size: int = 32,
    num_workers: int = 4,
):
    """Stream samples through a prefetching loader; the TPU aggregates batch
    k while workers load batch k+1 (vs the reference's strictly serial
    unpickle->prep->update loop, ``extract_coma.py:383-425``).

    ``state`` may be passed as a 1-element list (``[state]``): the list is
    emptied on entry, HANDING OVER the caller's only reference so the initial
    grids free as soon as batch 0's output replaces them. Passing the state
    bare keeps a live reference in the caller's frame for the whole call —
    one extra (H, O, N) grid-pair (~3.8 GB at the reference qual shape) that
    the 16 GB chip cannot spare at peak (measured: batch 1 of a 2-batch
    full-scale run RESOURCE_EXHAUSTs with the bare form, fits with the
    handover).

    Returns (state, num_samples).
    """
    from coma_tpu.pipelines.loader import PrefetchingSampleLoader

    if isinstance(state, list):
        state = state.pop()

    multi = len(jax.devices()) > 1
    # Donate the state on real (non-tunneled) TPU: in-place accumulation
    # halves the inter-batch grid peak (in-state + out-state -> one). The
    # axon tunnel rejects donation at runtime (INVALID_ARGUMENT, observed
    # r5) and XLA:CPU ignores it with a warning, so gate on the platform.
    donate = (0,) if jax.default_backend() == "tpu" else ()
    if occupancy:
        if multi:
            step = sharded_occupancy_aggregate
        elif jax.default_backend() != "cpu":
            from coma_tpu.ops.occupancy_kernel import fused_occupancy_update_batch

            step = jax.jit(fused_occupancy_update_batch, donate_argnums=donate)
        else:
            step = jax.jit(occupancy_update_batch)
    elif multi:
        step = sharded_contact_aggregate
    elif jax.default_backend() != "cpu":
        from coma_tpu.ops.contact_kernel import fused_contact_update_batch

        step = jax.jit(fused_contact_update_batch, donate_argnums=donate)
    else:
        step = jax.jit(contact_update_batch)

    loader = PrefetchingSampleLoader(
        keys, prepare_fn, batch_size=batch_size, num_workers=num_workers
    )
    n = 0
    for batch in loader:
        valid = jnp.asarray(batch["valid"])
        n += int(batch["valid"].sum())
        if occupancy:
            state = step(
                state,
                jnp.asarray(batch["human_verts"]),
                jnp.asarray(batch["obj_verts"]),
                valid=valid,
            )
        else:
            state = step(
                state,
                jnp.asarray(batch["human_verts"]),
                jnp.asarray(batch["human_normals"]),
                jnp.asarray(batch["obj_verts"]),
                jnp.asarray(batch["obj_normals"]),
                valid=valid,
            )
        # One scalar fetch per batch = a hard completion barrier. Without
        # it, async dispatch enqueues batch k+1 while batch k is still
        # executing, so THREE (H, O, N) grid-pair states are live at once
        # (~12 GB at the reference qual shape 10475x180x250) and the 16 GB
        # chip RESOURCE_EXHAUSTs; the barrier caps the peak at two states.
        # A value fetch, not block_until_ready — the tunneled backend can
        # ack block_until_ready before the device finishes. The threaded
        # loader keeps prefetching batch k+1 while we wait, so load/compute
        # overlap is preserved; the fetch itself is ~40 ms per batch.
        float(state.used_count)
    return state, n


def run_affordance_extraction(
    hyperparams: Dict[str, Any],
    hyperparams_key: str,
    supercategories: Optional[List[str]] = None,
    categories: Optional[List[str]] = None,
    prompts: Optional[List[str]] = None,
    results_root: str = "results",
    constants_mesh_dir: str = "./constants/mesh",
    coma_save_dir: Optional[str] = None,
    affordance_save_dir: Optional[str] = None,
    scale_tolerance: float = 3.0,
    skip_done: bool = False,
    verbose: bool = True,
    multihost: bool = False,
    timings: Optional[Dict[str, float]] = None,
) -> List[str]:
    """Run extraction for every discovered SCAM; returns saved product paths.

    With ``multihost`` (after ``parallel.multihost.initialize()``): each
    process aggregates its shard of the sample list, states are combined with
    one DCN psum, and process 0 writes the outputs (SURVEY §2.6 mapping).

    ``timings`` (optional dict) accumulates phase wall-clocks across scams:
    ``aggregate_s`` (load+prep+device scan), ``export_s`` (device->host state
    fetch + pickle write) and ``product_s`` (product compute + save) — the
    bench harness uses it to separate compute from transfer cost."""
    import time as _time
    tree = ResultsTree(results_root)
    visualize_type = hyperparams["visualize_type"]
    occupancy = visualize_type == "occupancy"
    quant_mode = hyperparams.get("quant_mode", False)

    human_pth = smplx_downsample_path(hyperparams["human_res"], constants_mesh_dir)
    if not os.path.exists(human_pth):
        # downsample_human collapses any level >= the template's vertex count
        # to the single FULL pickle (cli/downsample_human.py) — follow it, so
        # tiny smoke templates stay drivable end-to-end
        full_pth = smplx_downsample_path("FULL", constants_mesh_dir)
        if os.path.exists(full_pth):
            human_pth = full_pth
    human_downsample = load_pickle(human_pth)
    H = (
        human_downsample["N_raw"]
        if hyperparams["human_use_downsample_pcd_raw"]
        else human_downsample["N"]
    )

    scams = collect_scam_samples(
        tree, supercategories, categories, prompts, hyperparams["enable_postfilter"]
    )

    saved: List[str] = []
    for scam in sorted(scams.keys()):
        sc, cat, asset, mainprompt = scam
        if quant_mode and mainprompt != "total":
            continue
        keys = scams[scam]

        object_downsample = load_pickle(
            tree.asset_downsample(sc, cat, asset, hyperparams["object_res"])
        )
        O = (
            object_downsample["N_raw"]
            if hyperparams["object_use_downsample_pcd_raw"]
            else object_downsample["N"]
        )

        coma_pickle = tree.coma_pickle(sc, cat, asset, hyperparams_key, mainprompt)
        coma_json = tree.coma_json(sc, cat, asset, hyperparams_key, mainprompt)
        out_dir = tree.affordance_dir(sc, cat, asset, hyperparams_key, mainprompt)

        if skip_done and os.path.exists(coma_pickle):
            state = (
                load_occupancy_state(coma_pickle)
                if occupancy
                else load_coma_state(coma_pickle)
            )
        else:
            def prepare_one(key):
                return prepare_affordance_extraction_inputs(
                    human_mesh_pth=tree.human_sample(key),
                    human_downsample_metadata=human_downsample,
                    object_downsample_metadata=object_downsample,
                    human_use_downsample_pcd_raw=hyperparams[
                        "human_use_downsample_pcd_raw"
                    ],
                    object_use_downsample_pcd_raw=hyperparams[
                        "object_use_downsample_pcd_raw"
                    ],
                    eps=hyperparams["eps"],
                    standardize_human_scale=hyperparams["standardize_human_scale"],
                    scaler_range=hyperparams["scaler_range"],
                    camera_pth=tree.camera(sc, cat, asset, key.view_id),
                    human_params_pth=tree.human_pred(key),
                )

            if occupancy:
                state = init_occupancy_state(
                    human_res=H,
                    obj_res=O,
                    spatial_res=hyperparams["spatial_res"],
                    scale_tolerance=scale_tolerance,
                )
            else:
                state = init_coma_state(
                    human_res=H,
                    obj_res=O,
                    normal_res=hyperparams["normal_res"],
                    spatial_grid_size=hyperparams["spatial_grid_size"],
                    spatial_grid_thres=hyperparams["spatial_grid_thres"],
                    normal_gaussian_sigma=hyperparams["normal_gaussian_sigma"],
                    principle_vec=hyperparams["principle_vec"],
                    sub_principle_vec=hyperparams["sub_principle_vec"],
                    eps=hyperparams["eps"],
                )
            agg_keys = keys
            if multihost:
                from coma_tpu.parallel import multihost as mh

                agg_keys = mh.process_shard_worklist(sorted(keys))
            _t0 = _time.perf_counter()
            # hand over the init state's ONLY reference (list form) so the
            # zeroed grids free the moment batch 0's output replaces them —
            # a bare `state` argument stays pinned by this frame for the
            # whole call and costs an extra grid-pair of HBM at peak
            state_box = [state]
            del state
            state, n_samples = aggregate_samples_streaming(
                state_box, agg_keys, prepare_one, occupancy
            )
            if timings is not None:
                timings["aggregate_s"] = timings.get("aggregate_s", 0.0) + (
                    _time.perf_counter() - _t0)
            if multihost:
                state = mh.allreduce_state(state)
                n_samples = int(
                    np.asarray(
                        mh.allreduce_tree(np.asarray(n_samples, np.int64))
                    )
                )
                if jax.process_index() != 0:
                    continue  # process 0 owns the writes
            if n_samples == 0:
                if verbose:
                    print(f"[extract] {scam}: no surviving samples, skipping")
                continue

            os.makedirs(os.path.dirname(coma_pickle), exist_ok=True)
            _t0 = _time.perf_counter()
            if occupancy:
                save_occupancy_state(state, coma_pickle)
            else:
                save_coma_state(state, coma_pickle)
            if timings is not None:
                timings["export_s"] = timings.get("export_s", 0.0) + (
                    _time.perf_counter() - _t0)
            info = dict(hyperparams)
            info.update(
                H=H, O=O, num_samples=n_samples,
                supercategory=sc, category=cat, asset_id=asset, mainprompt=mainprompt,
            )
            with open(coma_json, "w") as wf:
                json.dump(info, wf, indent=1, default=str)
            if verbose:
                print(f"[extract] {scam}: aggregated {n_samples} samples "
                      f"(H={H}, O={O}) -> {coma_pickle}")

        if visualize_type != "none":
            _t0 = _time.perf_counter()
            saved.append(
                save_product(state, visualize_type, hyperparams, object_downsample, out_dir)
            )
            if timings is not None:
                timings["product_s"] = timings.get("product_s", 0.0) + (
                    _time.perf_counter() - _t0)
    return saved
