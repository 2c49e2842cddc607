"""ComA pickle export/load, format-compatible with the reference.

The reference ships trained ComA models as pickles of ``vars(ComA)`` with all
tensors numpy-ified (``utils/coma.py:export:582-597`` via
``utils/misc.py:to_np_torch_recursive``). We read and write the same dict
schema so pre-trained reference pickles load into :class:`ComAState` /
:class:`OccupancyState` and our exports load into the reference's classes.

One deliberate divergence: the reference pickles include ``contact_dist_func``
— a ``functools.partial`` over ``utils.coma.negative_exp`` whose unpickling
requires the reference package on ``sys.path``. We (a) tolerate it on load
via a stubbing unpickler and (b) omit it on export; the reference's
``ComA.load`` only ``setattr``s keys that exist in the dict, and its
``__init__`` already created the partial, so omission is load-compatible.
"""
from __future__ import annotations

import io as _io
import pickle
import warnings
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from coma_tpu.affordance.state import (
    ComAState,
    OccupancyState,
    init_coma_state,
    init_occupancy_state,
    make_voxel_grid,
)


class RefPickleStubWarning(UserWarning):
    """A reference pickle referenced a symbol we could not import.

    The payload under that symbol is replaced by a :class:`_Stub`; loading
    proceeds, but the stubbed entry carries no data. Warn loudly so a pickle
    whose *arrays* fail to resolve is never silently swallowed."""


class _Stub:
    """Placeholder for unresolvable classes/functions inside reference pickles."""

    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs

    def __call__(self, *args, **kwargs):  # pragma: no cover - never invoked
        raise RuntimeError("stubbed callable from a reference pickle was invoked")

    def __setstate__(self, state):
        self.state = state


class RefCompatUnpickler(pickle.Unpickler):
    """Unpickler that stubs out reference-repo module references.

    Reference pickles may embed ``utils.coma.negative_exp`` (inside a
    functools.partial) and similar first-party symbols. Anything that cannot
    be imported resolves to a harmless stub instead of raising.
    """

    def find_class(self, module: str, name: str):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            warnings.warn(
                f"reference pickle references unimportable symbol "
                f"{module}.{name}; substituting a stub (its payload is "
                f"dropped). Expected for 'utils.coma.negative_exp' / "
                f"'easydict.EasyDict'-era entries; anything else may mean "
                f"lost data.",
                RefPickleStubWarning,
                stacklevel=2,
            )
            return _Stub


def load_pickle(path: str) -> Any:
    with open(path, "rb") as handle:
        return RefCompatUnpickler(handle).load()


def loads_pickle(data: bytes) -> Any:
    return RefCompatUnpickler(_io.BytesIO(data)).load()


# ---------------------------------------------------------------------------
# Contact / orientation state
# ---------------------------------------------------------------------------

def coma_state_to_dict(state: ComAState) -> Dict[str, Any]:
    """Serialize to the reference's ``vars(ComA)`` dict schema (all numpy)."""
    H, O = state.human_res, state.obj_res
    return {
        "device": "tpu",
        "human_res": H,
        "obj_res": O,
        "normal_res": state.normal_res,
        "spatial_res": 0,
        "canon_normal_grid": np.asarray(state.canon_normal_grid, dtype=np.float32),
        "prob_grid_canon_human_wrt_obj": np.asarray(
            state.prob_grid_canon_human_wrt_obj, dtype=np.float32
        ),
        "prob_grid_canon_obj_wrt_human": np.asarray(
            state.prob_grid_canon_obj_wrt_human, dtype=np.float32
        ),
        "contact_dist_expectation_grid_nom": np.asarray(
            state.contact_dist_expectation_grid_nom, dtype=np.float32
        ),
        "contact_dist_expectation_grid_denom": np.asarray(
            state.contact_dist_expectation_grid_denom, dtype=np.float32
        ),
        "significant_contact_count": np.asarray(
            state.significant_contact_count, dtype=np.float32
        ),
        "proximity_settings": {
            "spatial_grid_size": state.spatial_grid_size,
            "spatial_grid_thres": state.spatial_grid_thres,
        },
        # zero-initialized in the reference and never written by the main path
        # (utils/coma.py:226-227); kept for schema parity.
        "cross_contact_scores_nom": np.zeros((H, O), dtype=np.float32),
        "cross_contact_scores_denom": np.zeros((H, O), dtype=np.float32),
        "cache_count": 0,
        "used_count": int(np.asarray(state.used_count)),
        "principle_vec": np.asarray(state.principle_vec, dtype=np.float32),
        "sub_principle_vec": np.asarray(state.sub_principle_vec, dtype=np.float32),
        "rel_dist_method": "dist",
        "normal_gaussian_sigma": state.normal_gaussian_sigma,
        "eps": state.eps,
    }


def coma_state_from_dict(d: Dict[str, Any], dtype=jnp.float32) -> ComAState:
    """Rebuild a :class:`ComAState` from a reference-format dict."""
    prox = d.get("proximity_settings", {}) or {}
    state = init_coma_state(
        human_res=int(d["human_res"]),
        obj_res=int(d["obj_res"]),
        normal_res=int(d["normal_res"]),
        spatial_grid_size=float(prox.get("spatial_grid_size", 0.06)),
        spatial_grid_thres=float(prox.get("spatial_grid_thres", 0.24)),
        normal_gaussian_sigma=float(d.get("normal_gaussian_sigma", 0.2)),
        principle_vec=np.asarray(d.get("principle_vec", [0, 0, 1]), dtype=np.float32),
        sub_principle_vec=np.asarray(
            d.get("sub_principle_vec", [0, 1, 0]), dtype=np.float32
        ),
        eps=float(d.get("eps", 1e-10)),
        dtype=dtype,
    )
    import dataclasses

    arr = lambda k, cur: jnp.asarray(d[k], dtype=dtype) if k in d else cur
    return dataclasses.replace(
        state,
        canon_normal_grid=arr("canon_normal_grid", state.canon_normal_grid),
        prob_grid_canon_human_wrt_obj=arr(
            "prob_grid_canon_human_wrt_obj", state.prob_grid_canon_human_wrt_obj
        ),
        prob_grid_canon_obj_wrt_human=arr(
            "prob_grid_canon_obj_wrt_human", state.prob_grid_canon_obj_wrt_human
        ),
        contact_dist_expectation_grid_nom=arr(
            "contact_dist_expectation_grid_nom",
            state.contact_dist_expectation_grid_nom,
        ),
        contact_dist_expectation_grid_denom=arr(
            "contact_dist_expectation_grid_denom",
            state.contact_dist_expectation_grid_denom,
        ),
        significant_contact_count=arr(
            "significant_contact_count", state.significant_contact_count
        ),
        used_count=jnp.asarray(float(d.get("used_count", 0)), dtype=dtype),
    )


def save_coma_state(state: ComAState, path: str) -> None:
    with open(path, "wb") as handle:
        pickle.dump(coma_state_to_dict(state), handle, protocol=pickle.HIGHEST_PROTOCOL)


def load_coma_state(path: str, dtype=jnp.float32) -> ComAState:
    return coma_state_from_dict(load_pickle(path), dtype=dtype)


# ---------------------------------------------------------------------------
# Occupancy state
# ---------------------------------------------------------------------------

def occupancy_state_to_dict(state: OccupancyState) -> Dict[str, Any]:
    """Serialize to the reference's ``vars(ComA_Occupancy)`` dict schema."""
    R = state.spatial_res
    grid, metadata = make_voxel_grid(gridsize=2.4, resolution=R)
    ijk = np.mgrid[0:R, 0:R, 0:R].astype(np.int64)
    anchor = np.asarray(state.anchor_vert, dtype=np.float32)
    return {
        "device": "tpu",
        "human_res": state.human_res,
        "obj_res": state.obj_res,
        "normal_res": 0,
        "spatial_res": R,
        "spatial_grid": np.asarray(state.spatial_grid, dtype=np.float32),
        "spatial_indexgrid": ijk,
        "spatial_grid_metadata": {
            k: (np.asarray(v, dtype=np.float32) if isinstance(v, np.ndarray) else v)
            for k, v in metadata.items()
        },
        "N_x": R,
        "N_y": R,
        "N_z": R,
        "spatial_occupancy_grids": np.asarray(
            state.spatial_occupancy_grids, dtype=np.float32
        ),
        "cache_count": 0,
        "used_count": int(np.asarray(state.used_count)),
        "principle_vec": np.asarray([0, 0, 1], dtype=np.float32),
        "sub_principle_vec": np.asarray([0, 1, 0], dtype=np.float32),
        "rel_dist_method": "dist",
        "rel_dist_thres": state.rel_dist_thres,
        "normal_gaussian_sigma": 0.1,
        "eps": 1e-8,
        "debug_obj_vert": None if np.any(np.isnan(anchor)) else anchor,
        "debug_obj_normal": None,
    }


def occupancy_state_from_dict(
    d: Dict[str, Any], scale_tolerance: Optional[float] = None, dtype=jnp.float32
) -> OccupancyState:
    R = int(d["spatial_res"])
    state = init_occupancy_state(
        human_res=int(d["human_res"]),
        obj_res=int(d["obj_res"]),
        spatial_res=R,
        # rel_dist_thres is stored directly; scale_tolerance only matters for
        # fresh states, so reconstruct it from the stored threshold.
        scale_tolerance=(
            scale_tolerance
            if scale_tolerance is not None
            else float(d["rel_dist_thres"]) / (2.4 / R)
        ),
        dtype=dtype,
    )
    import dataclasses

    replace = dict(
        spatial_occupancy_grids=jnp.asarray(d["spatial_occupancy_grids"], dtype=dtype),
        used_count=jnp.asarray(float(d.get("used_count", 0)), dtype=dtype),
    )
    if d.get("spatial_grid") is not None:
        replace["spatial_grid"] = jnp.asarray(d["spatial_grid"], dtype=dtype)
    if d.get("debug_obj_vert") is not None:
        replace["anchor_vert"] = jnp.asarray(d["debug_obj_vert"], dtype=dtype)
    return dataclasses.replace(state, **replace)


def save_occupancy_state(state: OccupancyState, path: str) -> None:
    with open(path, "wb") as handle:
        pickle.dump(
            occupancy_state_to_dict(state), handle, protocol=pickle.HIGHEST_PROTOCOL
        )


def load_occupancy_state(path: str, dtype=jnp.float32) -> OccupancyState:
    return occupancy_state_from_dict(load_pickle(path), dtype=dtype)
