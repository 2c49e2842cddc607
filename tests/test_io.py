"""Round-trip and reference-format compatibility tests for ComA pickles."""
import functools
import pickle
import sys
import types

import numpy as np
import jax.numpy as jnp

from coma_tpu.affordance.contact import contact_update
from coma_tpu.affordance.io import (
    coma_state_to_dict,
    load_coma_state,
    load_occupancy_state,
    loads_pickle,
    save_coma_state,
    save_occupancy_state,
)
from coma_tpu.affordance.occupancy import occupancy_update
from coma_tpu.affordance.state import init_coma_state, init_occupancy_state

H, O, N, R = 5, 4, 16, 6

REFERENCE_COMA_KEYS = {
    # vars(ComA) minus cache/used/contact_dist_func (utils/coma.py:582-597)
    "device", "human_res", "obj_res", "normal_res", "spatial_res",
    "canon_normal_grid", "prob_grid_canon_human_wrt_obj",
    "prob_grid_canon_obj_wrt_human", "contact_dist_expectation_grid_nom",
    "contact_dist_expectation_grid_denom", "significant_contact_count",
    "proximity_settings", "cross_contact_scores_nom",
    "cross_contact_scores_denom", "cache_count", "used_count",
    "principle_vec", "sub_principle_vec", "rel_dist_method",
    "normal_gaussian_sigma", "eps",
}


def aggregated_state(rng):
    state = init_coma_state(H, O, N, 0.06, 0.24)
    hv = rng.normal(size=(H, 3)); ov = rng.normal(size=(O, 3))
    hn = rng.normal(size=(H, 3)); hn /= np.linalg.norm(hn, axis=-1, keepdims=True)
    on = rng.normal(size=(O, 3)); on /= np.linalg.norm(on, axis=-1, keepdims=True)
    return contact_update(state, *[jnp.array(x, dtype=jnp.float32) for x in (hv, hn, ov, on)])


def test_export_schema_matches_reference(rng):
    d = coma_state_to_dict(aggregated_state(rng))
    assert set(d.keys()) == REFERENCE_COMA_KEYS
    assert d["prob_grid_canon_human_wrt_obj"].dtype == np.float32
    assert d["prob_grid_canon_human_wrt_obj"].shape == (H, O, N)
    assert isinstance(d["used_count"], int) and d["used_count"] == 1
    assert d["proximity_settings"]["spatial_grid_size"] == 0.06


def test_contact_roundtrip(tmp_path, rng):
    state = aggregated_state(rng)
    p = str(tmp_path / "coma.pickle")
    save_coma_state(state, p)
    loaded = load_coma_state(p)
    for f in ("prob_grid_canon_human_wrt_obj", "prob_grid_canon_obj_wrt_human",
              "significant_contact_count", "canon_normal_grid"):
        np.testing.assert_array_equal(np.asarray(getattr(state, f)), np.asarray(getattr(loaded, f)))
    assert loaded.spatial_grid_thres == state.spatial_grid_thres
    assert float(loaded.used_count) == 1.0


def test_occupancy_roundtrip(tmp_path, rng):
    state = init_occupancy_state(H, O, R, 3.0)
    hv = rng.normal(size=(H, 3)); ov = rng.normal(size=(O, 3)) * 0.1
    state = occupancy_update(state, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    p = str(tmp_path / "occ.pickle")
    save_occupancy_state(state, p)
    loaded = load_occupancy_state(p)
    np.testing.assert_array_equal(np.asarray(state.spatial_occupancy_grids),
                                  np.asarray(loaded.spatial_occupancy_grids))
    assert abs(loaded.rel_dist_thres - state.rel_dist_thres) < 1e-9
    np.testing.assert_allclose(np.asarray(loaded.anchor_vert), np.asarray(state.anchor_vert))


def test_unpickler_stubs_reference_symbols(tmp_path):
    """Reference pickles embed functools.partial(utils.coma.negative_exp, ...);
    loading must tolerate the missing module."""
    fake = types.ModuleType("utils")
    fake_coma = types.ModuleType("utils.coma")

    def negative_exp(x):  # pragma: no cover
        return x

    negative_exp.__module__ = "utils.coma"
    negative_exp.__qualname__ = "negative_exp"
    fake_coma.negative_exp = negative_exp
    sys.modules["utils"] = fake
    sys.modules["utils.coma"] = fake_coma
    try:
        payload = pickle.dumps({
            "human_res": 2,
            "contact_dist_func": functools.partial(negative_exp, spatial_grid_size=0.06),
        })
    finally:
        del sys.modules["utils"], sys.modules["utils.coma"]

    out = loads_pickle(payload)
    assert out["human_res"] == 2  # loaded fine despite unimportable utils.coma
