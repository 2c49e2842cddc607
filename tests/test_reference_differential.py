"""Differential parity: the REFERENCE'S OWN torch code as the oracle.

The strongest oracle available in this environment is the reference source
itself at ``/root/reference`` — its math is torch/numpy and CPU-runnable once
the unused heavy deps (open3d, trimesh, detectron2, easydict) are stubbed.
These tests import the actual reference modules and property-test our JAX
functions against the REAL reference math on randomized inputs, replacing
the hand-written mirrors in ``tests/oracles.py`` as ground truth for every
aggregation/derivation path (VERDICT r3 item 4).

Covered (reference file:line):
- ``canonicalize_a_wrt_b_to_p`` incl. the 180° singular branch
  (``utils/coma.py:105-172``)
- ``geodesic_gaussian_scores`` / ``get_uniform_points_on_sphere``
  (``utils/coma.py:15-112``)
- ``ComA.aggregate_single_sample_for_contact`` via register+aggregate_all
  (``utils/coma.py:279-323``)
- ``compute_contact_map`` / ``aggregate_contact_for_significant_pairs``
  (``utils/coma.py:333-438``)
- entropy v1/v2 (``utils/coma.py:441-487,529-579``)
- ``ComA_Occupancy`` updates + ``return_aggregated_spatial_grids``
  (``utils/coma_occupancy.py:272-312``)
- SIM/MAE (``utils/evaluation.py:4-49``), IoU/IoM/IoChosen + cam transform
  (``utils/postprocess.py:10-107,155-182``)
- ``batch_rodrigues`` / ``quat_to_rotmat`` (``utils/transformations.py:20-58``)

Slow lane: the oracles aggregate full H x O x N grids sample-by-sample in
torch; runtime is seconds-per-test but the lane budget is strict.
"""
from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = os.environ.get("COMA_REFERENCE_ROOT", "/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE_ROOT, "utils")),
        reason="reference checkout unavailable",
    ),
]

# small but non-degenerate shapes; the math is shape-generic
H, O, N = 37, 23, 50
GRID_SIZE, THRES, SIGMA, EPS = 0.07, 0.12, 0.25, 1e-8


_STUBBED: list[str] = []


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec: importlib.util.find_spec raises ValueError on
        # an installed module whose __spec__ is None, which broke any later
        # transformers import (its optional-dep probe scans sys.modules)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        _STUBBED.append(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with their heavy deps stubbed out.

    Only import-time symbols are stubbed; every function under test runs the
    reference's real torch/numpy code.
    """
    try:
        import easydict  # noqa: F401
    except ImportError:
        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:  # pragma: no cover
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        _stub("easydict", EasyDict=EasyDict)
    for name in ("open3d", "trimesh"):
        try:
            importlib.import_module(name)
        except ImportError:
            _stub(name)
    try:
        import detectron2  # noqa: F401
    except ImportError:
        # bbox_xy_to_wh (postprocess.py:110-131) routes through
        # BoxMode.convert; a functional XYXY->XYWH stand-in keeps the
        # reference's own code on the real code path
        class BoxMode:
            XYXY_ABS, XYWH_ABS = 0, 1

            @staticmethod
            def convert(box, from_mode, to_mode):
                assert (from_mode, to_mode) == (0, 1)
                box = np.asarray(box, dtype=np.float64).copy()
                box[:, 2] -= box[:, 0]
                box[:, 3] -= box[:, 1]
                return box

        _stub("detectron2")
        _stub("detectron2.structures")
        _stub("detectron2.structures.boxes", BoxMode=BoxMode)
        _stub("detectron2.structures.masks", BitMasks=object)
    # constants.segmentation reads JSONs relative to the reference cwd; the
    # postprocess functions under test only need the name maps to exist
    _stub("constants")
    _stub(
        "constants.segmentation",
        COCO_CLASS_ID2NAME={0: "person"},
        COCO_CLASS_NAME2ID={"person": 0},
        LVIS_CLASS_ID2NAME={0: "person"},
        LVIS_CLASS_NAME2ID={"person": 0},
    )

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        mods = {
            name: importlib.import_module(f"utils.{name}")
            for name in (
                "transformations",
                "coma",
                "coma_occupancy",
                "evaluation",
                "postprocess",
            )
        }
    finally:
        sys.path.remove(REFERENCE_ROOT)
    yield types.SimpleNamespace(**mods)
    # drop the stubs (and the reference's own modules, which shadow real
    # top-level names like ``constants``/``utils``) so later tests in the
    # same process import the real packages
    for name in _STUBBED:
        sys.modules.pop(name, None)
    _STUBBED.clear()
    for name in list(sys.modules):
        if name == "utils" or name.startswith("utils."):
            sys.modules.pop(name)


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _sample_cloud(rng, n, scale=0.1):
    verts = (rng.normal(size=(n, 3)) * scale).astype(np.float32)
    normals = _unit(rng.normal(size=(n, 3))).astype(np.float32)
    return verts, normals


def _ref_coma(ref, *, sigma=SIGMA):
    return ref.coma.ComA(
        human_res=H,
        obj_res=O,
        normal_res=N,
        spatial_res=0,
        proximity_settings=dict(
            spatial_grid_size=GRID_SIZE, spatial_grid_thres=THRES
        ),
        normal_gaussian_sigma=sigma,
        eps=EPS,
        device="cpu",
    )


def _our_state():
    from coma_tpu.affordance.state import init_coma_state

    return init_coma_state(H, O, N, GRID_SIZE, THRES, SIGMA, eps=EPS)


def _aggregate_both(ref, rng, n_samples=3):
    """Aggregate the same random samples through both implementations."""
    import jax.numpy as jnp

    from coma_tpu.affordance.contact import contact_update_batch

    rc = _ref_coma(ref)
    hv = np.stack([_sample_cloud(rng, H)[0] for _ in range(n_samples)])
    hn = np.stack([_unit(rng.normal(size=(H, 3))).astype(np.float32) for _ in range(n_samples)])
    ov = np.stack([_sample_cloud(rng, O)[0] for _ in range(n_samples)])
    on = np.stack([_unit(rng.normal(size=(O, 3))).astype(np.float32) for _ in range(n_samples)])
    for i in range(n_samples):
        rc.register_sample_to_cache(
            human_verts=hv[i], human_normals=hn[i],
            obj_verts=ov[i], obj_normals=on[i],
        )
    rc.aggregate_all_samples()
    state = contact_update_batch(
        _our_state(), jnp.asarray(hv), jnp.asarray(hn),
        jnp.asarray(ov), jnp.asarray(on),
    )
    return rc, state


# ---------------------------------------------------------------- sphere


def test_sphere_grid_matches_reference(ref):
    from coma_tpu.affordance.sphere import fibonacci_sphere

    x, y, z = ref.coma.get_uniform_points_on_sphere(num_points=N)
    want = np.stack([x, y, z], axis=-1)
    np.testing.assert_allclose(fibonacci_sphere(N), want, atol=1e-6)


def test_geodesic_gaussian_matches_reference(ref, rng):
    import torch

    import jax.numpy as jnp

    from coma_tpu.affordance.sphere import fibonacci_sphere, geodesic_gaussian

    grid = fibonacci_sphere(N).astype(np.float32)
    canon = _unit(rng.normal(size=(H, O, 3))).astype(np.float32)
    want = ref.coma.geodesic_gaussian_scores(
        normal_grid=torch.tensor(grid),
        canon_normals=torch.tensor(canon),
        normal_gaussian_sigma=SIGMA,
        eps=EPS,
    ).numpy()
    got = geodesic_gaussian(jnp.asarray(grid), jnp.asarray(canon), SIGMA, EPS)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# -------------------------------------------------------- canonicalize


def test_canonicalize_matches_reference(ref, rng):
    import torch

    import jax.numpy as jnp

    from coma_tpu.affordance.canonicalize import canonicalize_pairwise

    a = _unit(rng.normal(size=(H, 3))).astype(np.float32)
    b = _unit(rng.normal(size=(O, 3))).astype(np.float32)
    # exercise BOTH singular branches: one b exactly antiparallel to p
    # (the 180° replacer, coma.py:143-145,168-169) and one within eps of it
    b[0] = [0.0, 0.0, -1.0]
    b[1] = _unit(np.array([[1e-6, 0.0, -1.0]], np.float32))[0]
    # ... and a near-miss that must take the regular branch
    b[2] = _unit(np.array([[1e-3, 0.0, -1.0]], np.float32))[0]
    p = np.array([0.0, 0.0, 1.0], np.float32)
    q = np.array([0.0, 1.0, 0.0], np.float32)

    want = ref.coma.canonicalize_a_wrt_b_to_p(
        a=torch.tensor(a), b=torch.tensor(b),
        p=torch.tensor(p), sub_p=torch.tensor(q), eps=EPS,
    ).numpy()
    got = np.asarray(canonicalize_pairwise(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(p), jnp.asarray(q), EPS
    ))
    # rows where b is within eps of the antipode take the exact replacer path
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
    # the unit-norm invariant the reference enforces by construction
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.ones((H, O)), atol=1e-5
    )


# --------------------------------------------------------- aggregation


def test_contact_aggregation_matches_reference(ref, rng):
    rc, state = _aggregate_both(ref, rng)
    np.testing.assert_allclose(
        np.asarray(state.prob_grid_canon_human_wrt_obj),
        rc.prob_grid_canon_human_wrt_obj.numpy(), rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(state.prob_grid_canon_obj_wrt_human),
        rc.prob_grid_canon_obj_wrt_human.numpy(), rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(state.contact_dist_expectation_grid_nom),
        rc.contact_dist_expectation_grid_nom.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.contact_dist_expectation_grid_denom),
        rc.contact_dist_expectation_grid_denom.numpy(), atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(state.significant_contact_count),
        rc.significant_contact_count.numpy().astype(np.float32),
    )
    assert float(state.used_count) == rc.used_count


def test_contact_map_matches_reference(ref, rng):
    from coma_tpu.affordance.contact import contact_map

    rc, state = _aggregate_both(ref, rng)
    want = rc.compute_contact_map(contact_map_type="both", as_numpy=True)
    got = contact_map(state, "both")
    np.testing.assert_allclose(
        np.asarray(got["human"]), want["human"], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["obj"]), want["obj"], rtol=2e-3, atol=1e-5
    )


def test_significant_aggregation_matches_reference(ref, rng):
    from coma_tpu.affordance.contact import aggregate_contact

    rc, state = _aggregate_both(ref, rng)
    cmap = rc.compute_contact_map(contact_map_type="both", as_numpy=False)
    for ratio in (0.0, 0.5, 1.1):  # 1.1: NO pair qualifies -> zeros branch
        want = rc.aggregate_contact_for_significant_pairs(
            contact_map_dict=cmap, contact_map_type="both",
            significant_contact_ratio=ratio, as_numpy=True,
        )
        got_h, ind_h = aggregate_contact(state, "human", ratio)
        got_o, ind_o = aggregate_contact(state, "obj", ratio)
        np.testing.assert_allclose(
            np.asarray(got_h), want["human"], rtol=2e-3, atol=1e-6,
            err_msg=f"human, ratio={ratio}",
        )
        np.testing.assert_allclose(
            np.asarray(got_o), want["obj"], rtol=2e-3, atol=1e-6,
            err_msg=f"obj, ratio={ratio}",
        )
        pairs = want["significant_contact_pairs"]
        np.testing.assert_array_equal(np.asarray(ind_h), pairs.any(axis=1))
        np.testing.assert_array_equal(np.asarray(ind_o), pairs.any(axis=0))


def test_nonphysical_entropy_matches_reference(ref, rng):
    from coma_tpu.affordance.contact import nonphysical_response

    rc, state = _aggregate_both(ref, rng)
    n_bin = 1000
    want_v1 = rc.compute_nonphysical_response_sphere(
        n_bin=n_bin, nonphysical_type="both", as_numpy=True
    )
    # NOTE: the reference's normalize_prob_grid_for_normals mutates the grid
    # in place; calling the v2 derivation afterwards re-normalizes an
    # already-normalized grid, which changes values only by O(eps). Our
    # functional version normalizes a fresh copy each call — same semantics.
    want_v2 = rc.compute_nonphysical_response_sphere_v2(
        n_bin=n_bin, nonphysical_type="both", as_numpy=True
    )
    # atol 1e-3: round(p*n_bin) is a step function — a probability landing
    # within float rounding of a bin boundary flips one bin between the
    # f32 and f64 paths, shifting a score by ~1/(N·log n_bin) ≈ 3e-4
    for which in ("human", "obj"):
        np.testing.assert_allclose(
            np.asarray(nonphysical_response(state, n_bin, which, v2=False)),
            want_v1[which], rtol=1e-3, atol=1e-3, err_msg=f"v1/{which}",
        )
        np.testing.assert_allclose(
            np.asarray(nonphysical_response(state, n_bin, which, v2=True)),
            want_v2[which], rtol=1e-3, atol=1e-3, err_msg=f"v2/{which}",
        )


# ----------------------------------------------------------- occupancy


def test_occupancy_matches_reference(ref, rng):
    import jax.numpy as jnp

    from coma_tpu.affordance.occupancy import (
        aggregated_occupancy,
        occupancy_update_batch,
    )
    from coma_tpu.affordance.state import init_occupancy_state

    RES, TOL = 12, 2.0
    ro = ref.coma_occupancy.ComA_Occupancy(
        scale_tolerance=TOL, human_res=H, obj_res=O, normal_res=0,
        spatial_res=RES, eps=EPS, device="cpu",
    )
    n_samples = 3
    hv = np.stack([
        (rng.normal(size=(H, 3)) * 0.4).astype(np.float32)
        for _ in range(n_samples)
    ])
    # the reference asserts the anchor vertex is IDENTICAL across samples
    # (coma_occupancy.py:277-284) — the object is canonical per asset
    ov = np.broadcast_to(
        (rng.normal(size=(O, 3)) * 0.4).astype(np.float32), (n_samples, O, 3)
    ).copy()
    on = np.broadcast_to(
        _unit(rng.normal(size=(O, 3))).astype(np.float32), (n_samples, O, 3)
    ).copy()
    for i in range(n_samples):
        ro.register_sample_to_cache(
            human_verts=hv[i], human_normals=None,
            obj_verts=ov[i], obj_normals=on[i],
        )
    ro.aggregate_all_samples()

    state = init_occupancy_state(H, O, spatial_res=RES, scale_tolerance=TOL)
    state = occupancy_update_batch(state, jnp.asarray(hv), jnp.asarray(ov))

    np.testing.assert_allclose(
        np.asarray(state.spatial_grid),
        ro.spatial_grid.numpy(), atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(state.spatial_occupancy_grids),
        ro.spatial_occupancy_grids.numpy(),
    )
    want = ro.return_aggregated_spatial_grids().numpy()
    got = np.asarray(aggregated_occupancy(state))
    # reference divides 0-hit rows by 0 -> NaN rows; we define them as 0.
    # After the max over H they only differ if EVERY row is 0-hit somewhere,
    # which the sample scale prevents — but guard with nan-aware compare.
    np.testing.assert_allclose(got, np.nan_to_num(want), rtol=1e-5, atol=1e-7)


# ----------------------------------------------------------- evaluation


def test_quant_metrics_match_reference(ref, rng):
    from coma_tpu.affordance.evaluation import mean_absolute_error, similarity

    src = rng.uniform(0, 1, size=257).astype(np.float64)
    tgt = rng.uniform(0, 1, size=257).astype(np.float64)
    np.testing.assert_allclose(
        float(mean_absolute_error(src, tgt)),
        ref.evaluation.mean_absolute_error(src, tgt), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(similarity(src, tgt)),
        ref.evaluation.simlarity_metric(src, tgt), rtol=1e-6,
    )


# ---------------------------------------------------------- postprocess


def test_segmentation_overlap_metrics_match_reference(ref, rng):
    from coma_tpu.pipelines.postprocess import (
        intersection_over_chosen,
        intersection_over_maximum,
        intersection_over_union,
    )

    s1 = rng.uniform(size=(31, 29)) > 0.5
    s2 = rng.uniform(size=(31, 29)) > 0.4
    assert intersection_over_union(s1, s2) == pytest.approx(
        ref.postprocess.intersection_over_union(s1, s2))
    assert intersection_over_maximum(s1, s2) == pytest.approx(
        ref.postprocess.intersection_over_maximum(s1, s2))
    for key in ("seg1", "seg2"):
        assert intersection_over_chosen(s1, s2, key=key) == pytest.approx(
            ref.postprocess.intersection_over_chosen_seg(s1, s2, key=key))


def test_local_to_global_cam_matches_reference(ref, rng):
    from coma_tpu.pipelines.postprocess import local_to_global_cam

    n = 5
    xy = rng.uniform(10, 200, size=(n, 2))
    wh = rng.uniform(20, 150, size=(n, 2))
    bboxes = np.concatenate([xy, xy + wh], axis=-1)
    cams = np.stack([
        rng.uniform(0.5, 2.0, size=n),
        rng.uniform(-0.3, 0.3, size=n),
        rng.uniform(-0.3, 0.3, size=n),
    ], axis=-1)
    np.testing.assert_allclose(
        local_to_global_cam(bboxes, cams, 512),
        ref.postprocess.local_to_global_cam(bboxes, cams, 512),
        rtol=1e-6,
    )


# ------------------------------------------------------ transformations


def test_rodrigues_matches_reference(ref, rng):
    import torch

    import jax.numpy as jnp

    from coma_tpu.geometry.transforms import rodrigues

    theta = rng.normal(size=(64, 3)).astype(np.float32)
    want = ref.transformations.batch_rodrigues(torch.tensor(theta)).numpy()
    got = np.asarray(rodrigues(jnp.asarray(theta)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_quat_to_rotmat_matches_reference(ref, rng):
    import torch

    import jax.numpy as jnp

    from coma_tpu.geometry.transforms import quat_to_rotmat

    quat = rng.normal(size=(64, 4)).astype(np.float32)
    want = ref.transformations.quat_to_rotmat(torch.tensor(quat)).numpy()
    got = np.asarray(quat_to_rotmat(jnp.asarray(quat)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------- published pickle schema (r5)
#
# VERDICT r4 item 7: exercise RefCompatUnpickler against BYTE-FAITHFUL
# pickles of the FULL published schema — produced by the reference's OWN
# ``export()`` (``utils/coma.py:582-597``, ``utils/coma_occupancy.py:
# 315-330``), i.e. every ``vars()`` key with torch dtypes routed through
# ``to_np_torch_recursive`` (``utils/misc.py:14-63``) — the closest
# available proxy for the Google-Drive pickles until real bytes exist.

# vars(ComA) minus cache/used (utils/coma.py:195-251,586-588)
REF_CONTACT_EXPORT_KEYS = {
    "device", "human_res", "obj_res", "normal_res", "spatial_res",
    "canon_normal_grid", "prob_grid_canon_human_wrt_obj",
    "prob_grid_canon_obj_wrt_human", "contact_dist_expectation_grid_nom",
    "contact_dist_expectation_grid_denom", "significant_contact_count",
    "proximity_settings", "contact_dist_func", "cross_contact_scores_nom",
    "cross_contact_scores_denom", "cache_count", "used_count",
    "principle_vec", "sub_principle_vec", "rel_dist_method",
    "normal_gaussian_sigma", "eps",
}

# vars(ComA_Occupancy) minus cache/used (utils/coma_occupancy.py:206-250)
REF_OCCUPANCY_EXPORT_KEYS = {
    "device", "human_res", "obj_res", "normal_res", "spatial_res",
    "spatial_grid", "spatial_indexgrid", "spatial_grid_metadata",
    "N_x", "N_y", "N_z", "spatial_occupancy_grids", "cache_count",
    "used_count", "principle_vec", "sub_principle_vec", "rel_dist_method",
    "rel_dist_thres", "normal_gaussian_sigma", "eps",
    "debug_obj_vert", "debug_obj_normal",
}


def test_reference_contact_export_full_schema(ref, rng, tmp_path):
    """The reference's own export() bytes: exact key set, to_np dtype
    discipline (all float arrays f32, int arrays i64, no torch objects
    except the negative_exp partial), and our loader reproducing the
    reference accumulators from those bytes."""
    import pickle as _pickle

    from coma_tpu.affordance.io import load_coma_state

    rc, state = _aggregate_both(ref, rng)
    pth = tmp_path / "ref_contact.pickle"
    rc.export(save_pth=str(pth))

    # plain unpickle works HERE because the fixture holds utils.coma in
    # sys.modules; the stubbed/torch-free path is covered below
    with open(pth, "rb") as fh:
        raw = _pickle.load(fh)
    assert set(raw.keys()) == REF_CONTACT_EXPORT_KEYS
    for k, v in raw.items():
        if isinstance(v, np.ndarray):
            assert v.dtype in (np.float32, np.int64), (k, v.dtype)
    # canon_normal_grid was torch.float64 in-memory; export coerces to f32
    assert raw["canon_normal_grid"].dtype == np.float32
    import functools

    assert isinstance(raw["contact_dist_func"], functools.partial)

    loaded = load_coma_state(str(pth))
    np.testing.assert_allclose(
        np.asarray(loaded.prob_grid_canon_human_wrt_obj),
        rc.prob_grid_canon_human_wrt_obj.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.prob_grid_canon_obj_wrt_human),
        rc.prob_grid_canon_obj_wrt_human.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(loaded.significant_contact_count),
        rc.significant_contact_count.numpy())
    np.testing.assert_allclose(
        np.asarray(loaded.contact_dist_expectation_grid_nom),
        rc.contact_dist_expectation_grid_nom.numpy(), rtol=1e-5, atol=1e-6)
    assert float(loaded.used_count) == float(rc.used_count)
    assert loaded.spatial_grid_size == rc.proximity_settings["spatial_grid_size"]
    assert loaded.spatial_grid_thres == rc.proximity_settings["spatial_grid_thres"]


def test_reference_occupancy_export_full_schema(ref, rng, tmp_path):
    import pickle as _pickle

    from coma_tpu.affordance.io import load_occupancy_state

    RES, TOL = 12, 2.0
    ro = ref.coma_occupancy.ComA_Occupancy(
        scale_tolerance=TOL, human_res=H, obj_res=O, normal_res=0,
        spatial_res=RES, eps=EPS, device="cpu",
    )
    hv = (rng.normal(size=(2, H, 3)) * 0.4).astype(np.float32)
    ov = np.broadcast_to(
        (rng.normal(size=(O, 3)) * 0.4).astype(np.float32), (2, O, 3)).copy()
    on = np.broadcast_to(
        _unit(rng.normal(size=(O, 3))).astype(np.float32), (2, O, 3)).copy()
    for i in range(2):
        ro.register_sample_to_cache(
            human_verts=hv[i], human_normals=None,
            obj_verts=ov[i], obj_normals=on[i])
    ro.aggregate_all_samples()
    pth = tmp_path / "ref_occupancy.pickle"
    ro.export(save_pth=str(pth))

    with open(pth, "rb") as fh:
        raw = _pickle.load(fh)
    assert set(raw.keys()) == REF_OCCUPANCY_EXPORT_KEYS
    for k, v in raw.items():
        if isinstance(v, np.ndarray):
            assert v.dtype in (np.float32, np.int64), (k, v.dtype)

    loaded = load_occupancy_state(str(pth))
    np.testing.assert_array_equal(
        np.asarray(loaded.spatial_occupancy_grids),
        ro.spatial_occupancy_grids.numpy())
    np.testing.assert_allclose(
        float(loaded.rel_dist_thres), float(ro.rel_dist_thres), rtol=1e-6)
    assert float(loaded.used_count) == float(ro.used_count)


def test_reference_export_loads_torch_free(ref, rng, tmp_path):
    """The reference-exported bytes load and derive products in a process
    where importing torch is BLOCKED and the reference package is absent —
    the partial resolves to a stub, the arrays are plain numpy, and the
    derived contact map matches the in-process value."""
    import subprocess

    rc, state = _aggregate_both(ref, rng, n_samples=2)
    pth = tmp_path / "ref_contact.pickle"
    rc.export(save_pth=str(pth))
    want = rc.prob_grid_canon_human_wrt_obj.numpy()
    np.save(tmp_path / "want.npy", want)

    script = f"""
import sys
class _Block:
    def find_spec(self, name, path=None, target=None):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked for this test")
        return None
sys.meta_path.insert(0, _Block())
import warnings
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from coma_tpu.affordance.io import RefPickleStubWarning, load_coma_state
from coma_tpu.affordance.contact import aggregate_contact
with warnings.catch_warnings(record=True) as w:
    warnings.simplefilter("always")
    st = load_coma_state({str(pth)!r})
assert any(issubclass(x.category, RefPickleStubWarning) for x in w), "stub path not hit"
np.testing.assert_allclose(
    np.asarray(st.prob_grid_canon_human_wrt_obj),
    np.load({str(tmp_path / 'want.npy')!r}), rtol=1e-5, atol=1e-6)
_, cm = aggregate_contact(st, "human", 0.1)
assert np.isfinite(np.asarray(cm)).all()
assert "torch" not in sys.modules
print("TORCH_FREE_OK")
"""
    env = dict(os.environ)
    # repo root only: the reference must NOT be importable in the child
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "TORCH_FREE_OK" in r.stdout


# --------------------------------------------------------------------------
# src/generation/initialize_depth.py — directional size, nearest point, and
# the (dead upstream) filter_out candidate window, run as the REAL reference
# code with only its Blender/CUDA imports stubbed.
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_init():
    """File-import ``src/generation/initialize_depth.py``. The functions
    under test are pure numpy; ``compute_collision`` (CUDA BVH — and its
    ``BVH`` symbol is never even imported upstream, NameError if reached) is
    monkeypatched per-test."""
    _stub("blenderproc")
    _stub("bpy")
    _stub("bpy.app")
    _stub("bpy.app.handlers", persistent=lambda f: f)
    _stub("mathutils", Matrix=object)
    for name in ("open3d", "trimesh"):
        try:
            importlib.import_module(name)
        except ImportError:
            _stub(name)
    _stub("trimesh.boolean", intersection=None)
    _stub("constants")
    _stub("constants.generation")
    _stub("constants.generation.assets",
          CATEGORY2DATASET_TYPE={}, DATASET_PTHS={}, CATEGORY2ASSET={})
    _stub("constants.generation.visualizers",
          COMPATIBILITY_MATRIX_TRIMESH_P3D_TO_BLENDER=np.array(
              [[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]]),
          COMPATIBILITY_MATRIX_OPENGL_TO_BLENDER=np.array(
              [[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]]))
    _stub("constants.metadata", DEFAULT_SEED=42)

    spec = importlib.util.spec_from_file_location(
        "ref_initialize_depth",
        os.path.join(REFERENCE_ROOT, "src", "generation", "initialize_depth.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE_ROOT)
    yield mod
    for name in _STUBBED:
        sys.modules.pop(name, None)
    _STUBBED.clear()
    for name in list(sys.modules):
        if name == "utils" or name.startswith("utils."):
            sys.modules.pop(name)


def test_directional_size_and_nearest_point_match_reference(ref_init):
    from coma_tpu.lifting.depth_init import (
        compute_directional_size, compute_nearest_point)
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    for _ in range(5):
        verts = rng.normal(size=(40, 3))
        direction = rng.normal(size=3)
        point = rng.normal(size=3)
        want_size = ref_init.compute_directional_size(verts, direction / np.linalg.norm(direction))
        got_size = float(compute_directional_size(
            jnp.asarray(verts, jnp.float32), jnp.asarray(direction, jnp.float32)))
        assert abs(got_size - want_size) < 1e-4
        want_near, want_dist = ref_init.compute_nearest_point(
            verts, point, direction.copy())
        got_near, got_dist = compute_nearest_point(
            jnp.asarray(verts, jnp.float32), jnp.asarray(point, jnp.float32),
            jnp.asarray(direction, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(got_near), want_near.reshape(3), rtol=1e-4, atol=1e-5)
        assert abs(float(got_dist) - want_dist) < 1e-4


@pytest.mark.parametrize("kernel_size", [5, 9])
def test_filter_out_window_matches_reference_extract_candidates(
        ref_init, monkeypatch, kernel_size):
    """Drive the reference's real ``extract_candidates(filter_out=True)``
    with deterministic fake collision counts; our
    ``filter_candidate_indices`` must keep the same candidates — the
    reference's kept verts use ``displacements[center - kernel//2]`` (its
    sliced-index quirk, extract_candidates:119,125), which the mapping below
    reproduces explicitly."""
    from coma_tpu.ops.collision import filter_candidate_indices

    rng = np.random.default_rng(kernel_size)
    D = 2 * kernel_size + 3
    human_verts = rng.normal(size=(12, 3))
    human_faces = np.arange(12, dtype=np.int64).reshape(4, 3)
    asset_verts = rng.normal(size=(9, 3))
    asset_faces = np.arange(9, dtype=np.int64).reshape(3, 3)
    displacements = np.linspace(0.0, 2.0, D)
    direction = np.array([0.3, -1.2, 0.4])

    for trial in range(10):
        curve = rng.integers(0, 4, size=D).astype(float)
        curve[rng.integers(0, D, size=3)] = 0.0
        calls = {"n": 0}

        def fake_compute_collision(verts, faces, max_collisions, _c=calls,
                                   _curve=curve):
            i = _c["n"]
            _c["n"] += 1
            if i < 2:            # the two standalone default_collision calls
                return 0.0
            return float(_curve[i - 2])

        monkeypatch.setattr(ref_init, "compute_collision",
                            fake_compute_collision)
        cands = ref_init.extract_candidates(
            human_verts, human_faces, asset_verts, asset_faces,
            displacements=list(displacements), direction=direction.copy(),
            kernel_size=kernel_size, max_collisions=1000, filter_out=True)
        kept = filter_candidate_indices(curve, kernel_size)
        assert len(cands) == len(kept)
        half = kernel_size // 2
        dirn = direction.reshape(1, 3)
        for cand, c in zip(cands, kept):
            np.testing.assert_allclose(
                cand["verts"],
                human_verts + displacements[c - half] * dirn)
