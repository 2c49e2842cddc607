"""Oracle + property tests for ComA contact aggregation and derivations."""
import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.affordance.contact import (
    aggregate_contact,
    contact_map,
    contact_update,
    contact_update_batch,
    merge_states,
    nonphysical_response,
    significant_contact_pairs,
)
from coma_tpu.affordance.state import init_coma_state
from tests.oracles import contact_update_oracle

H, O, N = 6, 5, 32
CFG = dict(
    human_res=H, obj_res=O, normal_res=N,
    spatial_grid_size=0.06, spatial_grid_thres=0.24,
    normal_gaussian_sigma=0.2, eps=1e-10,
)


def make_sample(rng, scale=1.0):
    hv = rng.normal(size=(H, 3)) * scale
    ov = rng.normal(size=(O, 3)) * scale
    hn = rng.normal(size=(H, 3))
    hn /= np.linalg.norm(hn, axis=-1, keepdims=True)
    on = rng.normal(size=(O, 3))
    on /= np.linalg.norm(on, axis=-1, keepdims=True)
    # keep object normals away from -p so the oracle's regular branch applies
    on = np.where(on[:, 2:3] < -0.9, -on, on)
    hn = np.where(hn[:, 2:3] < -0.9, -hn, hn)
    return hv, hn, ov, on


def fresh_acc(state):
    grid = np.asarray(state.canon_normal_grid, dtype=np.float64)
    return dict(
        ph=np.zeros((H, O, N)), po=np.zeros((H, O, N)),
        nom=np.zeros((H, O)), denom=np.zeros((H, O)),
        sig=np.zeros((H, O)), count=0,
    ), grid


def test_single_update_matches_oracle(rng):
    state = init_coma_state(**CFG)
    acc, grid = fresh_acc(state)
    hv, hn, ov, on = make_sample(rng, scale=0.3)
    state = contact_update(state, jnp.array(hv, dtype=jnp.float32), jnp.array(hn, dtype=jnp.float32),
                           jnp.array(ov, dtype=jnp.float32), jnp.array(on, dtype=jnp.float32))
    acc = contact_update_oracle(acc, hv, hn, ov, on, [0, 0, 1], [0, 1, 0], grid,
                                0.2, 0.06, 0.24, 1e-10)
    np.testing.assert_allclose(np.asarray(state.prob_grid_canon_human_wrt_obj), acc["ph"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.prob_grid_canon_obj_wrt_human), acc["po"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.contact_dist_expectation_grid_nom), acc["nom"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.significant_contact_count), acc["sig"])
    assert float(state.used_count) == 1.0


def test_batch_scan_equals_sequential(rng):
    state_a = init_coma_state(**CFG)
    state_b = init_coma_state(**CFG)
    B = 4
    samples = [make_sample(rng, scale=0.5) for _ in range(B)]
    for hv, hn, ov, on in samples:
        state_a = contact_update(state_a, jnp.array(hv, dtype=jnp.float32), jnp.array(hn, dtype=jnp.float32),
                                 jnp.array(ov, dtype=jnp.float32), jnp.array(on, dtype=jnp.float32))
    stack = lambda idx: jnp.array(np.stack([s[idx] for s in samples]), dtype=jnp.float32)
    state_b = jax.jit(contact_update_batch)(state_b, stack(0), stack(1), stack(2), stack(3))
    for f in ("prob_grid_canon_human_wrt_obj", "prob_grid_canon_obj_wrt_human",
              "contact_dist_expectation_grid_nom", "significant_contact_count"):
        np.testing.assert_allclose(np.asarray(getattr(state_a, f)), np.asarray(getattr(state_b, f)), rtol=1e-5, atol=1e-6)
    assert float(state_b.used_count) == B


def test_padding_mask_ignores_invalid(rng):
    state_a = init_coma_state(**CFG)
    state_b = init_coma_state(**CFG)
    s0, s1 = make_sample(rng), make_sample(rng)
    stack = lambda idx: jnp.array(np.stack([s0[idx], s1[idx]]), dtype=jnp.float32)
    state_a = contact_update_batch(state_a, stack(0), stack(1), stack(2), stack(3),
                                   valid=jnp.array([1.0, 0.0]))
    state_b = contact_update(state_b, *[jnp.array(x, dtype=jnp.float32) for x in s0])
    np.testing.assert_allclose(np.asarray(state_a.prob_grid_canon_human_wrt_obj),
                               np.asarray(state_b.prob_grid_canon_human_wrt_obj),
                               rtol=1e-4, atol=1e-6)
    assert float(state_a.used_count) == 1.0


def test_merge_states_equals_joint_aggregation(rng):
    joint = init_coma_state(**CFG)
    sh_a = init_coma_state(**CFG)
    sh_b = init_coma_state(**CFG)
    samples = [make_sample(rng) for _ in range(4)]
    for s in samples:
        joint = contact_update(joint, *[jnp.array(x, dtype=jnp.float32) for x in s])
    for s in samples[:2]:
        sh_a = contact_update(sh_a, *[jnp.array(x, dtype=jnp.float32) for x in s])
    for s in samples[2:]:
        sh_b = contact_update(sh_b, *[jnp.array(x, dtype=jnp.float32) for x in s])
    merged = merge_states(sh_a, sh_b)
    for f in ("prob_grid_canon_human_wrt_obj", "significant_contact_count",
              "contact_dist_expectation_grid_nom", "contact_dist_expectation_grid_denom"):
        np.testing.assert_allclose(np.asarray(getattr(merged, f)), np.asarray(getattr(joint, f)), rtol=1e-5, atol=1e-6)
    assert float(merged.used_count) == float(joint.used_count)


def test_contact_map_formula(rng):
    state = init_coma_state(**CFG)
    for _ in range(3):
        state = contact_update(state, *[jnp.array(x, dtype=jnp.float32) for x in make_sample(rng, 0.2)])
    cmap = contact_map(state, "both")
    ph = np.asarray(state.prob_grid_canon_human_wrt_obj, dtype=np.float64)
    ph /= ph.sum(-1, keepdims=True) + 1e-10
    grid = np.asarray(state.canon_normal_grid, dtype=np.float64)
    anti = (1.0 - grid @ np.array([0, 0, 1.0])) / 2.0
    prox = np.asarray(state.contact_dist_expectation_grid_nom, dtype=np.float64) / np.asarray(
        state.contact_dist_expectation_grid_denom, dtype=np.float64)
    want = (ph * anti[None, None]).sum(-1) * prox
    np.testing.assert_allclose(np.asarray(cmap["human"]), want, rtol=1e-4)
    assert cmap["obj"].shape == (H, O)


def test_significant_pairs_threshold(rng):
    state = init_coma_state(**CFG)
    # two samples: same geometry, so each close pair is counted twice
    hv = np.zeros((H, 3)); hv[:, 0] = np.linspace(0, 1.0, H)
    ov = np.zeros((O, 3)); ov[:, 0] = np.linspace(0, 1.0, O)
    hn = np.tile([0, 0, 1.0], (H, 1)); on = np.tile([0, 1.0, 0], (O, 1))
    args = [jnp.array(x, dtype=jnp.float32) for x in (hv, hn, ov, on)]
    state = contact_update(state, *args)
    state = contact_update(state, *args)
    pairs = np.asarray(significant_contact_pairs(state, 1.0))  # need count >= 2
    d = np.linalg.norm(hv[:, None] - ov[None, :], axis=-1)
    np.testing.assert_array_equal(pairs, d < 0.24)


def test_aggregate_contact_zero_when_no_significant(rng):
    state = init_coma_state(**CFG)
    hv, hn, ov, on = make_sample(rng)
    # push objects far away: no significant contact anywhere
    state = contact_update(state, jnp.array(hv, dtype=jnp.float32), jnp.array(hn, dtype=jnp.float32),
                           jnp.array(ov + 100.0, dtype=jnp.float32), jnp.array(on, dtype=jnp.float32))
    agg, indicator = aggregate_contact(state, "human", significant_contact_ratio=0.5)
    np.testing.assert_array_equal(np.asarray(agg), np.zeros(H))
    assert not np.asarray(indicator).any()


def test_aggregate_contact_max_semantics(rng):
    state = init_coma_state(**CFG)
    for _ in range(2):
        state = contact_update(state, *[jnp.array(x, dtype=jnp.float32) for x in make_sample(rng, 0.2)])
    agg, indicator = aggregate_contact(state, "human", significant_contact_ratio=0.0)
    # ratio 0 -> every pair significant -> plain max over objects
    cmap = np.asarray(contact_map(state, "human")["human"])
    np.testing.assert_allclose(np.asarray(agg), cmap.max(-1), rtol=1e-6)
    assert np.asarray(indicator).all()
    # object-side
    agg_o, _ = aggregate_contact(state, "obj", significant_contact_ratio=0.0)
    cmap_o = np.asarray(contact_map(state, "obj")["obj"])
    np.testing.assert_allclose(np.asarray(agg_o), cmap_o.max(0), rtol=1e-6)


def test_nonphysical_entropy_bounds(rng):
    state = init_coma_state(**CFG)
    for _ in range(3):
        state = contact_update(state, *[jnp.array(x, dtype=jnp.float32) for x in make_sample(rng, 0.2)])
    score = np.asarray(nonphysical_response(state, n_bin=1e6, which="human"))
    assert score.shape == (H, O)
    assert (score >= -1e-5).all() and (score <= 1.0 + 1e-5).all()
    # a delta distribution has entropy 0 -> score 1; uniform -> score ~0
    import dataclasses
    delta = np.zeros((H, O, N), dtype=np.float32); delta[..., 0] = 1.0
    st = dataclasses.replace(state, prob_grid_canon_human_wrt_obj=jnp.array(delta))
    np.testing.assert_allclose(np.asarray(nonphysical_response(st, 1e6, "human")), 1.0, atol=1e-4)
    uniform = np.full((H, O, N), 1.0 / N, dtype=np.float32)
    st = dataclasses.replace(state, prob_grid_canon_human_wrt_obj=jnp.array(uniform))
    got = np.asarray(nonphysical_response(st, 1e6, "human"))
    want = 1.0 + N * (1 / N) * np.log(1 / N) / np.log(1e6)  # = 1 - log N / log 1e6
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_update_jits_and_is_deterministic(rng):
    state = init_coma_state(**CFG)
    s = [jnp.array(x, dtype=jnp.float32) for x in make_sample(rng)]
    f = jax.jit(contact_update)
    a = f(state, *s)
    b = f(state, *s)
    np.testing.assert_array_equal(np.asarray(a.prob_grid_canon_human_wrt_obj),
                                  np.asarray(b.prob_grid_canon_human_wrt_obj))
