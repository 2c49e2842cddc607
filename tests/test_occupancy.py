"""Oracle + property tests for occupancy voxel aggregation."""
import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.affordance.occupancy import (
    aggregated_occupancy,
    merge_occupancy_states,
    normalized_occupancy,
    occupancy_product,
    occupancy_update,
    occupancy_update_batch,
)
from coma_tpu.affordance.state import init_occupancy_state, make_voxel_grid
from tests.oracles import occupancy_update_oracle

H, O, R = 7, 4, 8
TOL = 3.0  # scale_tolerance


def make_sample(rng):
    hv = rng.normal(size=(H, 3)) * 0.6
    ov = rng.normal(size=(O, 3)) * 0.2
    return hv, ov


def test_voxel_grid_centers():
    grid, meta = make_voxel_grid(gridsize=2.4, resolution=R)
    assert grid.shape == (3, R, R, R)
    vs = 2.4 / R
    # first cell center = start + vs/2; start = -1.2
    np.testing.assert_allclose(grid[:, 0, 0, 0], [-1.2 + vs / 2] * 3, atol=1e-6)
    np.testing.assert_allclose(grid[:, -1, -1, -1], [1.2 - vs / 2] * 3, atol=1e-5)
    assert abs(meta["voxel_size"] - vs) < 1e-12


def test_single_update_matches_oracle(rng):
    state = init_occupancy_state(H, O, R, TOL)
    hv, ov = make_sample(rng)
    state = occupancy_update(state, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    grid, _ = make_voxel_grid(2.4, R)
    want = occupancy_update_oracle(grid.astype(np.float64), hv, ov[0], (2.4 / R) * TOL)
    np.testing.assert_allclose(np.asarray(state.spatial_occupancy_grids), want, atol=1e-5)
    assert float(state.used_count) == 1.0
    np.testing.assert_allclose(np.asarray(state.anchor_vert), ov[0], rtol=1e-6)


def test_batch_equals_sequential(rng):
    sa = init_occupancy_state(H, O, R, TOL)
    sb = init_occupancy_state(H, O, R, TOL)
    samples = [make_sample(rng) for _ in range(3)]
    for hv, ov in samples:
        sa = occupancy_update(sa, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    hvs = jnp.array(np.stack([s[0] for s in samples]), dtype=jnp.float32)
    ovs = jnp.array(np.stack([s[1] for s in samples]), dtype=jnp.float32)
    sb = jax.jit(occupancy_update_batch)(sb, hvs, ovs)
    np.testing.assert_allclose(np.asarray(sa.spatial_occupancy_grids),
                               np.asarray(sb.spatial_occupancy_grids), atol=1e-5)
    assert float(sb.used_count) == 3.0


def test_merge_equals_joint(rng):
    joint = init_occupancy_state(H, O, R, TOL)
    a = init_occupancy_state(H, O, R, TOL)
    b = init_occupancy_state(H, O, R, TOL)
    samples = [make_sample(rng) for _ in range(4)]
    for hv, ov in samples:
        joint = occupancy_update(joint, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    for hv, ov in samples[:2]:
        a = occupancy_update(a, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    for hv, ov in samples[2:]:
        b = occupancy_update(b, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    merged = merge_occupancy_states(a, b)
    np.testing.assert_allclose(np.asarray(merged.spatial_occupancy_grids),
                               np.asarray(joint.spatial_occupancy_grids), atol=1e-6)
    assert float(merged.used_count) == 4.0


def test_normalization_and_aggregation(rng):
    state = init_occupancy_state(H, O, R, TOL)
    for _ in range(3):
        hv, ov = make_sample(rng)
        state = occupancy_update(state, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    norm = np.asarray(normalized_occupancy(state))
    sums = norm.reshape(H, -1).sum(-1)
    hits = np.asarray(state.spatial_occupancy_grids).reshape(H, -1).sum(-1)
    # vertices with any hits normalize to 1; all-zero vertices stay 0
    np.testing.assert_allclose(sums[hits > 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(sums[hits == 0], 0.0)
    agg = np.asarray(aggregated_occupancy(state))
    np.testing.assert_allclose(agg, norm.max(axis=0), atol=1e-7)


def test_product_scaling(rng):
    state = init_occupancy_state(H, O, R, TOL)
    hv, ov = make_sample(rng)
    state = occupancy_update(state, jnp.array(hv, dtype=jnp.float32), jnp.array(ov, dtype=jnp.float32))
    prod = np.asarray(occupancy_product(state))
    assert abs(prod.max() - 0.7) < 1e-6
    assert prod.min() >= 0.0
