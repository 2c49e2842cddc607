"""Parity tests for the fused Pallas occupancy kernel (interpreter on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from coma_tpu.affordance.occupancy import occupancy_update_batch
from coma_tpu.affordance.state import init_occupancy_state
from coma_tpu.ops.occupancy_kernel import fused_occupancy_update_batch

H, O, R = 40, 12, 6


def make_batch(rng, B):
    hv = jnp.asarray(rng.normal(size=(B, H, 3)) * 0.6, jnp.float32)
    ov = jnp.asarray(rng.normal(size=(B, O, 3)) * 0.6, jnp.float32)
    return hv, ov


@pytest.mark.parametrize("B", [8, 11])  # 11: exercises slab padding
def test_fused_occupancy_matches_reference_path(rng, B):
    hv, ov = make_batch(rng, B)
    state = init_occupancy_state(H, O, R, scale_tolerance=3.0)
    ref = occupancy_update_batch(state, hv, ov)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_occupancy_update_batch(state, hv, ov)
    np.testing.assert_array_equal(
        np.asarray(ref.spatial_occupancy_grids),
        np.asarray(fused.spatial_occupancy_grids),
    )
    assert float(fused.used_count) == B
    np.testing.assert_allclose(
        np.asarray(ref.anchor_vert), np.asarray(fused.anchor_vert)
    )


def test_fused_occupancy_respects_valid_mask(rng):
    hv, ov = make_batch(rng, 9)
    valid = jnp.asarray([1, 1, 0, 1, 1, 1, 0, 1, 1], jnp.float32)
    state = init_occupancy_state(H, O, R, scale_tolerance=3.0)
    ref = occupancy_update_batch(state, hv, ov, valid=valid)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_occupancy_update_batch(state, hv, ov, valid=valid)
    np.testing.assert_array_equal(
        np.asarray(ref.spatial_occupancy_grids),
        np.asarray(fused.spatial_occupancy_grids),
    )
    assert float(fused.used_count) == 7.0
    # anchor = the LAST valid sample's (reference overwrites per sample)
    np.testing.assert_allclose(np.asarray(fused.anchor_vert),
                               np.asarray(ov[8, 0]))
