"""Golden regression fixtures: the derived affordance products for a fixed
synthetic aggregation are frozen in tests/golden/ (generated 2026-08-16).

The reference's de-facto integration test is re-deriving products from its
released pre-trained pickles (SURVEY.md §4.3); these fixtures play that role
hermetically — any change to the ComA math that shifts a product beyond f32
reduction noise (rtol 2e-5: a few ulps through the exp/arccos chains, which
legitimately move with XLA version/opt-level) fails here and must be an intentional, documented change
(then regenerate with the snippet in the git history of this file).
"""
import os

import numpy as np
import jax.numpy as jnp

from coma_tpu.affordance.contact import (
    aggregate_contact,
    contact_map,
    contact_update_batch,
    orientational_tendency,
)
from coma_tpu.affordance.io import load_coma_state
from coma_tpu.affordance.occupancy import occupancy_product, occupancy_update_batch
from coma_tpu.affordance.state import init_coma_state, init_occupancy_state

HERE = os.path.dirname(__file__)
GOLDEN = np.load(os.path.join(HERE, "golden", "products.npz"))


def test_golden_aggregation_reproduces():
    """Re-aggregating the stored inputs reproduces the stored pickle."""
    hv = jnp.asarray(GOLDEN["inputs_hv"])
    hn = jnp.asarray(GOLDEN["inputs_hn"])
    ov = jnp.asarray(GOLDEN["inputs_ov"])
    on = jnp.asarray(GOLDEN["inputs_on"])
    state = contact_update_batch(
        init_coma_state(24, 10, 32, 0.07, 0.5, 0.25), hv, hn, ov, on
    )
    stored = load_coma_state(os.path.join(HERE, "golden", "coma_small.pickle"))
    np.testing.assert_allclose(
        np.asarray(state.prob_grid_canon_human_wrt_obj),
        np.asarray(stored.prob_grid_canon_human_wrt_obj),
        rtol=2e-5, atol=1e-6,
    )


def test_golden_products():
    state = load_coma_state(os.path.join(HERE, "golden", "coma_small.pickle"))
    ah, _ = aggregate_contact(state, "human", 0.0)
    ao, _ = aggregate_contact(state, "obj", 0.0)
    np.testing.assert_allclose(np.asarray(ah), GOLDEN["aggr_human"], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ao), GOLDEN["aggr_object"], rtol=2e-5, atol=1e-6)
    cm = contact_map(state, which="human")
    np.testing.assert_allclose(
        np.asarray(cm["human"]), GOLDEN["contact_map_human"], rtol=2e-5, atol=1e-6
    )
    ot = orientational_tendency(state, obj_index=0)
    np.testing.assert_allclose(
        np.asarray(ot), GOLDEN["orientational_tendency"], rtol=2e-5, atol=1e-6
    )


def test_golden_occupancy_product():
    occ = occupancy_update_batch(
        init_occupancy_state(24, 10, 8, 3.0),
        jnp.asarray(GOLDEN["inputs_hv"]),
        jnp.asarray(GOLDEN["inputs_ov"]),
    )
    np.testing.assert_allclose(
        np.asarray(occupancy_product(occ)), GOLDEN["occupancy_product"], rtol=2e-5, atol=1e-6
    )
