"""Parity tests for the fused Pallas splat kernel (interpreter mode on CPU).

On real TPU hardware the kernel compiles via Mosaic; CI runs it through the
Pallas interpreter, which executes the same kernel logic.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from coma_tpu.affordance.contact import contact_update_batch
from coma_tpu.affordance.state import init_coma_state
from coma_tpu.ops.contact_kernel import acos_f32, fused_contact_update_batch

# fast-lane dims: every kernel code path (slab padding, valid masking,
# poly-vs-exact arccos) is shape-independent, and the interpreter's cost
# scales with H*O*N — the production-scale parity run (48, 20, 40) lives
# in the slow lane below
H, O, N = 32, 20, 24


def make_batch(rng, B, h=None, o=None):
    h, o = h or H, o or O
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(B, h, 3)) * 0.3, dtype=jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(B, h, 3))), dtype=jnp.float32)
    ov = jnp.asarray(rng.normal(size=(B, o, 3)) * 0.3, dtype=jnp.float32)
    on = jnp.asarray(unit(rng.normal(size=(B, o, 3))), dtype=jnp.float32)
    return hv, hn, ov, on


def test_acos_f32_accuracy():
    x = jnp.linspace(-1 + 1e-7, 1 - 1e-7, 20001, dtype=jnp.float32)
    err = jnp.abs(acos_f32(x) - jnp.arccos(x)).max()
    assert float(err) < 1e-6


@pytest.mark.parametrize("B", [
    pytest.param(4, marks=pytest.mark.slow),  # exact-slab-count chain
    5,  # fast-lane representative: full slabs PLUS the padded tail slab
])
def test_fused_matches_reference_path(rng, B):
    hv, hn, ov, on = make_batch(rng, B)
    state = init_coma_state(H, O, N, 0.07, 0.24, 0.25)
    ref = contact_update_batch(state, hv, hn, ov, on)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_contact_update_batch(state, hv, hn, ov, on)
    for f in (
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "significant_contact_count",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, f)), np.asarray(getattr(ref, f)),
            rtol=1e-4, atol=1e-5,
        )
    assert float(fused.used_count) == B


@pytest.mark.slow
def test_fused_matches_reference_path_production_scale(rng):
    """Slow-lane parity at the qual production config (H=48, O=20, N=40,
    B=5 with slab padding) — the exact shapes the fast lane ran before the
    dims were shrunk for CI budget."""
    Hp, Op, Np = 48, 20, 40
    hv, hn, ov, on = make_batch(rng, 5, h=Hp, o=Op)
    state = init_coma_state(Hp, Op, Np, 0.07, 0.24, 0.25)
    ref = contact_update_batch(state, hv, hn, ov, on)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_contact_update_batch(state, hv, hn, ov, on)
    for f in (
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "significant_contact_count",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, f)), np.asarray(getattr(ref, f)),
            rtol=1e-4, atol=1e-5,
        )


def test_fused_respects_valid_mask(rng):
    # masking is shape-independent; smaller dims keep the interpreter cheap
    Hs, Os, Ns = 16, 12, 16
    hv, hn, ov, on = make_batch(rng, 4, h=Hs, o=Os)
    valid = jnp.array([1.0, 0.0, 1.0, 0.0])
    state = init_coma_state(Hs, Os, Ns, 0.07, 0.24, 0.25)
    ref = contact_update_batch(state, hv, hn, ov, on, valid=valid)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_contact_update_batch(state, hv, hn, ov, on, valid=valid)
    np.testing.assert_allclose(
        np.asarray(fused.prob_grid_canon_human_wrt_obj),
        np.asarray(ref.prob_grid_canon_human_wrt_obj),
        rtol=1e-4, atol=1e-5,
    )
    assert float(fused.used_count) == 2.0


def test_fused_large_sigma_exact_path(rng):
    """σ ≥ ~0.55 disables the θ²-poly cutoff; the exact arccos path runs.
    Path selection is shape-independent; small dims keep the interpreter
    cheap."""
    Hs, Os, Ns = 16, 12, 16
    hv, hn, ov, on = make_batch(rng, 4, h=Hs, o=Os)
    state = init_coma_state(Hs, Os, Ns, 0.07, 0.24, normal_gaussian_sigma=0.8)
    ref = contact_update_batch(state, hv, hn, ov, on)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_contact_update_batch(state, hv, hn, ov, on)
    np.testing.assert_allclose(
        np.asarray(fused.prob_grid_canon_human_wrt_obj),
        np.asarray(ref.prob_grid_canon_human_wrt_obj),
        rtol=1e-4, atol=1e-5,
    )


def test_fused_lane_blocked_small(rng):
    """Fast-lane representative of lane blocking: an explicit 128-lane
    block on O=140 (Op=256, OB=2 chunks) runs the same chunked kernel
    program as the auto-selected wide-O path at ~1/10 the interpreter
    cost; the O>512 auto-selection itself is covered by the slow-lane
    ``test_fused_lane_blocked_wide_o``."""
    Hs, Os, Ns = 8, 140, 8
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(2, Hs, 3)) * 0.3, dtype=jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(2, Hs, 3))), dtype=jnp.float32)
    ov = jnp.asarray(rng.normal(size=(2, Os, 3)) * 0.3, dtype=jnp.float32)
    on = jnp.asarray(unit(rng.normal(size=(2, Os, 3))), dtype=jnp.float32)
    state = init_coma_state(Hs, Os, Ns, 0.07, 0.24, 0.25)
    ref = contact_update_batch(state, hv, hn, ov, on)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_contact_update_batch(state, hv, hn, ov, on,
                                           lane_block=128)
    for f in ("prob_grid_canon_human_wrt_obj", "prob_grid_canon_obj_wrt_human"):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, f)), np.asarray(getattr(ref, f)),
            rtol=1e-4, atol=1e-5,
        )


@pytest.mark.slow
def test_fused_lane_blocked_wide_o(rng):
    """v4 lane blocking (O > 512 auto-selects CO=256 chunks; see
    _canon_splat_kernel) matches the reference path bit-for-... closely.

    O=520 forces Op=768 (lane-block-aligned padding) with OB=3 chunks while
    staying small enough for the interpreter.
    """
    Hs, Os, Ns = 16, 520, 16
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(4, Hs, 3)) * 0.3, dtype=jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(4, Hs, 3))), dtype=jnp.float32)
    ov = jnp.asarray(rng.normal(size=(4, Os, 3)) * 0.3, dtype=jnp.float32)
    on = jnp.asarray(unit(rng.normal(size=(4, Os, 3))), dtype=jnp.float32)
    state = init_coma_state(Hs, Os, Ns, 0.07, 0.24, 0.25)
    ref = contact_update_batch(state, hv, hn, ov, on)
    with pltpu.force_tpu_interpret_mode():
        fused = fused_contact_update_batch(state, hv, hn, ov, on)  # auto CO
        explicit = fused_contact_update_batch(state, hv, hn, ov, on,
                                              lane_block=256)
    for f in ("prob_grid_canon_human_wrt_obj", "prob_grid_canon_obj_wrt_human"):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, f)), np.asarray(getattr(ref, f)),
            rtol=1e-4, atol=1e-5,
        )
        # the explicit-CO path and the auto path run the same program
        np.testing.assert_array_equal(
            np.asarray(getattr(fused, f)), np.asarray(getattr(explicit, f)))
