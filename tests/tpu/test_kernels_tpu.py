"""Real-chip (Mosaic-compiled) parity tests for the Pallas kernels.

The CPU suite validates the same kernels in interpreter mode
(``tests/test_contact_kernel.py``, ``tests/test_occupancy_kernel.py``);
this lane proves the Mosaic compilation path agrees with the jnp reference
implementation on actual TPU hardware.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coma_tpu.affordance.contact import contact_update_batch
from coma_tpu.affordance.state import init_coma_state
from coma_tpu.ops.contact_kernel import fused_contact_update_batch

H, O, N = 48, 20, 40


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_batch(rng, B):
    unit = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    hv = jnp.asarray(rng.normal(size=(B, H, 3)) * 0.3, dtype=jnp.float32)
    hn = jnp.asarray(unit(rng.normal(size=(B, H, 3))), dtype=jnp.float32)
    ov = jnp.asarray(rng.normal(size=(B, O, 3)) * 0.3, dtype=jnp.float32)
    on = jnp.asarray(unit(rng.normal(size=(B, O, 3))), dtype=jnp.float32)
    return hv, hn, ov, on


def test_contact_kernel_mosaic_matches_reference(rng):
    hv, hn, ov, on = make_batch(rng, 4)
    state = init_coma_state(H, O, N, 0.07, 0.24, 0.25)
    ref = jax.jit(contact_update_batch)(state, hv, hn, ov, on)
    fused = jax.jit(fused_contact_update_batch)(state, hv, hn, ov, on)
    for f in (
        "prob_grid_canon_human_wrt_obj",
        "prob_grid_canon_obj_wrt_human",
        "contact_dist_expectation_grid_nom",
        "significant_contact_count",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, f)), np.asarray(getattr(ref, f)),
            rtol=2e-3, atol=2e-3,
        )


def test_occupancy_update_on_chip(rng):
    from coma_tpu.affordance.occupancy import occupancy_update_batch
    from coma_tpu.affordance.state import init_occupancy_state

    state = init_occupancy_state(H, O, spatial_res=8, scale_tolerance=1.5)
    hv = jnp.asarray(rng.normal(size=(2, H, 3)) * 0.2, dtype=jnp.float32)
    ov = jnp.asarray(rng.normal(size=(2, O, 3)) * 0.2, dtype=jnp.float32)
    out = jax.jit(occupancy_update_batch)(state, hv, ov)
    assert bool(jnp.all(jnp.isfinite(out.spatial_occupancy_grids)))
    assert float(out.used_count) == 2.0


def test_unet_cfg_step_compiles_bf16():
    """The flagship's hot op: one CFG UNet step at 64x64 latents, bf16."""
    from coma_tpu.models.diffusion.unet import UNet2DCondition, tiny_unet_config

    cfg = tiny_unet_config(dtype=jnp.bfloat16)
    model = UNet2DCondition(cfg)
    lat = jnp.zeros((2, 16, 16, 9), jnp.bfloat16)
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), lat, t, ctx)
    out = jax.jit(model.apply)(params, lat, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_multilevel_roi_align_on_chip(rng):
    """The flat single-level-gather FPN pooler (the PointRend detect hot op)
    vs its dense pool-at-every-level oracle, compiled on the real chip."""
    from coma_tpu.ops.sampling import (
        _multilevel_roi_align_dense,
        multilevel_roi_align,
    )

    feats = [
        jnp.asarray(rng.normal(size=(128 // s, 128 // s, 16)), jnp.float32)
        for s in (4, 8, 16, 32)
    ]
    sides = np.tile(np.array([20.0, 60.0, 150.0, 300.0, 500.0], np.float32), 5)
    xy = rng.uniform(-20, 100, size=(len(sides), 2)).astype(np.float32)
    boxes = jnp.asarray(
        np.concatenate([xy, xy + sides[:, None] * [1.0, 0.8]], axis=-1)
    )
    ours = jax.jit(
        lambda f, b: multilevel_roi_align(f, b, 7, (4, 8, 16, 32))
    )(feats, boxes)
    oracle = jax.jit(
        lambda f, b: _multilevel_roi_align_dense(f, b, 7, (4, 8, 16, 32))
    )(feats, boxes)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=1e-4)
