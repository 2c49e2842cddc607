"""CPU parity tests for the FPN pooler (torch-free: these guard the
rewritten flat-gather ``multilevel_roi_align`` even where the torch mirror
suites skip)."""
import numpy as np

import jax.numpy as jnp
import pytest


def _seed_all(s=0):
    return np.random.default_rng(s)


@pytest.mark.slow  # ~9 s; the single-level oracle checks stay fast
def test_multilevel_roi_align_matches_dense_oracle():
    """The flat single-level-gather pooler must match the pool-at-every-level
    one-hot contraction (its L×-work oracle) across boxes whose areas span
    all four FPN levels, including the chunked lax.map path."""
    from coma_tpu.ops.sampling import (
        _fpn_level_assignment,
        _multilevel_roi_align_dense,
        multilevel_roi_align,
    )

    rng = _seed_all()
    H = W = 128
    feats = [
        jnp.asarray(rng.normal(size=(H // s, W // s, 8)).astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    # sizes chosen to land on levels 0..3 under the d2 rule (canonical 224@p4)
    sides = np.array([20.0, 60.0, 150.0, 300.0, 500.0, 0.0], np.float32)
    rng2 = np.random.default_rng(1)
    boxes = []
    for side in np.tile(sides, 4):
        x0, y0 = rng2.uniform(-20, 100, size=2)
        boxes.append([x0, y0, x0 + side, y0 + side * rng2.uniform(0.5, 1.5)])
    boxes = jnp.asarray(np.array(boxes, np.float32))
    lv = np.asarray(_fpn_level_assignment(boxes, 4, 4, 224.0))
    assert set(lv.tolist()) == {0, 1, 2, 3}  # the fixture truly spans levels
    ours = multilevel_roi_align(feats, boxes, 7, (4, 8, 16, 32))
    oracle = _multilevel_roi_align_dense(feats, boxes, 7, (4, 8, 16, 32))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=1e-5)
    # chunked path (R > chunk) must agree with the single-chunk path
    chunked = multilevel_roi_align(feats, boxes, 7, (4, 8, 16, 32), chunk=7)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ours), atol=1e-5)
