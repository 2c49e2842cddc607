"""Intersection-volume estimator vs closed-form oracles (docs/TOLERANCE.md).

The post-filter rejects samples with ratio > 0.05 (reference
``filter.py:76-87``); these tests pin the estimator's error bound at that
threshold with exactly computable box-box overlaps and the adaptive
gray-zone refinement's decision correctness.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from coma_tpu.lifting.metrics import (
    intersection_volume_ratio,
    intersection_volume_ratio_adaptive,
    mesh_volume,
)

_FACES = np.array(
    [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
     [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]]
)


def box_mesh(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    c = np.array(
        [[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]], [hi[0], hi[1], lo[2]],
         [lo[0], hi[1], lo[2]], [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
         [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]]
    )
    return c, _FACES


def _pair(depth, off):
    """Unit box A + unit box B slid in by ``depth`` with lateral offsets.
    Returns (A, B, exact intersection ratio)."""
    va, fa = box_mesh([0, 0, 0], [1, 1, 1])
    vb, fb = box_mesh([1 - depth, off[0], off[1]], [2 - depth, off[0] + 1, off[1] + 1])
    ey = max(0.0, min(1.0, off[0] + 1) - max(0.0, off[0]))
    ez = max(0.0, min(1.0, off[1] + 1) - max(0.0, off[1]))
    return (va, fa), (vb, fb), depth * ey * ez


def test_estimator_error_bound_res32_smoke():
    """Fast-lane representative of the error-bound gate: one case at
    res=32 (the res=64 compile alone costs ~20 s on the single-core CI
    host). The production res=64 bound is pinned by the slow-lane
    parametrized test below."""
    (va, fa), (vb, fb), exact = _pair(0.05, (0.0, 0.0))
    est = float(intersection_volume_ratio(
        jnp.asarray(va), jnp.asarray(fa), jnp.asarray(vb), jnp.asarray(fb),
        resolution=32,
    ))
    assert abs(est - exact) < 0.02, (est, exact)


@pytest.mark.slow
@pytest.mark.parametrize("depth,off", [
    (0.03, (0.1, -0.2)),
    (0.05, (0.0, 0.0)),
    (0.08, (-0.25, 0.15)),
])
def test_estimator_error_bound_res64(depth, off):
    (va, fa), (vb, fb), exact = _pair(depth, off)
    est = float(intersection_volume_ratio(
        jnp.asarray(va), jnp.asarray(fa), jnp.asarray(vb), jnp.asarray(fb),
        resolution=64,
    ))
    # the measured max error over the full oracle set is 0.0053; assert with
    # headroom so platform jitter doesn't flake
    assert abs(est - exact) < 0.008, (est, exact)


@pytest.mark.slow
def test_adaptive_decisions_match_oracle():
    """Accept/reject vs the 0.05 threshold agrees with the exact oracle for
    every case outside the inherent ±6% ambiguity band."""
    rng = np.random.default_rng(3)
    for depth in (0.02, 0.035, 0.042, 0.058, 0.07, 0.09):
        off = rng.uniform(-0.2, 0.2, 2)
        (va, fa), (vb, fb), exact = _pair(depth, off)
        if abs(exact - 0.05) < 0.003:
            continue  # inside the documented ambiguity band
        est = intersection_volume_ratio_adaptive(
            jnp.asarray(va), jnp.asarray(fa), jnp.asarray(vb), jnp.asarray(fb)
        )
        assert (est > 0.05) == (exact > 0.05), (depth, est, exact)


def test_mesh_volume_exact_on_box():
    va, fa = box_mesh([0, 0, 0], [2, 0.5, 1])
    assert float(mesh_volume(jnp.asarray(va), jnp.asarray(fa))) == pytest.approx(1.0)
