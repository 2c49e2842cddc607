"""Tests for the Fibonacci sphere grid and geodesic Gaussian splatting."""
import numpy as np
import jax.numpy as jnp

from coma_tpu.affordance.sphere import fibonacci_sphere, geodesic_gaussian
from tests.oracles import fibonacci_sphere_oracle, splat_oracle


def test_fibonacci_matches_oracle():
    for n in (1, 16, 250):
        np.testing.assert_allclose(fibonacci_sphere(n), fibonacci_sphere_oracle(n), atol=1e-12)


def test_fibonacci_unit_and_spread():
    g = fibonacci_sphere(250)
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-12)
    # near-uniform: mean should be close to the origin
    assert np.linalg.norm(g.mean(axis=0)) < 0.01


def test_geodesic_gaussian_matches_oracle(rng):
    grid = fibonacci_sphere(32).astype(np.float32)
    dirs = rng.normal(size=(5, 4, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(geodesic_gaussian(jnp.array(grid), jnp.array(dirs, dtype=jnp.float32), 0.2, 1e-10))
    want = splat_oracle(grid.astype(np.float64), dirs, 0.2, 1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_geodesic_gaussian_peak_at_alignment():
    grid = jnp.array(fibonacci_sphere(64), dtype=jnp.float32)
    d = grid[7][None, :]  # exactly one grid direction
    scores = np.asarray(geodesic_gaussian(grid, d, 0.2, 1e-10))[0]
    assert scores.argmax() == 7
    # eps-clipped arccos keeps even the perfect match slightly below 1
    assert 0.99 < scores[7] <= 1.0
