"""Fibonacci sphere grid + geodesic Gaussian splatting (pure JAX).

Reference parity: ``utils/coma.py:18-26`` (get_uniform_points_on_sphere) and
``utils/coma.py:102-112`` (geodesic_gaussian_scores). The grid construction is
deterministic, so our grid is bitwise-identical (up to float64->float32
rounding) to the reference's.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fibonacci_sphere(num_points: int) -> np.ndarray:
    """``num_points`` near-uniform unit vectors on S², Fibonacci lattice.

    Matches ``utils/coma.py:get_uniform_points_on_sphere`` exactly:
    ``phi = arccos(1 - 2 (i+0.5)/n)``, ``theta = pi (1+sqrt 5) (i+0.5)``.
    Returns an ``(N, 3)`` float64 array (callers cast as needed).
    """
    indices = np.arange(num_points, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * indices / num_points)
    theta = np.pi * (1.0 + 5.0**0.5) * indices
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=-1,
    )


def geodesic_gaussian(
    normal_grid: jax.Array,   # (N, 3) unit vectors
    directions: jax.Array,    # (..., 3) unit vectors
    sigma: float,
    eps: float,
) -> jax.Array:
    """Gaussian of geodesic distance between each direction and grid point.

    Returns ``(..., N)``: ``exp(-arccos(clip(d·g, ±(1∓eps)))² / σ²)``.
    The asymmetric clip (``[-1+eps, 1-eps]``) matches the reference
    (``utils/coma.py:109``); it keeps arccos' gradient finite and puts a
    floor of ``exp(-(~sqrt(2 eps))²/σ²)`` under perfectly aligned normals.
    """
    # K=3 contraction as explicit multiply-adds: an einsum here would lower
    # to a K=3 MXU matmul (42x padding waste, 6 passes at HIGHEST precision);
    # elementwise VPU ops are both faster and exactly f32.
    cos = (
        directions[..., None, 0] * normal_grid[:, 0]
        + directions[..., None, 1] * normal_grid[:, 1]
        + directions[..., None, 2] * normal_grid[:, 2]
    )
    geo = jnp.arccos(jnp.clip(cos, -1.0 + eps, 1.0 - eps))
    return jnp.exp(-(geo * geo) / (sigma * sigma))
