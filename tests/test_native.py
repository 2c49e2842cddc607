"""Tests for the native C++ components (skipped without a toolchain)."""
import numpy as np
import pytest

from coma_tpu import native
from coma_tpu.geometry.mesh import Mesh, face_areas
from coma_tpu.geometry.sampling import (
    poisson_disk_eliminate,
    sample_surface_uniform,
)
from tests.test_geometry import CUBE_F, CUBE_V

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_poisson_eliminate_matches_python_count(rng):
    mesh = Mesh(vertices=CUBE_V.astype(np.float64), faces=CUBE_F)
    pts, _ = sample_surface_uniform(mesh, 500, rng)
    area = float(face_areas(mesh.vertices, mesh.faces).sum())
    keep_native = native.poisson_eliminate(pts, 100, area)
    assert len(keep_native) == 100
    # spread quality on par with the python implementation
    keep_py = poisson_disk_eliminate(pts, 100, area)

    def min_dist(idx):
        p = pts[idx]
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_dist(keep_native) > 0.5 * min_dist(keep_py)


def test_native_inside_matches_jax(rng):
    import jax.numpy as jnp

    from coma_tpu.lifting.metrics import points_inside_mesh as jax_inside

    pts = rng.uniform(-0.5, 1.5, size=(500, 3))
    got = native.points_inside_mesh(pts, CUBE_V, CUBE_F)
    want = np.asarray(
        jax_inside(jnp.asarray(pts, jnp.float32), jnp.asarray(CUBE_V, jnp.float32),
                   jnp.asarray(CUBE_F))
    )
    # boundary-point disagreements only
    assert (got != want).mean() < 0.01
    # exact on clearly-inside/outside points
    inside_pts = rng.uniform(0.2, 0.8, size=(50, 3))
    assert native.points_inside_mesh(inside_pts, CUBE_V, CUBE_F).all()
    outside_pts = rng.uniform(2.0, 3.0, size=(50, 3))
    assert not native.points_inside_mesh(outside_pts, CUBE_V, CUBE_F).any()


def test_native_poisson_speed(rng):
    import time

    mesh = Mesh(vertices=CUBE_V.astype(np.float64), faces=CUBE_F)
    pts, _ = sample_surface_uniform(mesh, 2048 * 5, rng)
    area = float(face_areas(mesh.vertices, mesh.faces).sum())
    t0 = time.time()
    native.poisson_eliminate(pts, 2048, area)
    assert time.time() - t0 < 0.5  # python takes ~1.6s
