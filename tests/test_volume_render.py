"""Ray-marched occupancy volume rendering (``visualization/volume.py`` ←
``src/visualization/visualize_occupancy.py:27-66``)."""
import numpy as np
import pytest

import jax.numpy as jnp

from coma_tpu.visualization.volume import (
    _trilinear,
    render_occupancy_volume,
    save_occupancy_volume_render,
)

RES = 96  # image resolution for tests (production default 512)


def _blob_field(R=24, center=None, sigma=3.0):
    c = np.asarray(center if center is not None else [R / 2] * 3)
    ijk = np.mgrid[0:R, 0:R, 0:R].astype(np.float32) + 0.5
    d2 = sum((ijk[a] - c[a]) ** 2 for a in range(3))
    return np.exp(-d2 / (2 * sigma**2)).astype(np.float32)


def test_trilinear_matches_grid_values():
    field = jnp.asarray(np.arange(27, dtype=np.float32).reshape(3, 3, 3))
    # at a voxel center the sample equals the stored value
    pts = jnp.asarray([[1.5, 1.5, 1.5], [0.5, 0.5, 2.5]])
    out = np.asarray(_trilinear(field, pts))
    np.testing.assert_allclose(out, [13.0, 2.0], atol=1e-5)
    # midway between two centers -> mean of the two values
    mid = np.asarray(_trilinear(field, jnp.asarray([[1.5, 1.5, 2.0]])))
    np.testing.assert_allclose(mid, [(13.0 + 14.0) / 2], atol=1e-5)
    # far outside -> 0 (absorbing boundary)
    far = np.asarray(_trilinear(field, jnp.asarray([[-5.0, 1.0, 1.0]])))
    np.testing.assert_allclose(far, [0.0], atol=1e-6)


def test_volume_render_centered_blob():
    img = np.asarray(render_occupancy_volume(
        jnp.asarray(_blob_field()), resolution=RES, num_steps=96, slab=16))
    assert img.shape == (RES, RES, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    # corners are background (white); the center shows the blob
    assert (img[2, 2] > 0.99).all() and (img[-3, -3] > 0.99).all()
    c = RES // 2
    assert (img[c - 4:c + 4, c - 4:c + 4].mean(axis=(0, 1)) < 0.95).any()


def test_volume_render_rounds_num_steps_to_slab():
    # num_steps=100 with slab=16 used to crash in the slab reshape
    # (advisor r4); it now rounds up to 112 steps and renders
    img = np.asarray(render_occupancy_volume(
        jnp.asarray(_blob_field()), resolution=32, num_steps=100, slab=16))
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_volume_render_respects_ignore_threshold():
    """Values below 10% of max are zeroed (visualize_occupancy.py:26-28):
    a faint secondary blob must vanish from the render."""
    R = 24
    main = _blob_field(R, center=[6, 6, 12])
    faint = 0.05 * _blob_field(R, center=[18, 18, 12])
    with_faint = np.asarray(render_occupancy_volume(
        jnp.asarray(main + faint), resolution=RES, num_steps=96, slab=16))
    without = np.asarray(render_occupancy_volume(
        jnp.asarray(main), resolution=RES, num_steps=96, slab=16))
    np.testing.assert_allclose(with_faint, without, atol=5e-3)


def test_mesh_composites_depth_correctly(tmp_path):
    """A mesh plane between the camera and the blob occludes it; behind
    the blob, the blob still renders in front."""
    R = 24
    field = _blob_field(R, sigma=2.5)
    # a big quad at world x = +6 / x = -6 (voxel_size=1 -> voxel x = 18 / 6);
    # the default camera looks from +x toward the center
    quad = np.array([[0, -20, -20], [0, 20, -20], [0, 20, 20], [0, -20, 20]],
                    np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)

    front = save_occupancy_volume_render(
        str(tmp_path / "front.png"), field,
        mesh=(quad + np.array([6.0, 0, 0], np.float32), faces),
        resolution=RES, num_steps=96, elev_deg=0.0, azim_deg=0.0)
    behind = save_occupancy_volume_render(
        str(tmp_path / "behind.png"), field,
        mesh=(quad + np.array([-6.0, 0, 0], np.float32), faces),
        resolution=RES, num_steps=96, elev_deg=0.0, azim_deg=0.0)
    assert (tmp_path / "front.png").exists()
    c = RES // 2
    center_front = front[c - 3:c + 3, c - 3:c + 3].mean(axis=(0, 1))
    center_behind = behind[c - 3:c + 3, c - 3:c + 3].mean(axis=(0, 1))
    # front plane: uniform gray (mesh occludes the blob) -> low saturation
    assert abs(center_front[0] - center_front[2]) < 0.05
    # behind plane: the blob's jet colors dominate -> saturated center
    assert abs(center_behind[0] - center_behind[2]) > 0.1


def test_cli_occupancy_volume_mode(tmp_path):
    from coma_tpu.cli import visualize as cli

    np.save(tmp_path / "occupancy.npy", dict(
        prob_field=_blob_field(16),
        spatial_grid_metadata=dict(voxel_size=0.1),
    ))
    out = tmp_path / "vol.png"
    cli.main(["occupancy", "--occupancy_npy", str(tmp_path / "occupancy.npy"),
              "--out", str(out), "--mode", "volume", "--resolution", "64"])
    assert out.exists()
