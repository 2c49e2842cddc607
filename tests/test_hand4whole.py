"""Tests for the Hand4Whole regressor + mocap adapter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.models.hand4whole import (
    crop_and_resize,
    get_camera_trans,
    restore_bbox,
    rot6d_to_axis_angle,
    sample_joint_features,
    soft_argmax_2d,
    soft_argmax_3d,
)
from coma_tpu.models.resnet import ResNet
from coma_tpu.pipelines.mocap import (
    Hand4WholeRegressor,
    convert_mesh_to_image_space,
    process_bbox,
)


def test_soft_argmax_3d_peak():
    hm = jnp.full((1, 2, 8, 8, 6), -10.0)
    hm = hm.at[0, 0, 3, 5, 2].set(20.0).at[0, 1, 7, 0, 5].set(20.0)
    coord, prob = soft_argmax_3d(hm)
    np.testing.assert_allclose(np.asarray(coord[0, 0]), [2, 5, 3], atol=1e-2)
    np.testing.assert_allclose(np.asarray(coord[0, 1]), [5, 0, 7], atol=1e-2)
    np.testing.assert_allclose(np.asarray(prob.sum(axis=(2, 3, 4))), 1.0, atol=1e-5)


def test_soft_argmax_2d_peak():
    hm = jnp.full((1, 1, 8, 8), -10.0).at[0, 0, 6, 2].set(20.0)
    coord = soft_argmax_2d(hm)
    np.testing.assert_allclose(np.asarray(coord[0, 0]), [2, 6], atol=1e-2)


def test_sample_joint_features_exact_grid():
    feat = jnp.arange(4 * 4, dtype=jnp.float32).reshape(1, 4, 4, 1)
    xy = jnp.asarray([[[1.0, 2.0], [0.5, 0.5]]])
    out = np.asarray(sample_joint_features(feat, xy))
    assert abs(out[0, 0, 0] - 9.0) < 1e-5   # feat[2,1] = 2*4+1
    assert abs(out[0, 1, 0] - 2.5) < 1e-5   # bilinear center of 0,1,4,5


def test_crop_and_resize_identity():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    out = np.asarray(crop_and_resize(img, jnp.asarray([[0.0, 0.0, 4.0, 4.0]]), (4, 4)))
    np.testing.assert_allclose(out[0, :, :, 0], np.asarray(img)[0, :, :, 0], atol=1e-4)


def test_restore_bbox_aspect_and_extension():
    center = jnp.asarray([[10.0, 20.0]])
    size = jnp.asarray([[2.0, 8.0]])
    out = np.asarray(restore_bbox(center, size, aspect=1.0, extension=2.0))
    x0, y0, x1, y1 = out[0]
    assert abs((x1 - x0) - (y1 - y0)) < 1e-5   # square after aspect fix
    assert abs((x1 - x0) - 16.0) < 1e-5        # max(2, 8*1) * 2
    assert abs((x0 + x1) / 2 - 10.0) < 1e-5


def test_camera_trans_positive_depth(rng):
    cam = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    t = np.asarray(get_camera_trans(cam))
    assert (t[:, 2] > 0).all()


def test_rot6d_identity():
    x = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    aa = np.asarray(rot6d_to_axis_angle(x))
    np.testing.assert_allclose(aa, 0.0, atol=1e-6)


def test_process_bbox_aspect():
    bbox = process_bbox([10, 10, 50, 100], img_width=640, img_height=480)
    w, h = bbox[2], bbox[3]
    assert abs(w / h - 384 / 512) < 1e-5


@pytest.mark.slow
def test_resnet_output_shapes(rng):
    x = jnp.zeros((1, 64, 48, 3))
    net = ResNet((2, 2, 2, 2), bottleneck=False)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 2, 2, 512)   # stride 32, basic -> 512


def test_convert_mesh_to_image_space():
    rng = np.random.default_rng(0)
    mesh_cam = rng.normal(size=(20, 3)) * 0.3 + [0, 0, 10.0]
    joints_cam = rng.normal(size=(5, 3)) * 0.3 + [0, 0, 10.0]
    bbox = np.array([100.0, 50.0, 192.0, 256.0])
    out = convert_mesh_to_image_space(
        mesh_cam, joints_cam, bbox, np.zeros((4, 3), np.int64), {}
    )
    f = 5000.0 / 192 * 192  # focal scaled by bbox width
    assert abs(out.convert_data["focals"][0] - f) < 1e-3
    # principal point at the bbox center
    assert abs(out.convert_data["princpt"][0] - (100 + 96)) < 1e-3
    assert out.pred_vertices_img.shape == (20, 3)
    # z re-centered around 500
    assert abs(out.pred_vertices_img[:, 2].mean() - 500.0) < 1e-3


@pytest.mark.slow
def test_full_regressor_on_synthetic_image(rng):
    """End-to-end: random weights, synthetic image -> valid SMPL-X params."""
    from coma_tpu.models.hand4whole import Hand4Whole
    from coma_tpu.models.smplx import random_model

    model = Hand4Whole()
    img = jnp.asarray(rng.uniform(size=(1, 512, 384, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    regressor = Hand4WholeRegressor(params, random_model(num_verts=48, num_betas=10, num_expr=10))
    image = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
    outs = regressor.regress(image, [[100, 50, 200, 300]])
    assert len(outs) == 1
    out = outs[0]
    assert out.pred_vertices_img.shape == (48, 3)
    assert np.isfinite(out.pred_vertices_img).all()
    assert out.smplx_data["body_pose"].shape == (1, 63)
    assert out.joints_proj.shape[1] == 2
