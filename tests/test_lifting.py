"""Tests for the lifting stage: cameras, rasterizer, triangulation, depth
init/optimization, metrics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coma_tpu.lifting.cameras import (
    COMPATIBILITY_MATRIX_OPENGL_TO_BLENDER,
    OrthoCamera,
    project_points,
    reprojection_mse,
    triangulate_pair,
)
from coma_tpu.lifting.depth_init import (
    compute_directional_size,
    compute_nearest_point,
    initialize_depth_for_sample,
)
from coma_tpu.lifting.depth_optimize import optimize_depth_batch, pad_inliers
from coma_tpu.lifting.metrics import (
    intersection_volume_ratio,
    mesh_volume,
    points_inside_mesh,
)
from coma_tpu.lifting.rasterizer import (
    render_silhouette,
    render_silhouettes_batch,
    silhouette_iou,
)
from coma_tpu.models.keypoints import smpl_to_openpose
from tests.test_geometry import CUBE_F, CUBE_V


def rotation_z(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def look_at_camera(angle, dist=3.0, scale=2.0, resolution=(64, 64)):
    """A Blender-style camera orbiting the origin in the xy plane at z=0.5,
    looking inward (camera -Z = toward origin)."""
    # camera frame: z-axis points away from the target (Blender convention)
    z = np.array([np.cos(angle), np.sin(angle), 0.0])
    x = np.cross(np.array([0, 0, 1.0]), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)  # columns = camera axes in world
    t = z * dist + np.array([0, 0, 0.5])
    return OrthoCamera(
        R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32),
        scale=scale, resolution=resolution,
    )


# ------------------------------------------------------------- cameras ----

def test_projection_center():
    cam = look_at_camera(0.3)
    # the point on the camera axis projects to the image center
    center = np.asarray(cam.t) + np.asarray(cam.front) * 1.0
    px = np.asarray(project_points(cam, jnp.asarray(center[None], jnp.float32)))
    np.testing.assert_allclose(px[0, :2], [32.0, 32.0], atol=1e-3)


def test_projection_scale():
    cam = look_at_camera(0.0, scale=2.0, resolution=(64, 64))
    # one world unit along camera +x spans max(res)/scale = 32 pixels
    p0 = np.asarray(cam.t) + np.asarray(cam.front) * 2.0
    x_axis = np.asarray(cam.R[:, 0])
    pts = jnp.asarray(np.stack([p0, p0 + x_axis]), jnp.float32)
    px = np.asarray(project_points(cam, pts))
    assert abs((px[1, 0] - px[0, 0]) - 32.0) < 1e-3


def test_triangulation_recovers_points(rng):
    cams = [look_at_camera(a) for a in (0.0, 1.2)]
    X = jnp.asarray(rng.normal(size=(25, 3)) * 0.3, jnp.float32)
    j2d = [project_points(c, X)[:, :2] for c in cams]
    Xhat = triangulate_pair(cams[0], cams[1], j2d[0], j2d[1])
    np.testing.assert_allclose(np.asarray(Xhat), np.asarray(X), atol=1e-2)
    assert float(reprojection_mse(cams[0], Xhat, j2d[0])) < 1e-3


# ----------------------------------------------------------- rasterizer ----

def test_rasterize_cube_silhouette_area():
    cam = look_at_camera(0.0, scale=4.0, resolution=(64, 64))
    # unit cube at origin: faces span [0,1]^3 -> silhouette is a 1x1 square
    # seen orthographically -> area = (max_res/scale)^2 = 16x16 px = 256
    verts = jnp.asarray(CUBE_V - 0.5, jnp.float32)  # center at origin
    mask = np.asarray(render_silhouette(cam, verts, jnp.asarray(CUBE_F)))
    area = mask.sum()
    assert abs(area - 256) < 40  # rasterization tolerance on the boundary


def test_silhouette_iou_shifted():
    a = jnp.zeros((16, 16)).at[4:12, 4:12].set(1.0)
    b = jnp.zeros((16, 16)).at[4:12, 8:16].set(1.0)
    # overlap 8x4=32, union 8x8*2-32=96
    assert abs(float(silhouette_iou(a, b)) - 32 / 96) < 1e-6


def test_batch_render_matches_single():
    cam = look_at_camera(0.7, scale=4.0)
    verts = jnp.asarray(CUBE_V - 0.5, jnp.float32)
    faces = jnp.asarray(CUBE_F)
    batch = render_silhouettes_batch(cam, jnp.stack([verts, verts + 0.2]), faces)
    single = render_silhouette(cam, verts, faces)
    np.testing.assert_array_equal(np.asarray(batch[0]), np.asarray(single))
    assert np.asarray(batch[1]).sum() > 0


# ------------------------------------------------------------ depth init ----

def test_nearest_point_on_ray():
    asset = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]], jnp.float32)
    point = jnp.asarray([2.0, 0.0, 0.0], jnp.float32)
    direction = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    nearest, dist = compute_nearest_point(asset, point, direction)
    np.testing.assert_allclose(np.asarray(nearest), [0.0, 0.0, 0.0], atol=1e-6)
    assert abs(float(dist) - (-2.0)) < 1e-6  # origin is 2 behind the point


def test_directional_size():
    size = compute_directional_size(jnp.asarray(CUBE_V, jnp.float32), jnp.asarray([0.0, 0.0, 2.0]))
    assert abs(float(size) - 1.0) < 1e-6


def test_depth_init_recovers_offset():
    """Shift the cube off its true depth; the IoU search must find it.

    Depth is only observable through occlusion under an orthographic camera
    (exactly why the reference renders the candidate into the full scene):
    an occluding asset sits between camera and human, partially covering it.
    """
    cam = look_at_camera(0.0, scale=4.0, resolution=(64, 64))
    faces = jnp.asarray(CUBE_F)
    # occluder: a half-size cube offset toward the camera and shifted up so
    # it overlaps the top half of the human's silhouette
    direction = cam.front / jnp.linalg.norm(cam.front)
    occ_verts = jnp.asarray(CUBE_V * 0.5 - 0.25, jnp.float32) \
        - 0.9 * direction[None] + jnp.asarray([0.0, 0.0, 0.3])
    verts_true = jnp.asarray(CUBE_V - 0.5, jnp.float32)
    gt_mask = render_silhouette(cam, verts_true, faces,
                                occluder_verts=occ_verts, occluder_faces=faces)
    # start 0.6 units behind along the ray; candidates at stride 0.3.
    # candidates in FRONT of the occluder produce a fuller silhouette,
    # candidates far behind the same occluded one — IoU peaks at the truth
    # only if some candidate crosses the occluder depth; verify ordering.
    verts_start = verts_true - 0.6 * direction[None]
    displacements = jnp.arange(-3, 4, dtype=jnp.float32) * 0.3 + 0.6
    out = initialize_depth_for_sample(
        cam, verts_start, faces, gt_mask, displacements,
        occluder_verts=occ_verts, occluder_faces=faces,
        direction=direction,  # the test's frame uses the viewing direction
    )
    ious = np.asarray(out["ious"])
    # the candidate that pops in FRONT of the occluder shows more silhouette
    # than the (occluded) GT -> IoU < 1; all behind-occluder candidates tie
    # at IoU 1 (ortho depth is only observable through occlusion)
    assert ious[0] < 0.99
    np.testing.assert_allclose(ious[1:], 1.0, atol=1e-6)
    assert float(out["best_iou"]) > 0.99
    # reference tie-break (interval_from_center) picks the FARTHEST tied
    # candidate — faithful to initialize_depth.py:200, even though the true
    # displacement (0.6) is among the ties
    assert abs(float(out["best_displacement"]) - 1.5) < 1e-6


# -------------------------------------------------------- depth optimize ----

def test_depth_optimization_recovers_displacement(rng):
    cams = [look_at_camera(a) for a in (0.5, 1.5, 2.5)]
    scale, res = cams[0].scale, cams[0].resolution
    X_true = jnp.asarray(rng.normal(size=(25, 3)) * 0.2, jnp.float32)
    front = cams[0].front / jnp.linalg.norm(cams[0].front)
    d_true = 0.8
    X_start = X_true - d_true * front[None]

    inliers = [
        dict(R=np.asarray(c.R), t=np.asarray(c.t),
             joints_2d=np.asarray(project_points(c, X_true)[:, :2]))
        for c in cams
    ]
    R, t, j2d, valid = pad_inliers(inliers, max_inliers=4, resolution=res)
    result = optimize_depth_batch(
        joints_world=X_start[None],
        verts_world=X_start[None],
        cam_front=front[None],
        inlier_R=jnp.asarray(R)[None],
        inlier_t=jnp.asarray(t)[None],
        inlier_joints_2d=jnp.asarray(j2d)[None],
        inlier_valid=jnp.asarray(valid)[None],
        scale=scale,
        resolution=res,
        num_epochs=300,
        lr=0.05,
    )
    assert abs(float(result.displacement[0]) - d_true) < 0.02
    assert float(result.losses[0]) < 1e-2


def test_smpl_to_openpose_sizes():
    assert smpl_to_openpose(use_hands=False).shape == (25,)
    assert smpl_to_openpose(use_hands=True).shape == (67,)
    assert smpl_to_openpose(use_hands=True)[0] == 55


# --------------------------------------------------------------- metrics ----

def test_points_inside_cube():
    verts = jnp.asarray(CUBE_V, jnp.float32)
    faces = jnp.asarray(CUBE_F)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.1, 0.9, 0.2]], jnp.float32)
    inside = np.asarray(points_inside_mesh(pts, verts, faces))
    np.testing.assert_array_equal(inside, [True, False, True])


def test_mesh_volume_cube():
    assert abs(float(mesh_volume(jnp.asarray(CUBE_V, jnp.float32), jnp.asarray(CUBE_F))) - 1.0) < 1e-6


def test_intersection_ratio_overlapping_cubes():
    a_v = jnp.asarray(CUBE_V, jnp.float32)
    b_v = jnp.asarray(CUBE_V + np.array([0.5, 0.0, 0.0]), jnp.float32)
    faces = jnp.asarray(CUBE_F)
    ratio = float(intersection_volume_ratio(a_v, faces, b_v, faces, resolution=32))
    assert abs(ratio - 0.5) < 0.03  # half of A overlaps B


def test_intersection_ratio_disjoint():
    a_v = jnp.asarray(CUBE_V, jnp.float32)
    b_v = jnp.asarray(CUBE_V + 5.0, jnp.float32)
    faces = jnp.asarray(CUBE_F)
    ratio = float(intersection_volume_ratio(a_v, faces, b_v, faces, resolution=16))
    assert ratio == 0.0


@pytest.mark.slow
def test_capsule_collision_aux_pushes_human_out(rng):
    """Batched collision backend: with scene points inside the body and no
    joint evidence, the optimizer should move the human along the ray until
    the capsule occupancy clears (reference loss stack:
    ``optimize_depth.py:752-762``, collision w=0.4)."""
    from coma_tpu.models.coap import (
        BODY25_PARENTS,
        make_capsule_collision_aux_fn,
        pad_scene_points,
    )

    J = 25
    joints = jnp.asarray(rng.normal(size=(J, 3)) * 0.15, jnp.float32)
    verts = joints  # stand-in body vertices
    front = jnp.asarray([0.0, 0.0, 1.0])
    scene = np.asarray(joints)[:5]  # points buried inside the body
    pts, valid = pad_scene_points(scene, 16)

    fn = make_capsule_collision_aux_fn(BODY25_PARENTS)
    aux = dict(
        joints=joints[None],
        base_centroid=jnp.mean(verts, axis=0)[None],
        scene_points=jnp.asarray(pts)[None],
        scene_valid=jnp.asarray(valid)[None],
    )
    # no inlier views: multiview term is masked out, collision drives d
    R = np.tile(np.eye(3, dtype=np.float32), (1, 2, 1, 1))
    t = np.zeros((1, 2, 3), np.float32)
    j2d = np.zeros((1, 2, 25, 2), np.float32)
    inval = np.zeros((1, 2), np.float32)
    res = optimize_depth_batch(
        joints_world=joints[None],
        verts_world=verts[None],
        cam_front=front[None],
        inlier_R=jnp.asarray(R[0])[None],
        inlier_t=jnp.asarray(t[0])[None],
        inlier_joints_2d=jnp.asarray(j2d[0])[None],
        inlier_valid=jnp.asarray(inval[0])[None],
        scale=1.0,
        resolution=(64, 64),
        collision_fn=fn,
        collision_aux=aux,
        num_epochs=150,
        lr=0.05,
    )
    fn0 = fn(verts, {k: v[0] for k, v in aux.items()})
    fn1 = fn(res.verts[0], {k: v[0] for k, v in aux.items()})
    assert float(fn1) < float(fn0)  # penetration strictly reduced
    assert abs(float(res.displacement[0])) > 0.05  # actually moved
    # padded scene slots contribute nothing
    aux_empty = dict(aux)
    aux_empty["scene_valid"] = jnp.zeros_like(aux["scene_valid"])
    assert float(fn(verts, {k: v[0] for k, v in aux_empty.items()})) == 0.0


@pytest.mark.slow
def test_coap_collision_aux_batched(rng):
    """Neural-COAP aux path: finite loss, nonzero grad, vmaps over B=2."""
    import jax

    from coma_tpu.models.coap import (
        COAPConfig,
        COAPOccupancy,
        make_coap_collision_aux_fn,
        pad_scene_points,
    )
    from coma_tpu.models.coap_partition import build_partition
    from coma_tpu.models.smplx import random_model, smplx_forward

    sm = random_model(num_verts=64, num_betas=4, num_expr=2)
    part = build_partition(np.asarray(sm.lbs_weights), tuple(np.asarray(sm.parents)))
    K = part.num_parts
    cfg = COAPConfig(num_parts=K, code_dim=8, hidden_dim=8,
                     query_dims=(32, 32), query_skip=(1,), query_out=8,
                     decoder_dims=(16, 16), decoder_skip=())
    model = COAPOccupancy(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((K, part.max_part_size, 3)),
        jnp.zeros((K, 4, 3)),
        jnp.ones((K, 4)),
    )
    verts, joints, rel_tf, rest_j = smplx_forward(
        sm, betas=jnp.zeros((2, 4)), return_rel_transforms=True
    )
    pts, valid = pad_scene_points(np.asarray(verts[0])[:6], 8)

    fn = make_coap_collision_aux_fn(model, variables, part)
    aux = dict(
        rest_joints=rest_j,
        rel_transforms=rel_tf,
        translation=jnp.zeros((2, 3)),
        base_centroid=jnp.mean(verts, axis=1),
        scene_points=jnp.asarray(np.stack([pts, pts])),
        scene_valid=jnp.asarray(np.stack([valid, valid])),
    )
    losses = jax.vmap(fn)(verts, aux)
    assert losses.shape == (2,) and np.isfinite(np.asarray(losses)).all()
    g = jax.grad(lambda d: fn(verts[0] + d, {k: v[0] for k, v in aux.items()}))(
        jnp.zeros(3)
    )
    assert np.isfinite(np.asarray(g)).all()
