"""SMPL-X body model: batched, jittable JAX LBS.

Reference parity: the vendored smplx package
(``imports/hand4whole/common/utils_hand4whole/smplx/smplx/body_models.py:722``
SMPLX, ``smplx/lbs.py:134-227`` lbs / ``:248`` blend_shapes / ``:272``
batch_rodrigues / ``:320`` batch_rigid_transform) — re-derived from the SMPL
equations as pure functions over a weights pytree. Everything jits and vmaps;
the kinematic-chain accumulation is an unrolled static loop over the 55
joints (static shapes, MXU-friendly batched matmuls).

Weights are license-gated (SMPL-X npz from MPG) and never redistributed;
``SMPLXModel.from_npz`` loads a user-provided file, and ``random_model``
builds a tiny synthetic model for tests.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from coma_tpu.geometry.transforms import rodrigues

NUM_BODY_JOINTS = 21   # SMPLX: SMPL's 23 minus the two hand roots
NUM_HAND_JOINTS = 15
NUM_FACE_JOINTS = 3    # jaw, leye, reye
NUM_JOINTS = NUM_BODY_JOINTS + NUM_FACE_JOINTS + 2 * NUM_HAND_JOINTS  # 54 (+root)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "v_template", "shapedirs", "expr_dirs", "posedirs", "J_regressor",
        "lbs_weights", "pose_mean", "left_hand_components", "right_hand_components",
    ],
    meta_fields=["parents", "faces"],
)
@dataclasses.dataclass(frozen=True)
class SMPLXModel:
    """SMPL-X weights as a pytree (faces/parents static)."""

    v_template: jax.Array          # (V, 3)
    shapedirs: jax.Array           # (V, 3, n_betas)
    expr_dirs: jax.Array           # (V, 3, n_expr)
    posedirs: jax.Array            # (9*J, V*3)  — (R - I) feature basis
    J_regressor: jax.Array         # (J+1, V)
    lbs_weights: jax.Array         # (V, J+1)
    pose_mean: jax.Array           # ((J+1)*3,) — hand means unless flat_hand_mean
    left_hand_components: jax.Array   # (n_pca, 45) or (0, 45)
    right_hand_components: jax.Array  # (n_pca, 45)
    parents: Tuple[int, ...] = ()  # (J+1,)
    faces: Tuple = ()              # static; use .faces_array for numpy

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def faces_array(self) -> np.ndarray:
        return np.asarray(self.faces, dtype=np.int64).reshape(-1, 3)

    @classmethod
    def from_npz(
        cls,
        path: str,
        num_betas: int = 10,
        num_expression_coeffs: int = 10,
        flat_hand_mean: bool = False,
        dtype=jnp.float32,
    ) -> "SMPLXModel":
        """Load the official SMPL-X npz (user-provided; license-gated).

        Mirrors the reference's loading semantics
        (``body_models.py:SMPLX.__init__:722+``): shapedirs' last axis splits
        into 300 shape + 100 expression dirs (or 10+10 for reduced models);
        pose_mean embeds the hand means unless ``flat_hand_mean``.
        """
        data = np.load(path, allow_pickle=True)
        shapedirs_full = np.asarray(data["shapedirs"], dtype=np.float64)
        SHAPE_SPACE_DIM = 300
        if shapedirs_full.shape[-1] < SHAPE_SPACE_DIM + 10:
            shape_dirs = shapedirs_full[..., :10][..., :num_betas]
            expr_dirs = shapedirs_full[..., 10:][..., :num_expression_coeffs]
        else:
            shape_dirs = shapedirs_full[..., :num_betas]
            expr_dirs = shapedirs_full[
                ..., SHAPE_SPACE_DIM : SHAPE_SPACE_DIM + num_expression_coeffs
            ]

        posedirs = np.asarray(data["posedirs"], dtype=np.float64)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (9J, V*3)

        parents = np.asarray(data["kintree_table"])[0].astype(np.int64)
        parents[0] = -1

        left_mean = np.asarray(data["hands_meanl"], dtype=np.float64).ravel()
        right_mean = np.asarray(data["hands_meanr"], dtype=np.float64).ravel()
        if flat_hand_mean:
            left_mean = np.zeros_like(left_mean)
            right_mean = np.zeros_like(right_mean)
        pose_mean = np.concatenate(
            [
                np.zeros(3),                      # global orient
                np.zeros(NUM_BODY_JOINTS * 3),
                np.zeros(3 * NUM_FACE_JOINTS),    # jaw, leye, reye
                left_mean,
                right_mean,
            ]
        )

        faces = np.asarray(data["f"], dtype=np.int64)
        return cls(
            v_template=jnp.asarray(data["v_template"], dtype=dtype),
            shapedirs=jnp.asarray(shape_dirs, dtype=dtype),
            expr_dirs=jnp.asarray(expr_dirs, dtype=dtype),
            posedirs=jnp.asarray(posedirs, dtype=dtype),
            J_regressor=jnp.asarray(data["J_regressor"], dtype=dtype),
            lbs_weights=jnp.asarray(data["weights"], dtype=dtype),
            pose_mean=jnp.asarray(pose_mean, dtype=dtype),
            left_hand_components=jnp.asarray(
                data["hands_componentsl"], dtype=dtype
            ),
            right_hand_components=jnp.asarray(
                data["hands_componentsr"], dtype=dtype
            ),
            parents=tuple(int(p) for p in parents),
            faces=tuple(faces.ravel().tolist()),
        )


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """(B, L) x (V, 3, L) -> (B, V, 3). Reference: ``lbs.py:blend_shapes:248``."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3). Reference: ``lbs.py:vertices2joints:230``."""
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor)


def batch_rigid_transform(
    rot_mats: jax.Array,   # (B, J, 3, 3)
    joints: jax.Array,     # (B, J, 3)
    parents: Tuple[int, ...],
) -> Tuple[jax.Array, jax.Array]:
    """Forward kinematics along the (static) kinematic tree.

    Returns (posed_joints (B,J,3), rel_transforms (B,J,4,4)).
    Reference: ``lbs.py:batch_rigid_transform:320`` — the chain loop unrolls
    at trace time (J=55 static), each step one batched 4x4 matmul.
    """
    B, J = joints.shape[:2]
    rel_joints = joints.at[:, 1:].add(-joints[:, list(parents[1:])])

    def make_tf(R, t):  # (B,3,3),(B,3) -> (B,4,4)
        top = jnp.concatenate([R, t[:, :, None]], axis=2)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=1)

    chain = [make_tf(rot_mats[:, 0], rel_joints[:, 0])]
    for i in range(1, J):
        chain.append(chain[parents[i]] @ make_tf(rot_mats[:, i], rel_joints[:, i]))
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]
    # remove the rest-pose joint location from the translation (lbs.py:359-363)
    joints_homo = jnp.concatenate([joints, jnp.zeros((B, J, 1), joints.dtype)], axis=2)
    rel = transforms - jnp.pad(
        jnp.einsum("bjkl,bjl->bjk", transforms, joints_homo)[:, :, :, None],
        ((0, 0), (0, 0), (0, 0), (3, 0)),
    )
    return posed_joints, rel


def lbs(
    betas: jax.Array,        # (B, n_shape_components)
    pose: jax.Array,         # (B, (J)*3) axis-angle full pose
    v_template: jax.Array,   # (V, 3)
    shapedirs: jax.Array,    # (V, 3, n)
    posedirs: jax.Array,     # (9(J-1), V*3)
    J_regressor: jax.Array,  # (J, V)
    parents: Tuple[int, ...],
    lbs_weights: jax.Array,  # (V, J)
    return_rel_transforms: bool = False,
) -> Tuple[jax.Array, ...]:
    """Linear blend skinning. Returns (verts (B,V,3), joints (B,J,3)) —
    plus (rel_transforms (B,J,4,4), rest_joints (B,J,3)) when
    ``return_rel_transforms`` (the inputs COAP's bone-local frames need).

    Reference: ``lbs.py:lbs:134-227`` (pose2rot=True path).
    """
    B = max(betas.shape[0], pose.shape[0])
    J = J_regressor.shape[0]

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(J_regressor, v_shaped)

    rot_mats = rodrigues(pose.reshape(B, J, 3))                    # (B, J, 3, 3)
    eye = jnp.eye(3, dtype=pose.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)          # (B, 9(J-1))
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)     # (B, V, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_tf = batch_rigid_transform(rot_mats, joints, parents)

    T = jnp.einsum("vj,bjkl->bvkl", lbs_weights, rel_tf)           # (B, V, 4, 4)
    v_homo = jnp.concatenate(
        [v_posed, jnp.ones((B, v_posed.shape[1], 1), v_posed.dtype)], axis=2
    )
    verts = jnp.einsum("bvkl,bvl->bvk", T, v_homo)[:, :, :3]
    if return_rel_transforms:
        return verts, posed_joints, rel_tf, joints
    return verts, posed_joints


def smplx_forward(
    model: SMPLXModel,
    betas: Optional[jax.Array] = None,            # (B, n_betas)
    expression: Optional[jax.Array] = None,       # (B, n_expr)
    global_orient: Optional[jax.Array] = None,    # (B, 3)
    body_pose: Optional[jax.Array] = None,        # (B, 63)
    jaw_pose: Optional[jax.Array] = None,         # (B, 3)
    leye_pose: Optional[jax.Array] = None,
    reye_pose: Optional[jax.Array] = None,
    left_hand_pose: Optional[jax.Array] = None,   # (B, 45) or (B, n_pca)
    right_hand_pose: Optional[jax.Array] = None,
    transl: Optional[jax.Array] = None,           # (B, 3)
    use_pca: bool = False,
    batch_size: Optional[int] = None,
    return_rel_transforms: bool = False,
) -> Tuple[jax.Array, ...]:
    """Full SMPL-X forward: assemble pose, add pose_mean, run LBS.

    Returns (vertices (B,V,3), joints (B,J,3)). Reference:
    ``body_models.py:SMPLX.forward:928-1069`` (landmark/extra-joint selection
    lives in :mod:`coma_tpu.models.keypoints`). With
    ``return_rel_transforms``, additionally returns
    (rel_transforms (B,J,4,4), rest_joints (B,J,3)) — the COAP bone-frame
    inputs (``imports/coap/coap.py:compute_abs_transformations:562``); note
    ``transl`` is NOT folded into them (pass it as the rigid translation).
    """
    dtype = model.v_template.dtype
    B = batch_size or next(
        (
            int(a.shape[0])
            for a in (betas, body_pose, global_orient, transl)
            if a is not None
        ),
        1,
    )
    z = lambda n: jnp.zeros((B, n), dtype=dtype)
    betas = betas if betas is not None else z(model.shapedirs.shape[-1])
    expression = expression if expression is not None else z(model.expr_dirs.shape[-1])
    global_orient = global_orient if global_orient is not None else z(3)
    body_pose = body_pose if body_pose is not None else z(NUM_BODY_JOINTS * 3)
    jaw_pose = jaw_pose if jaw_pose is not None else z(3)
    leye_pose = leye_pose if leye_pose is not None else z(3)
    reye_pose = reye_pose if reye_pose is not None else z(3)
    n_hand = model.left_hand_components.shape[0] if use_pca else NUM_HAND_JOINTS * 3
    left_hand_pose = left_hand_pose if left_hand_pose is not None else z(n_hand)
    right_hand_pose = right_hand_pose if right_hand_pose is not None else z(n_hand)

    if use_pca:
        left_hand_pose = left_hand_pose @ model.left_hand_components
        right_hand_pose = right_hand_pose @ model.right_hand_components

    full_pose = (
        jnp.concatenate(
            [
                global_orient, body_pose, jaw_pose, leye_pose, reye_pose,
                left_hand_pose, right_hand_pose,
            ],
            axis=1,
        )
        + model.pose_mean[None]
    )
    shape_components = jnp.concatenate([betas, expression], axis=-1)
    shapedirs = jnp.concatenate([model.shapedirs, model.expr_dirs], axis=-1)

    out = lbs(
        shape_components,
        full_pose,
        model.v_template,
        shapedirs,
        model.posedirs,
        model.J_regressor,
        model.parents,
        model.lbs_weights,
        return_rel_transforms=return_rel_transforms,
    )
    verts, joints = out[0], out[1]
    if transl is not None:
        verts = verts + transl[:, None, :]
        joints = joints + transl[:, None, :]
    if return_rel_transforms:
        return verts, joints, out[2], out[3]
    return verts, joints


def star_pose_vertices(model: SMPLXModel) -> jax.Array:
    """The canonical 'star pose' template: body_pose[2] = +π/6,
    body_pose[5] = -π/6, all else zero (reference:
    ``src/coma/downsample_human.py:20-26``). Returns (V, 3)."""
    body_pose = jnp.zeros((1, NUM_BODY_JOINTS * 3), dtype=model.v_template.dtype)
    body_pose = body_pose.at[0, 2].set(jnp.pi / 6).at[0, 5].set(-jnp.pi / 6)
    verts, _ = smplx_forward(model, body_pose=body_pose)
    return verts[0]


def random_model(
    num_verts: int = 64,
    num_betas: int = 4,
    num_expr: int = 2,
    seed: int = 0,
    dtype=jnp.float32,
) -> SMPLXModel:
    """A tiny synthetic SMPL-X-shaped model for tests (full 55-joint tree)."""
    rng = np.random.default_rng(seed)
    J = NUM_JOINTS + 1
    V = num_verts
    # a simple chain-ish kinematic tree resembling SMPLX's topology breadth
    parents = [-1] + [rng.integers(0, max(1, j)) for j in range(1, J)]
    lbs_w = rng.uniform(size=(V, J))
    lbs_w /= lbs_w.sum(-1, keepdims=True)
    faces = []
    for i in range(V - 2):
        faces.extend([i, i + 1, i + 2])
    return SMPLXModel(
        v_template=jnp.asarray(rng.normal(size=(V, 3)), dtype=dtype),
        shapedirs=jnp.asarray(rng.normal(size=(V, 3, num_betas)) * 0.1, dtype=dtype),
        expr_dirs=jnp.asarray(rng.normal(size=(V, 3, num_expr)) * 0.01, dtype=dtype),
        posedirs=jnp.asarray(rng.normal(size=(9 * (J - 1), V * 3)) * 0.01, dtype=dtype),
        J_regressor=jnp.asarray(
            rng.dirichlet(np.ones(V), size=J), dtype=dtype
        ),
        lbs_weights=jnp.asarray(lbs_w, dtype=dtype),
        pose_mean=jnp.zeros(J * 3, dtype=dtype),
        left_hand_components=jnp.asarray(rng.normal(size=(6, 45)), dtype=dtype),
        right_hand_components=jnp.asarray(rng.normal(size=(6, 45)), dtype=dtype),
        parents=tuple(int(p) for p in parents),
        faces=tuple(np.asarray(faces, dtype=np.int64).tolist()),
    )
