"""HOI reconstruction: optimize a SMPL-X human to satisfy a learned ComA.

Reference parity: ``src/application/optimize.py:optimize_smpl:167-317`` —
derive orientation targets (argmax of the relative-normal grid at a
reference object vertex) and contact pairs (proximity expectation >
threshold) from a trained ComA, then 2000 Adam steps over VPoser latent +
global orient/transl/hand poses with orientation loss, chamfer contact
loss, VPoser/angle priors, and optional collision. (The reference file has
broken imports, ``optimize.py:13-26``; fixed here per SURVEY §7.)

TPU-first: one jitted lax.scan over the 2000 steps; the orientation loss
canonicalizes only against the single reference object normal (identical to
the reference's select-a-column of the full (H, O, 3) tensor, without
materializing it).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from coma_tpu.affordance.canonicalize import canonicalize_pairwise
from coma_tpu.geometry.transforms import normalize_vectors
from coma_tpu.models.coap import capsule_occupancy, collision_loss, sample_scene_points_bbox
from coma_tpu.models.smplx import SMPLXModel, smplx_forward
from coma_tpu.models.vposer import VPoserDecoder, l2_prior, smplify_angle_prior


def vertex_normals_jax(verts: jax.Array, faces: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Differentiable area-weighted vertex normals (reference:
    ``application/optimize.py:compute_vertex_normals:118-152``)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), eps)


def chamfer_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric chamfer (reference: ``optimize.py:chamfer_distance:155-164``).

    sqrt is stabilized so coincident points yield zero gradient, not NaN.
    """
    diff = a[:, None, :] - b[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    return jnp.mean(jnp.min(d, axis=1)) + jnp.mean(jnp.min(d, axis=0))


def derive_targets_from_coma(
    coma_dict: Dict[str, Any],
    reference_object_vertex_index: int,
    contact_threshold: float,
):
    """Orientation GT + contact correspondences from a raw ComA pickle dict
    (reference: ``optimize.py:188-196``)."""
    grid_prob = np.asarray(
        coma_dict["prob_grid_canon_human_wrt_obj"]
    )[:, reference_object_vertex_index, :]                         # (H, N)
    grid = np.asarray(coma_dict["canon_normal_grid"])              # (N, 3)
    orientation_gt = grid[np.argmax(grid_prob, axis=1)]            # (H, 3)

    prox = np.asarray(coma_dict["contact_dist_expectation_grid_nom"]) / np.asarray(
        coma_dict["contact_dist_expectation_grid_denom"]
    )                                                              # (H, O)
    selected_human = np.flatnonzero(prox.max(axis=1) > contact_threshold)
    corresponding_obj = np.argmax(prox[selected_human], axis=1)
    return orientation_gt, selected_human, corresponding_obj


@dataclasses.dataclass
class HOIOptResult:
    vertices: np.ndarray
    faces: np.ndarray
    losses: Dict[str, float]


def optimize_smpl(
    smplx_model: SMPLXModel,
    vposer_decoder_params,
    coma_dict: Dict[str, Any],
    obj_verts: np.ndarray,        # (O, 3) raw pcd points
    obj_normals: np.ndarray,      # (O, 3)
    reference_object_vertex_index: int = 0,
    contact_threshold: float = 0.3,
    scale_factor: float = 1.0,
    num_iters: int = 2000,
    lr: float = 1e-2,
    body_pose_weight: float = 4.78,
    bending_prior_weight: float = 1.2,
    pprior_weight: float = 1e1,
    orientation_weight: float = 1e12,
    contact_weight: float = 2.6e11,
    collision_weight: float = 1e9,
    use_collision: bool = False,
    betas: Optional[np.ndarray] = None,
    eps: float = 1e-6,
) -> HOIOptResult:
    """The full 2000-step fit as one jitted program."""
    orientation_gt, sel_h, corr_o = derive_targets_from_coma(
        coma_dict, reference_object_vertex_index, contact_threshold
    )
    decoder = VPoserDecoder()

    obj_verts_j = jnp.asarray(obj_verts, jnp.float32)
    obj_normals_j = normalize_vectors(jnp.asarray(obj_normals, jnp.float32), eps)
    ref_normal = obj_normals_j[reference_object_vertex_index : reference_object_vertex_index + 1]
    orientation_gt_j = jnp.asarray(orientation_gt, jnp.float32)
    sel_h_j = jnp.asarray(sel_h)
    corr_o_j = jnp.asarray(corr_o)
    faces = jnp.asarray(smplx_model.faces_array)
    p = jnp.asarray(coma_dict.get("principle_vec", [0, 0, 1]), jnp.float32)
    q = jnp.asarray(coma_dict.get("sub_principle_vec", [0, 1, 0]), jnp.float32)
    betas_j = (
        jnp.asarray(betas, jnp.float32).reshape(1, -1)
        if betas is not None
        else jnp.zeros((1, smplx_model.shapedirs.shape[-1]), jnp.float32)
    )

    params = dict(
        pose_embedding=jnp.zeros((1, 32), jnp.float32),
        global_orient=jnp.zeros((1, 3), jnp.float32),
        transl=jnp.asarray([[3.0, 1.0, 0.0]], jnp.float32),
        left_hand_pose=jnp.zeros((1, 45), jnp.float32),
        right_hand_pose=jnp.zeros((1, 45), jnp.float32),
    )

    def forward(prm):
        body_pose = decoder.apply(vposer_decoder_params, prm["pose_embedding"])
        verts, joints = smplx_forward(
            smplx_model,
            betas=betas_j,
            global_orient=prm["global_orient"],
            body_pose=body_pose,
            left_hand_pose=prm["left_hand_pose"],
            right_hand_pose=prm["right_hand_pose"],
            transl=prm["transl"],
        )
        return verts[0] * scale_factor, joints[0] * scale_factor, body_pose

    def losses_fn(prm):
        verts, joints, body_pose = forward(prm)
        human_normals = vertex_normals_jax(verts, faces, eps)
        # canonicalize only wrt the reference object normal: (H, 1, 3)
        canon = canonicalize_pairwise(human_normals, ref_normal, p, q, eps)[:, 0, :]
        align = jnp.sum(orientation_gt_j * canon, axis=-1)
        orient = jnp.mean(jnp.nan_to_num(1.0 - (align + 1.0) / 2.0)) * orientation_weight

        contact = (
            chamfer_distance(verts[sel_h_j], obj_verts_j[corr_o_j]) * contact_weight
            if len(sel_h) > 0
            else 0.0
        )
        pprior = l2_prior(prm["pose_embedding"]) * body_pose_weight**2 * pprior_weight
        angle = jnp.sum(smplify_angle_prior(body_pose)) * bending_prior_weight

        total = orient + contact + pprior + angle
        coll = 0.0
        if use_collision:
            weights = sample_scene_points_bbox(obj_verts_j, verts)
            occ = capsule_occupancy(obj_verts_j, joints, smplx_model.parents)
            coll = collision_loss(occ * weights) * collision_weight
            total = total + coll
        return total, dict(orientation=orient, contact=contact, pprior=pprior, angle=angle)

    optimizer = optax.adam(lr)

    @jax.jit
    def run(prm):
        state = optimizer.init(prm)

        def step(carry, _):
            prm, state = carry
            loss_val, grads = jax.value_and_grad(lambda x: losses_fn(x)[0])(prm)
            updates, state = optimizer.update(grads, state, prm)
            prm = optax.apply_updates(prm, updates)
            return (prm, state), loss_val

        (prm, _), losses = jax.lax.scan(step, (prm, state), None, length=num_iters)
        return prm, losses

    params, loss_hist = run(params)
    verts, _, _ = forward(params)
    _, parts = losses_fn(params)
    return HOIOptResult(
        vertices=np.asarray(verts),
        faces=np.asarray(smplx_model.faces_array),
        losses={k: float(v) for k, v in parts.items()},
    )


def save_optimized_obj(result: HOIOptResult, save_dir: str, supercategory: str, category: str) -> str:
    from coma_tpu.geometry.mesh import save_obj

    out_dir = f"{save_dir}/{supercategory}/{category}"
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/optimized.obj"
    save_obj(path, result.vertices, result.faces)
    return path
