"""Depth optimization: Adam over a per-sample scalar displacement.

Reference parity: ``src/generation/optimize_depth.py:run_depth_optimization:432-780``
— 200 Adam steps (lr 0.01) on a single scalar ``displacement`` along the
camera front axis, minimizing w_multiview (1e-3) x the mean reprojection MSE
over the RANSAC inlier views (body joints only,
``multiview_joint_loss:371-400``) + w_collision (0.4) x the COAP collision
loss. NOTE the reference re-runs the full SMPL-X forward every step with
residual parameters that are NOT in the optimizer (``:692-696``: only
``displacement`` is optimized) — the residuals stay zero forever, so the
forward is loop-invariant; we hoist it: world joints/verts are computed once
and the optimization moves them rigidly along the ray. The gradients are
identical; thousands of samples then batch in one vmapped jit.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from coma_tpu.lifting.cameras import OrthoCamera, project_points

W_MULTIVIEW = 1e-3   # optimize_depth.py:804 (w_multiview default)
W_COLLISION = 0.4    # optimize_depth.py:805


def multiview_joint_loss(
    joints_world: jax.Array,      # (J, 3) world joints (OpenPose-25 order subset applied by caller)
    inlier_R: jax.Array,          # (K, 3, 3)
    inlier_t: jax.Array,          # (K, 3)
    inlier_joints_2d: jax.Array,  # (K, 25, 2) body joints in each inlier view
    inlier_valid: jax.Array,      # (K,) 1/0 padding mask
    scale: float,
    resolution: Tuple[int, int],
) -> jax.Array:
    """Mean over valid inlier views of the body-joint reprojection MSE.

    Reference: ``optimize_depth.py:multiview_joint_loss:371-400`` (the inner
    reduction is ``mean(sum(err², axis=1))`` over the joint axis — kept).
    """
    def per_view(R, t, j2d):
        cam = OrthoCamera(R=R, t=t, scale=scale, resolution=resolution)
        proj = project_points(cam, joints_world)[..., :2]
        return jnp.mean(jnp.sum((j2d - proj) ** 2, axis=0))

    losses = jax.vmap(per_view)(inlier_R, inlier_t, inlier_joints_2d)  # (K,)
    return jnp.sum(losses * inlier_valid) / jnp.maximum(jnp.sum(inlier_valid), 1.0)


@dataclasses.dataclass
class DepthOptResult:
    displacement: jax.Array   # (B,) optimized scalar per sample
    verts: jax.Array          # (B, V, 3) optimized world vertices
    losses: jax.Array         # (B,) final loss values


def optimize_depth_batch(
    joints_world: jax.Array,       # (B, 25, 3) body joints at displacement 0
    verts_world: jax.Array,        # (B, V, 3) vertices at displacement 0
    cam_front: jax.Array,          # (B, 3) unit camera front vectors
    inlier_R: jax.Array,           # (B, K, 3, 3) padded inlier cameras
    inlier_t: jax.Array,           # (B, K, 3)
    inlier_joints_2d: jax.Array,   # (B, K, 25, 2)
    inlier_valid: jax.Array,       # (B, K)
    scale: float,
    resolution: Tuple[int, int],
    collision_fn: Optional[Callable] = None,  # (verts (V,3)[, aux]) -> scalar loss
    collision_aux=None,  # per-sample pytree, leading axis B (vmapped with the batch)
    num_epochs: int = 200,
    lr: float = 0.01,
    w_multiview: float = W_MULTIVIEW,
    w_collision: float = W_COLLISION,
) -> DepthOptResult:
    """Optimize every sample's displacement scalar in one vmapped Adam run.

    The reference runs 200 sequential Adam steps per sample on one GPU
    process; here B samples optimize simultaneously, each with its padded
    inlier set. ``collision_fn`` is called as ``fn(verts)`` when
    ``collision_aux`` is None, else ``fn(verts, aux_i)`` with the sample's
    slice of the aux pytree (how the neural-COAP/capsule backends carry
    per-sample bone transforms and scene points through the vmap — see
    :func:`coma_tpu.models.coap.make_coap_collision_aux_fn`).
    """
    def loss_fn(d, jw, vw, front, R, t, j2d, valid, aux):
        joints = jw + d * front[None, :]
        loss = w_multiview * multiview_joint_loss(
            joints, R, t, j2d, valid, scale, resolution
        )
        if collision_fn is not None:
            moved = vw + d * front[None, :]
            c = collision_fn(moved) if collision_aux is None else collision_fn(moved, aux)
            loss = loss + w_collision * c
        return loss

    optimizer = optax.adam(lr)

    def run_one(jw, vw, front, R, t, j2d, valid, aux):
        d0 = jnp.zeros(())
        state0 = optimizer.init(d0)

        def step(carry, _):
            d, opt_state = carry
            loss, grad = jax.value_and_grad(loss_fn)(
                d, jw, vw, front, R, t, j2d, valid, aux
            )
            updates, opt_state = optimizer.update(grad, opt_state, d)
            return (d + updates, opt_state), loss

        (d, _), losses = jax.lax.scan(step, (d0, state0), None, length=num_epochs)
        final_loss = loss_fn(d, jw, vw, front, R, t, j2d, valid, aux)
        return d, vw + d * front[None, :], final_loss

    aux_axis = None if collision_aux is None else 0
    d, verts, losses = jax.vmap(run_one, in_axes=(0, 0, 0, 0, 0, 0, 0, aux_axis))(
        joints_world, verts_world, cam_front, inlier_R, inlier_t,
        inlier_joints_2d, inlier_valid, collision_aux,
    )
    return DepthOptResult(displacement=d, verts=verts, losses=losses)


def pad_inliers(
    inliers: List[dict], max_inliers: int, resolution: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad a ragged per-sample inlier list to (K, ...) arrays + valid mask.

    Each inlier dict: {'R' (3,3), 't' (3,), 'joints_2d' (25, 2)}.
    """
    K = max_inliers
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.zeros((K, 3), dtype=np.float32)
    j2d = np.zeros((K, 25, 2), dtype=np.float32)
    valid = np.zeros((K,), dtype=np.float32)
    for i, inl in enumerate(inliers[:K]):
        R[i] = inl["R"]
        t[i] = inl["t"]
        j2d[i] = inl["joints_2d"]
        valid[i] = 1.0
    return R, t, j2d, valid
