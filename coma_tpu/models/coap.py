"""COAP-style body occupancy + collision losses.

Reference parity: ``imports/coap/`` — ``attach_coap`` monkey-patches a
neural-implicit occupancy model (PointNet part encoders + implicit decoder,
``coap.py:COAPBodyModel:597``: per-part query, bbox gating, max over parts)
onto an SMPL-X model; the pipeline consumes only ``collision_loss`` =
Σ relu(occupancy − 0.5) over scene points (``optimize_depth.py:752``,
``application/optimize.py:301``).

Two interchangeable occupancy backends:
- :class:`COAPOccupancy` — the neural architecture (ResnetPointnet +
  ImplicitNet, faithful to ``imports/coap/modules.py``) for loading the
  published checkpoint (license-gated, user-provided).
- :func:`capsule_occupancy` — a geometric per-bone capsule field derived
  from the posed joints: fully differentiable, weight-free, keeps the
  pipeline runnable without external checkpoints. Smooth occupancy
  σ((r_bone − dist) / τ) matches COAP's level-set semantics (0.5 at the
  surface).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# --------------------------------------------------------------------------
# Neural backend (architecture for the published weights)
# --------------------------------------------------------------------------

class ResnetBlockFC(nn.Module):
    """FC ResNet block (reference: ``imports/coap/modules.py:64-105``)."""

    size_out: int
    size_h: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        size_h = self.size_h or min(x.shape[-1], self.size_out)
        net = nn.Dense(size_h, name="fc_0")(nn.relu(x))
        dx = nn.Dense(self.size_out, name="fc_1")(nn.relu(net))
        if x.shape[-1] != self.size_out:
            x = nn.Dense(self.size_out, use_bias=False, name="shortcut")(x)
        return x + dx


class ResnetPointnet(nn.Module):
    """PointNet encoder with max-pool context (``modules.py:7-62``)."""

    out_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, p):  # (B, T, dim)
        def pool_cat(net):
            pooled = jnp.max(net, axis=1, keepdims=True)
            return jnp.concatenate(
                [net, jnp.broadcast_to(pooled, net.shape)], axis=-1
            )

        net = nn.Dense(2 * self.hidden_dim, name="fc_pos")(p)
        net = ResnetBlockFC(self.hidden_dim, name="block_0")(net)
        net = ResnetBlockFC(self.hidden_dim, name="block_1")(pool_cat(net))
        net = ResnetBlockFC(self.hidden_dim, name="block_3")(pool_cat(net))
        net = ResnetBlockFC(self.hidden_dim, name="block_4")(pool_cat(net))
        net = jnp.max(net, axis=1)
        return nn.Dense(self.out_dim, name="fc_c")(nn.relu(net))


class ImplicitNet(nn.Module):
    """IGR-style MLP (``modules.py:108-165``): softplus(beta=100) hidden
    activations, skip connections that re-concatenate the input.

    Layer ``lin{i}`` sizing follows the reference exactly: when layer i+1 is
    a skip layer, lin{i}'s output is ``dims[i+1] - d_in`` so the concatenated
    width comes back to ``dims[i+1]``. No activation after the final layer.
    """

    d_out: int = 1
    dims: Tuple[int, ...] = (256, 256, 256)
    skip_in: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x):
        inp = x
        d_in = x.shape[-1]
        all_dims = (d_in,) + tuple(self.dims) + (self.d_out,)
        n_layers = len(all_dims) - 1
        for layer in range(n_layers):
            out_dim = all_dims[layer + 1]
            if layer + 1 in self.skip_in:
                out_dim -= d_in
            if layer in self.skip_in:
                x = jnp.concatenate([x, inp], axis=-1) / jnp.sqrt(2.0)
            x = nn.Dense(out_dim, name=f"lin{layer}")(x)
            if layer < n_layers - 1:
                x = nn.softplus(x * 100.0) / 100.0
        return x


@dataclasses.dataclass(frozen=True)
class COAPConfig:
    """Published-checkpoint hyperparameters (``coap.py:602-620``)."""

    num_parts: int = 20            # SMPL-X after MERGE_BODY_PARTS
    code_dim: int = 128
    hidden_dim: int = 128
    query_dims: Tuple[int, ...] = (256, 256, 256)
    query_skip: Tuple[int, ...] = (2,)
    query_out: int = 128
    decoder_dims: Tuple[int, ...] = (256, 256, 256, 256, 256, 256)
    decoder_skip: Tuple[int, ...] = (3,)
    level_set: float = 0.5


class COAPOccupancy(nn.Module):
    """Per-part encode + query-encode + implicit decode + max over parts.

    Faithful to ``coap.py:COAPBodyModel.query:688-725``: query feature =
    [local_query(3), inside_bbox(1), part one-hot(K), latent(code_dim)] ->
    query_encoder -> concat local_query again -> decoder -> sigmoid(-x),
    gated by inside_bbox, max over parts. Query points must already be in
    per-part local frames (bone transforms from the LBS relative transforms,
    as :mod:`coma_tpu.models.coap_partition` computes them).
    """

    config: COAPConfig = COAPConfig()

    @nn.compact
    def __call__(self, part_points, query_local, inside_bbox):
        """part_points (K, T, 3) local part clouds; query_local (K, Q, 3)
        queries in part frames; inside_bbox (K, Q) gating in {0, 1}.
        Returns (Q,) occupancy in [0, 1]."""
        cfg = self.config
        codes = ResnetPointnet(cfg.code_dim, cfg.hidden_dim, name="encoder")(
            part_points
        )                                                  # (K, code)
        K, Q, _ = query_local.shape
        one_hot = jnp.broadcast_to(
            jnp.eye(K, dtype=query_local.dtype)[:, None, :], (K, Q, K)
        )
        z = jnp.concatenate(
            [
                query_local,
                inside_bbox[..., None].astype(query_local.dtype),
                one_hot,
                jnp.broadcast_to(codes[:, None, :], (K, Q, cfg.code_dim)),
            ],
            axis=-1,
        )
        z = ImplicitNet(cfg.query_out, cfg.query_dims, cfg.query_skip,
                        name="query_encoder")(z)           # (K, Q, 128)
        z = jnp.concatenate([query_local, z], axis=-1)
        raw = ImplicitNet(1, cfg.decoder_dims, cfg.decoder_skip,
                          name="decoder")(z)[..., 0]       # (K, Q)
        occ = jax.nn.sigmoid(-raw) * inside_bbox
        return jnp.max(occ, axis=0)


# --------------------------------------------------------------------------
# Geometric capsule backend (weight-free, differentiable)
# --------------------------------------------------------------------------

def capsule_occupancy(
    points: jax.Array,        # (Q, 3) query points (world)
    joints: jax.Array,        # (J, 3) posed joints (world)
    parents: Tuple[int, ...],
    radii: Optional[jax.Array] = None,   # (J,) per-bone radius
    sharpness: float = 30.0,
) -> jax.Array:
    """Smooth occupancy of a capsule skeleton: σ(κ(r − d(point, bone))).

    0.5 exactly on the capsule surface (COAP's level set); union via max
    over bones like COAP's max over parts.
    """
    if radii is None:
        radii = jnp.full((len(parents),), 0.07, dtype=points.dtype)

    def bone_dist(j):
        parent = parents[j]
        a = joints[parent if parent >= 0 else j]
        b = joints[j]
        ab = b - a
        denom = jnp.maximum(jnp.sum(ab * ab), 1e-9)
        t = jnp.clip(((points - a) @ ab) / denom, 0.0, 1.0)
        closest = a + t[:, None] * ab
        diff = points - closest
        # safe norm: d(||x||)/dx is NaN at 0, and a query point exactly on
        # the bone axis is a legal input (it is maximally inside the capsule)
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

    dists = jnp.stack([bone_dist(j) for j in range(len(parents))])  # (J, Q)
    occ = jax.nn.sigmoid(sharpness * (radii[:, None] - dists))
    return jnp.max(occ, axis=0)


def collision_loss(
    occupancy: jax.Array, level_set: float = 0.5
) -> jax.Array:
    """Σ relu(occ − level_set) (reference: ``coap.py:collision_loss:732-742``)."""
    return jnp.sum(jax.nn.relu(occupancy - level_set))


def sample_scene_points_bbox(
    scene_points: jax.Array,  # (N, 3)
    verts: jax.Array,         # (V, 3) posed human vertices
) -> jax.Array:
    """Mask of scene points within the human's bbox (the reference's cheap
    pre-filter, ``optimize_depth.py:sample_scene_points:105-124``); returned
    as a (N,) weight so the jitted loss stays static-shaped."""
    lo = jnp.min(verts, axis=0)
    hi = jnp.max(verts, axis=0)
    inside = jnp.all((scene_points >= lo) & (scene_points <= hi), axis=-1)
    return inside.astype(scene_points.dtype)


# --------------------------------------------------------------------------
# world-space query: partition + frames + bbox gate + neural occupancy
# --------------------------------------------------------------------------

def coap_occupancy_world(
    occ_model,                 # COAPOccupancy
    variables,                 # converted checkpoint params
    partition,                 # coap_partition.BodyPartition
    rest_joints: jax.Array,    # (J, 3)
    rel_transforms: jax.Array, # (J, 4, 4) from the LBS (batch_rigid_transform)
    translation: jax.Array,    # (3,) rigid body translation (e.g. transl/depth)
    verts_world: jax.Array,    # (V, 3) posed+translated human vertices
    query_points: jax.Array,   # (Q, 3) world scene points
) -> jax.Array:
    """The reference's ``coap.py:query:688-725`` end to end: canonicalize the
    per-part vertex clouds and the query points into bone-local frames
    (translation folded into the frames), gate by padded part bboxes, run the
    neural occupancy, max over parts. Returns (Q,) occupancy."""
    from coma_tpu.models.coap_partition import (
        bone_local_frames,
        part_bbox_gate,
        to_part_local,
    )

    frames = bone_local_frames(rel_transforms, rest_joints, partition.part_joint)
    # world -> local must undo the rigid translation first:
    # local = R_inv (x - (t + d)) = frames @ (x - d)
    frames = frames.at[:, :3, 3].add(
        -jnp.einsum("kij,j->ki", frames[:, :3, :3], translation)
    )
    part_pts = verts_world[jnp.asarray(partition.part_vertex_ids)]   # (K, M, 3)
    homo = jnp.concatenate(
        [part_pts, jnp.ones(part_pts.shape[:2] + (1,), part_pts.dtype)], axis=-1
    )
    local_parts = jnp.einsum("kij,kmj->kmi", frames, homo)[..., :3]
    query_local = to_part_local(query_points, frames)
    inside = part_bbox_gate(
        local_parts, jnp.asarray(partition.part_vertex_valid), query_local,
        bbox_padding=1.125,  # coap.py:603 (bbox_padding)
    )
    return occ_model.apply(variables, local_parts, query_local, inside)


# OpenPose BODY_25 skeleton (the 25-joint body subset optimize_depth works
# in, models/keypoints.py:SMPLX_TO_OPENPOSE_BODY): parent index per joint,
# -1 = root (MidHip). Used by the weight-free capsule fallback.
BODY25_PARENTS = (
    1, 8, 1, 2, 3, 1, 5, 6, -1, 8, 9, 10, 8, 12, 13,
    0, 0, 15, 16, 14, 19, 14, 11, 22, 11,
)
# Per-bone capsule radii (meters): torso/head thicker than limbs/feet.
BODY25_RADII = (
    0.08, 0.10, 0.09, 0.05, 0.04, 0.09, 0.05, 0.04, 0.12, 0.10, 0.07, 0.05,
    0.10, 0.07, 0.05, 0.07, 0.07, 0.06, 0.06, 0.03, 0.03, 0.04, 0.03, 0.03,
    0.04,
)


def pad_scene_points(
    points: np.ndarray, max_points: int, dtype=np.float32
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/trim (N, 3) scene points to (max_points, 3) + (max_points,) valid
    mask. Pad slots sit at 1e6 so they fall outside every bbox gate; the
    valid mask zeroes any residual occupancy before the collision sum."""
    pts = np.full((max_points, 3), 1e6, dtype=dtype)
    valid = np.zeros((max_points,), dtype=dtype)
    n = min(len(points), max_points)
    if n:
        pts[:n] = points[:n]
        valid[:n] = 1.0
    return pts, valid


def make_capsule_collision_aux_fn(
    parents: Tuple[int, ...] = BODY25_PARENTS,
    radii=None,
    sharpness: float = 30.0,
    level_set: float = 0.5,
):
    """Weight-free collision term for the *batched* depth optimizer.

    The returned ``fn(verts_world, aux)`` is vmappable over samples: all
    per-sample state rides in ``aux`` = dict(joints (J,3) at zero
    displacement, base_centroid (3,), scene_points (Q,3), scene_valid (Q,)).
    The rigid displacement is recovered as the centroid shift (the depth
    optimizer only translates the body along the camera ray).
    """
    radii_arr = jnp.asarray(
        radii if radii is not None else BODY25_RADII[: len(parents)], jnp.float32
    )

    def fn(verts_world, aux):
        d = jnp.mean(verts_world, axis=0) - aux["base_centroid"]
        occ = capsule_occupancy(
            aux["scene_points"], aux["joints"] + d[None], parents, radii_arr,
            sharpness,
        )
        return collision_loss(occ * aux["scene_valid"], level_set)

    return fn


def make_coap_collision_aux_fn(occ_model, variables, partition, level_set: float = 0.5):
    """Neural-COAP collision term for the *batched* depth optimizer
    (reference default: ``optimize_depth.py:752-762``, w=0.4).

    Per-sample aux = dict(rest_joints (J,3), rel_transforms (J,4,4) from the
    LBS, translation (3,) rigid offset from LBS space to world at zero
    displacement, base_centroid (3,), scene_points (Q,3), scene_valid (Q,)).
    """

    def fn(verts_world, aux):
        d = jnp.mean(verts_world, axis=0) - aux["base_centroid"]
        occ = coap_occupancy_world(
            occ_model, variables, partition, aux["rest_joints"],
            aux["rel_transforms"], aux["translation"] + d, verts_world,
            aux["scene_points"],
        )
        return collision_loss(occ * aux["scene_valid"], level_set)

    return fn


def make_coap_collision_fn(
    occ_model,
    variables,
    partition,
    rest_joints: jax.Array,
    rel_transforms: jax.Array,
    base_verts: jax.Array,     # (V, 3) posed verts at zero displacement
    scene_points: jax.Array,   # (Q, 3)
    level_set: float = 0.5,
):
    """Adapter for :func:`coma_tpu.lifting.depth_optimize`'s ``collision_fn``
    hook (the reference's neural-COAP term, ``optimize_depth.py:752``, w=0.4).

    The depth optimizer only rigidly translates the body, so the rigid
    displacement is recovered exactly as the centroid shift from
    ``base_verts`` and folded into the bone frames."""
    base_centroid = jnp.mean(base_verts, axis=0)

    def collision_fn(verts_world):
        d = jnp.mean(verts_world, axis=0) - base_centroid
        occ = coap_occupancy_world(
            occ_model, variables, partition, rest_joints, rel_transforms,
            d, verts_world, scene_points,
        )
        return collision_loss(occ, level_set)

    return collision_fn
