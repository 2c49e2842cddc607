"""Vector/rotation transform primitives (pure JAX).

Reference parity: ``utils/transformations.py`` (normalize_vectors_*,
batch_rodrigues) — re-derived from the underlying math, jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_vectors(v: jax.Array, eps: float = 1e-8) -> jax.Array:
    """L2-normalize vectors along the last axis.

    Matches the semantics of ``utils/transformations.py:normalize_vectors_torch``
    (norm clamped below by ``eps`` so zero vectors stay zero instead of NaN).
    """
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def rodrigues(rotvec: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle vectors ``(..., 3)`` -> rotation matrices ``(..., 3, 3)``.

    Reference parity: ``utils/transformations.py:batch_rodrigues`` and
    ``smplx/lbs.py:batch_rodrigues``. Formulated on the UNNORMALIZED axis,
    R = I + A·K + B·K² with A = sinθ/θ, B = (1-cosθ)/θ², switching to the
    Taylor expansion near θ = 0 — value AND gradient are exact at the
    identity (norm-then-normalize is NaN-gradient at zero, which poisons
    optimizers that start from zero rotations).
    """
    n2 = jnp.sum(rotvec * rotvec, axis=-1)[..., None, None]
    ok = n2 > eps * eps
    theta = jnp.sqrt(jnp.where(ok, n2, 1.0))
    A = jnp.where(ok, jnp.sin(theta) / theta, 1.0 - n2 / 6.0)
    B = jnp.where(ok, (1.0 - jnp.cos(theta)) / jnp.where(ok, n2, 1.0), 0.5 - n2 / 24.0)

    K = skew(rotvec)  # unnormalized
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), K.shape)
    return eye + A * K + B * (K @ K)


def skew(v: jax.Array) -> jax.Array:
    """Cross-product (skew-symmetric) matrix of ``(..., 3)`` vectors.

    ``skew(v) @ u == cross(v, u)``. NOTE: the reference builds this matrix
    with a misplaced element (``utils/coma.py:149-156`` writes ``b[:,0]`` to
    ``[0,0]`` instead of ``[2,1]``), which is only observable when the
    principal vector has a non-zero x/y component; all shipped configs use
    ``p=[0,0,1]`` where both agree. We implement the correct matrix.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_to_rotmat(quat: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Quaternions ``(..., 4)`` (w, x, y, z) -> rotation matrices ``(..., 3, 3)``.

    Reference parity: ``utils/transformations.py:quat_to_rotmat``.
    """
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), eps)
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot6d_to_rotmat(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Continuous 6D rotation representation -> rotation matrices.

    Used by the VPoser decoder (reference: ``imports/vposer/vposer_smpl.py:43``)
    and Hand4Whole's RotationNet. Gram-Schmidt of two 3-vectors.
    """
    a1, a2 = x[..., :3], x[..., 3:6]
    b1 = normalize_vectors(a1, eps)
    b2 = normalize_vectors(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1, eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rigid_align_np(src, dst):
    """Least-squares rigid transform (Kabsch): R, t with dst ≈ src @ R.T + t.

    Host-side numpy (used by the optimize_depth CLI to align regressed LBS
    vertices onto pixel-lifted world vertices before posing COAP's bone
    frames; correspondence is by index)."""
    import numpy as np

    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    sc, dc = src.mean(axis=0), dst.mean(axis=0)
    H = (src - sc).T @ (dst - dc)
    U, _, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    t = dc - R @ sc
    return R.astype(np.float32), t.astype(np.float32)
