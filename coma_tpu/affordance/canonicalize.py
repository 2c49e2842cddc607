"""Relative-normal canonicalization (pure JAX).

The core geometric operation of ComA (reference:
``utils/coma.py:canonicalize_a_wrt_b_to_p:123-172``): for every pair of
normals ``(a_i, b_j)``, rotate ``a_i`` by the rotation ``R(b_j -> p)`` that
takes ``b_j`` onto the principal axis ``p``. The result is the "relative
normal" of ``a`` in the frame where ``b`` is canonical.

Derivation (not a translation of the reference's code): for unit vectors
``b, p`` with ``c = b·p`` and ``w = b×p``, the Rodrigues rotation taking
``b`` to ``p`` applied to ``a`` is

    R a = a·w / (1+c) · w  +  c·a  +  (a·b)·p  -  (a·p)·b

which is singular at ``c = -1`` (b antiparallel to p); there the reference
falls back to a 180° rotation about the sub-principal axis ``q`` (orthogonal
to ``p``): ``R a = 2 (a·q) q - a``. We match both branches and the trailing
re-normalization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from coma_tpu.geometry.transforms import normalize_vectors


def canonicalize_pairwise(
    a: jax.Array,      # (A, 3) normals to transform
    b: jax.Array,      # (B, 3) normals defining the canonicalizing rotation
    p: jax.Array,      # (3,) principal axis (unit, after normalization)
    sub_p: jax.Array,  # (3,) sub-principal axis, orthogonal to p
    eps: float = 1e-8,
    normalize_first: bool = True,
) -> jax.Array:
    """Rotate every ``a_i`` by ``R(b_j -> p)``. Returns ``(A, B, 3)``.

    Reference parity: ``utils/coma.py:canonicalize_a_wrt_b_to_p``. For the
    shipped configs (``p=[0,0,1]``) this is numerically identical; see
    ``coma_tpu.geometry.transforms.skew`` for the reference's skew-matrix
    quirk that only shows up for other ``p``.
    """
    if normalize_first:
        a = normalize_vectors(a, eps)
        b = normalize_vectors(b, eps)
        p = normalize_vectors(p[None, :], eps)[0]
        sub_p = normalize_vectors(sub_p[None, :], eps)[0]

    # K=3 contractions: force full-f32 accumulation — TPU matmuls default to
    # bf16 passes, which is far below the reference's f32 math.
    hi = jax.lax.Precision.HIGHEST
    dot = lambda x, y: jnp.einsum("ik,jk->ij", x, y, precision=hi)
    c = jnp.sum(b * p[None, :], axis=-1)        # (B,)   b·p
    a_dot_b = dot(a, b)                         # (A, B)
    a_dot_p = jnp.sum(a * p[None, :], axis=-1)  # (A,)
    a_dot_q = jnp.sum(a * sub_p[None, :], axis=-1)  # (A,)

    w = jnp.cross(b, p[None, :])                # (B, 3) b×p
    a_dot_w = dot(a, w)                         # (A, B)

    singular = (1.0 + c) < eps                  # (B,)  b ≈ -p

    # Regular branch; guard the 1/(1+c) pole so the masked-out lane stays finite.
    inv = jnp.where(singular, 0.0, 1.0 / jnp.where(singular, 1.0, 1.0 + c))  # (B,)
    out = (
        a_dot_w[:, :, None] * w[None, :, :] * inv[None, :, None]
        + c[None, :, None] * a[:, None, :]
        + a_dot_b[:, :, None] * p[None, None, :]
        - a_dot_p[:, None, None] * b[None, :, :]
    )                                           # (A, B, 3)

    # Singular branch: 180° about sub_p.
    flipped = 2.0 * a_dot_q[:, None] * sub_p[None, :] - a  # (A, 3)
    out = jnp.where(singular[None, :, None], flipped[:, None, :], out)

    # Re-normalize. The reference divides by the exact norm (NaN for
    # zero-normal inputs — which its pipeline drops upstream,
    # ``downsample_objects.py:30-44``); we clamp so degenerate rows yield a
    # zero vector instead of poisoning the accumulators.
    norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
    return out / jnp.maximum(norm, eps)
