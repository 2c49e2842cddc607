"""Property + oracle tests for the relative-normal canonicalization."""
import numpy as np
import jax.numpy as jnp

from coma_tpu.affordance.canonicalize import canonicalize_pairwise
from tests.oracles import canonicalize_oracle

P = np.array([0.0, 0.0, 1.0])
SUB_P = np.array([0.0, 1.0, 0.0])


def random_unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_matches_rotation_oracle(rng):
    a = random_unit(rng, 7)
    b = random_unit(rng, 5)
    # keep b away from the -p singularity for the regular-branch check
    b = b[b[:, 2] > -0.95]
    got = np.asarray(canonicalize_pairwise(jnp.array(a), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    want = canonicalize_oracle(a, b, P, SUB_P)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_b_equals_p_is_identity(rng):
    a = random_unit(rng, 6)
    b = P[None, :]
    got = np.asarray(canonicalize_pairwise(jnp.array(a), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    np.testing.assert_allclose(got[:, 0, :], a, atol=1e-5)


def test_b_maps_to_p(rng):
    """Canonicalizing b with respect to itself must land exactly on p."""
    b = random_unit(rng, 8)
    got = np.asarray(canonicalize_pairwise(jnp.array(b), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    diag = got[np.arange(8), np.arange(8)]
    np.testing.assert_allclose(diag, np.tile(P, (8, 1)), atol=2e-5)


def test_antipodal_branch():
    """b = -p takes the 180°-about-sub_p branch: a -> 2(a·q)q - a."""
    a = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    b = -P[None, :]
    got = np.asarray(canonicalize_pairwise(jnp.array(a), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    want = np.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    np.testing.assert_allclose(got[:, 0, :], want, atol=1e-6)


def test_results_are_unit(rng):
    a = random_unit(rng, 10)
    b = random_unit(rng, 9)
    got = np.asarray(canonicalize_pairwise(jnp.array(a), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_preserves_angle_between_a_and_b(rng):
    """Rotation preserves angles: angle(canon_a, p) == angle(a, b)."""
    a = random_unit(rng, 6)
    b = random_unit(rng, 6)
    b = np.where(b[:, 2:3] < -0.9, -b, b)
    got = np.asarray(canonicalize_pairwise(jnp.array(a), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    want = a @ b.T                       # cos(angle(a_i, b_j))
    have = got @ P                       # cos(angle(canon, p))
    np.testing.assert_allclose(have, want, atol=2e-5)


def test_unnormalized_inputs_are_normalized_first(rng):
    a = random_unit(rng, 4)
    b = random_unit(rng, 3)
    b = np.where(b[:, 2:3] < -0.9, -b, b)
    got1 = np.asarray(canonicalize_pairwise(jnp.array(3.0 * a), jnp.array(0.5 * b), jnp.array(2 * P), jnp.array(SUB_P)))
    got2 = np.asarray(canonicalize_pairwise(jnp.array(a), jnp.array(b), jnp.array(P), jnp.array(SUB_P)))
    np.testing.assert_allclose(got1, got2, atol=1e-5)
