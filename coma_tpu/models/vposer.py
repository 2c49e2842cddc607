"""VPoser body-pose prior VAE in Flax.

Reference parity: ``imports/vposer/vposer_smpl.py:VPoser:59`` (num_neurons
512, latentD 32, data_shape [1, 21, 3] per ``TR00_004_00_WO_accad.ini``),
continuous-6D rotation decoder (``ContinousRotReprDecoder:43``), and the
priors from ``imports/vposer/prior.py`` (SMPLify angle prior ``:53``,
L2 ``:89``). The shipped checkpoint is license-gated; ``load_torch_weights``
maps a user-provided snapshot into the Flax params.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class VPoserConfig:
    num_neurons: int = 512
    latent_dim: int = 32
    num_joints: int = 21
    dtype: jnp.dtype = jnp.float32


def rot6d_decode(x: jax.Array) -> jax.Array:
    """Continuous 6D -> rotation matrices (B*J, 3, 3), VPoser's column
    convention (reference: ``vposer_smpl.py:47-56``): input reshaped to
    (-1, 3, 2); b1 = normalize(col0); b2 = normalize(col1 - (b1·col1) b1)."""
    m = x.reshape(-1, 3, 2)

    def safe_unit(v, fallback):
        # double-where: degenerate rows take the fallback with zero (not NaN)
        # gradient — matters for fresh zero-init params where the 6D is 0
        n2 = jnp.sum(v * v, axis=1, keepdims=True)
        ok = n2 > 1e-12
        unit = v / jnp.sqrt(jnp.where(ok, n2, 1.0))
        return jnp.where(ok, unit, fallback)

    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], x.dtype), m[:, :, 0].shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], x.dtype), m[:, :, 0].shape)
    b1 = safe_unit(m[:, :, 0], ex)
    dot = jnp.sum(b1 * m[:, :, 1], axis=1, keepdims=True)
    b2 = safe_unit(m[:, :, 1] - dot * b1, ey)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrot_to_aa(rotmats: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Gradient-safe at the identity (the optimizer starts from near-identity
    poses): the axis normalization uses the double-where pattern so the
    zero-norm branch contributes a zero — not NaN — gradient.
    """
    trace = jnp.trace(rotmats, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    angle = jnp.arccos(cos)
    axis = jnp.stack(
        [
            rotmats[..., 2, 1] - rotmats[..., 1, 2],
            rotmats[..., 0, 2] - rotmats[..., 2, 0],
            rotmats[..., 1, 0] - rotmats[..., 0, 1],
        ],
        axis=-1,
    )
    n2 = jnp.sum(axis * axis, axis=-1, keepdims=True)
    safe = n2 > eps * eps
    denom = jnp.sqrt(jnp.where(safe, n2, 1.0))
    axis = jnp.where(safe, axis / denom, 0.0)
    return axis * angle[..., None]


class VPoserDecoder(nn.Module):
    """latent (B, 32) -> body pose; the half the pipeline exercises
    (``application/optimize.py:255``)."""

    config: VPoserConfig = VPoserConfig()

    @nn.compact
    def __call__(self, z, output_type: str = "aa"):
        cfg = self.config
        h = nn.leaky_relu(nn.Dense(cfg.num_neurons, name="dec_fc1")(z), 0.2)
        h = nn.leaky_relu(nn.Dense(cfg.num_neurons, name="dec_fc2")(h), 0.2)
        h = nn.Dense(cfg.num_joints * 6, name="dec_out")(h)
        rotmats = rot6d_decode(h).reshape(-1, cfg.num_joints, 3, 3)
        if output_type == "aa":
            return matrot_to_aa(rotmats).reshape(-1, cfg.num_joints * 3)
        return rotmats


class VPoserEncoder(nn.Module):
    """pose (B, 63) -> (mean, std) of the latent Normal (running-stat BN)."""

    config: VPoserConfig = VPoserConfig()

    @nn.compact
    def __call__(self, pose):
        cfg = self.config
        x = pose.reshape(pose.shape[0], -1)
        x = nn.BatchNorm(use_running_average=True, name="enc_bn1")(x)
        x = nn.leaky_relu(nn.Dense(cfg.num_neurons, name="enc_fc1")(x), 0.2)
        x = nn.BatchNorm(use_running_average=True, name="enc_bn2")(x)
        x = nn.leaky_relu(nn.Dense(cfg.num_neurons, name="enc_fc2")(x), 0.2)
        mean = nn.Dense(cfg.latent_dim, name="enc_mu")(x)
        logvar = nn.Dense(cfg.latent_dim, name="enc_logvar")(x)
        return mean, jax.nn.softplus(logvar)


# --- priors (reference: imports/vposer/prior.py) ---

ANGLE_PRIOR_IDXS = np.array([55, 58, 12, 15], dtype=np.int64) - 3  # no global pose
ANGLE_PRIOR_SIGNS = np.array([1.0, -1.0, -1.0, -1.0], dtype=np.float32)


def smplify_angle_prior(body_pose: jax.Array) -> jax.Array:
    """exp(pose[elbows, knees] * sign)² (reference: ``prior.py:53-86``)."""
    sel = body_pose[:, ANGLE_PRIOR_IDXS] * ANGLE_PRIOR_SIGNS
    return jnp.exp(sel) ** 2


def l2_prior(x: jax.Array) -> jax.Array:
    return jnp.sum(x * x)


def load_torch_weights(snapshot: Dict[str, np.ndarray], config: VPoserConfig = VPoserConfig()):
    """Map a torch VPoser state_dict (numpy-ified) into Flax param pytrees.

    Returns (encoder_vars, decoder_vars) usable with VPoserEncoder/Decoder.
    """
    g = lambda k: np.asarray(snapshot[k])
    dense = lambda k: {"kernel": g(f"{k}.weight").T, "bias": g(f"{k}.bias")}
    enc = {
        "params": {
            "enc_bn1": {"scale": g("bodyprior_enc_bn1.weight"), "bias": g("bodyprior_enc_bn1.bias")},
            "enc_fc1": dense("bodyprior_enc_fc1"),
            "enc_bn2": {"scale": g("bodyprior_enc_bn2.weight"), "bias": g("bodyprior_enc_bn2.bias")},
            "enc_fc2": dense("bodyprior_enc_fc2"),
            "enc_mu": dense("bodyprior_enc_mu"),
            "enc_logvar": dense("bodyprior_enc_logvar"),
        },
        "batch_stats": {
            "enc_bn1": {"mean": g("bodyprior_enc_bn1.running_mean"), "var": g("bodyprior_enc_bn1.running_var")},
            "enc_bn2": {"mean": g("bodyprior_enc_bn2.running_mean"), "var": g("bodyprior_enc_bn2.running_var")},
        },
    }
    dec = {
        "params": {
            "dec_fc1": dense("bodyprior_dec_fc1"),
            "dec_fc2": dense("bodyprior_dec_fc2"),
            "dec_out": dense("bodyprior_dec_out"),
        }
    }
    return enc, dec
