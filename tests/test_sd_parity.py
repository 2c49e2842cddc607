"""Architectural parity of the Flax SD UNet/VAE vs independent torch mirrors.

VERDICT r1 gap #2: prove the converter + architecture against real diffusers
*semantics*, not just name round-trips. ``tests/torch_sd_mirror.py``
re-implements the diffusers forwards in torch with the exact checkpoint key
layout; here we random-init the mirrors, convert their ``state_dict()``
through ``convert_unet``/``convert_vae`` (the same code path a downloaded
checkpoint takes), and compare forwards at f32.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from coma_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
from coma_tpu.models.diffusion.vae import Decoder, Encoder, VAEConfig
from coma_tpu.models.diffusion.weights import convert_unet, convert_vae

from tests.torch_sd_mirror import AutoencoderKLMirror, UNetMirror

ATOL = 2e-4


def _np_state_dict(module: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def unet_pair():
    torch.manual_seed(0)
    mirror = UNetMirror(
        in_channels=9, out_channels=4, block_out_channels=(32, 64, 64, 64),
        layers_per_block=1, cross_attention_dim=32, heads=2, groups=8,
        cross_attn_blocks=(True, True, True, False),
    ).eval()
    cfg = UNetConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=2, norm_num_groups=8,
        dtype=jnp.float32,
    )
    params = convert_unet(_np_state_dict(mirror), cfg, dtype=jnp.float32)
    return mirror, UNet2DCondition(cfg), params


@pytest.mark.slow
def test_unet_forward_parity(unet_pair, rng):
    mirror, flax_model, params = unet_pair
    B, H = 2, 16
    sample = rng.normal(size=(B, H, H, 9)).astype(np.float32)
    context = rng.normal(size=(B, 7, 32)).astype(np.float32)
    t = np.array([1.0, 501.0], np.float32)

    with torch.no_grad():
        ref = mirror(
            torch.from_numpy(sample).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(context),
        ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(
        flax_model.apply(params, jnp.asarray(sample), jnp.asarray(t), jnp.asarray(context))
    )
    assert ours.shape == ref.shape == (B, H, H, 4)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


@pytest.mark.slow
def test_unet_forward_parity_sd2_heads(rng):
    """SD-2.x head layout: diffusers stores per-block head COUNTS
    (``attention_head_dim: [5, 10, 20, 20]`` in
    stable-diffusion-2-inpainting's unet config). A tiny config with distinct
    per-block counts must match the mirror given the same list."""
    torch.manual_seed(1)
    heads = (1, 2, 4, 4)
    mirror = UNetMirror(
        in_channels=9, out_channels=4, block_out_channels=(32, 64, 64, 64),
        layers_per_block=1, cross_attention_dim=48, heads=heads, groups=8,
        cross_attn_blocks=(True, True, True, False),
    ).eval()
    cfg = UNetConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        cross_attention_dim=48, heads_per_block=heads, norm_num_groups=8,
        dtype=jnp.float32,
    )
    params = convert_unet(_np_state_dict(mirror), cfg, dtype=jnp.float32)

    gen = np.random.default_rng(7)
    sample = gen.normal(size=(2, 16, 16, 9)).astype(np.float32)
    context = gen.normal(size=(2, 7, 48)).astype(np.float32)
    t = np.array([11.0, 801.0], np.float32)
    with torch.no_grad():
        ref = mirror(
            torch.from_numpy(sample).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(context),
        ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(
        UNet2DCondition(cfg).apply(
            params, jnp.asarray(sample), jnp.asarray(t), jnp.asarray(context)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


@pytest.mark.slow
def test_unet_timestep_sensitivity(unet_pair, rng):
    """The sinusoidal embedding convention (cos|sin flip) must match — an
    embedding order bug would still pass a single-timestep test by luck."""
    mirror, flax_model, params = unet_pair
    sample = rng.normal(size=(1, 8, 8, 9)).astype(np.float32)
    context = rng.normal(size=(1, 4, 32)).astype(np.float32)
    for tv in (0.0, 47.0, 999.0):
        t = np.array([tv], np.float32)
        with torch.no_grad():
            ref = mirror(
                torch.from_numpy(sample).permute(0, 3, 1, 2),
                torch.from_numpy(t), torch.from_numpy(context),
            ).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(
            flax_model.apply(params, jnp.asarray(sample), jnp.asarray(t), jnp.asarray(context))
        )
        np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


@pytest.fixture(scope="module")
def vae_pair():
    torch.manual_seed(1)
    mirror = AutoencoderKLMirror(
        in_channels=3, chs=(16, 16, 32, 32), layers_per_block=1, groups=8, latent=4
    ).eval()
    cfg = VAEConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        norm_num_groups=8, dtype=jnp.float32,
    )
    enc_vars, dec_vars = convert_vae(_np_state_dict(mirror), cfg, dtype=jnp.float32)
    return mirror, Encoder(cfg), enc_vars, Decoder(cfg), dec_vars


def test_vae_encode_parity(vae_pair, rng):
    mirror, enc, enc_vars, _, _ = vae_pair
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = mirror.encode_moments(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(enc.apply(enc_vars, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 4, 4, 8)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


def test_vae_decode_parity(vae_pair, rng):
    mirror, _, _, dec, dec_vars = vae_pair
    z = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = mirror.decode(
            torch.from_numpy(z).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(dec.apply(dec_vars, jnp.asarray(z)))
    assert ours.shape == ref.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-3)


def test_vae_roundtrip_parity(vae_pair, rng):
    """Encode -> take the mean -> decode, both stacks end to end (the exact
    x̂0-decode / mask-latent-re-encode path the adaptive-mask loop hits
    ~21x per image, adaptive_mask_inpainting.py:1028-1155)."""
    mirror, enc, enc_vars, dec, dec_vars = vae_pair
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        m = mirror.encode_moments(torch.from_numpy(x).permute(0, 3, 1, 2))
        mean = m[:, :4]
        ref = mirror.decode(mean).permute(0, 2, 3, 1).numpy()
    moments = enc.apply(enc_vars, jnp.asarray(x))
    mean_ours = moments[..., :4]
    ours = np.asarray(dec.apply(dec_vars, mean_ours))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
