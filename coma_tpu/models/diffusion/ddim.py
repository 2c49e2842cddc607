"""DDIM scheduler as pure JAX functions over a static config.

Reference parity: HF diffusers' DDIMScheduler as configured by the
reference's pipeline (``src/generation/inpaint.py:54-60``): scaled_linear
betas 0.00085 -> 0.012 over 1000 train steps, ``clip_sample=False``,
``set_alpha_to_one=False``, eta=0 (deterministic), epsilon prediction,
'leading' timestep spacing with ``steps_offset=0``.

Everything here is trace-time static except the latents/noise, so the whole
sampler loop compiles into one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed schedule tables (numpy, baked into the jitted program)."""

    timesteps: np.ndarray        # (n,) int32, descending
    alphas_cumprod: np.ndarray   # (T,) f32
    final_alpha_cumprod: float
    num_train_timesteps: int
    num_inference_steps: int

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    @property
    def prev_timesteps(self) -> np.ndarray:
        return self.timesteps - self.num_train_timesteps // self.num_inference_steps

    def alpha_prod(self, t: np.ndarray) -> np.ndarray:
        """alphas_cumprod[t], with final_alpha_cumprod for t < 0."""
        t = np.asarray(t)
        safe = np.clip(t, 0, self.num_train_timesteps - 1)
        return np.where(t >= 0, self.alphas_cumprod[safe], self.final_alpha_cumprod)


def make_ddim_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    set_alpha_to_one: bool = False,
    steps_offset: int = 0,
) -> DDIMSchedule:
    """scaled_linear betas + 'leading' timestep spacing (diffusers defaults
    as instantiated by the reference)."""
    betas = (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
        ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy()
    timesteps = timesteps.astype(np.int32) + steps_offset
    return DDIMSchedule(
        timesteps=timesteps,
        alphas_cumprod=alphas_cumprod,
        final_alpha_cumprod=float(1.0 if set_alpha_to_one else alphas_cumprod[0]),
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
    )


def ddim_step(
    schedule: DDIMSchedule,
    step_index: int,
    model_output: jax.Array,  # eps prediction, same shape as sample
    sample: jax.Array,        # x_t
) -> Tuple[jax.Array, jax.Array]:
    """One deterministic DDIM step at static ``step_index``.

    Returns ``(prev_sample x_{t-1}, pred_original_sample x̂0)`` — the
    reference consumes both (``adaptive_mask_inpainting.py:1015-1028``).
    """
    t = int(schedule.timesteps[step_index])
    prev_t = t - schedule.num_train_timesteps // schedule.num_inference_steps
    a_t = float(schedule.alpha_prod(t))
    a_prev = float(schedule.alpha_prod(prev_t))

    pred_x0 = (sample - (1.0 - a_t) ** 0.5 * model_output) / a_t**0.5
    direction = (1.0 - a_prev) ** 0.5 * model_output
    prev_sample = a_prev**0.5 * pred_x0 + direction
    return prev_sample, pred_x0


def ddim_step_traced(
    schedule: DDIMSchedule,
    step_index: jax.Array,    # traced int32 (for lax.scan/fori loops)
    model_output: jax.Array,
    sample: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Traced-index variant: gathers a_t/a_prev from baked-in tables."""
    a_t_tab = jnp.asarray(schedule.alpha_prod(schedule.timesteps), dtype=sample.dtype)
    a_prev_tab = jnp.asarray(
        schedule.alpha_prod(schedule.prev_timesteps), dtype=sample.dtype
    )
    a_t = a_t_tab[step_index]
    a_prev = a_prev_tab[step_index]
    pred_x0 = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
    direction = jnp.sqrt(1.0 - a_prev) * model_output
    prev_sample = jnp.sqrt(a_prev) * pred_x0 + direction
    return prev_sample, pred_x0


def add_noise(
    schedule: DDIMSchedule,
    original: jax.Array,
    noise: jax.Array,
    timestep,
) -> jax.Array:
    """q(x_t | x_0): sqrt(ᾱ_t)·x0 + sqrt(1-ᾱ_t)·ε."""
    a = jnp.asarray(schedule.alphas_cumprod, dtype=original.dtype)[timestep]
    return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise


def inpaint_timesteps(
    schedule: DDIMSchedule, strength: float
) -> Tuple[np.ndarray, int]:
    """The inpaint pipeline's strength-truncated timestep list (diffusers
    ``get_timesteps``, reference ``adaptive_mask_inpainting.py:722-730``)."""
    init_timestep = min(
        int(schedule.num_inference_steps * strength), schedule.num_inference_steps
    )
    t_start = max(schedule.num_inference_steps - init_timestep, 0)
    return schedule.timesteps[t_start:], t_start
