"""Per-step adaptive-mask inpainting video (the reference's
``utils/visualization/visualize_video.py``: per-step mask/image PNGs piped
through ffmpeg; here composed on the host from the pipeline's scan outputs
and written as an animated GIF — no ffmpeg in the image).

Usage::

    images, inter = pipe.generate_p(params, rng, img, mask, ctx, neg,
                                    return_intermediates=True)
    write_adaptive_mask_video(inter, vae_decode, "steps.gif", sample=0)
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def _to_uint8(img01: np.ndarray) -> np.ndarray:
    return (np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8)


def compose_step_frames(
    intermediates,
    vae_decode_fn: Callable,
    vae_scaling: float = 0.18215,
    sample: int = 0,
    every: int = 1,
) -> np.ndarray:
    """(S, B, h, w, {1,4}) scan outputs -> (S', H, 2W, 3) uint8 frames:
    decoded x̂0 on the left, the (upsampled) adaptive mask on the right."""
    import jax
    import jax.numpy as jnp

    mask_lat = np.asarray(intermediates["mask_lat"])[:, sample, ..., 0]  # (S, h, w)
    pred_x0 = np.asarray(intermediates["pred_x0"])[:, sample]            # (S, h, w, 4)
    steps = range(0, pred_x0.shape[0], every)

    decoded = vae_decode_fn(jnp.asarray(pred_x0[list(steps)]) / vae_scaling)
    decoded = np.asarray(jnp.clip(decoded / 2 + 0.5, 0, 1))             # (S', H, W, 3)
    H, W = decoded.shape[1:3]

    frames = []
    for k, img in enumerate(decoded):
        m = np.asarray(
            jax.image.resize(jnp.asarray(mask_lat[list(steps)[k]]), (H, W), "nearest")
        )
        panel = np.concatenate([img, np.repeat(m[..., None], 3, axis=-1)], axis=1)
        frames.append(_to_uint8(panel))
    return np.stack(frames)


def write_gif(frames: np.ndarray, out_path: str, fps: int = 8) -> None:
    """(S, H, W, 3) uint8 -> animated GIF (PIL; imageio mp4 needs ffmpeg,
    which is absent in this image)."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        out_path, save_all=True, append_images=imgs[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )


def write_adaptive_mask_video(
    intermediates,
    vae_decode_fn: Callable,
    out_path: str,
    vae_scaling: float = 0.18215,
    sample: int = 0,
    every: int = 1,
    fps: int = 8,
) -> np.ndarray:
    """Compose + write; returns the frames for inspection."""
    frames = compose_step_frames(
        intermediates, vae_decode_fn, vae_scaling, sample, every
    )
    write_gif(frames, out_path, fps)
    return frames
