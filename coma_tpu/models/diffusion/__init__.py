"""Flax Stable-Diffusion inpainting stack: UNet, VAE, CLIP text, DDIM,
adaptive-mask pipeline (reference: ``utils/adaptive_mask_inpainting.py`` +
HF diffusers)."""
