"""Distribution-comparison metrics for quantitative evaluation.

Reference parity: ``utils/evaluation.py`` — normalized MAE and SIM
(histogram intersection, Σ min(p, q)) over affordance distributions, used
for the paper's quantitative tables against BEHAVE ground truth.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _normalize(x: jax.Array, eps: float) -> jax.Array:
    return x / (jnp.sum(x, axis=-1, keepdims=True) + eps)


def mean_absolute_error(src: jax.Array, tgt: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalized MAE between two 1-D distributions (``utils/evaluation.py:4-25``).

    Batched inputs ``(B, N)`` return the mean over the batch.
    """
    src = _normalize(src, eps)
    tgt = _normalize(tgt, eps)
    return jnp.mean(jnp.abs(src - tgt))


def similarity(src: jax.Array, tgt: jax.Array, eps: float = 1e-12) -> jax.Array:
    """SIM = Σ min(p, q) after normalization (``utils/evaluation.py:28-49``).

    Batched inputs ``(B, N)`` return the mean per-row SIM.
    """
    src = _normalize(src, eps)
    tgt = _normalize(tgt, eps)
    return jnp.mean(jnp.sum(jnp.minimum(src, tgt), axis=-1))


def quant_metrics(pred: jax.Array, test: jax.Array, eps: float = 1e-12) -> Dict[str, float]:
    """Both metrics with the reference's double-normalization
    (``quant_metrics_for_two_distributions:52-78``)."""
    pred = _normalize(pred, eps)
    test = _normalize(test, eps)
    return {
        "mae": float(mean_absolute_error(pred, test, eps)),
        "sim": float(similarity(pred, test, eps)),
    }
