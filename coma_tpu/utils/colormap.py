"""Colormap helper (reference: ``utils/visualization/colormap.py`` —
matplotlib 'jet' over [0, 1], RGBA -> RGB)."""
from __future__ import annotations

import numpy as np


def jet_rgb(values: np.ndarray) -> np.ndarray:
    """Map values in [0, 1] to jet RGB in [0, 1]. (N,) -> (N, 3)."""
    import matplotlib.cm as cm
    from matplotlib.colors import Normalize

    mapper = cm.ScalarMappable(norm=Normalize(vmin=0.0, vmax=1.0), cmap="jet")
    return np.asarray(mapper.to_rgba(np.asarray(values)))[:, :3]
