"""Affordance visualization without Blender/mayavi.

Reference parity:
- ``src/visualization/visualize_human.py`` (per-vertex affordance weights as
  vertex colors on the SMPL-X star mesh, Blender) -> vertex-colored PLY mesh
  + rasterized PNG preview.
- ``src/visualization/visualize_object.py`` (colored point cloud in a
  Blender addon) -> the .ply product is already colored; PNG preview here.
- ``src/visualization/visualize_occupancy.py`` (mayavi volume render) ->
  matplotlib slice grid + thresholded voxel projection.
- ``utils/visualization/visualize_video.py`` (per-step mask/image PNGs ->
  mp4 via ffmpeg shell-out) -> same, ffmpeg.
"""
from __future__ import annotations

import os
import struct
import subprocess
from typing import Optional, Tuple

import numpy as np

from coma_tpu.utils.colormap import jet_rgb


def save_vertex_colored_mesh(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    weights: np.ndarray,
    cmap=jet_rgb,
) -> None:
    """Binary PLY mesh with per-vertex colors from normalized weights."""
    w = np.asarray(weights, np.float64)
    w = (w - w.min()) / max(w.max() - w.min(), 1e-12)
    colors = np.clip(np.round(cmap(w) * 255), 0, 255).astype(np.uint8)
    n_v, n_f = len(verts), len(faces)
    header = [
        "ply", "format binary_little_endian 1.0",
        f"element vertex {n_v}",
        "property double x", "property double y", "property double z",
        "property uchar red", "property uchar green", "property uchar blue",
        f"element face {n_f}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    v = np.asarray(verts, "<f8")
    f = np.asarray(faces, "<i4")
    with open(path, "wb") as fh:
        fh.write(("\n".join(header) + "\n").encode("ascii"))
        for i in range(n_v):
            fh.write(v[i].tobytes())
            fh.write(colors[i].tobytes())
        for i in range(n_f):
            fh.write(struct.pack("<B", 3))
            fh.write(f[i].tobytes())


def render_mesh_preview(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    weights: Optional[np.ndarray] = None,
    resolution: int = 512,
    elev: float = 15.0,
    azim: float = 45.0,
) -> None:
    """PNG preview of a (weight-colored) mesh via matplotlib trisurf."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(resolution / 100, resolution / 100), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    tri = ax.plot_trisurf(
        verts[:, 0], verts[:, 1], verts[:, 2],
        triangles=np.asarray(faces), linewidth=0, antialiased=False,
    )
    if weights is not None:
        w = np.asarray(weights, np.float64)
        w = (w - w.min()) / max(w.max() - w.min(), 1e-12)
        face_w = w[np.asarray(faces)].mean(axis=1)
        tri.set_fc(jet_rgb(face_w))
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    extent = np.ptp(verts, axis=0).max()
    center = verts.mean(axis=0)
    for setter, c in zip((ax.set_xlim, ax.set_ylim, ax.set_zlim), center):
        setter(c - extent / 2, c + extent / 2)
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def visualize_occupancy_slices(
    path: str,
    prob_field: np.ndarray,         # (R, R, R)
    mesh: Optional[Tuple[np.ndarray, np.ndarray]] = None,  # verts in voxel coords
    threshold: float = 0.1,
) -> None:
    """Occupancy field as a 3x3 slice grid + a max-projection panel
    (mayavi-volume-render stand-in)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    R = prob_field.shape[0]
    fig, axes = plt.subplots(2, 3, figsize=(9, 6))
    for k, frac in enumerate((0.3, 0.5, 0.7)):
        axes[0, k].imshow(prob_field[int(R * frac)], cmap="inferno", vmin=0)
        axes[0, k].set_title(f"z-slice {frac:.0%}")
        axes[0, k].axis("off")
    for k, axis in enumerate((0, 1, 2)):
        axes[1, k].imshow(prob_field.max(axis=axis), cmap="inferno", vmin=0)
        axes[1, k].set_title(f"max-proj axis {axis}")
        axes[1, k].axis("off")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def frames_to_video(frames_dir: str, out_path: str, fps: int = 10) -> bool:
    """PNG frames -> mp4 via ffmpeg (reference: ``visualize_video.py:38``).

    Returns False when ffmpeg is unavailable."""
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-pattern_type", "glob",
             "-i", os.path.join(frames_dir, "*.png"),
             "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path],
            check=True, capture_output=True,
        )
        return True
    except (FileNotFoundError, subprocess.CalledProcessError):
        return False


def write_message_on_img(image: "np.ndarray", message: str) -> "np.ndarray":
    """Stamp a sentinel/debug message onto an image (RGB uint8).

    Reference parity: ``utils/misc.py:write_message_on_img:88-92`` (used by
    ``predict_human.py`` to annotate failure images, e.g. "NO HUMANS").
    PIL replaces cv2.putText; same bottom-left-ish red stamp.
    """
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.asarray(image))
    draw = ImageDraw.Draw(img)
    draw.text((max(0, img.height - 150), img.height - 20), message,
              fill=(255, 0, 0))
    return np.asarray(img)
