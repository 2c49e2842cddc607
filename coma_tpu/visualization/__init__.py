"""Visualization: affordance products to colored meshes / images / videos."""
from coma_tpu.visualization.viz import (
    frames_to_video,
    render_mesh_preview,
    save_vertex_colored_mesh,
    visualize_occupancy_slices,
)

__all__ = [
    "frames_to_video",
    "render_mesh_preview",
    "save_vertex_colored_mesh",
    "visualize_occupancy_slices",
]
