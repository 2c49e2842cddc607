"""Geometry layer: transforms, mesh IO, normals, downsampling."""
from coma_tpu.geometry.transforms import (
    normalize_vectors,
    quat_to_rotmat,
    rodrigues,
    rot6d_to_rotmat,
    skew,
)

__all__ = [
    "normalize_vectors",
    "quat_to_rotmat",
    "rodrigues",
    "rot6d_to_rotmat",
    "skew",
]
