"""Minimal PLY point-cloud writer/reader (Open3D-compatible layout).

Reference parity: ``o3d.io.write_point_cloud(... .ply)`` as used for the
object-contact product (``src/coma/extract_coma.py:448-457``): binary
little-endian, double x/y/z + double nx/ny/nz + uchar red/green/blue.
"""
from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np


def write_ply_pointcloud(
    path: str,
    points: np.ndarray,                 # (N, 3) float
    normals: Optional[np.ndarray] = None,   # (N, 3) float
    colors: Optional[np.ndarray] = None,    # (N, 3) float in [0,1] or uint8
) -> None:
    n = len(points)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += ["property double x", "property double y", "property double z"]
    if normals is not None:
        header += ["property double nx", "property double ny", "property double nz"]
    if colors is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += ["end_header"]

    pts = np.asarray(points, dtype="<f8")
    nrm = np.asarray(normals, dtype="<f8") if normals is not None else None
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = np.clip(np.round(c * 255.0), 0, 255).astype(np.uint8)
    else:
        c = None

    with open(path, "wb") as fh:
        fh.write(("\n".join(header) + "\n").encode("ascii"))
        for i in range(n):
            fh.write(pts[i].tobytes())
            if nrm is not None:
                fh.write(nrm[i].tobytes())
            if c is not None:
                fh.write(c[i].tobytes())


def read_ply_pointcloud(path: str) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Read a binary-LE or ascii PLY with x/y/z [+nx/ny/nz] [+rgb uchar].

    Returns ``(points, normals_or_None, colors01_or_None)``.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    header_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii").splitlines()
    binary = any("binary_little_endian" in h for h in header)
    n = int(next(h for h in header if h.startswith("element vertex")).split()[-1])
    props = [
        (h.split()[1], h.split()[2])
        for h in header
        if h.startswith("property") and not h.startswith("property list")
    ]
    names = [p[1] for p in props]
    fmt_map = {"double": "d", "float": "f", "uchar": "B", "uint8": "B"}
    if binary:
        fmt = "<" + "".join(fmt_map[t] for t, _ in props)
        size = struct.calcsize(fmt)
        rows = [
            struct.unpack_from(fmt, data, header_end + i * size) for i in range(n)
        ]
    else:
        body = data[header_end:].decode("ascii").split()
        width = len(props)
        rows = [
            [float(x) for x in body[i * width : (i + 1) * width]] for i in range(n)
        ]
    arr = np.asarray(rows, dtype=np.float64)
    col = {name: arr[:, i] for i, name in enumerate(names)}
    points = np.stack([col["x"], col["y"], col["z"]], axis=-1)
    normals = (
        np.stack([col["nx"], col["ny"], col["nz"]], axis=-1) if "nx" in col else None
    )
    colors = (
        np.stack([col["red"], col["green"], col["blue"]], axis=-1) / 255.0
        if "red" in col
        else None
    )
    return points, normals, colors
