"""PLY mesh export (triangle soup -> binary little-endian PLY).

Mirrors the reference's scan-end mesh save (``StopScanningAndExtractIsoSurfaceMC``
-> ``saveMesh(.ply)``, DepthSensing.cpp:335-368).
"""

from __future__ import annotations

import struct

import numpy as np


def save_ply(path: str, tri_vertices: np.ndarray, tri_colors: np.ndarray | None = None):
    """Write a triangle soup.

    Args:
      tri_vertices: [T, 3, 3] float32.
      tri_colors: optional [T, 3, 3] float32 in [0, 1].
    """
    T = tri_vertices.shape[0]
    verts = tri_vertices.reshape(-1, 3).astype("<f4")
    n_v = verts.shape[0]
    has_color = tri_colors is not None
    with open(path, "wb") as fh:
        hdr = ["ply", "format binary_little_endian 1.0", f"element vertex {n_v}"]
        hdr += ["property float x", "property float y", "property float z"]
        if has_color:
            hdr += [
                "property uchar red",
                "property uchar green",
                "property uchar blue",
            ]
        hdr += [f"element face {T}", "property list uchar int vertex_indices", "end_header"]
        fh.write(("\n".join(hdr) + "\n").encode())
        if has_color:
            cols = np.clip(tri_colors.reshape(-1, 3) * 255.0, 0, 255).astype(np.uint8)
            rec = np.zeros(n_v, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = verts
            rec["rgb"] = cols
            fh.write(rec.tobytes())
        else:
            fh.write(verts.tobytes())
        idx = np.arange(n_v, dtype="<i4").reshape(T, 3)
        face = np.zeros(T, dtype=[("n", "u1"), ("i", "<i4", 3)])
        face["n"] = 3
        face["i"] = idx
        fh.write(face.tobytes())


def load_ply_vertex_count(path: str) -> int:
    with open(path, "rb") as fh:
        for raw in fh:
            line = raw.decode(errors="replace").strip()
            if line.startswith("element vertex"):
                return int(line.split()[-1])
            if line == "end_header":
                break
    return 0
