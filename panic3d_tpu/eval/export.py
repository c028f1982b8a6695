"""Mesh + volume export.

Role of `src/shape_utils.py` (marching-cubes -> .ply CLI, DeepSDF-derived)
and the .mrc shape export of `src/gen_samples.py`: write extracted surfaces
as PLY (with vertex colors) and density volumes as raw .npy/.mrc-style
binaries for external viewers.
"""

from __future__ import annotations

import os
import struct

import numpy as np


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray,
             colors: np.ndarray = None):
    """Binary little-endian PLY with optional per-vertex uchar colors."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    verts = np.asarray(verts, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    has_color = colors is not None
    if has_color:
        colors = np.clip(np.asarray(colors), 0, 1)
        colors = (colors * 255).astype(np.uint8)

    with open(path, "wb") as f:
        hdr = [
            "ply",
            "format binary_little_endian 1.0",
            f"element vertex {len(verts)}",
            "property float x",
            "property float y",
            "property float z",
        ]
        if has_color:
            hdr += [
                "property uchar red",
                "property uchar green",
                "property uchar blue",
            ]
        hdr += [
            f"element face {len(faces)}",
            "property list uchar int vertex_indices",
            "end_header",
        ]
        f.write(("\n".join(hdr) + "\n").encode("ascii"))
        if has_color:
            rec = np.zeros(
                len(verts),
                dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
            )
            rec["xyz"] = verts
            rec["rgb"] = colors
            f.write(rec.tobytes())
        else:
            f.write(verts.tobytes())
        frec = np.zeros(
            len(faces), dtype=[("n", np.uint8), ("idx", np.int32, 3)]
        )
        frec["n"] = 3
        frec["idx"] = faces
        f.write(frec.tobytes())
    return path


def load_ply(path: str):
    """Minimal reader for files written by save_ply (tests/roundtrips)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    nv = int([l for l in header if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in header if l.startswith("element face")][0].split()[-1])
    has_color = any("uchar red" in l for l in header)
    off = end
    if has_color:
        rec = np.frombuffer(
            data, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
            count=nv, offset=off,
        )
        verts, colors = rec["xyz"].copy(), rec["rgb"].astype(np.float32) / 255
        off += rec.itemsize * nv
    else:
        verts = np.frombuffer(data, np.float32, nv * 3, off).reshape(nv, 3).copy()
        colors = None
        off += nv * 12
    frec = np.frombuffer(
        data, dtype=[("n", np.uint8), ("idx", np.int32, 3)], count=nf, offset=off
    )
    return verts, frec["idx"].copy(), colors


def save_mrc(path: str, volume: np.ndarray, voxel_size: float = 1.0):
    """Minimal MRC2014 density-volume writer (gen_samples.py --shapes role)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vol = np.asarray(volume, dtype=np.float32)
    nz, ny, nx = vol.shape
    header = np.zeros(256, dtype=np.int32)
    header[0:3] = [nx, ny, nz]
    header[3] = 2  # mode 2: float32
    header[7:10] = [nx, ny, nz]
    fheader = header.view(np.float32)
    fheader[10:13] = [nx * voxel_size, ny * voxel_size, nz * voxel_size]
    fheader[13:16] = [90.0, 90.0, 90.0]
    header[16:19] = [1, 2, 3]
    fheader[19] = float(vol.min())
    fheader[20] = float(vol.max())
    fheader[21] = float(vol.mean())
    header[52] = int.from_bytes(b"MAP ", "little")
    header[53] = int.from_bytes(bytes([68, 65, 0, 0]), "little")  # little-endian
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(vol.tobytes())
    return path
