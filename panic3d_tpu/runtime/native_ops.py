"""On-demand C++ op compilation with a content-hash build cache.

Role of `src/torch_utils/custom_ops.py:61-157` (the md5-keyed nvcc JIT
cache), retargeted: device kernels are XLA/Pallas, so the native layer here
builds host-side C++ (mesh extraction, IO) with g++ into .so files keyed by
source hash, loaded via ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_CACHE_DIR = os.environ.get(
    "PANIC3D_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "panic3d_native")
)


def _build(source_path: str) -> str:
    with open(source_path, "rb") as f:
        src = f.read()
    key = hashlib.md5(src).hexdigest()[:16]
    name = os.path.splitext(os.path.basename(source_path))[0]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"{name}-{key}.so")
    if not os.path.isfile(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             source_path, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path


@lru_cache(maxsize=None)
def load_library(name: str) -> ctypes.CDLL:
    source = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    return ctypes.CDLL(_build(source))


@lru_cache(maxsize=1)
def _mesh_lib():
    lib = load_library("mesh_extract")
    lib.marching_tetrahedra.restype = ctypes.c_int
    lib.marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    return lib


def marching_tetrahedra(grid: np.ndarray, level: float):
    """Extract the iso-surface of a [nx,ny,nz] float32 grid at `level`.

    Returns (verts [V,3] float32 in index units, faces [T,3] int32).
    """
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    assert grid.ndim == 3
    lib = _mesh_lib()
    pv = ctypes.POINTER(ctypes.c_float)()
    pt = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    ret = lib.marching_tetrahedra(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grid.shape[0], grid.shape[1], grid.shape[2],
        ctypes.c_float(level),
        ctypes.byref(pv), ctypes.byref(nv),
        ctypes.byref(pt), ctypes.byref(nt),
    )
    if ret != 0:
        raise RuntimeError("marching_tetrahedra failed")
    try:
        verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(pt, shape=(nt.value, 3)).copy() if nt.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mt_free(pv)
        lib.mt_free(pt)
    return verts, faces
