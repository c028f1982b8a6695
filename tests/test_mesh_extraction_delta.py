"""Marching-tetrahedra vs classic marching-cubes mesh delta (VERDICT r3 #6).

The reference extracts meshes with skimage Lewiner MC
(`_util/eg3d_metrics3d.py:186-210`); production here uses native marching
tetrahedra. Both interpolate vertices along grid edges, so they are
different triangulations of the same point set. These tests bound the
difference with a vendored, programmatically-constructed classic MC
(eval/marching_cubes.py — tables derived by edge-loop walking, not
copied): on analytic density grids the extractor-choice chamfer delta is
several times SMALLER than either extractor's own discretization error,
and F1 at the reference's tightest threshold (0.005) is ~1 — i.e. the
deviation is far below metric noise. Measured r4 values (N=48 grids,
scripts/compare_mesh_extraction.py): sphere tets-vs-mc cd 3.7e-5 vs
tets-vs-true cd 1.6e-4; bumpy tets-vs-mc cd 2.3e-4 (1.6% of a voxel),
f1@5 0.998.
"""

import numpy as np
import pytest

from panic3d_tpu.eval.marching_cubes import marching_cubes_classic
from panic3d_tpu.eval.mesh_metrics import chamfer_and_f1, sample_points_on_mesh
from panic3d_tpu.runtime.native_ops import marching_tetrahedra

pytestmark = pytest.mark.fast

BW = 0.7
N = 32


def _sphere_grid():
    lin = (np.arange(N) + 0.5) / N * BW - BW / 2
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    return (0.22 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)


def test_marching_cubes_watertight_on_sphere():
    verts, faces = marching_cubes_classic(_sphere_grid(), 0.0)
    assert len(faces) > 500
    # all vertices on the isosurface (within interpolation error)
    w = verts / N * BW - BW / 2 + 0.5 * BW / N
    r = np.linalg.norm(w, axis=1)
    assert np.abs(r - 0.22).max() < 0.35 * BW / N
    # watertight: every undirected edge shared by exactly two triangles
    q = np.round(verts * 4096).astype(np.int64)
    from collections import Counter

    cnt = Counter()
    for t in q.reshape(-1, 3, 3):
        for i in range(3):
            e = tuple(sorted((tuple(t[i]), tuple(t[(i + 1) % 3]))))
            cnt[e] += 1
    assert all(v == 2 for v in cnt.values())


def test_tets_vs_mc_delta_below_metric_noise():
    vol = _sphere_grid()
    vt, ft = marching_tetrahedra(np.ascontiguousarray(vol), 0.0)
    vm, fm = marching_cubes_classic(vol, 0.0)
    vt = vt / N * BW - BW / 2
    vm = vm / N * BW - BW / 2
    pt = sample_points_on_mesh(vt, ft, 4000, seed=0)
    pm = sample_points_on_mesh(vm, fm, 4000, seed=1)
    res = chamfer_and_f1(pt, (vt, ft), pm, (vm, fm))
    voxel = BW / N
    # extractor-choice delta far below the F1 threshold scale (0.005) and
    # below a tenth of a voxel
    assert res["cd"] < 0.1 * voxel
    assert res["f1@5"] > 0.995
    # ... and below the discretization error both extractors pay anyway
    half = 0.5 * voxel
    true_err = np.abs(np.linalg.norm(pt + half, axis=1) - 0.22).mean()
    assert res["cd"] < true_err
