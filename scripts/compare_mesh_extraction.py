"""Quantify marching-tetrahedra vs classic marching-cubes mesh deltas.

The reference extracts meshes with skimage Lewiner marching cubes
(`_util/eg3d_metrics3d.py:186-210`); production here uses native marching
tetrahedra. Both interpolate vertices along grid edges — this script
measures the chamfer/F1 gap between the two triangulations on analytic
density grids, next to each extractor's gap to the TRUE surface, so the
"different triangulation" deviation can be compared against the
discretization error any extractor pays.

Usage: python scripts/compare_mesh_extraction.py [N]
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # keep off the TPU tunnel

import numpy as np

sys.path.insert(0, ".")

from panic3d_tpu.eval.marching_cubes import marching_cubes_classic
from panic3d_tpu.eval.mesh_metrics import (
    chamfer_and_f1,
    sample_points_on_mesh,
)
from panic3d_tpu.runtime.native_ops import marching_tetrahedra

BW = 0.7


def grids(N):
    lin = (np.arange(N) + 0.5) / N * BW - BW / 2
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    yield "sphere", 0.22 - r, ("sphere", 0.22)
    # head-ish blob: sphere with angular bumps (non-trivial topology of
    # curvature, exercises ambiguous MC cases)
    theta = np.arctan2(Y, X)
    phi = np.arctan2(Z, np.sqrt(X**2 + Y**2))
    bump = 0.03 * np.sin(5 * theta) * np.cos(4 * phi)
    yield "bumpy", (0.20 + bump) - r, None


def to_world(verts, N):
    return verts / N * BW - 0.5 * BW


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    out = {}
    for name, vol, analytic in grids(N):
        vol = vol.astype(np.float32)
        vt, ft = marching_tetrahedra(np.ascontiguousarray(vol), 0.0)
        vm, fm = marching_cubes_classic(vol, 0.0)
        vt, vm = to_world(vt, N), to_world(vm, N)
        # the grid samples cell centers ((i+0.5)/N): world vertex positions
        # carry a half-voxel offset; irrelevant for tets-vs-MC (both share
        # it), corrected for the analytic comparison below
        half = 0.5 * BW / N
        pt = sample_points_on_mesh(vt, ft, 8000, seed=0)
        pm = sample_points_on_mesh(vm, fm, 8000, seed=1)
        res = chamfer_and_f1(pt, (vt, ft), pm, (vm, fm))
        entry = {
            "tets_tris": int(len(ft)),
            "mc_tris": int(len(fm)),
            "tets_vs_mc_cd": res["cd"],
            "tets_vs_mc_f1@5": res["f1@5"],
            "tets_vs_mc_f1@10": res["f1@10"],
        }
        if analytic is not None:
            _, R = analytic
            for tag, pts in (("tets", pt), ("mc", pm)):
                d = np.abs(np.linalg.norm(pts + half, axis=1) - R)
                entry[f"{tag}_vs_true_cd"] = float(d.mean())
                entry[f"{tag}_vs_true_max"] = float(d.max())
        entry["voxel"] = BW / N
        out[name] = entry
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
