"""Classic marching cubes, constructed programmatically (no copied tables).

Purpose: quantify the production mesh extractor's deviation. The reference
extracts isosurfaces with skimage's Lewiner marching cubes
(`_util/eg3d_metrics3d.py:186-210`); our production extractor is native
marching tetrahedra (`native/mesh_extract.cpp`). Both place vertices by
linear interpolation along grid edges, so they triangulate the *same*
point set differently — this module provides an independent classic
marching-cubes triangulation (Lorensen-style, with a fixed
separate-the-positive-corners rule on ambiguous faces) so the
chamfer/F1 delta between edge-interpolating extractors can be *measured*
(tests/test_mesh_extraction_delta.py, scripts/compare_mesh_extraction.py)
rather than assumed.

The 256-case triangle table is not transcribed from any source: it is
derived at import time by walking edge loops around each sign
configuration. Every cut edge lies on exactly two cube faces; each face
contributes exactly one pairing for each of its cut edges (unambiguous for
2 cut edges; for 4, pair the edges sharing a positive corner, which
separates the positive corners and — being a function of the face's sign
pattern alone — is consistent between the two cells sharing the face, so
the mesh is crack-free). The pairings form closed loops; each loop is
fan-triangulated.
"""

from __future__ import annotations

import numpy as np

# corner i sits at (i&1, (i>>1)&1, (i>>2)&1) in cell-local coordinates
_CORNER_POS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
    dtype=np.int64,
)

# 12 edges as (corner_a, corner_b), a < b, differing in exactly one bit
_EDGES = [
    (a, a | (1 << k))
    for a in range(8)
    for k in range(3)
    if not a & (1 << k)
]
_EDGE_INDEX = {frozenset(e): i for i, e in enumerate(_EDGES)}

# 6 faces as 4 corner ids in cyclic order
_FACES = []
for _axis in range(3):
    _u1, _u2 = [a for a in range(3) if a != _axis]
    for _v in (0, 1):
        _cyc = []
        for _b1, _b2 in ((0, 0), (1, 0), (1, 1), (0, 1)):
            _c = (_v << _axis) | (_b1 << _u1) | (_b2 << _u2)
            _cyc.append(_c)
        _FACES.append(_cyc)


def _config_triangles(signs):
    """Triangles (edge-index triples) for one 8-bit sign configuration."""
    cut = [signs[a] != signs[b] for a, b in _EDGES]
    adj = {i: [] for i in range(12) if cut[i]}

    def connect(e1, e2):
        adj[e1].append(e2)
        adj[e2].append(e1)

    for corners in _FACES:
        face_edges = [
            _EDGE_INDEX[frozenset((corners[i], corners[(i + 1) % 4]))]
            for i in range(4)
        ]
        cuts = [i for i in range(4) if cut[face_edges[i]]]
        if len(cuts) == 2:
            connect(face_edges[cuts[0]], face_edges[cuts[1]])
        elif len(cuts) == 4:
            # alternating-sign face: pair the edges flanking each positive
            # corner (fixed rule, symmetric across the shared face)
            for i in range(4):
                if signs[corners[i]]:
                    connect(face_edges[(i - 1) % 4], face_edges[i])

    # trace closed loops (every cut edge has exactly 2 pairings)
    loops = []
    seen = set()
    for start in adj:
        if start in seen:
            continue
        loop = [start]
        seen.add(start)
        prev, cur = None, start
        while True:
            nxt = adj[cur][0] if adj[cur][0] != prev else adj[cur][1]
            if nxt == start:
                break
            loop.append(nxt)
            seen.add(nxt)
            prev, cur = cur, nxt
        loops.append(loop)

    tris = []
    for loop in loops:
        # orient so the fan normal points from positive toward negative
        mids = np.array(
            [
                (_CORNER_POS[_EDGES[e][0]] + _CORNER_POS[_EDGES[e][1]]) / 2.0
                for e in loop
            ]
        )
        grad = np.zeros(3)
        for e in loop:
            a, b = _EDGES[e]
            pos, neg = (a, b) if signs[a] else (b, a)
            grad += _CORNER_POS[neg] - _CORNER_POS[pos]
        n = np.zeros(3)
        for i in range(1, len(loop) - 1):
            n += np.cross(mids[i] - mids[0], mids[i + 1] - mids[0])
        if np.dot(n, grad) < 0:
            loop = loop[::-1]
        for i in range(1, len(loop) - 1):
            tris.append((loop[0], loop[i], loop[i + 1]))
    return tris


_TRI_TABLE = [
    _config_triangles([bool(c & (1 << i)) for i in range(8)])
    for c in range(256)
]


def marching_cubes_classic(vol: np.ndarray, level: float):
    """Extract the `level` isosurface of vol [X,Y,Z].

    Returns (verts [V,3] float32 in grid-index coordinates, faces [F,3]
    int32) — the same coordinate convention as
    runtime.native_ops.marching_tetrahedra, so the two extractors are
    directly comparable. Vertices are emitted per-triangle (not deduped);
    distance metrics are invariant to duplication.
    """
    vol = np.asarray(vol, dtype=np.float32)
    X, Y, Z = vol.shape
    inside = vol > level

    corner_vals = []
    corner_in = []
    for i in range(8):
        bx, by, bz = _CORNER_POS[i]
        sl = (
            slice(bx, X - 1 + bx),
            slice(by, Y - 1 + by),
            slice(bz, Z - 1 + bz),
        )
        corner_vals.append(vol[sl])
        corner_in.append(inside[sl])
    config = np.zeros((X - 1, Y - 1, Z - 1), dtype=np.int32)
    for i in range(8):
        config |= corner_in[i].astype(np.int32) << i

    base = np.stack(
        np.meshgrid(
            np.arange(X - 1), np.arange(Y - 1), np.arange(Z - 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    config_f = config.reshape(-1)
    cv = [v.reshape(-1) for v in corner_vals]

    all_tris = []
    for c in np.unique(config_f):
        tris = _TRI_TABLE[c]
        if not tris:
            continue
        cells = np.nonzero(config_f == c)[0]
        # interpolated point on each edge used by this config
        edge_pts = {}
        for tri in tris:
            for e in tri:
                if e in edge_pts:
                    continue
                a, b = _EDGES[e]
                va, vb = cv[a][cells], cv[b][cells]
                t = (level - va) / (vb - va)
                pa = _CORNER_POS[a].astype(np.float32)
                pb = _CORNER_POS[b].astype(np.float32)
                edge_pts[e] = (
                    base[cells]
                    + pa[None]
                    + t[:, None] * (pb - pa)[None]
                )
        for tri in tris:
            all_tris.append(np.stack([edge_pts[e] for e in tri], axis=1))

    if not all_tris:
        return (
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
        )
    tri_pts = np.concatenate(all_tris, axis=0)  # [F, 3, 3]
    verts = tri_pts.reshape(-1, 3).astype(np.float32)
    faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    return verts, faces
