"""Point/mesh geometry metrics on TPU: chamfer distance + F1.

Role of the reference's igl calls (`_scripts/eval/measure.py:77-99,186-201`,
`_databacks/lustrous_gltf_v0_measurable.py:303-331`): surface point
sampling, point->mesh squared distances, chamfer = mean of symmetric
point->mesh distance, F1@k at threshold k/1000.

TPU-first: igl's CPU AABB trees are replaced by brute-force point-to-
triangle distance, chunked with lax.map — a dense [P, T] problem that
vectorizes perfectly on the VPU and is faster end-to-end than building
host-side acceleration structures for meshes of this size (~1e4-1e5 tris).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def point_triangle_distance_sq(p, a, b, c):
    """Squared distance from points p [P,3] to triangles (a,b,c) [T,3] -> [P,T].

    Exact: min over the three clipped edge segments (covers every exterior
    Voronoi region, vertices included) and, when the plane projection lands
    inside the triangle, the plane distance (which then dominates).
    """

    def seg_d(s, e):  # closest distance to segment s->e
        se = e - s  # [T,3]
        len2 = jnp.sum(se**2, axis=-1)  # [T]
        sp = p[:, None, :] - s[None, :, :]  # [P,T,3]
        t = jnp.einsum("ptc,tc->pt", sp, se) / jnp.where(len2 == 0, 1.0, len2)
        t = jnp.clip(t, 0.0, 1.0)
        closest = s[None] + t[..., None] * se[None]
        return jnp.sum((p[:, None, :] - closest) ** 2, axis=-1)

    d_edges = jnp.minimum(jnp.minimum(seg_d(a, b), seg_d(a, c)), seg_d(b, c))

    ab = b - a
    ac = c - a
    n = jnp.cross(ab, ac)  # [T,3]
    n2 = jnp.sum(n**2, axis=-1)  # [T]
    ap = p[:, None, :] - a[None, :, :]
    dot_n = jnp.einsum("ptc,tc->pt", ap, n)
    d_plane = dot_n**2 / jnp.where(n2 == 0, 1.0, n2)
    # barycentric coords of the projection
    gamma = jnp.einsum("ptc,tc->pt", jnp.cross(ab[None], ap, axis=-1), n) / jnp.where(
        n2 == 0, 1.0, n2
    )
    beta = jnp.einsum("ptc,tc->pt", jnp.cross(ap, ac[None], axis=-1), n) / jnp.where(
        n2 == 0, 1.0, n2
    )
    inside = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (n2 > 0)[None, :]
    return jnp.where(inside, d_plane, d_edges)


@partial(jax.jit, static_argnames=("tri_chunk",))
def point_mesh_distance_sq(points, verts, faces, tri_chunk: int = 2048):
    """Min squared distance from each point to the mesh: [P]."""
    tris = verts[faces]  # [T,3,3]
    T = tris.shape[0]
    pad = (-T) % tri_chunk
    tris = jnp.pad(tris, ((0, pad), (0, 0), (0, 0)), constant_values=1e9)
    tris = tris.reshape(-1, tri_chunk, 3, 3)

    def body(carry, tri):
        d = point_triangle_distance_sq(points, tri[:, 0], tri[:, 1], tri[:, 2])
        return jnp.minimum(carry, jnp.min(d, axis=1)), None

    init = jnp.full((points.shape[0],), jnp.inf)
    out, _ = jax.lax.scan(body, init, tris)
    return out


def sample_points_on_mesh(verts, faces, n: int, seed: int = 0):
    """Area-weighted surface sampling (igl.random_points_on_mesh role)."""
    rng = np.random.RandomState(seed)
    v = np.asarray(verts)
    f = np.asarray(faces)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = area.sum()
    if total <= 0:
        return np.zeros((n, 3), np.float32)
    probs = area / total
    idx = rng.choice(len(f), size=n, p=probs)
    u = rng.rand(n, 1)
    w = rng.rand(n, 1)
    flip = (u + w) > 1
    u = np.where(flip, 1 - u, u)
    w = np.where(flip, 1 - w, w)
    pts = a[idx] + u * (b[idx] - a[idx]) + w * (c[idx] - a[idx])
    return pts.astype(np.float32)


def chamfer_and_f1(pred_pts, pred_mesh, gt_pts, gt_mesh, thresholds=(0.005, 0.010)):
    """Symmetric point->mesh distances -> chamfer + F1@k
    (measure.py:186-201: cd = mean of both directions, ×100 at report time;
    F1 uses precision/recall at k/1000)."""
    pv, pf = pred_mesh
    gv, gf = gt_mesh
    d_p2g = np.sqrt(np.asarray(
        point_mesh_distance_sq(jnp.asarray(pred_pts), jnp.asarray(gv), jnp.asarray(gf))
    ))
    d_g2p = np.sqrt(np.asarray(
        point_mesh_distance_sq(jnp.asarray(gt_pts), jnp.asarray(pv), jnp.asarray(pf))
    ))
    cd = (d_p2g.mean() + d_g2p.mean()) / 2
    out = {"cd": float(cd), "p2s": d_p2g, "s2p": d_g2p}
    for t in thresholds:
        precision = (d_p2g < t).mean()
        recall = (d_g2p < t).mean()
        f1 = (
            2 * precision * recall / (precision + recall)
            if (precision + recall) > 0
            else 0.0
        )
        out[f"f1@{int(t*1000)}"] = float(f1)
    return out
