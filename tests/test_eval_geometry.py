"""Geometry eval tests: marching tetrahedra, point-mesh distance, chamfer/F1.

Oracles: analytic sphere, brute-force numpy point-to-triangle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from panic3d_tpu.eval.mesh_metrics import (
    chamfer_and_f1,
    point_mesh_distance_sq,
    point_triangle_distance_sq,
    sample_points_on_mesh,
)
from panic3d_tpu.eval.volume import marching_cubes
from panic3d_tpu.runtime.native_ops import marching_tetrahedra


def sphere_grid(n=48, r=15.0):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    rad = np.sqrt(((g - c) ** 2).sum(axis=0))
    return 1.0 / (1.0 + np.exp(rad - r)), c


def test_marching_tetrahedra_sphere():
    density, c = sphere_grid()
    verts, faces = marching_tetrahedra(density, 0.5)
    assert len(verts) > 1000 and len(faces) > 1000
    rad = np.linalg.norm(verts - c, axis=1)
    assert abs(rad.mean() - 15.0) < 0.05
    assert rad.std() < 0.05
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_marching_cubes_wrapper_scaling():
    density, c = sphere_grid()
    n = density.shape[0]
    rgbs = np.random.RandomState(0).rand(3, n, n, n).astype(np.float32)
    bw = 0.7
    mc = marching_cubes(density, rgbs, bw, level=0.5)
    # world-space center should be near -bw/2 + c/n*bw ~ 0
    center = mc.verts.mean(axis=0)
    assert np.abs(center).max() < 0.02
    rad = np.linalg.norm(mc.verts - center, axis=1)
    np.testing.assert_allclose(rad.mean(), 15.0 / n * bw, atol=0.01)
    assert mc.colors.shape == (len(mc.verts), 3)
    assert (mc.colors >= 0).all() and (mc.colors <= 1).all()


def brute_point_tri_dist(p, tri, samples=400):
    """Oracle: dense barycentric sampling of the triangle."""
    rng = np.random.RandomState(0)
    u = rng.rand(samples, 1)
    v = rng.rand(samples, 1)
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    pts = tri[0] + u * (tri[1] - tri[0]) + v * (tri[2] - tri[0])
    # include edges and vertices densely
    t = np.linspace(0, 1, 100)[:, None]
    edges = np.concatenate([
        tri[0] + t * (tri[1] - tri[0]),
        tri[0] + t * (tri[2] - tri[0]),
        tri[1] + t * (tri[2] - tri[1]),
    ])
    allpts = np.concatenate([pts, edges])
    return ((p[:, None, :] - allpts[None]) ** 2).sum(-1).min(1)


def test_point_triangle_distance_matches_bruteforce():
    rng = np.random.RandomState(1)
    tris = rng.randn(5, 3, 3).astype(np.float32)
    pts = rng.randn(20, 3).astype(np.float32) * 2
    d = np.asarray(
        point_triangle_distance_sq(
            jnp.asarray(pts), jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
            jnp.asarray(tris[:, 2]),
        )
    )
    for ti in range(5):
        ref = brute_point_tri_dist(pts, tris[ti])
        # exact must be <= sampled upper bound, and close to it
        assert (d[:, ti] <= ref + 1e-4).all()
        np.testing.assert_allclose(d[:, ti], ref, atol=2e-2)


def test_point_mesh_distance_on_sphere():
    """Points at radius r from a spherical mesh of radius s: distance ~ |r-s|."""
    density, c = sphere_grid()
    verts, faces = marching_tetrahedra(density, 0.5)
    rng = np.random.RandomState(2)
    dirs = rng.randn(100, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = c + dirs * 20.0  # radius 20 vs mesh radius 15
    d = np.sqrt(np.asarray(point_mesh_distance_sq(
        jnp.asarray(pts, dtype=jnp.float32), jnp.asarray(verts),
        jnp.asarray(faces),
    )))
    np.testing.assert_allclose(d, 5.0, atol=0.1)


def test_chamfer_f1_identical_meshes():
    density, c = sphere_grid(32, 10.0)
    verts, faces = marching_tetrahedra(density, 0.5)
    pts = sample_points_on_mesh(verts, faces, 500, seed=0)
    out = chamfer_and_f1(pts, (verts, faces), pts, (verts, faces),
                         thresholds=(0.005, 0.01))
    assert out["cd"] < 1e-4
    assert out["f1@5"] == 1.0 and out["f1@10"] == 1.0


def test_sample_points_on_mesh_area_weighted():
    verts = np.asarray([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],     # big triangle (area 0.5)
        [2, 0, 0], [2.1, 0, 0], [2, 0.1, 0],  # tiny triangle (area 0.005)
    ], dtype=np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    pts = sample_points_on_mesh(verts, faces, 2000, seed=1)
    frac_tiny = (pts[:, 0] > 1.5).mean()
    assert frac_tiny < 0.03  # ~1% expected
