"""Decompose flagship forward time: backbone | renderer | superres.

Usage: python scripts/profile_render.py  (runs on the default TPU)
Timing uses scalar-checksum host reads (axon block_until_ready is lazy).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")

from panic3d_tpu import configs
from panic3d_tpu.models.triplane import TriPlaneGenerator
from panic3d_tpu.models.volumetric import renderer as vr
from __graft_entry__ import _flagship_inputs


def timed(name, fn, *args, iters=4):
    chk = fn(*args)
    float(chk)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {1000*np.median(ts):9.2f} ms")


def main():
    bs = 2
    ess = os.environ.get("BENCH_ESS", "0") == "1"
    g = configs.flagship(eval_mode=True, ess=ess)
    xin = _flagship_inputs(g, bs=bs)
    params = g.init({"params": jax.random.PRNGKey(0)}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")

    cond = xin["cond"]
    zs = jnp.zeros((bs, g.num_ws, g.z_dim))
    cam = jnp.asarray(
        np.tile(np.asarray(
            __import__("panic3d_tpu.cameras", fromlist=["camera_label"]).camera_label(
                0.0, 0.0, 1.0, 30.0)
        ), (bs, 1))
    )

    @jax.jit
    def map_fn(params):
        ws = g.apply(params, zs, cam, cond, method=TriPlaneGenerator.mapping_zplus)
        return jnp.sum(ws)

    @jax.jit
    def planes_fn(params):
        ws = g.apply(params, zs, cam, cond, method=TriPlaneGenerator.mapping_zplus)
        planes = g.apply(params, ws, cond, noise_mode="const",
                         method=TriPlaneGenerator._planes_from_ws)
        return jnp.sum(planes)

    # fixed planes for renderer-only timing
    ws0 = g.apply(params, zs, cam, cond, method=TriPlaneGenerator.mapping_zplus)
    planes0 = g.apply(params, ws0, cond, noise_mode="const",
                      method=TriPlaneGenerator._planes_from_ws)
    planes0 = jax.device_put(planes0)

    res = 64
    o = jnp.concatenate([jnp.zeros((bs, res * res, 2)),
                         jnp.ones((bs, res * res, 1))], -1)
    d = jnp.concatenate([jnp.zeros((bs, res * res, 2)),
                         -jnp.ones((bs, res * res, 1))], -1)
    rk = g.rk

    @jax.jit
    def render_fn(params, planes):
        def decode(feats):
            return g.apply(params, feats, method=lambda m, f: m.decoder(f, True))
        out = vr.render(planes, decode, o, d, rk,
                        triplane_crop=0.1, cull_clouds=0.5)
        return jnp.sum(out.rgb)

    @jax.jit
    def sample_only_fn(planes):
        coords = jnp.zeros((bs, res * res * 192, 3))
        pa = vr.generate_plane_axes(True)
        feats = vr.sample_from_planes(pa, planes, coords, rk["box_warp"])
        return jnp.sum(feats)

    @jax.jit
    def sr_fn(params):
        feat = jnp.zeros((bs, 32, 64, 64))
        ws = jnp.zeros((bs, g.num_ws, g.w_dim))
        img = g.apply(params, feat[:, :3], feat, ws, noise_mode="const",
                      method=lambda m, rgb, x, w, **kw: m.superresolution(rgb, x, w, **kw))
        return jnp.sum(img)

    @jax.jit
    def full_fn(params, xin):
        xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5)
        out = g.apply(params, xin, method=TriPlaneGenerator.f, noise_mode="const")
        return jnp.sum(out["image"])

    popts = dict(
        mode="default", thresh_weight=0.95, thresh_edges=0.02,
        thresh_occ=0.05, offset_occ=0.01, thresh_dxyz=0.000005,
    )

    @jax.jit
    def paste_fn(params, xin):
        xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5, paste_params=popts)
        out = g.apply(params, xin, method=TriPlaneGenerator.f, noise_mode="const")
        return jnp.sum(out["image"])

    timed("mapping_zplus", map_fn, params)
    timed("mapping+backbone(planes)", planes_fn, params)
    timed("triplane sample only (192/ray)", sample_only_fn, planes0)
    timed("full hierarchical render", render_fn, params, planes0)
    timed("superresolution", sr_fn, params)
    timed("FULL G.f", full_fn, params, xin)
    timed("FULL G.f + paste", paste_fn, params, xin)


if __name__ == "__main__":
    main()
