"""Decompose single-portrait -> 256³ mesh latency (the BASELINE p50 metric).

Stages: plane synthesis | 256³ chunked decode (TPU) | density grid to host
| marching tetrahedra (native C++) | vertex colors. Timing uses host reads
(axon block_until_ready is lazy).
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
from panic3d_tpu.eval import volume as vol
from panic3d_tpu.models.triplane import TriPlaneGenerator
from __graft_entry__ import _flagship_inputs


def main():
    g = configs.flagship(eval_mode=True)
    xin = _flagship_inputs(g, bs=1)
    params = g.init({"params": jax.random.PRNGKey(0)}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5)

    # warm (compile) once
    t0 = time.perf_counter()
    mesh = vol.extract_mesh(g, params, xin)
    print(f"cold extract_mesh                {time.perf_counter()-t0:8.2f} s "
          f"({len(mesh.verts)} verts)")

    for it in range(2):
        t0 = time.perf_counter()
        mesh = vol.extract_mesh(g, params, xin)
        print(f"warm extract_mesh (iter {it})      {time.perf_counter()-t0:8.2f} s")

    # stage decomposition (warm)
    planes_from_z, planes_from_ws, decode_all, decode_sigma = vol._cached_decoder(g, None)
    from panic3d_tpu.cameras.conventions import camera_label
    cam = camera_label(jnp.zeros(1), jnp.zeros(1), jnp.ones(1), 30 * jnp.ones(1))
    t0 = time.perf_counter()
    _, planes = planes_from_z(params, xin["z"], cam, xin["cond"])
    float(jnp.sum(planes[0, 0, 0, :2].astype(jnp.float32)))
    t_planes = time.perf_counter() - t0

    N = 256
    chunk = 2**17
    key = ("mesh", id(g), id(None), N, chunk, True, True, "float16")
    density_grid = vol._DECODER_CACHE[key]
    t0 = time.perf_counter()
    d = density_grid(params, planes, 0.1, 0.5)
    float(d[0, 0, 0].astype(jnp.float32))
    t_decode = time.perf_counter() - t0

    t0 = time.perf_counter()
    vol_np = np.asarray(d[0, : N**3, 0], dtype=np.float32).reshape(N, N, N)[::-1]
    t_xfer = time.perf_counter() - t0

    from panic3d_tpu.runtime.native_ops import marching_tetrahedra
    t0 = time.perf_counter()
    verts, faces = marching_tetrahedra(np.ascontiguousarray(vol_np), 0.5)
    t_mc = time.perf_counter() - t0

    print(f"planes synthesis                 {t_planes:8.2f} s")
    print(f"256³ decode (device)             {t_decode:8.2f} s")
    print(f"density grid -> host (fp16 33MB) {t_xfer:8.2f} s")
    print(f"marching tetrahedra ({len(verts):7d} v) {t_mc:8.2f} s")


if __name__ == "__main__":
    main()
