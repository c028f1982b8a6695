"""Single-portrait -> mesh latency (BASELINE.md metric #2).

Runs the full geometry path: mapping -> backbone planes -> 256^3 chunked
decode (eval/volume.py) -> density filters -> native marching tetrahedra,
on the flagship eval config, and prints p50 latency.
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
from panic3d_tpu.eval.volume import get_volume, marching_cubes
from panic3d_tpu.models.triplane import TriPlaneGenerator
from __graft_entry__ import _flagship_inputs


def main():
    res = int(os.environ.get("MESH_RES", "256"))
    g = configs.flagship(eval_mode=True)
    xin = _flagship_inputs(g, bs=1)
    params = g.init({"params": jax.random.PRNGKey(0)}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        vol = get_volume(g, params, xin, resolution=res)
        t1 = time.perf_counter()
        mc = marching_cubes(vol.densities[0, 0], vol.rgbs[0, :3],
                            g.rk["box_warp"], level=0.5)
        t2 = time.perf_counter()
        times.append((t1 - t0, t2 - t1))
        print(f"iter {i}: decode={t1-t0:.2f}s mesh={t2-t1:.2f}s "
              f"verts={len(mc.verts)} faces={len(mc.faces)}")
    dec = float(np.median([t[0] for t in times]))
    msh = float(np.median([t[1] for t in times]))
    print(f"p50 portrait->mesh latency @ {res}^3: {dec+msh:.2f}s "
          f"(decode {dec:.2f}s + marching {msh:.2f}s)")


if __name__ == "__main__":
    main()
