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
from panic3d_tpu.eval.volume import extract_mesh
from panic3d_tpu.models.triplane import TriPlaneGenerator
from __graft_entry__ import _flagship_inputs


def main():
    res = int(os.environ.get("MESH_RES", "256"))
    g = configs.flagship(eval_mode=True)
    xin = _flagship_inputs(g, bs=1)
    params = g.init({"params": jax.random.PRNGKey(0)}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    # random-init model: no density crossing survives crop+cull, so bench
    # the unfiltered path (a trained model yields a real surface either way)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        mc = extract_mesh(g, params, xin, resolution=res, level=0.27)
        t1 = time.perf_counter()
        times.append(t1 - t0)
        print(f"iter {i}: portrait->mesh {t1-t0:.2f}s "
              f"verts={len(mc.verts)} faces={len(mc.faces)}")
    print(f"p50 portrait->mesh latency @ {res}^3: {float(np.median(times)):.2f}s")


if __name__ == "__main__":
    main()
