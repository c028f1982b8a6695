"""Probe: XLA-TPU row-gather rate as a function of row width and dtype.

The packed bilinear gather uses 128-lane bf16 rows (256 B) at a measured
~62 Mrows/s. The roofline model (2.5 ns/row + 0.053 ns/B) was fit on
64 B / 256 B / 512 B points only; if the per-row cost is actually FLAT
above some width (512 B gathers at the same rate as 256 B), an xy-pair
packed layout (two 64-lane rows per point/plane instead of one 128-lane
row) could beat the current one — this script measures every
(width, dtype) cell so the layout choice rests on data, not the 3-point
fit.

Usage: python scripts/bench_gather_rowwidth.py  (on the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")


def timed(fn, *args, iters=5):
    chk = fn(*args)
    float(chk)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    R = 6 * 393216  # rows per eval pass (packed form working set)
    T = 6 * 257 * 257
    idx = jnp.asarray(rng.randint(0, T, size=R).astype(np.int32))
    take = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)
                                        .astype(jnp.float32)))

    print(f"{R} random rows from a {T}-row table")
    for dtype, dname, bpe in ((jnp.bfloat16, "bf16", 2), (jnp.float32, "f32", 4)):
        for lanes in (32, 64, 128, 256):
            tb = jnp.asarray(rng.randn(T, lanes), dtype)
            t = timed(take, tb, idx)
            rb = lanes * bpe
            print(f"{dname:5s} [T,{lanes:3d}] ({rb:4d} B/row): "
                  f"{1000*t:8.2f} ms  {R/t/1e6:7.1f} Mrows/s  "
                  f"{R*rb/t/1e9:6.1f} GB/s  {1e9*t/R:5.2f} ns/row")


if __name__ == "__main__":
    main()
