"""Microbenchmark: triplane gather variants vs the HBM gather roofline.

Measures, at the flagship eval working set (bs=2 views, 64² rays x 96
samples, 3 planes of 32ch at 256²):
  1. unpacked 4-corner bilinear gather (ops.grid_sample.grid_sample_2d_points)
  2. corner-packed single-row gather (grid_sample_2d_points_packed)
  3. a raw jnp.take row-gather probe (no lerp math) at both row widths —
     the achievable ceiling for any gather-based implementation

and reports achieved effective GB/s against the chip's HBM peak. This is
the committed evidence for retiring the Pallas gather kernel (VERDICT r1
item 8): if the XLA packed path sits at the same row rate as the raw take
probe, the gather is descriptor-rate-bound in hardware and no kernel
reformulation of the same access pattern can beat it.

Usage: python scripts/bench_gather.py  (runs on the default TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")

from panic3d_tpu.ops.grid_sample import (
    grid_sample_2d_points,
    grid_sample_2d_points_packed,
    pack_bilinear_2d,
)

HBM_PEAK_GBS = float(os.environ.get("BENCH_HBM_GBS", "819"))  # v5e spec


def timed(fn, *args, iters=6):
    chk = fn(*args)
    float(chk)  # force full materialization (axon block_until_ready is lazy)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    dtype = jnp.bfloat16
    NP, C, H, W = 6, 32, 256, 256      # bs=2 x 3 planes
    M = 64 * 64 * 96                    # rays x samples per view-plane
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(NP, C, H, W), dtype=dtype)
    pts = jnp.asarray(rng.rand(NP, M, 2) * 2 - 1, dtype=jnp.float32)
    packed = jax.jit(pack_bilinear_2d)(planes)
    n_rows_unpacked = NP * M * 4
    n_rows_packed = NP * M

    unpacked_f = jax.jit(lambda p, q: jnp.sum(
        grid_sample_2d_points(p, q).astype(jnp.float32)))
    packed_f = jax.jit(lambda p, q: jnp.sum(
        grid_sample_2d_points_packed(p, q).astype(jnp.float32)))

    t_un = timed(unpacked_f, planes, pts)
    t_pk = timed(packed_f, packed, pts)

    # raw row-gather probes: same row counts/widths, indices precomputed
    flat32 = planes.transpose(0, 2, 3, 1).reshape(-1, C)          # 32-lane rows
    flat128 = packed.reshape(-1, 4 * C)                            # 128-lane rows
    idx32 = jnp.asarray(
        rng.randint(0, flat32.shape[0], size=n_rows_unpacked), jnp.int32)
    idx128 = jnp.asarray(
        rng.randint(0, flat128.shape[0], size=n_rows_packed), jnp.int32)
    take_f = jax.jit(lambda t, i: jnp.sum(
        jnp.take(t, i, axis=0).astype(jnp.float32)))
    t_take32 = timed(take_f, flat32, idx32)
    t_take128 = timed(take_f, flat128, idx128)

    bpe = np.dtype(np.float32).itemsize if dtype == jnp.float32 else 2
    bytes_un = n_rows_unpacked * C * bpe
    bytes_pk = n_rows_packed * 4 * C * bpe

    def row(name, t, rows, nbytes):
        gbs = nbytes / t / 1e9
        print(f"{name:34s} {1000*t:8.2f} ms  {rows/t/1e6:8.1f} Mrows/s  "
              f"{gbs:7.1f} GB/s  ({100*gbs/HBM_PEAK_GBS:.1f}% of HBM peak)")

    print(f"working set: {NP} planes x {M} pts, dtype={np.dtype(np.float32).name if bpe==4 else 'bfloat16'}")
    row("bilinear 4-corner (32-lane rows)", t_un, n_rows_unpacked, bytes_un)
    row("bilinear packed (128-lane rows)", t_pk, n_rows_packed, bytes_pk)
    row("raw take, 32-lane rows", t_take32, n_rows_unpacked, bytes_un)
    row("raw take, 128-lane rows", t_take128, n_rows_packed, bytes_pk)


if __name__ == "__main__":
    main()
