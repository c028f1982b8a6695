"""Probe: which gather formulation/layout does XLA-TPU lower fastest?

Variants over the same logical work (gather R rows of 256 bytes):
  dtype/width:  bf16 [T,128] | f32 [T,64] (bitcast) | f32 [T,128] (2x bytes)
  table size:   101 MB (HBM) | ~4 MB (VMEM-able)
  index order:  random | sorted (indices_are_sorted=True)
  formulation:  jnp.take | take_along_axis batched

Informs whether the packed-row gather is descriptor-bound, tile-bound, or
table-residency-bound, and whether any cheap reformulation beats jnp.take.
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
    R = 6 * 393216            # rows gathered per eval pass (packed form)
    take = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)
                                        .astype(jnp.float32)))
    take_sorted = jax.jit(lambda t, i: jnp.sum(
        jnp.take(t, i, axis=0, indices_are_sorted=True).astype(jnp.float32)))

    def report(name, t, rows, nbytes):
        print(f"{name:44s} {1000*t:8.2f} ms  {rows/t/1e6:7.1f} Mrows/s  "
              f"{nbytes/t/1e9:7.1f} GB/s")

    for T, tag in ((6 * 257 * 257, "101MB table"), (16384, "4MB table")):
        idx = rng.randint(0, T, size=R).astype(np.int32)
        idx_s = np.sort(idx)
        tb = jnp.asarray(rng.randn(T, 128), jnp.bfloat16)
        tf64 = jax.jit(lambda x: jax.lax.bitcast_convert_type(
            x.reshape(x.shape[0], 64, 2), jnp.float32))(tb)
        tf128 = jnp.asarray(rng.randn(T, 128), jnp.float32)
        i = jnp.asarray(idx)
        i_s = jnp.asarray(idx_s)

        t1 = timed(take, tb, i)
        report(f"[{tag}] bf16 [T,128] random", t1, R, R * 256)
        t2 = timed(take, tf64, i)
        report(f"[{tag}] f32 [T,64] random", t2, R, R * 256)
        t3 = timed(take, tf128, i)
        report(f"[{tag}] f32 [T,128] random (2x bytes)", t3, R, R * 512)
        t4 = timed(take_sorted, tb, i_s)
        report(f"[{tag}] bf16 [T,128] sorted+flagged", t4, R, R * 256)

    # batched take_along_axis form: [B, T/B, 128] tables, per-batch indices
    B = 6
    Tb = 257 * 257
    tb3 = jnp.asarray(rng.randn(B, Tb, 128), jnp.bfloat16)
    ib = jnp.asarray(rng.randint(0, Tb, size=(B, R // B, 1)).astype(np.int32))
    taa = jax.jit(lambda t, i: jnp.sum(
        jnp.take_along_axis(t, i, axis=1).astype(jnp.float32)))
    t5 = timed(taa, tb3, ib)
    report("[101MB] bf16 take_along_axis batched", t5, R, R * 256)


if __name__ == "__main__":
    main()
