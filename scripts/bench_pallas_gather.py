"""Fused Pallas gather+decode microbench (VERDICT r3 #1b, the second
render-speedup attempt).

Question: can a Pallas kernel that keeps a plane tile VMEM-resident and
fuses row gather + the OSG decoder's first matmul beat XLA's gather
lowering (measured r3: ~2.5 ns/row fixed, 72 Mrows/s at the eval's packed
128-lane bf16 rows)? The retired r2 kernel measured per-row VMEM dynamic
slices 5.6x slower than XLA's gather for the gather alone; this probe
re-tests the pattern WITH the fusion the VERDICT asked about (the decoder
matmul rides the gathered tile while it is VMEM-resident, removing the
intermediate HBM round trip).

Shapes mirror one ray-chunk of the flagship eval render: a [4096, 128]
packed-row table tile (VMEM-resident; float32 because Mosaic cannot vector.load a single bf16 sublane row), 128K gathered rows, a
[128->64] first-layer matmul. Baseline: jnp.take + dot, jit-fused by XLA.

Result is recorded in PARITY.md ("Pallas fused-gather attempt").
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/panic3d_jax_cache_tpu"),
)

ROWS = 4096          # table rows (one plane tile)
C = 128              # packed row lanes (bf16)
P = 131072           # gathered points
HID = 64             # decoder first-layer width
TILE = 512           # points per grid step


@jax.jit
def pallas_fused(idx, table, w):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
        ],
        out_specs=pl.BlockSpec(
            (TILE, HID), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32)],
    )

    def kernel(idx_sref, table_ref, w_ref, out_ref, rows_scratch):
        i = pl.program_id(0)

        def body(k, _):
            r = idx_sref[i * TILE + k]
            rows_scratch[pl.ds(k, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)
        out_ref[:] = jnp.dot(
            rows_scratch[:], w_ref[:], preferred_element_type=jnp.float32
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, HID), jnp.float32),
        grid_spec=grid_spec,
    )(idx, table, w)


@jax.jit
def xla_baseline(idx, table, w):
    rows = jnp.take(table, idx, axis=0)
    return jnp.dot(rows, w, preferred_element_type=jnp.float32)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(ROWS, C), jnp.float32)
    w = jnp.asarray(rng.randn(C, HID) * 0.1, jnp.float32)
    idx = jnp.asarray(rng.randint(0, ROWS, P), jnp.int32)

    t_x = timeit(xla_baseline, idx, table, w)
    print(f"XLA take+dot      {t_x:7.3f} ms  ({P/t_x*1e-3:7.1f} Mrows/s)")
    t_p = timeit(pallas_fused, idx, table, w)
    print(f"Pallas fused      {t_p:7.3f} ms  ({P/t_p*1e-3:7.1f} Mrows/s)")
    print(f"ratio pallas/xla  {t_p/t_x:.2f}x")

    got = np.asarray(pallas_fused(idx, table, w))
    want = np.asarray(xla_baseline(idx, table, w))
    print("maxdiff", float(np.abs(got - want).max()))


if __name__ == "__main__":
    main()
