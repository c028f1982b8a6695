"""Microbench: upfirdn2d lowerings (depthwise conv / unrolled slices /
polyphase) at the flagship SR shapes.

Methodology: each timing runs REPS dependent applications inside one jit
(fori_loop) so per-call host-sync cost (the ~30 ms axon tunnel floor) is
paid once; an identically-structured near-empty loop measures that floor
and is subtracted. Numbers are ms per single op.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")

import importlib

uf = importlib.import_module("panic3d_tpu.ops.upfirdn2d")

REPS = 50


def timed_total(fn, *args, iters=5):
    fn(*args).block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return 1000 * np.median(ts)


def loop(body):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, body, x)
    return run


def main():
    f = uf.setup_filter([1, 3, 3, 1])
    for (n, c, h) in [(2, 32, 128), (2, 128, 256), (2, 64, 512), (2, 3, 256)]:
        x = jnp.zeros((n, c, h, h), jnp.bfloat16)
        floor = timed_total(loop(lambda _, x: x * 1.0000001), x)
        line = f"[{n},{c},{h}²] floor={floor:5.1f}ms |"
        for impl in ("conv", "unroll", "poly"):
            uf.FORCE_IMPL = impl

            def up2(_, x, impl=impl):
                y = uf.upfirdn2d(x, f, up=2, padding=[2, 1, 2, 1], gain=4)
                return y[:, :, : x.shape[2], : x.shape[3]] + x

            def fir(_, x, impl=impl):
                return uf.upfirdn2d(x, f, padding=[2, 1, 2, 1]) + x

            def dn2(_, x, impl=impl):
                y = uf.upfirdn2d(x, f, down=2, padding=[2, 1, 2, 1])
                return jnp.pad(y, ((0, 0), (0, 0), (0, h - y.shape[2]),
                                   (0, h - y.shape[3]))) + x

            t_up = (timed_total(loop(up2), x) - floor) / REPS
            t_f = (timed_total(loop(fir), x) - floor) / REPS
            if impl == "poly":
                # the poly lowering only exists for down==1 (ops/upfirdn2d.py
                # dispatch); forcing it on dn2 would silently measure conv
                line += f"  {impl}: up2={t_up:6.2f} f={t_f:6.2f} dn2=   n/a"
            else:
                t_dn = (timed_total(loop(dn2), x) - floor) / REPS
                line += f"  {impl}: up2={t_up:6.2f} f={t_f:6.2f} dn2={t_dn:6.2f}"
            uf.FORCE_IMPL = None
        print(line, flush=True)


if __name__ == "__main__":
    main()
