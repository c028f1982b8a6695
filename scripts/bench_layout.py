"""NCHW vs NHWC conv layout probe for the G synthesis stack (VERDICT r3 #4a).

The training step is HBM-bandwidth-bound (PARITY.md roofline); every conv
in the package runs logical NCHW (`ops/conv.py:43`). If XLA's TPU layout
assignment inserted relayout copies around NCHW convs, switching the
package to NHWC would be a bandwidth lever. This probe times a
representative synthesis slab — style-modulated 3x3 convs at 128²/256²
with demod scaling, noise add and leaky-relu epilogue, forward AND
backward — in both logical layouts, fp32 and bf16, on the real chip.

Verdict from the r4 run is recorded in PARITY.md ("Layout probe").
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/panic3d_jax_cache_tpu"),
)

BS = int(os.environ.get("BENCH_BATCH", "2"))
RES = 128
CH = 256


def make_stack(layout):
    if layout == "NCHW":
        dn = ("NCHW", "OIHW", "NCHW")
        cax = 1
    else:
        dn = ("NHWC", "HWIO", "NHWC")
        cax = 3

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )

    def sscale(x, s):  # per-sample channel scale (modulation / demod)
        shape = [1, 1, 1, 1]
        shape[0] = x.shape[0]
        shape[cax] = x.shape[cax]
        return x * s.reshape(shape)

    def f(params, x, noise):
        w1, w2, w3, s1, s2, s3, d1, d2, d3 = params
        for w, s, d in ((w1, s1, d1), (w2, s2, d2), (w3, s3, d3)):
            x = sscale(x, s)
            x = conv(x, w)
            x = sscale(x, d)
            x = jax.nn.leaky_relu(x + noise, 0.2) * np.sqrt(2)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    return f


def run(layout, dtype):
    rng = np.random.RandomState(0)
    if layout == "NCHW":
        x = rng.randn(BS, CH, RES, RES)
        noise = rng.randn(1, 1, RES, RES)
        wshape = (CH, CH, 3, 3)
    else:
        x = rng.randn(BS, RES, RES, CH)
        noise = rng.randn(1, RES, RES, 1)
        wshape = (3, 3, CH, CH)
    x = jnp.asarray(x, dtype)
    noise = jnp.asarray(noise, dtype)
    ws = [jnp.asarray(rng.randn(*wshape) * 0.05, dtype) for _ in range(3)]
    ss = [jnp.asarray(rng.rand(BS, CH) + 0.5, dtype) for _ in range(6)]
    params = tuple(ws + ss)

    f = make_stack(layout)

    @jax.jit
    def step(params, x, noise):
        val, g = jax.value_and_grad(f)(params, x, noise)
        return val + sum(jnp.sum(t.astype(jnp.float32)) for t in g)

    chk = step(params, x, noise)
    float(chk)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = step(params, x, noise)
    float(chk)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{layout:5s} {np.dtype(dtype).name:9s} fwd+bwd {dt:7.2f} ms")
    return dt


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        a = run("NCHW", dtype)
        b = run("NHWC", dtype)
        print(f"  -> NHWC/NCHW ratio {b / a:.3f}")


if __name__ == "__main__":
    main()
