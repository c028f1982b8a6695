"""Op-level breakdown of the superresolution module (bs=2 flagship shapes).

Captures a jax.profiler device trace of REPS SR applies in one jit and
parses it with xprof's op_profile converter to rank HLO op categories by
self time. Also prints the upfirdn call census (shape, up, down).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")

import importlib

from panic3d_tpu.models import superresolution as srmod

ufmod = importlib.import_module("panic3d_tpu.ops.upfirdn2d")

REPS = 10


def main():
    bs = 2
    sr = srmod.SuperresolutionHybrid8XDC(
        channels=32, img_resolution=512, sr_num_fp16_res=4, sr_antialias=True
    )
    rgb = jnp.zeros((bs, 3, 64, 64))
    x = jnp.zeros((bs, 32, 64, 64))
    ws = jnp.zeros((bs, 14, 512))
    variables = sr.init(jax.random.PRNGKey(0), rgb, x, ws, noise_mode="const")

    # upfirdn census (one abstract trace)
    counts = []
    real_upfirdn = ufmod.upfirdn2d

    def counting(x, f, **kw):
        counts.append((tuple(x.shape), kw.get("up", 1), kw.get("down", 1)))
        return real_upfirdn(x, f, **kw)

    import panic3d_tpu.ops.conv as convmod
    saved = convmod.upfirdn2d
    ufmod.upfirdn2d = counting
    convmod.upfirdn2d = counting
    jax.eval_shape(lambda v: sr.apply(v, rgb, x, ws, noise_mode="const"),
                   variables)
    ufmod.upfirdn2d = real_upfirdn
    convmod.upfirdn2d = saved
    print(f"upfirdn calls: {len(counts)}")
    for c in counts:
        print("   shape", c[0], "up", c[1], "down", c[2])

    @jax.jit
    def run(variables, rgb, x, ws):
        def body(_, r):
            img = sr.apply(variables, r[:, :, :64, :64] * 0 + rgb, x, ws,
                           noise_mode="const")
            return r + 1e-6 * img
        r = jnp.zeros((bs, 3, 512, 512))
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, r))

    float(run(variables, rgb, x, ws))  # compile
    t0 = time.perf_counter()
    float(run(variables, rgb, x, ws))
    total = time.perf_counter() - t0
    print(f"SR full: {1000 * total / REPS:.1f} ms/apply (incl ~30ms/REPS "
          "tunnel floor)")

    logdir = "/tmp/sr_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    float(run(variables, rgb, x, ws))
    jax.profiler.stop_trace()

    xsp = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane:", xsp)
    if not xsp:
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xsp, "op_profile", {})
    prof = json.loads(data)

    # walk the op_profile tree: byCategory -> children (categories) ->
    # children (ops); print self-time ranked ops
    root = prof.get("byCategory") or prof.get("byProgram")
    total_ps = root["metrics"]["rawTime"]

    rows = []

    def walk(node, path):
        ch = node.get("children") or []
        m = node.get("metrics") or {}
        t = m.get("rawTime", 0)
        if not ch and t:
            rows.append((t, "/".join(path[-2:])))
        for c in ch:
            walk(c, path + [c.get("name", "?")])

    walk(root, [])
    rows.sort(reverse=True)
    print(f"\ntop ops by self time (total {total_ps/1e9:.1f} ms):")
    for t, name in rows[:25]:
        print(f"  {100*t/total_ps:5.1f}%  {t/1e9:7.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
