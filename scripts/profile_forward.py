"""Op-level xprof breakdown of the flagship eval forward (bench.py's jit).

Reuses bench.py's exact forward (so the persistent compile cache applies),
traces a few calls on the real chip, and ranks HLO ops/categories by device
self time. This is the ground-truth decomposition harness — per-component
wall-clock scripts through the axon tunnel pay a ~30 ms host-read floor
per sync that swamps sub-ms ops (the round-3 "SR costs 52 ms" false alarm).
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/panic3d_jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from panic3d_tpu import configs
    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from __graft_entry__ import _flagship_inputs

    bs = int(os.environ.get("BENCH_BATCH", "2"))
    ess = os.environ.get("BENCH_ESS", "0") == "1"
    paste = os.environ.get("BENCH_PASTE", "0") == "1"
    g = configs.flagship(eval_mode=True, ess=ess)
    xin = _flagship_inputs(g, bs=bs)
    xin["azimuths"] = jnp.linspace(0.0, 330.0, bs)
    params = g.init(
        {"params": jax.random.PRNGKey(0)}, xin,
        method=TriPlaneGenerator.f, noise_mode="const",
    )
    popts = dict(
        mode="default", thresh_weight=0.95, thresh_edges=0.02,
        thresh_occ=0.05, offset_occ=0.01, thresh_dxyz=0.000005,
    ) if paste else None

    @jax.jit
    def forward(params, xin):
        xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5)
        if popts:
            xin["paste_params"] = popts
        out = g.apply(params, xin, method=TriPlaneGenerator.f,
                      noise_mode="const")
        return out["image"], jnp.sum(out["image"])

    _, chk = forward(params, xin)
    float(chk)
    t0 = time.perf_counter()
    for _ in range(3):
        _, chk = forward(params, xin)
    float(chk)
    wall = (time.perf_counter() - t0) / 3
    print(f"forward: {1000 * wall:.1f} ms/call (bs={bs})")

    logdir = "/tmp/fwd_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        _, chk = forward(params, xin)
    float(chk)
    jax.profiler.stop_trace()

    xsp = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xsp:
        print("no xplane captured")
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xsp, "op_profile", {})
    prof = json.loads(data)
    root = prof.get("byCategory") or prof.get("byProgram")
    total_ps = root["metrics"]["rawTime"]

    # category totals + leaf ops. op_profile nesting: root (byProgram/
    # byCategory) -> program (jit_forward) -> category (convolution /
    # gather / fusion classes ...) -> ops; aggregate at the CATEGORY level
    # and attribute each leaf to its category so fusions are nameable.
    cats, rows = [], []
    for prog in root.get("children", []):
        pname = prog.get("name", "?")
        for c in prog.get("children", []) or [prog]:
            m = c.get("metrics") or {}
            cats.append((m.get("rawTime", 0), f"{pname}/{c.get('name','?')}"))

            def walk(node, cat):
                ch = node.get("children") or []
                t = (node.get("metrics") or {}).get("rawTime", 0)
                # fusion nodes carry their time on the parent; children
                # (inner instructions) often report 0 — record any node
                # whose time is not accounted for by its children
                tch = sum(
                    (k.get("metrics") or {}).get("rawTime", 0) for k in ch
                )
                if t and t > tch:
                    rows.append((t - tch, f"{cat}: {node.get('name','?')}"))
                for k in ch:
                    walk(k, cat)

            walk(c, c.get("name", "?"))

    cats.sort(reverse=True)
    rows.sort(reverse=True)
    print(f"\nby category (device total {total_ps/1e9:.1f} ms / 3 calls):")
    for t, name in cats:
        print(f"  {100*t/total_ps:5.1f}%  {t/1e9:8.2f} ms  {name}")
    print("\ntop 30 ops by self time:")
    for t, name in rows[:30]:
        print(f"  {100*t/total_ps:5.1f}%  {t/1e9:8.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
