"""Map hot fusion names from profile_forward.py to their source ops.

Compiles bench.py's exact forward (same config flags => same fusion
numbering as the xprof run), prints each requested fusion's root
instruction + the op_name metadata of its constituent instructions, so
"custom fusion: fusion.3" becomes "gather of packed planes at
renderer.py sample_from_planes".

Usage: python scripts/attribute_hlo.py fusion.3 fusion.217 ...
       (no args: prints the 40 largest fusions by instruction count)
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

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
    ess = os.environ.get("BENCH_ESS", "1") == "1"
    paste = os.environ.get("BENCH_PASTE", "1") == "1"
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

    compiled = forward.lower(params, xin).compile()
    txt = compiled.as_text()
    with open("/tmp/fwd_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: /tmp/fwd_hlo.txt ({len(txt)} bytes)")

    # parse fusion computations: `%fused_computation.N (...)` bodies plus
    # the callers `%fusion.N = ... fusion(...), calls=%fused_computation.N,
    # ... metadata={op_name="..."}`
    want = sys.argv[1:]
    # caller lines
    callers = {}
    for m in re.finditer(r"%?(fusion[.\w]*) = ([^\n]*)", txt):
        callers[m.group(1)] = m.group(2)
    for name in want:
        line = callers.get(name)
        print("\n=== ", name, " ===")
        if not line:
            print("  (no caller line found)")
            continue
        mm = re.search(r'calls=%?([\w.\-]+)', line)
        md = re.search(r'op_name="([^"]*)"', line)
        shp = line.split(" fusion(")[0].split(" = ")[-1]
        print("  out:", shp[:120])
        if md:
            print("  op_name:", md.group(1)[:160])
        if mm:
            comp = mm.group(1)
            # find the computation body
            body = re.search(
                r"%?" + re.escape(comp) + r" \([^)]*\) -> [^{]*\{(.*?)\n\}",
                txt, re.S)
            if body:
                ops = {}
                names = set()
                for ln in body.group(1).splitlines():
                    om = re.search(r"= [\w<>\[\],{}\/ ]*? ([a-z\-]+)\(", ln)
                    if om:
                        ops[om.group(1)] = ops.get(om.group(1), 0) + 1
                    nm = re.search(r'op_name="([^"]*)"', ln)
                    if nm:
                        names.add(nm.group(1))
                print("  body ops:", dict(sorted(ops.items(),
                                                 key=lambda kv: -kv[1])))
                for n in sorted(names)[:12]:
                    print("   src:", n[:150])


if __name__ == "__main__":
    main()
