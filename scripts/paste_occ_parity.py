"""Flagship-shape parity of the grid paste-occlusion vs the render path.

VERDICT r4 item 2's output-parity evidence at the REAL shape: runs the full
flagship G.f paste-front forward twice — occ_impl='render' (the reference
structure: a second +z hierarchical render per view,
reference triplane.py:565-577) vs occ_impl='grid' (the TPU-native
per-portrait suffix-integral volume, models/volumetric/lattice.py) — on the
committed flagship-parity inputs, and commits mask agreement + final-image
deltas to PASTE_OCC_PARITY.json. Tiny-shape and analytic-scene agreement is
tested in tests/test_lattice.py; this quantifies it where it ships.

Weights: same random init + sigma-bias shift as scripts/ess_parity.py (see
its docstring for why the shift is needed for non-degenerate geometry).

Run: nohup python scripts/paste_occ_parity.py > /tmp/paste_occ.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/panic3d_jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "tests", "goldens",
    "flagship_parity_golden.npz",
)
OUTPATH = os.path.join(
    os.path.dirname(__file__), "..", "PASTE_OCC_PARITY.json"
)

PASTE = dict(
    mode="default", thresh_weight=0.95, thresh_edges=0.02,
    thresh_occ=0.05, offset_occ=0.01, thresh_dxyz=0.000005,
)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("ESS_PARITY_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    from panic3d_tpu import configs
    from panic3d_tpu.models.triplane import TriPlaneGenerator

    t0 = time.time()
    gold = np.load(GOLDEN)
    bs = gold["in_z"].shape[0]
    xin = {
        "z": jnp.asarray(gold["in_z"]),
        "elevations": jnp.asarray(gold["in_elevations"]),
        "azimuths": jnp.asarray(gold["in_azimuths"]),
        "distances": jnp.asarray(gold["in_distances"]),
        "fovs": jnp.asarray(gold["in_fovs"]),
        "cond": {
            "image_ortho_front": jnp.asarray(gold["in_img"]),
            "resnet_chonk": jnp.asarray(gold["in_chonk"]),
        },
        "triplane_crop": 0.1,
        "cull_clouds": 0.5,
    }
    sigma_shift = float(os.environ.get("ESS_SIGMA_SHIFT", "2.5"))
    ess = os.environ.get("PASTE_OCC_ESS", "1") == "1"
    g = configs.flagship(eval_mode=True, ess=ess)
    variables = g.init(
        {"params": jax.random.PRNGKey(0)},
        dict(xin, paste_params=dict(PASTE)),
        method=TriPlaneGenerator.f, noise_mode="const",
    )
    variables = jax.device_get(variables)
    b = np.asarray(variables["params"]["decoder"]["net2"]["bias"]).copy()
    b[0] += sigma_shift
    variables["params"]["decoder"]["net2"]["bias"] = jnp.asarray(b)
    print(f"[{time.time()-t0:.0f}s] init done (ess={ess})", flush=True)

    outs = {}
    for impl in ("render", "grid"):
        @jax.jit
        def fwd(variables, _impl=impl):
            # xin closed over: filters/paste_params are static config
            x = dict(xin, paste_params=dict(PASTE, occ_impl=_impl))
            return g.apply(variables, x, method=TriPlaneGenerator.f,
                           noise_mode="const")

        out = jax.device_get(fwd(variables))
        outs[impl] = {
            "mask_occ": np.asarray(out["paste"]["mask_occ"], np.float32),
            "mask": np.asarray(out["paste"]["mask"], np.float32),
            "image": np.asarray(out["image"], np.float32),
        }
        print(f"[{time.time()-t0:.0f}s] occ_impl={impl} rendered", flush=True)

    r, q = outs["render"], outs["grid"]
    img_d = np.abs(r["image"] - q["image"])
    mse = float((img_d ** 2).mean())
    results = {
        "config": f"flagship eval bs={bs} paste defaults ess={ess} "
                  f"sigma_shift={sigma_shift}",
        "mask_occ_agreement": float((r["mask_occ"] == q["mask_occ"]).mean()),
        "mask_agreement": float((r["mask"] == q["mask"]).mean()),
        "image_maxdiff": float(img_d.max()),
        "image_meandiff": float(img_d.mean()),
        "image_psnr": float(10 * np.log10(4.0 / mse)) if mse > 0 else None,
    }
    print(json.dumps(results, indent=1), flush=True)
    with open(OUTPATH, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[{time.time()-t0:.0f}s] wrote {OUTPATH}", flush=True)


if __name__ == "__main__":
    main()
