"""Quantify ESS vs the reference 96+96 quadrature at flagship shape.

VERDICT r4 item 3 + the r4 advisor's medium finding: ESS (empty-space
skipping, models/volumetric/renderer.py) is the default eval config, but its
quality evidence was analytic-scene only. This script renders the SAME
flagship-shape generator + the committed flagship-parity inputs
(tests/goldens/flagship_parity_golden.npz) under

  * the reference eval quadrature — uniform 96+96 over [0.5, 1.5]
    (eg3dc_v0.py:30-31,55-56), settings-parity anchor;
  * ESS at budgets 48+48 (production default), 32+32, 24+24,

and commits per-output deltas (max/mean |diff|, image PSNR) plus the
measured occupancy fraction to ESS_PARITY.json. JAX-vs-JAX is sufficient:
the committed torch golden already anchors the 96+96 side
(FLAGSHIP_PARITY.json).

Weights are the flax random init with the decoder's sigma bias shifted;
the sweep covers TWO density regimes (measured occupancy fraction is in
the JSON): +1.25 — head-like ~14% occupancy, the regime ESS is designed
for (intervals narrow, effective spacing beats uniform 96+96); +2.5 —
dense ~58% occupancy matching the committed torch-golden geometry
(FLAGSHIP_PARITY.json), the worst case for ESS (intervals barely narrow,
so 48+48 degenerates toward a plain budget halving). Without a shift a
random-init density is culled to nothing and the narrowing would not be
exercised.

Run: nohup python scripts/ess_parity.py > /tmp/ess_parity.log 2>&1 &
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
OUTPATH = os.path.join(os.path.dirname(__file__), "..", "ESS_PARITY.json")
OUT_KEYS = ["image", "image_raw", "image_depth", "image_weights"]


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

    shifts = [
        float(s) for s in
        os.environ.get("ESS_SIGMA_SHIFTS", "1.25,2.5").split(",")
    ]

    def build(ess_budget):
        """ess_budget None -> uniform 96+96; else ESS with that budget."""
        if ess_budget is None:
            g = configs.flagship(eval_mode=True, ess=False)
        else:
            g = configs.flagship(
                eval_mode=True, ess=True,
                rendering_kwargs=dict(
                    depth_resolution=ess_budget,
                    depth_resolution_importance=ess_budget,
                ),
            )
        return g

    # one shared init (identical weights across configs: rendering kwargs
    # don't affect parameter shapes); the per-regime sigma shift is applied
    # to a copy below
    g0 = build(None)
    variables0 = jax.device_get(g0.init(
        {"params": jax.random.PRNGKey(0)}, xin,
        method=TriPlaneGenerator.f, noise_mode="const",
    ))
    b0 = np.asarray(variables0["params"]["decoder"]["net2"]["bias"]).copy()
    print(f"[{time.time()-t0:.0f}s] init done (shifts {shifts})", flush=True)

    results = {
        "config": f"flagship eval bs={bs} crop0.1 cull0.5 production "
                  "render_dtype; per-regime decoder sigma-bias shift",
    }
    for sigma_shift in shifts:
        regime = f"shift{sigma_shift:g}"
        variables = variables0
        b = b0.copy()
        b[0] += sigma_shift
        variables["params"]["decoder"]["net2"]["bias"] = jnp.asarray(b)
        results[regime] = run_regime(
            jax, jnp, configs, TriPlaneGenerator, build, variables, xin,
            gold, bs, t0, sigma_shift,
        )

    with open(OUTPATH, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[{time.time()-t0:.0f}s] wrote {OUTPATH}", flush=True)


def run_regime(jax, jnp, configs, TriPlaneGenerator, build, variables, xin,
               gold, bs, t0, sigma_shift):
    results = {"sigma_shift": sigma_shift}

    # occupancy fraction at the production ESS grid — how much narrowing
    # the scene actually offers (head-like scenes: ~0.05-0.25)
    g_e = build(48)
    ws = g_e.apply(variables, jnp.asarray(gold["in_z"]),
                   jnp.zeros((bs, 25)), xin["cond"],
                   method=TriPlaneGenerator.mapping)
    planes = g_e.apply(variables, ws, xin["cond"], noise_mode="const",
                       method=TriPlaneGenerator._planes_from_ws)
    occ, occ_out = g_e.apply(
        variables, planes, triplane_crop=0.1, cull_clouds=0.5,
        method=TriPlaneGenerator.ess_occupancy_for_planes,
    )
    results["occ_fraction"] = float(np.asarray(occ).mean())
    results["occ_outside"] = float(np.asarray(occ_out))
    print(f"[{time.time()-t0:.0f}s] occupancy fraction "
          f"{results['occ_fraction']:.4f} (outside {results['occ_outside']})",
          flush=True)

    outs = {}
    for budget in (None, 48, 32, 24):
        name = "uniform96" if budget is None else f"ess{budget}"
        g = build(budget)

        @jax.jit
        def fwd(variables, _g=g):
            # xin closed over: triplane_crop/cull_clouds are static config
            return _g.apply(variables, xin, method=TriPlaneGenerator.f,
                            noise_mode="const")

        out = jax.device_get(fwd(variables))
        outs[name] = {k: np.asarray(out[k], np.float32) for k in OUT_KEYS}
        print(f"[{time.time()-t0:.0f}s] {name} rendered", flush=True)

    ref = outs["uniform96"]
    for name, out in outs.items():
        if name == "uniform96":
            continue
        entry = {}
        for k in OUT_KEYS:
            d = np.abs(out[k] - ref[k])
            entry[k] = {
                "maxdiff": float(d.max()),
                "meandiff": float(d.mean()),
                "ref_absmean": float(np.abs(ref[k]).mean()),
            }
        # PSNR on the final 512 image, reference convention: [-1,1] range
        # -> peak-to-peak 2
        mse = float(((out["image"] - ref["image"]) ** 2).mean())
        entry["image_psnr_vs_uniform96"] = (
            float(10 * np.log10(4.0 / mse)) if mse > 0 else float("inf")
        )
        results[name] = entry
        print(name, json.dumps(entry, indent=1), flush=True)

    return results


if __name__ == "__main__":
    main()
