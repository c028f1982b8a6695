"""Benchmark: 512² rendered views/sec/chip on the flagship generator.

Runs the eval-mode ecrutileE_eclustrousC forward (96+96 ray samples at 64²
neural res -> SR to 512², BASELINE.md eval settings) and reports sustained
views/sec on one chip.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the driver target is >=5x an RTX 3080 Ti running the torch reference, which
renders ~2 views/sec at these settings (eval-time G.f at 96+96 samples,
single image per call). vs_baseline = views_per_sec / 2.0 against that
estimate until a measured torch baseline lands.
"""

import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from panic3d_tpu import configs
    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from __graft_entry__ import _flagship_inputs

    # bs=2 with auto ray-chunking is the per-chip optimum on v5e (larger
    # batches scale superlinearly in cost — gather working sets spill)
    
    bs = int(os.environ.get("BENCH_BATCH", "2"))
    g = configs.flagship(eval_mode=True)
    xin = _flagship_inputs(g, bs=bs)
    # spread over turntable azimuths like eval.generate's spin12
    xin["azimuths"] = jnp.linspace(0.0, 330.0, bs)

    params = g.init(
        {"params": jax.random.PRNGKey(0)}, xin,
        method=TriPlaneGenerator.f, noise_mode="const",
    )

    @jax.jit
    def forward(params, xin):
        # eval-time density filters are static config, not traced inputs
        xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5)
        out = g.apply(params, xin, method=TriPlaneGenerator.f, noise_mode="const")
        # scalar checksum: forces execution to completion on platforms whose
        # block_until_ready is lazy (axon tunnel), with an 8-byte host read
        return out["image"], jnp.sum(out["image"])

    # warmup / compile (float() forces full materialization)
    img, chk = forward(params, xin)
    float(chk)

    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        _, chk = forward(params, xin)
        float(chk)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    views_per_sec = bs / dt
    baseline = 2.0  # est. torch reference on RTX 3080 Ti (see docstring)
    print(json.dumps({
        "metric": "render_512px_views_per_sec_per_chip",
        "value": round(views_per_sec, 3),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
