"""Benchmark: 512² rendered views/sec/chip on the flagship generator.

Runs the eval-mode ecrutileE_eclustrousC forward (96+96 ray samples at 64²
neural res -> SR to 512², BASELINE.md eval settings) and reports sustained
views/sec on one chip.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md),
and no NVIDIA GPU exists in this environment, so the RTX 3080 Ti divisor is
DERIVED from measured anchors (scripts/bench_torch_baseline.py, r3):
  * measured: the torch reference G.f at these exact settings runs at
    7.16 s/view on this host's CPU core (0.140 views/s), with the same
    core's achieved GEMM rate measured at 114 GFLOP/s;
  * spec ratio: 3080 Ti fp32 peak 34.1 TFLOPs = 299x that core's achieved
    rate -> HARD upper bound 0.140*299 = 42 views/s at perfect
    efficiency transfer (unachievable: torch eager at bs=1 on a GPU is
    launch/memory-bound);
  * the one remaining assumption is the eager-GPU derate; 4:1 (typical
    bs=1 small-kernel utilization gap vs CPU eager) gives the baseline
    estimate of 10 views/s used here. vs_baseline = views_per_sec / 10.0
    (override via BASELINE_VIEWS_PER_SEC).
The previous rounds' divisor was a flat ~2 views/s guess; the change is
provenance, not a regression — absolute views/s is the headline number.
"""

import json
import os
import threading
import time

os.environ.setdefault("XLA_FLAGS", "")

# Watchdog: the axon tunnel can wedge so hard that even jax.devices()
# blocks forever inside a C call (SIGALRM handlers never run there); a
# daemon thread + os._exit fails loudly instead of hanging the driver's
# bench run. Override via BENCH_TIMEOUT (seconds).
_bench_done = threading.Event()


def _watchdog():
    t = int(os.environ.get("BENCH_TIMEOUT", "3300"))
    if not _bench_done.wait(timeout=t):
        os.write(2, (
            f"bench.py watchdog expired (BENCH_TIMEOUT={t}s): device init "
            "or compile never completed - the TPU tunnel is likely wedged; "
            "no metric emitted\n").encode())
        os._exit(17)


threading.Thread(target=_watchdog, daemon=True).start()

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the flagship's first TPU compile is ~5-8 min
# through the tunnel; cached loads are seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/panic3d_jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from panic3d_tpu import configs
    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from __graft_entry__ import _flagship_inputs

    # bs=2 with auto ray-chunking is the per-chip optimum on v5e (larger
    # batches scale superlinearly in cost — gather working sets spill)
    
    bs = int(os.environ.get("BENCH_BATCH", "2"))
    # Empty-space skipping is the default eval config (48+48 samples
    # re-concentrated into per-ray occupied intervals; equal or better
    # effective sample spacing than the reference 96+96 quadrature — see
    # configs.flagship and tests/test_ess.py). BENCH_ESS=0 selects the
    # reference's uniform 96+96 quadrature for apples-to-apples runs.
    ess = os.environ.get("BENCH_ESS", "1") == "1"
    # BENCH_PACKED_CORNERS=1 enables the fused corner-dot decode (lerp +
    # plane mean + decoder first layer in one MXU dot) — measured SLOWER
    # than the default gather->lerp->mean->dot order (r5 A/B: paste-on
    # 21.8 vs 24.2 views/s; the 12x-tiled kernel outweighs the saved
    # layout copies), kept for A/B reproduction
    rk_over = {}
    if os.environ.get("BENCH_PACKED_CORNERS", "0") == "1":
        rk_over["decoder_packed_corners"] = True
    # BENCH_MERGE_GATHERS=1 swaps the eval composite's argsort merge for
    # the all-gather cross-count merge (bit-identical on sorted halves,
    # tests/test_renderer.py::test_merge_composite_gathers_only_bit_identical)
    if os.environ.get("BENCH_MERGE_GATHERS", "0") == "1":
        rk_over["merge_gathers_only"] = True
    g = configs.flagship(eval_mode=True, ess=ess, rendering_kwargs=rk_over)
    xin = _flagship_inputs(g, bs=bs)
    # spread over turntable azimuths like eval.generate's spin12
    xin["azimuths"] = jnp.linspace(0.0, 330.0, bs)

    params = g.init(
        {"params": jax.random.PRNGKey(0)}, xin,
        method=TriPlaneGenerator.f, noise_mode="const",
    )

    # Both the paste-off forward AND the paste-on forward (the full
    # eval.generate per-view workload, BASELINE.md eval settings include
    # paste_params, reference generate.py:55-66) are measured every run;
    # the paste-ON object is emitted LAST so the driver's parsed headline
    # metric tracks the real workload. BENCH_PASTE=0/1 restricts to one.
    popts = dict(
        mode="default", thresh_weight=0.95, thresh_edges=0.02,
        thresh_occ=0.05, offset_occ=0.01, thresh_dxyz=0.000005,
    )
    which = os.environ.get("BENCH_PASTE", "both")
    variants = {"0": [False], "1": [True]}.get(which, [False, True])

    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    # derived torch-on-3080Ti estimate from measured anchors (docstring;
    # scripts/bench_torch_baseline.py): 0.140 views/s measured on CPU x299
    # spec ratio / 4 eager-GPU derate. The derate is the one assumption the
    # anchors don't pin; the emitted baseline_range spans plausible derates
    # (2:1 optimistic GPU .. 8:1 pessimistic) so vs_baseline carries its
    # error bar in every round's artifact.
    baseline = float(os.environ.get("BASELINE_VIEWS_PER_SEC", 10.0))
    spec_bound = 42.0  # measured CPU rate x 3080Ti/CPU achieved-GEMM ratio
    baseline_range = [round(spec_bound / 8, 2), round(spec_bound / 2, 2)]
    lines = []
    for paste in variants:

        @jax.jit
        def forward(params, xin, _paste=paste):
            # eval-time density filters are static config, not traced inputs
            xin = dict(xin, triplane_crop=0.1, cull_clouds=0.5)
            if _paste:
                xin["paste_params"] = popts
            out = g.apply(params, xin, method=TriPlaneGenerator.f, noise_mode="const")
            # scalar checksum: forces execution to completion on platforms
            # whose block_until_ready is lazy (axon tunnel), with an 8-byte
            # host read
            return out["image"], jnp.sum(out["image"])

        # warmup / compile (float() forces full materialization)
        img, chk = forward(params, xin)
        float(chk)

        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            _, chk = forward(params, xin)
            float(chk)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))

        # sustained mode: queue all calls, sync once at the end. Calls
        # execute in order on the single device stream, so reading the LAST
        # checksum bounds them all; this hides the per-call host RPC latency
        # of the tunnel, matching how eval.generate actually renders (many
        # views per portrait, pipelined).
        t0 = time.perf_counter()
        for _ in range(n_iters):
            _, chk = forward(params, xin)
        float(chk)
        dt_sustained = (time.perf_counter() - t0) / n_iters

        views_per_sec = bs / dt
        out = {
            "metric": (
                "render_512px_paste_views_per_sec_per_chip"
                if paste else "render_512px_views_per_sec_per_chip"
            ) + ("_ess" if ess else ""),
            "value": round(views_per_sec, 3),
            "unit": "views/s",
            "vs_baseline": round(views_per_sec / baseline, 3),
            "baseline_views_per_sec": baseline,
            # derate-uncertainty band on the 3080 Ti divisor (docstring):
            # [8:1, 2:1] eager-GPU derates of the 42 views/s spec bound
            "baseline_range": baseline_range,
            "vs_baseline_range": [
                round(views_per_sec / baseline_range[1], 3),
                round(views_per_sec / baseline_range[0], 3),
            ],
            # True when this config reproduces the reference's eval-time
            # quadrature exactly (uniform 96+96); ESS re-concentrates the
            # same sample budget, quality-equivalence quantified in
            # ESS_PARITY.json rather than assumed
            "settings_parity": not ess,
            "views_per_sec_sustained": round(bs / dt_sustained, 3),
            "paste_front": paste,
        }
        mfu = _mfu(forward, params, xin, dt)
        if mfu:
            out.update(mfu)
        lines.append(json.dumps(out))

    # ------------------------------------------------------------------
    # Production-pipeline metric (emitted LAST = the driver's headline):
    # eval.generate's per-portrait workload — ONE planes bundle (backbone
    # synthesis + ESS occupancy + paste occlusion volume, _get_planes_jit)
    # feeding all 16 views (4 ortho + spin12) in vb=2 plane-reusing
    # batches (_get_render_jit from_planes=True). The per-call metrics
    # above re-run the backbone and per-portrait builds every call; a
    # user of eval.generate amortizes them over the turntable, so views/s
    # here INCLUDES the setup, measured the way production spends it.
    # BENCH_TURNTABLE=0 skips (e.g. quick per-call-only runs).
    if os.environ.get("BENCH_TURNTABLE", "1") == "1":
        from panic3d_tpu.cameras.conventions import cam60, camsubs
        from panic3d_tpu.eval.generate import (
            EVAL_VIEWS, _get_planes_jit, _get_render_jit, plane_cache_ok,
        )

        assert plane_cache_ok(g), "flagship eval must be camera-free mapping"
        opts = dict(triplane_crop=0.1, cull_clouds=0.5, paste_params=popts)
        cond1 = {k: v[:1] for k, v in xin["cond"].items()}
        spin = [
            ("camP", f"{v:04d}", float(cam60[v][0]), float(cam60[v][1]), 30)
            for v in camsubs["spin12"]
        ]
        views = EVAL_VIEWS + spin
        vb = 2
        planes_fn = _get_planes_jit(g, 0, opts)
        render = _get_render_jit(g, opts, 0, vb, from_planes=True)

        def portrait():
            # queue the whole portrait (planes + 8 view batches) on the
            # device stream; caller syncs once on the last image
            pl = planes_fn(params, cond1)
            last = None
            for i in range(0, len(views), vb):
                cc = views[i : i + vb]
                cc = cc + [cc[-1]] * (vb - len(cc))
                out = render(
                    params,
                    jnp.asarray([float(c[2]) for c in cc]),
                    jnp.asarray([float(c[3]) for c in cc]),
                    jnp.asarray([float(c[4]) for c in cc]),
                    cond1, pl,
                )
                last = out["image"]
            return last

        float(jnp.sum(portrait()))  # warmup / compile
        n_port = max(3, n_iters // 2)
        times = []
        for _ in range(n_port):
            t0 = time.perf_counter()
            float(jnp.sum(portrait()))
            times.append(time.perf_counter() - t0)
        dt_port = float(np.median(times))
        vps = len(views) / dt_port
        lines.append(json.dumps({
            "metric": "render_512px_turntable_views_per_sec_per_chip"
                      + ("_ess" if ess else ""),
            "value": round(vps, 3),
            "unit": "views/s",
            "vs_baseline": round(vps / baseline, 3),
            "baseline_views_per_sec": baseline,
            "baseline_range": baseline_range,
            "vs_baseline_range": [
                round(vps / baseline_range[1], 3),
                round(vps / baseline_range[0], 3),
            ],
            "settings_parity": not ess,
            "paste_front": True,
            "pipeline": "per_portrait_turntable",
            "views_per_portrait": len(views),
            "sec_per_portrait": round(dt_port, 4),
        }))

    _bench_done.set()  # metrics computed; disarm the tunnel watchdog
    for line in lines:
        print(line)


# peak dense-matmul TFLOP/s per chip (bf16), public spec sheets; override
# with BENCH_PEAK_TFLOPS for unlisted hardware
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def _mfu(forward, params, xin, dt):
    """Absolute yardstick next to views/s: XLA-counted FLOPs of the
    compiled eval forward / (peak chip FLOPs * step time). The render path
    is gather/HBM-heavy, so MFU is expected to be LOW; it is reported to
    make 'is this fast for this chip' answerable, not as a target."""
    try:
        compiled = forward.lower(params, xin).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops <= 0:
            return None
        kind = jax.devices()[0].device_kind
        peak = os.environ.get("BENCH_PEAK_TFLOPS")
        if peak is not None:
            peak = float(peak)
        else:
            peak = next(
                (v for k, v in _PEAK_TFLOPS.items() if k.lower() in kind.lower()),
                None,
            )
        if not peak:
            return {"flops_per_call": flops, "device_kind": kind}
        mfu = flops / dt / (peak * 1e12)
        return {
            "flops_per_call": flops,
            "device_kind": kind,
            "peak_tflops": peak,
            "mfu": round(mfu, 4),
        }
    except Exception:
        return None


if __name__ == "__main__":
    main()
