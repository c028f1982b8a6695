"""Training-step throughput on the real chip (imgs/sec/chip).

Runs the full GAN train step (all loss phases of the flagship recipe:
adversarial + ortho recon views + density reg + R1, per-phase Adam, EMA)
on synthetic data. Presets:
  tiny     — smoke-scale model (fast compile sanity check)
  flagship — the 512² ecrutileE_eclustrousC training shape (one chip)

Usage: python scripts/bench_train.py [--preset flagship] [--batch 2]
       python scripts/bench_train.py --preset flagship --breakdown
         (per-phase wall-clock + XLA-counted FLOPs/bytes -> MFU table;
          names the top costs — the training-step roofline)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")


def breakdown(args, g, loss, tcfg, state, batch, phases):
    """Per-phase roofline: each phase compiled as its own single-phase step,
    timed on device, with XLA's own FLOP/byte counts (cost_analysis) ->
    per-phase MFU against the chip's peak. The EMA+state overhead rides
    inside every row (it is ~0.1%% of any phase); the sum of rows tracks the
    full step within noise."""
    from panic3d_tpu.training import build_train_step

    dev = jax.devices()[0]
    peak = 197e12 if "v5 lite" in dev.device_kind else 275e12  # bf16 peak

    rows = []
    key = jax.random.PRNGKey(1)
    for ph in phases:
        step = jax.jit(build_train_step(loss, tcfg, g.z_dim, (ph,)))
        t0 = time.perf_counter()
        compiled = step.lower(state, batch, key).compile()
        t_compile = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", float("nan")))
        bytes_ac = float(ca.get("bytes accessed", float("nan")))
        new_state, stats = compiled(state, batch, key)
        float(list(stats.values())[0]) if stats else None
        ts = []
        for i in range(max(args.iters // 2, 3)):
            t0 = time.perf_counter()
            new_state, stats = compiled(state, batch, jax.random.PRNGKey(2 + i))
            # force a host read so the tunnel's lazy sync can't lie
            float(jnp.sum(new_state.cur_nimg))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rows.append(dict(phase=ph, sec=round(dt, 4),
                         gflops=round(flops / 1e9, 1),
                         gbytes=round(bytes_ac / 1e9, 2),
                         mfu=round(flops / (dt * peak), 4),
                         hbm_frac=round(bytes_ac / dt / 819e9, 3),
                         compile_s=round(t_compile, 1)))
        print(rows[-1], flush=True)
    total = sum(r["sec"] for r in rows)
    rows.sort(key=lambda r: -r["sec"])
    print({
        "metric": f"train_breakdown_{args.preset}",
        "batch": args.batch,
        "sum_phase_sec": round(total, 3),
        "top2": [r["phase"] for r in rows[:2]],
        "device": dev.device_kind,
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=["tiny", "flagship"])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--breakdown", action="store_true",
                    help="per-phase wall/FLOPs/bytes/MFU roofline table")
    ap.add_argument("--remat", default=None, choices=["full", "dots"],
                    help="rematerialize phase losses in backward "
                         "(HBM-roofline experiment)")
    ap.add_argument("--fuse-recon", nargs="?", const="sum", default="off",
                    choices=["off", "sum", "seq"],
                    help="shared-backbone recon instead of Gcond/Gside-*: "
                         "'sum' = one Adam step, 'seq' = per-view "
                         "sequential Adam via vmapped trunk VJP")
    ap.add_argument("--phases", default=None,
                    help="comma-separated phase subset (e.g. 'Gmain,Dmain') "
                         "— cheap targeted roofline probes without the full "
                         "multi-phase compile")
    args = ap.parse_args()

    from panic3d_tpu import configs
    from panic3d_tpu.data.dataset import synthetic_batch
    from panic3d_tpu.models.dual_discriminator import DualDiscriminator
    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.training import (
        LossConfig, TrainConfig, build_train_step, init_state,
    )
    from panic3d_tpu.training.setup import init_lpips, make_loss

    bs = args.batch
    if args.preset == "flagship":
        g = configs.flagship()
        size = 512
        chonk_ch, feat_dim = 512, 512
        d = DualDiscriminator(c_dim=25, img_resolution=512, img_channels=3)
    else:
        g = configs.tiny(
            img_resolution=128, backbone_resolution=32,
            neural_rendering_resolution=16,
            cond_mode="ortho_front.add_4.reschonk_add_16",
            rendering_kwargs=dict(
                superresolution_module="training.superresolution.SuperresolutionHybrid2X",
                depth_resolution=6, depth_resolution_importance=6,
                box_warp=0.7, ray_start=0.5, ray_end=1.5,
                white_back=True, use_triplane=True,
            ),
        )
        size = 128
        chonk_ch, feat_dim = 16, 32
        d = DualDiscriminator(
            c_dim=25, img_resolution=128, img_channels=3,
            channel_base=1024, channel_max=32,
            epilogue_kwargs=dict(mbstd_group_size=2),
        )

    batch = jax.tree_util.tree_map(
        jnp.asarray,
        synthetic_batch(bs=bs, size=size, chonk_ch=chonk_ch, feat_dim=feat_dim),
    )
    key = jax.random.PRNGKey(0)
    xin = {"z": jnp.zeros((bs, g.z_dim)), "camera_params": batch["camera"],
           "cond": batch["cond"]}
    vars_G = g.init({"params": key, "noise": key}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    vars_D = d.init(
        {"params": key},
        {"image": batch["image"],
         "image_raw": jnp.zeros(
             (bs, 3, g.neural_rendering_resolution,
              g.neural_rendering_resolution))},
        batch["camera"], batch["cond"],
    )
    cfg = LossConfig(
        lambda_gcond_lpips=10.0, lambda_gcond_l1=10.0,
        lambda_gcond_sides_lpips=10.0, lambda_gcond_back_l1=10.0,
        lambda_gcond_rand_lpips=10.0,
    )
    loss = make_loss(g, d, init_lpips(), cfg, noise_mode="const")
    tcfg = TrainConfig(batch_size=bs, remat=args.remat)
    state = init_state(vars_G, vars_D, tcfg)
    if args.fuse_recon == "sum":
        phases = ("Gmain", "Grecon-fused", "Grand", "Greg", "Dmain", "Dreg")
    elif args.fuse_recon == "seq":
        phases = ("Gmain", "Grecon-seq", "Grand", "Greg", "Dmain", "Dreg")
    else:
        phases = ("Gmain", "Gcond", "Gside-left", "Gside-right", "Gside-back",
                  "Grand", "Greg", "Dmain", "Dreg")
    if args.phases:
        keep = tuple(p.strip() for p in args.phases.split(","))
        unknown = set(keep) - set(phases)
        if unknown:
            raise SystemExit(f"unknown phases {sorted(unknown)}; "
                             f"choose from {phases}")
        phases = tuple(p for p in phases if p in keep)

    if args.breakdown:
        return breakdown(args, g, loss, tcfg, state, batch, phases)
    step = jax.jit(build_train_step(loss, tcfg, g.z_dim, phases))

    t0 = time.perf_counter()
    state, stats = step(state, batch, jax.random.PRNGKey(1))
    float(list(stats.values())[0])
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s")

    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, stats = step(state, batch, jax.random.PRNGKey(2 + i))
        float(list(stats.values())[0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print({
        "metric": f"train_step_{args.preset}_imgs_per_sec_per_chip",
        "sec_per_step": round(dt, 3),
        "imgs_per_sec": round(bs / dt, 3),
        "batch": bs,
    })


if __name__ == "__main__":
    main()
