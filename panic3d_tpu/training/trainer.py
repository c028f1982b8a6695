"""Training CLI: flagship GAN training with snapshots/stats/auto-resume.

Role of `_train/eg3dc/trainers/train_eclustrousC.py` (the ~70-flag click
CLI, phase construction, auto-resume from the newest usable snapshot) and
the host-side parts of `training_loop_v0.py` (tick loop, stats jsonl,
snapshot writing).

TPU-first: no process spawning — one host process drives the whole
jax.sharding.Mesh; the per-GPU subprocess/NCCL machinery of the reference
(train_eclustrousC.py:44-50,107-114) has no equivalent here by design.

Run: python -m panic3d_tpu.training.trainer --name myrun --data . \
    --batch 8 --gamma 4 [--synthetic]  (synthetic data for smoke tests)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--outdir", default="./_runs")
    ap.add_argument("--data", default=".")
    ap.add_argument("--data-subset", default="rutileEA")
    ap.add_argument("--cond-mode", default="ortho_front.add_shuffle2_4.reschonk_add_512")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gamma", type=float, default=4.0, help="R1 weight")
    ap.add_argument("--glr", type=float, default=0.0025)
    ap.add_argument("--dlr", type=float, default=0.002)
    ap.add_argument("--kimg", type=int, default=25000)
    ap.add_argument("--tick", type=int, default=4, help="kimg per tick")
    ap.add_argument("--snap", type=int, default=50, help="ticks per snapshot")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mirror", action="store_true")
    # loss lambdas (train_eclustrousC.py:152-181 defaults)
    ap.add_argument("--lambda-gcond-lpips", type=float, default=10.0)
    ap.add_argument("--lambda-gcond-l1", type=float, default=1.0)
    ap.add_argument("--lambda-gcond-alpha-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-depth-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-sides-lpips", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-sides-l1", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-sides-alpha-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-sides-depth-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-back-lpips", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-back-l1", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-back-alpha-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-back-depth-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-rand-lpips", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-rand-l1", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-rand-alpha-l2", type=float, default=0.0)
    ap.add_argument("--lambda-gcond-rand-depth-l2", type=float, default=0.0)
    ap.add_argument("--lossmask-mode-adv", default="none")
    ap.add_argument("--lossmask-mode-recon", default="none")
    ap.add_argument("--lambda-recon-lpips", type=float, default=0.0)
    ap.add_argument("--lambda-recon-l1", type=float, default=0.0)
    ap.add_argument("--lambda-recon-alpha-l2", type=float, default=0.0)
    ap.add_argument("--lambda-recon-depth-l2", type=float, default=0.0)
    ap.add_argument("--paste-params-mode", default="none")
    ap.add_argument("--density-reg", type=float, default=0.25)
    ap.add_argument("--reg-type", default="l1")
    ap.add_argument("--blur-init-sigma", type=float, default=0.0)
    ap.add_argument("--blur-fade-kimg", type=float, default=200.0)
    ap.add_argument("--gen-pose-cond", action="store_true")
    ap.add_argument("--gpc-reg-prob", type=float, default=0.5)
    ap.add_argument("--triplane-depth", type=int, default=1)
    ap.add_argument("--triplane-width", type=int, default=32)
    ap.add_argument("--backbone-resolution", type=int, default=256)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--lpips-weights", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic data (smoke test)")
    ap.add_argument("--tiny", action="store_true", help="tiny model (smoke test)")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--dry-run", action="store_true")
    return ap.parse_args(argv)


def _snapshot_images(g, state, batch, snap_dir):
    """G_ema sample grid at snapshot time (training_loop_v0.py:435-443)."""
    try:
        import jax.numpy as jnp

        from ..eval.viewer import save_grid
        from ..models.triplane import TriPlaneGenerator

        bs = batch["image"].shape[0]
        xin = {
            "z": jnp.zeros((bs, g.z_dim)),
            "camera_params": batch["camera"],
            "cond": batch["cond"],
            "normalize_images": True,
        }
        out = g.apply(state.vars_Gema, xin, method=TriPlaneGenerator.f,
                      noise_mode="const")
        imgs = np.asarray(out["image"]) * 0.5 + 0.5
        save_grid(list(imgs), os.path.join(snap_dir, "fakes.png"))
    except Exception as e:  # snapshot imaging must never kill training
        print(f"snapshot image failed: {e}")


def find_resume(run_dir: str):
    """Auto-resume: newest snapshot dir (train_eclustrousC.py:301-337 role)."""
    if not os.path.isdir(run_dir):
        return None
    snaps = sorted(
        d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")
    )
    return os.path.join(run_dir, snaps[-1]) if snaps else None


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..data.dataset import EcrutileEDataset, InfiniteBatcher, synthetic_batch
    from ..models.dual_discriminator import DualDiscriminator
    from ..models.triplane import TriPlaneGenerator
    from ..parallel import make_mesh, shard_batch
    from ..runtime.checkpoint import load_checkpoint, save_checkpoint
    from .loop import GANTrainState, TrainConfig, build_train_step, init_state, phases_for_step
    from .loss import LossConfig
    from .setup import init_lpips, make_loss
    from .stats import Collector, JsonlLogger

    run_dir = os.path.join(args.outdir, args.name)
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "training_options.json"), "w") as f:
        json.dump(vars(args), f, indent=1)

    # models
    if args.tiny:
        g = configs.tiny(cond_mode="ortho_front.add_4.reschonk_add_16")
        d = DualDiscriminator(c_dim=25, img_resolution=g.img_resolution,
                              channel_base=1024, channel_max=32,
                              epilogue_kwargs=dict(mbstd_group_size=2))
        chonk_ch, feat_dim = 16, 32
    else:
        g = configs.flagship(
            cond_mode=args.cond_mode,
            triplane_width=args.triplane_width,
            backbone_resolution=args.backbone_resolution,
            img_resolution=args.resolution,
        )
        d = DualDiscriminator(c_dim=25, img_resolution=args.resolution)
        chonk_ch, feat_dim = 512, 512

    loss_cfg = LossConfig(
        r1_gamma=args.gamma,
        blur_init_sigma=args.blur_init_sigma,
        blur_fade_kimg=args.blur_fade_kimg,
        gpc_reg_prob=args.gpc_reg_prob if args.gen_pose_cond else None,
        lambda_gcond_lpips=args.lambda_gcond_lpips,
        lambda_gcond_l1=args.lambda_gcond_l1,
        lambda_gcond_alpha_l2=args.lambda_gcond_alpha_l2,
        lambda_gcond_depth_l2=args.lambda_gcond_depth_l2,
        lambda_gcond_sides_lpips=args.lambda_gcond_sides_lpips,
        lambda_gcond_sides_l1=args.lambda_gcond_sides_l1,
        lambda_gcond_sides_alpha_l2=args.lambda_gcond_sides_alpha_l2,
        lambda_gcond_sides_depth_l2=args.lambda_gcond_sides_depth_l2,
        lambda_gcond_back_lpips=args.lambda_gcond_back_lpips,
        lambda_gcond_back_l1=args.lambda_gcond_back_l1,
        lambda_gcond_back_alpha_l2=args.lambda_gcond_back_alpha_l2,
        lambda_gcond_back_depth_l2=args.lambda_gcond_back_depth_l2,
        lambda_gcond_rand_lpips=args.lambda_gcond_rand_lpips,
        lambda_gcond_rand_l1=args.lambda_gcond_rand_l1,
        lambda_gcond_rand_alpha_l2=args.lambda_gcond_rand_alpha_l2,
        lambda_gcond_rand_depth_l2=args.lambda_gcond_rand_depth_l2,
        lossmask_mode_adv=args.lossmask_mode_adv,
        lossmask_mode_recon=args.lossmask_mode_recon,
        lambda_recon_lpips=args.lambda_recon_lpips,
        lambda_recon_l1=args.lambda_recon_l1,
        lambda_recon_alpha_l2=args.lambda_recon_alpha_l2,
        lambda_recon_depth_l2=args.lambda_recon_depth_l2,
        paste_params_mode=None if args.paste_params_mode == "none" else args.paste_params_mode,
        density_reg=args.density_reg,
        reg_type=args.reg_type,
        box_warp=g.rk["box_warp"],
    )

    # which phases exist (training_loop_v0.py:221-266 lambda gating)
    phases = ["Gmain"]
    c = loss_cfg
    if c.lambda_gcond_lpips + c.lambda_gcond_l1 + c.lambda_gcond_alpha_l2 + c.lambda_gcond_depth_l2 > 0:
        phases.append("Gcond")
    if c.lambda_gcond_sides_lpips + c.lambda_gcond_sides_l1 + c.lambda_gcond_sides_alpha_l2 + c.lambda_gcond_sides_depth_l2 > 0:
        phases += ["Gside-left", "Gside-right"]
    if c.lambda_gcond_back_lpips + c.lambda_gcond_back_l1 + c.lambda_gcond_back_alpha_l2 + c.lambda_gcond_back_depth_l2 > 0:
        phases.append("Gside-back")
    if c.lambda_gcond_rand_lpips + c.lambda_gcond_rand_l1 + c.lambda_gcond_rand_alpha_l2 + c.lambda_gcond_rand_depth_l2 > 0:
        phases.append("Grand")
    if args.density_reg > 0:
        phases.append("Greg")
    phases += ["Dmain"]
    if args.gamma > 0:
        phases.append("Dreg")

    train_cfg = TrainConfig(
        batch_size=args.batch,
        g_lr=args.glr,
        d_lr=args.dlr,
        ema_kimg=args.batch * 10 / 32,
        phases=tuple(phases),
    )
    if args.dry_run:
        print(json.dumps(dict(
            phases=phases, loss=dataclasses.asdict(loss_cfg),
            train=dataclasses.asdict(train_cfg), model=str(g),
        ), indent=1, default=str))
        return

    # data
    size = g.img_resolution
    if args.synthetic:
        def batches():
            i = 0
            while True:
                yield synthetic_batch(bs=args.batch, size=size,
                                      chonk_ch=chonk_ch, feat_dim=feat_dim, seed=i)
                i += 1
        batch_iter = batches()
    else:
        ds = EcrutileEDataset(args.data, subset=args.data_subset, size=size,
                              mirror=args.mirror)
        def to_train(b):
            img = b["image"].astype(np.float32) / 127.5 - 1
            return {"image": img, "camera": b["camera"], "xyz": b["xyz"],
                    "alpha": b["alpha"],
                    "cond": b["condition"]}
        batch_iter = map(to_train, iter(InfiniteBatcher(ds, args.batch,
                                                        seed=args.seed)))

    # init / resume
    key = jax.random.PRNGKey(args.seed)
    first = jax.tree_util.tree_map(jnp.asarray, next(batch_iter))
    xin = {"z": jnp.zeros((args.batch, g.z_dim)),
           "camera_params": first["camera"], "cond": first["cond"]}
    vars_G = g.init({"params": key, "noise": key}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    vars_D = d.init({"params": key},
                    {"image": first["image"],
                     "image_raw": jnp.zeros((args.batch, 3, g.neural_rendering_resolution,
                                             g.neural_rendering_resolution))},
                    first["camera"], first["cond"])
    state = init_state(vars_G, vars_D, train_cfg)
    resume = args.resume or find_resume(run_dir)
    if resume:
        print(f"resuming from {resume}")
        restored, _ = load_checkpoint(resume, target=state)
        state = restored

    from ..eval.lpips import load_lpips_params
    lpips_vars = (load_lpips_params(args.lpips_weights) if args.lpips_weights
                  else init_lpips())
    loss = make_loss(g, d, lpips_vars, loss_cfg)

    import jax as _jax

    n_data = min(len(_jax.devices()), args.batch)
    while args.batch % n_data:
        n_data -= 1
    mesh = make_mesh(n_data=n_data, n_rays=1)
    steps = {}  # phase-tuple -> compiled step

    collector = Collector()
    logger = JsonlLogger(os.path.join(run_dir, "stats.jsonl"))
    total_steps = args.max_steps or (args.kimg * 1000 // args.batch)
    tick_interval = max(args.tick * 1000 // args.batch, 1)
    t_start = time.time()

    for step_i in range(int(state.cur_nimg) // args.batch, total_steps):
        active = phases_for_step(step_i, train_cfg)
        if active not in steps:
            steps[active] = jax.jit(build_train_step(loss, train_cfg, g.z_dim, active))
        batch = shard_batch(jax.tree_util.tree_map(jnp.asarray, next(batch_iter)), mesh)
        key, sk = jax.random.split(key)
        state, stats = steps[active](state, batch, sk)
        collector.report_dict({k: float(v) for k, v in stats.items()})

        if step_i % tick_interval == 0:
            kimg = int(state.cur_nimg) / 1000
            msg = " ".join(
                f"{k.split('/')[-1]}={collector.mean(k):.3f}" for k in sorted(
                    collector.as_dict()) if k.startswith("Loss/")
            )
            print(f"tick kimg={kimg:.1f} time={time.time()-t_start:.0f}s {msg}")
            logger.write(collector, kimg=kimg)
            collector.reset()

        if step_i % (tick_interval * args.snap) == 0 and step_i > 0:
            snap = os.path.join(run_dir, f"network-snapshot-{int(state.cur_nimg):06d}")
            save_checkpoint(snap, jax.device_get(state), config=vars(args))
            _snapshot_images(g, state, batch, snap)
            print(f"saved {snap}")

    snap = os.path.join(run_dir, f"network-snapshot-{int(state.cur_nimg):06d}")
    save_checkpoint(snap, jax.device_get(state), config=vars(args))
    print(f"done; final snapshot {snap}")


if __name__ == "__main__":
    main()
