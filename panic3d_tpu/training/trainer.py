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
import threading
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
    # Fold the ortho recon phases (Gcond/Gside-*) into one shared-backbone
    # pass. Modes, with flagship bs=2 v5e-lite measurements (r4):
    #   off (default) — separate per-view phases, reference-exact
    #                   semantics; 1.491 s/step (the one-jit step already
    #                   CSEs the repeated backbone forwards);
    #   sum           — one batched phase, ONE Adam step for the group
    #                   (optimizer-granularity deviation); 1.405 s/step;
    #   seq           — per-view grads from a vmapped trunk VJP, per-view
    #                   SEQUENTIAL Adam (reference granularity, grads at
    #                   pre-step params); 1.61 s/step — the vmapped
    #                   backward measured SLOWER than the CSE'd separate
    #                   backwards, so it is an opt-in, not the default.
    # 'auto' resolves to off.
    ap.add_argument("--fuse-recon", nargs="?", const="sum", default="auto",
                    choices=["auto", "off", "sum", "seq"])
    # path-length regularization (the pl_* options the reference loss keeps,
    # loss.py:44-48; Gpl rides the Greg lazy-reg interval)
    ap.add_argument("--pl-weight", type=float, default=0.0)
    ap.add_argument("--pl-batch-shrink", type=int, default=2)
    ap.add_argument("--pl-decay", type=float, default=0.01)
    ap.add_argument("--blur-init-sigma", type=float, default=0.0)
    ap.add_argument("--blur-fade-kimg", type=float, default=200.0)
    ap.add_argument("--gen-pose-cond", action="store_true")
    ap.add_argument("--gpc-reg-prob", type=float, default=0.5)
    ap.add_argument("--style-mixing-prob", type=float, default=0.0)
    # ADA (train_eclustrousC.py:208,527-534; heuristic training_loop_v0.py:398-402)
    ap.add_argument("--aug", choices=("noaug", "ada", "fixed"), default="noaug")
    ap.add_argument("--ada-target", type=float, default=0.6)
    ap.add_argument("--ada-interval", type=int, default=4)
    ap.add_argument("--ada-kimg", type=float, default=500.0)
    ap.add_argument("--aug-p", type=float, default=0.0, help="fixed-mode p")
    # gradient accumulation (batch_gpu, train_eclustrousC.py:216)
    ap.add_argument("--batch-gpu", type=int, default=None)
    # mesh shape: devices = n_data x mesh_rays; rays>1 shards the volume
    # render's ray axis across the mesh (SURVEY.md §5 sequence-parallel analog)
    ap.add_argument("--mesh-rays", type=int, default=1,
                    help="size of the 'rays' mesh axis (1 = pure DP)")
    # reference-compat: sum micro-batch grads instead of averaging them
    # (training_loop_v0.py:350-371 never divides by the accumulation rounds)
    ap.add_argument("--accum-sum", action="store_true",
                    help="reference grad-accumulation semantics: sum "
                         "micro-batch grads (effective step size x n_micro)")
    ap.add_argument("--tensorboard", action="store_true",
                    help="also export tick stats as TensorBoard events "
                         "(training_loop_v0.py:518-523 role) to <run>/tb")
    ap.add_argument("--remat", default=None, choices=["full", "dots"],
                    help="rematerialize phase losses in backward: trade "
                         "recompute (cheap: phases are HBM-bound at 6-8% "
                         "MFU) for forward-residual traffic/memory")
    # snapshot-time metric eval (training_loop_v0.py:487-498)
    ap.add_argument("--metrics", default="none",
                    help="comma list, e.g. fid50k_full; 'none' disables")
    ap.add_argument("--metric-items", type=int, default=50000)
    ap.add_argument("--clip-weights", default=None,
                    help="converted CLIP weights (fid_clip feature net)")
    ap.add_argument("--inception-weights", default=None,
                    help="converted InceptionV3 weights for fid50k_full "
                         "(runtime.convert.convert_inception_v3 output)")
    ap.add_argument("--resume-blur", action="store_true",
                    help="keep blur/gpc rampups active after resume")
    ap.add_argument("--allow-random-lpips", action="store_true",
                    help="permit training with a random-init LPIPS net")
    ap.add_argument("--lpips-bf16", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="run the recon-loss AlexNet tower in bfloat16 "
                         "(params/reductions fp32); fp32 default until "
                         "the canary drift is measured")
    ap.add_argument("--triplane-depth", type=int, default=1)
    ap.add_argument("--triplane-width", type=int, default=32)
    ap.add_argument("--backbone-resolution", type=int, default=256)
    ap.add_argument("--resolution", type=int, default=512)
    # model capacity / shape (train_eclustrousC.py:239-264, 480-556)
    ap.add_argument("--cbase-g", type=int, default=32768)
    ap.add_argument("--cmax-g", type=int, default=512)
    ap.add_argument("--cbase-d", type=int, default=32768)
    ap.add_argument("--cmax-d", type=int, default=512)
    ap.add_argument("--map-depth", type=int, default=2,
                    help="mapping net layers (best-run default 2)")
    ap.add_argument("--mbstd-group", type=int, default=4)
    ap.add_argument("--sr-module", default=None,
                    help="superresolution module override (default: pick "
                         "by resolution, train_eclustrousC.py:397-404)")
    ap.add_argument("--sr-channels-hidden", type=int, default=256)
    ap.add_argument("--sr-noise-mode", default=None,
                    choices=("random", "none"))
    ap.add_argument("--decoder-lr-mul", type=float, default=1.0)
    ap.add_argument("--use-triplane", type=int, default=1,
                    help="1 = correct 3rd-plane rotation (renderer.py:45-49)")
    ap.add_argument("--tanh-rgb-output", action="store_true")
    ap.add_argument("--c-scale", type=float, default=1.0)
    ap.add_argument("--c-noise", type=float, default=0.0,
                    help="D pose-conditioning noise (disc_c_noise)")
    ap.add_argument("--freezed", type=int, default=0,
                    help="Freeze-D: first N discriminator layers take no "
                         "updates (networks_stylegan2.py:788-794)")
    # precision: the reference trains G fp32 / D+SR fp16x4 fearing fp16
    # range; here the mixed dtype is bf16 (full fp32 range), so the backbone
    # default stays bf16 — the HBM-roofline lever (PARITY.md). --fp32 or
    # --g-num-fp16-res 0 restores reference numerics.
    ap.add_argument("--g-num-fp16-res", type=int, default=4)
    ap.add_argument("--d-num-fp16-res", type=int, default=4)
    ap.add_argument("--sr-num-fp16-res", type=int, default=4)
    ap.add_argument("--fp32", action="store_true",
                    help="force fp32 everywhere (num_fp16_res=0 for G/D/SR)")
    # loss extras (train_eclustrousC.py:239-264; lambda_adv_g/d are
    # commented out in the reference CLI:171-172 — not ported)
    ap.add_argument("--gpc-reg-fade-kimg", type=float, default=1000.0)
    ap.add_argument("--density-reg-p-dist", type=float, default=0.004)
    ap.add_argument("--density-reg-every", type=int, default=4,
                    help="Greg lazy-reg interval (g_reg_interval)")
    # neural-rendering resolution ramp (loss_orthocondA.py:214-218): the
    # host recompiles the step per distinct resolution (shape-changing)
    ap.add_argument("--neural-res-initial", type=int, default=64)
    ap.add_argument("--neural-res-final", type=int, default=None)
    ap.add_argument("--neural-res-fade-kimg", type=float, default=0.0)
    ap.add_argument("--neural-res-quantize", type=int, default=8,
                    help="snap ramped resolutions to multiples of N "
                         "(bounds per-resolution recompiles; 1 = the "
                         "reference's every-integer schedule)")
    ap.add_argument("--desc", default=None,
                    help="run-dir suffix: <name>-<desc>")
    ap.add_argument("--resume-discrim", default=None,
                    help="snapshot dir whose discriminator params replace "
                         "the fresh D (train_eclustrousC --resume_discrim)")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--lpips-weights", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic data (smoke test)")
    ap.add_argument("--tiny", action="store_true", help="tiny model (smoke test)")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--tick-steps", type=int, default=None,
                    help="override tick interval in STEPS (smoke tests)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    if args.fp32:
        args.g_num_fp16_res = args.d_num_fp16_res = args.sr_num_fp16_res = 0
    return args


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


def d_frozen_paths(img_resolution: int, freezed: int, architecture="resnet"):
    """(block, layer) pairs for the first `freezed` D layers, replicating the
    reference's layer indexing (networks_stylegan2.py:788-810): blocks from
    the highest resolution down; per block fromrgb (first block / skip arch
    only), conv0, conv1, then the resnet skip."""
    if freezed <= 0:
        return ()
    out, idx = [], 0
    res_log2 = int(np.log2(img_resolution))
    for i, res in enumerate(2**j for j in range(res_log2, 2, -1)):
        layers = ["fromrgb"] if (i == 0 or architecture == "skip") else []
        layers += ["conv0", "conv1"]
        if architecture == "resnet":
            layers.append("skip")
        for name in layers:
            if idx < freezed:
                out.append((f"b{res}", name))
            idx += 1
    return tuple(out)


def build_models(args):
    """Construct G/D from CLI flags (train_eclustrousC.py:189-203 knobs)."""
    from .. import configs
    from ..models.dual_discriminator import DualDiscriminator

    if args.tiny:
        model_kwargs = dict(family="tiny",
                            cond_mode="ortho_front.add_4.reschonk_add_16")
        g = configs.tiny(cond_mode=model_kwargs["cond_mode"])
        d = DualDiscriminator(c_dim=25, img_resolution=g.img_resolution,
                              channel_base=1024, channel_max=32,
                              epilogue_kwargs=dict(mbstd_group_size=2))
        chonk_ch, feat_dim = 16, 32
    else:
        rk = dict(
            triplane_depth=args.triplane_depth,
            c_scale=args.c_scale,
            decoder_lr_mul=args.decoder_lr_mul,
            use_triplane=bool(args.use_triplane),
            tanh_rgb_output=args.tanh_rgb_output,
            density_reg_p_dist=args.density_reg_p_dist,
        )
        if args.sr_module:
            rk["superresolution_module"] = args.sr_module
        if args.sr_noise_mode:
            rk["superresolution_noise_mode"] = args.sr_noise_mode
        model_kwargs = dict(
            family="flagship",
            cond_mode=args.cond_mode,
            triplane_width=args.triplane_width,
            backbone_resolution=args.backbone_resolution,
            img_resolution=args.resolution,
            sr_channels_hidden=args.sr_channels_hidden,
            sr_num_fp16_res=args.sr_num_fp16_res,
            mapping_kwargs=dict(num_layers=args.map_depth),
            # conv_clamp rides the precision flag (train_eclustrousC:554-556)
            synthesis_kwargs=dict(channel_base=args.cbase_g,
                                  channel_max=args.cmax_g,
                                  num_fp16_res=args.g_num_fp16_res,
                                  conv_clamp=(256 if args.g_num_fp16_res > 0
                                              else None)),
            neural_rendering_resolution=args.neural_res_initial,
            rendering_kwargs=rk,
        )
        g = configs.flagship(**{k: v for k, v in model_kwargs.items()
                                if k != "family"})
        d = DualDiscriminator(
            c_dim=25, img_resolution=args.resolution,
            channel_base=args.cbase_d, channel_max=args.cmax_d,
            num_fp16_res=args.d_num_fp16_res,
            conv_clamp=256 if args.d_num_fp16_res > 0 else None,
            disc_c_noise=args.c_noise,
            epilogue_kwargs=dict(mbstd_group_size=args.mbstd_group),
        )
        chonk_ch, feat_dim = 512, 512
    return g, d, chonk_ch, feat_dim, model_kwargs


_metric_feature_fns: dict = {}  # name -> feature_fn, reused across snapshots


def _snapshot_metrics(args, g, state, make_batch_iter, run_dir, snap):
    """Snapshot-time metric eval (training_loop_v0.py:487-498 role)."""
    try:
        from .metric_eval import (evaluate_fid, make_clip_feature_fn,
                                  make_inception_feature_fn)

        requested = args.metrics.split(",")
        # fid50k_full rides the reference's Inception detector (paper
        # protocol); fid_clip is the CLIP-feature variant kept from round 1.
        for name in ("fid50k_full", "fid_clip"):
            if name not in requested:
                continue
            # build each detector ONCE per process: a fresh jitted closure
            # every snapshot would recompile the feature net each time
            if name in _metric_feature_fns:
                feature_fn = _metric_feature_fns[name]
            elif name == "fid50k_full":
                inc_vars = None
                if args.inception_weights:
                    from ..runtime.checkpoint import load_checkpoint as _lc
                    inc_vars, _ = _lc(args.inception_weights)
                feature_fn = make_inception_feature_fn(inc_vars)
            else:
                clip_vars = None
                if args.clip_weights:
                    from ..runtime.checkpoint import load_checkpoint as _lc
                    clip_vars, _ = _lc(args.clip_weights)
                feature_fn = make_clip_feature_fn(clip_vars)
            _metric_feature_fns[name] = feature_fn
            r = evaluate_fid(
                g, state.vars_Gema, make_batch_iter, feature_fn,
                n_items=args.metric_items, run_dir=run_dir,
                snapshot_name=os.path.basename(snap),
                cache_dir=os.path.join(args.outdir, ".metric_cache"),
                dataset_key=(args.data, args.data_subset, args.synthetic,
                             name),
                metric_name=name,
            )
            print(f"{name} = {r['results'][name]:.3f}")
    except Exception as e:  # metric eval must never kill training
        print(f"snapshot metric eval failed: {e}")


def _snapshot_usable(path: str) -> bool:
    """A snapshot is usable iff its state file exists and is non-empty
    (the reference additionally demands a fid log next to the pkl,
    train_eclustrousC.py:301-337 — here state.msgpack is the single
    artifact whose integrity matters)."""
    st = os.path.join(path, "state.msgpack")
    return os.path.isfile(st) and os.path.getsize(st) > 0


def find_resume(run_dir: str):
    """Auto-resume: newest USABLE snapshot (train_eclustrousC.py:301-337
    role: scan newest-first, skip snapshots whose artifacts are missing —
    e.g. a crash mid-save)."""
    if not os.path.isdir(run_dir):
        return None
    snaps = sorted(
        d for d in os.listdir(run_dir) if d.startswith("network-snapshot-")
    )
    for d in reversed(snaps):
        p = os.path.join(run_dir, d)
        if _snapshot_usable(p):
            return p
    return None


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
    from ..utils.misc import check_replica_consistency
    from .loop import (
        GANTrainState, TrainConfig, ada_update, build_train_step, init_state,
        phases_for_step,
    )
    from .loss import LossConfig, OrthoCondLoss, active_recon_views
    from .setup import init_lpips, make_loss
    from .stats import Collector, JsonlLogger

    # multi-host: rendezvous (if configured) BEFORE any backend touch; all
    # filesystem writes below are leader-only (train_eclustrousC.py:44-50
    # NCCL rendezvous + rank-0 IO, the JAX way)
    from ..parallel.multihost import is_leader, maybe_initialize_distributed
    maybe_initialize_distributed()
    leader = is_leader()

    run_name = args.name + (f"-{args.desc}" if args.desc else "")
    run_dir = os.path.join(args.outdir, run_name)
    if leader:
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "training_options.json"), "w") as f:
            json.dump(vars(args), f, indent=1)

    # Resolve resume BEFORE building the loss config: resuming disables the
    # blur/gpc rampups and makes ADA react faster (train_eclustrousC.py:536-542).
    resume = args.resume or find_resume(run_dir)
    blur_init_sigma = args.blur_init_sigma
    gpc_reg_fade_kimg = args.gpc_reg_fade_kimg
    ada_kimg = args.ada_kimg
    if resume:
        ada_kimg = 100.0
        if not args.resume_blur:
            blur_init_sigma = 0.0
            gpc_reg_fade_kimg = 0.0

    # models; model_kwargs rides inside every snapshot config so loaders can
    # rebuild the exact architecture (the init_kwargs-in-pickle role,
    # eg3dc_v0.py:41-52)
    g, d, chonk_ch, feat_dim, model_kwargs = build_models(args)
    snap_config = dict(vars(args), model_kwargs=model_kwargs)

    loss_cfg = LossConfig(
        r1_gamma=args.gamma,
        blur_init_sigma=blur_init_sigma,
        blur_fade_kimg=args.blur_fade_kimg,
        gpc_reg_prob=args.gpc_reg_prob if args.gen_pose_cond else None,
        gpc_reg_fade_kimg=gpc_reg_fade_kimg,
        style_mixing_prob=args.style_mixing_prob,
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
        density_reg_p_dist=args.density_reg_p_dist,
        pl_weight=args.pl_weight,
        pl_batch_shrink=args.pl_batch_shrink,
        pl_decay=args.pl_decay,
        reg_type=args.reg_type,
        box_warp=g.rk["box_warp"],
        # ramp handled HOST-side: the jitted step always sees final=None
        # (a traced ramp would be shape-changing under jit); see the step
        # selection loop, which recompiles per distinct resolution
        neural_rendering_resolution_initial=args.neural_res_initial,
    )

    # which phases exist (training_loop_v0.py:221-266 lambda gating); the
    # per-view lambda sums live in ONE place: loss.active_recon_views
    phases = ["Gmain"]
    c = loss_cfg
    recon_views = active_recon_views(c)
    # fused recon eligibility: the fused phases map every view's ws from the
    # front camera, which only equals the per-phase objective when the
    # mapping is camera-free — the flagship default
    fuse_eligible = (g.rk.get("c_gen_conditioning_zero", False)
                     or g.rk.get("c_scale", 1.0) == 0)
    fuse = args.fuse_recon
    if fuse == "auto":
        fuse = "off"  # measured default: see --fuse-recon help
    if fuse in ("sum", "seq") and not fuse_eligible:
        raise SystemExit(
            "--fuse-recon requires c_gen_conditioning_zero (or "
            "c_scale=0): with a camera-conditioned mapping the fused "
            "phase would optimize a different objective than the "
            "separate Gcond/Gside phases")
    if fuse in ("sum", "seq"):
        if recon_views:
            phases.append("Grecon-fused" if fuse == "sum" else "Grecon-seq")
    else:
        if "front" in recon_views:
            phases.append("Gcond")
        if "left" in recon_views:
            phases += ["Gside-left", "Gside-right"]
        if "back" in recon_views:
            phases.append("Gside-back")
    if c.lambda_gcond_rand_lpips + c.lambda_gcond_rand_l1 + c.lambda_gcond_rand_alpha_l2 + c.lambda_gcond_rand_depth_l2 > 0:
        phases.append("Grand")
    if args.density_reg > 0:
        phases.append("Greg")
    if args.pl_weight > 0:
        phases.append("Gpl")
    phases += ["Dmain"]
    if args.gamma > 0:
        phases.append("Dreg")

    train_cfg = TrainConfig(
        batch_size=args.batch,
        batch_gpu=args.batch_gpu,
        accum_sum=args.accum_sum,
        remat=args.remat,
        g_lr=args.glr,
        d_lr=args.dlr,
        g_reg_interval=args.density_reg_every,
        ema_kimg=args.batch * 10 / 32,
        d_frozen=d_frozen_paths(d.img_resolution, args.freezed,
                                d.architecture),
        phases=tuple(phases),
    )
    if args.dry_run:
        print(json.dumps(dict(
            phases=phases, loss=dataclasses.asdict(loss_cfg),
            train=dataclasses.asdict(train_cfg), model=str(g),
        ), indent=1, default=str))
        return

    # data — each process loads only ITS batch shard (InfiniteSampler
    # rank-sharding role, misc.py:113-147); single-host: rank 0 of 1
    from ..parallel.multihost import process_rank, process_world
    rank, world = process_rank(), process_world()
    assert args.batch % world == 0, (args.batch, world)
    local_bs = args.batch // world

    size = g.img_resolution
    if args.synthetic:
        def make_batch_iter():
            i = 0
            while True:
                yield synthetic_batch(bs=local_bs, size=size,
                                      chonk_ch=chonk_ch, feat_dim=feat_dim,
                                      seed=i * world + rank)
                i += 1
    else:
        ds = EcrutileEDataset(args.data, subset=args.data_subset, size=size,
                              mirror=args.mirror)
        def to_train(b):
            img = b["image"].astype(np.float32) / 127.5 - 1
            return {"image": img, "camera": b["camera"], "xyz": b["xyz"],
                    "alpha": b["alpha"],
                    "cond": b["condition"]}

        def make_batch_iter():
            return map(to_train, iter(InfiniteBatcher(
                ds, local_bs, rank=rank, world=world, seed=args.seed)))
    batch_iter = make_batch_iter()

    # init / resume (param shapes are batch-size-independent: init at the
    # local shard size; identical across processes by the shared seed)
    key = jax.random.PRNGKey(args.seed)
    first = jax.tree_util.tree_map(jnp.asarray, next(batch_iter))
    xin = {"z": jnp.zeros((local_bs, g.z_dim)),
           "camera_params": first["camera"], "cond": first["cond"]}
    vars_G = g.init({"params": key, "noise": key}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    vars_D = d.init({"params": key},
                    {"image": first["image"],
                     "image_raw": jnp.zeros((local_bs, 3, g.neural_rendering_resolution,
                                             g.neural_rendering_resolution))},
                    first["camera"], first["cond"])
    state = init_state(vars_G, vars_D, train_cfg)
    if args.aug == "fixed":
        state = state.replace(aug_p=jnp.float32(args.aug_p))
    if resume:
        print(f"resuming from {resume}")
        # tolerant restore: snapshots from before a state field existed
        # (e.g. pl_mean) resume with the fresh default for that field
        from ..runtime.checkpoint import load_train_state
        restored, _ = load_train_state(resume, state)
        state = restored
    if args.resume_discrim:
        # D-only warm start (train_eclustrousC --resume_discrim; loads the
        # snapshot's discriminator over the fresh/resumed one)
        print(f"resuming discriminator from {args.resume_discrim}")
        from ..runtime.checkpoint import load_checkpoint as _lc
        from flax.serialization import from_state_dict as _fsd
        d_state, _ = _lc(args.resume_discrim)
        state = state.replace(vars_D=_fsd(state.vars_D, d_state["vars_D"]))

    uses_lpips = any(
        getattr(loss_cfg, f) > 0 for f in dir(loss_cfg)
        if f.startswith("lambda_") and f.endswith("lpips")
    )
    if (uses_lpips and not args.lpips_weights and not args.synthetic
            and not args.allow_random_lpips):
        raise SystemExit(
            "refusing to train against a random-init LPIPS net: pass "
            "--lpips-weights (runtime/convert.py) or --allow-random-lpips"
        )
    from ..eval.lpips import load_lpips_params
    lpips_vars = (load_lpips_params(args.lpips_weights) if args.lpips_weights
                  else init_lpips())

    import jax as _jax

    n_devices = len(_jax.devices())
    assert n_devices % args.mesh_rays == 0, (n_devices, args.mesh_rays)
    n_data = min(n_devices // args.mesh_rays, args.batch)
    while args.batch % n_data:
        n_data -= 1
    mesh = make_mesh(n_data=n_data, n_rays=args.mesh_rays)
    ray_shard = None
    if args.mesh_rays > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ray_shard = NamedSharding(mesh, P("data", "rays"))
    loss = make_loss(g, d, lpips_vars, loss_cfg, augment=args.aug != "noaug",
                     ray_sharding=ray_shard, lpips_bf16=args.lpips_bf16)
    steps = {}  # (phase-tuple, neural_res) -> compiled step
    losses_by_res = {args.neural_res_initial: loss}

    # the ramp formula lives in ONE place — LossConfig (loss.py:118-129,
    # mirroring loss_orthocondA.py:214-218); this cfg variant carries the
    # actual final/fade so the HOST can evaluate it, while the jitted loss
    # always sees final=None (a traced int() would fail under jit)
    ramp_cfg = dataclasses.replace(
        loss_cfg,
        neural_rendering_resolution_final=args.neural_res_final,
        neural_rendering_resolution_fade_kimg=args.neural_res_fade_kimg)

    def host_neural_res(step_i: int) -> int:
        """Resolution is shape-determining: each distinct value compiles its
        own step. --neural-res-quantize bounds how many compiles a long fade
        produces (TPU compiles are minutes; 1 = the reference's every-integer
        schedule); ramp endpoints are always exact."""
        res = int(ramp_cfg.neural_rendering_resolution(step_i * args.batch))
        q = args.neural_res_quantize
        final = args.neural_res_final
        if q > 1 and final is not None and res not in (
                args.neural_res_initial, final):
            lo = min(args.neural_res_initial, final)
            hi = max(args.neural_res_initial, final)
            res = int(np.clip(int(np.rint(res / q)) * q, lo, hi))
        return res

    def loss_for_res(res: int):
        if res not in losses_by_res:
            losses_by_res[res] = make_loss(
                g, d, lpips_vars,
                dataclasses.replace(
                    loss_cfg, neural_rendering_resolution_initial=res,
                    neural_rendering_resolution_final=None),
                augment=args.aug != "noaug", ray_sharding=ray_shard,
                lpips_bf16=args.lpips_bf16)
        return losses_by_res[res]

    from ..parallel.mesh import batch_sharding
    from ..parallel.multihost import make_global_batch

    collector = Collector()
    logger = JsonlLogger(os.path.join(run_dir, "stats.jsonl")) if leader else None
    tb = None
    if leader and args.tensorboard:
        from .stats import TensorboardLogger

        tb = TensorboardLogger(os.path.join(run_dir, "tb"))
    total_steps = args.max_steps or (args.kimg * 1000 // args.batch)
    tick_interval = args.tick_steps or max(args.tick * 1000 // args.batch, 1)
    t_start = time.time()

    # input pipeline: batch assembly + device_put run in a worker thread so
    # the device never idles on input (DataLoader-workers role); per-step
    # stats stay ON DEVICE and are read back in batches, otherwise every
    # float() is a host sync that serializes the step pipeline
    from ..data.prefetch import Prefetcher

    def _prepare(b):
        return make_global_batch(
            jax.tree_util.tree_map(jnp.asarray, b), mesh, batch_sharding(mesh)
        )

    batch_queue = Prefetcher(batch_iter, _prepare, depth=2)
    pending = []  # [(step_i, device-stats dict)]
    flush_interval = (
        args.ada_interval if args.aug == "ada" else min(tick_interval, 64)
    )

    def flush_pending():
        nonlocal pending
        if not pending:
            return
        vals = jax.device_get([s for _, s in pending])
        for v in vals:
            collector.report_dict({k: float(x) for k, x in v.items()})
        signs = [float(v["Loss/signs/real"]) for v in vals
                 if "Loss/signs/real" in v]
        pending = []
        return signs

    signs_hist = []
    save_thread = None
    start_step = int(state.cur_nimg) // args.batch
    nres = host_neural_res(start_step)

    def snap_artifacts(nres):
        """Snapshot config + generator AT the ramped resolution: the
        reference pickles G with its current neural_rendering_resolution
        (training_loop_v0.py:470-485), so loaders and snapshot-time metrics
        must see the resolution the model is actually training at."""
        cfg_now = dict(snap_config,
                       model_kwargs=dict(model_kwargs,
                                         neural_rendering_resolution=nres))
        g_now = (g if nres == g.neural_rendering_resolution
                 else g.clone(neural_rendering_resolution=nres))
        return cfg_now, g_now

    for step_i in range(start_step, total_steps):
        active = phases_for_step(step_i, train_cfg)
        nres = host_neural_res(step_i)
        if (active, nres) not in steps:
            steps[(active, nres)] = jax.jit(build_train_step(
                loss_for_res(nres), train_cfg, g.z_dim, active))
        batch = next(batch_queue)
        key, sk = jax.random.split(key)
        state, stats = steps[(active, nres)](state, batch, sk)
        pending.append((step_i, stats))

        if len(pending) >= flush_interval or step_i % tick_interval == 0:
            signs_hist.extend(flush_pending() or [])

        # ADA heuristic (training_loop_v0.py:398-402)
        if args.aug == "ada" and len(signs_hist) >= args.ada_interval:
            state = ada_update(
                state, float(np.mean(signs_hist)), args.ada_target,
                args.batch, args.ada_interval, ada_kimg,
            )
            signs_hist.clear()
            collector.report_dict({"Progress/augment": float(state.aug_p)})

        if step_i % tick_interval == 0 and leader:
            kimg = int(state.cur_nimg) / 1000
            msg = " ".join(
                f"{k.split('/')[-1]}={collector.mean(k):.3f}" for k in sorted(
                    collector.as_dict()) if k.startswith("Loss/")
            )
            print(f"tick kimg={kimg:.1f} time={time.time()-t_start:.0f}s {msg}")
            logger.write(collector, kimg=kimg)
            if tb is not None:
                tb.write(collector, step=int(state.cur_nimg))
            collector.reset()

        if step_i % (tick_interval * args.snap) == 0 and step_i > 0:
            # cross-replica param audit (check_ddp_consistency role,
            # training_loop_v0.py:478) — every process audits its devices
            if not check_replica_consistency(state.vars_G["params"]):
                print("WARNING: replica consistency check FAILED at snapshot")
            if leader:
                snap = os.path.join(
                    run_dir, f"network-snapshot-{int(state.cur_nimg):06d}"
                )
                # async save: jax arrays are immutable, so a worker thread
                # can device_get + serialize the captured state while the
                # loop keeps stepping (the D2H transfer is seconds of
                # otherwise-dead time); at most one save in flight. The dir
                # is created HERE, synchronously — _snapshot_images below
                # must not race the thread for it.
                if save_thread is not None:
                    save_thread.join()
                os.makedirs(snap, exist_ok=True)

                cfg_now, g_now = snap_artifacts(nres)

                def _save(snap=snap, state=state, cfg_now=cfg_now):
                    save_checkpoint(snap, jax.device_get(state),
                                    config=cfg_now)
                    print(f"saved {snap}")

                save_thread = threading.Thread(target=_save, daemon=True)
                save_thread.start()
                # grid from the host-local init batch (`first`), NOT the
                # globally-sharded training batch: on a multi-process run the
                # leader cannot eagerly apply G to non-addressable shards.
                # A fixed batch also matches the reference's fixed image grid
                # (training_loop_v0.py:435-443).
                _snapshot_images(g_now, state, first, snap)
                # snapshot-time metric eval (training_loop_v0.py:487-498)
                if args.metrics != "none":
                    _snapshot_metrics(args, g_now, state, make_batch_iter,
                                      run_dir, snap)

    flush_pending()
    if tb is not None:
        tb.close()
    batch_queue.close()
    if save_thread is not None:
        save_thread.join()
    if leader:
        snap = os.path.join(run_dir, f"network-snapshot-{int(state.cur_nimg):06d}")
        cfg_now, _ = snap_artifacts(nres)
        save_checkpoint(snap, jax.device_get(state), config=cfg_now)
        print(f"done; final snapshot {snap}")


if __name__ == "__main__":
    main()
