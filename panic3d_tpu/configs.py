"""Model configurations.

`flagship()` mirrors the ecrutileE_eclustrousC best-run shape recovered from
trainer CLI defaults (`_train/eg3dc/trainers/train_eclustrousC.py:189-203,
397-440`): 512² output, 256² backbone, triplane_width 32, SR hidden 256,
map depth 2, ecrutileE rendering config (box_warp 0.7, ray 0.5->1.5, 48+48
samples, white_back). The exact cond_mode string of the released checkpoint
lives inside its pickle (eg3dc_v0.py:47); eval only feeds image_ortho_front
+ resnet_chonk (generate.py:90-96), so the default here uses the ortho-front
shuffle injection + resnet chonk addition. Override via kwargs when
converting a real checkpoint.
"""

from __future__ import annotations

from .models import TriPlaneGenerator


FLAGSHIP_RENDERING_KWARGS = dict(
    image_resolution=512,
    disparity_space_sampling=False,
    clamp_mode="softplus",
    superresolution_module="training.superresolution.SuperresolutionHybrid8XDC",
    c_gen_conditioning_zero=True,
    gpc_reg_prob=None,
    c_scale=1.0,
    superresolution_noise_mode="none",
    density_reg=0.25,
    density_reg_p_dist=0.004,
    reg_type="l1",
    decoder_lr_mul=1.0,
    sr_antialias=True,
    white_back=True,
    triplane_depth=1,
    use_triplane=True,
    tanh_rgb_output=False,
    box_warp=0.7,
    ray_start=0.5,
    ray_end=1.5,
    depth_resolution=48,
    depth_resolution_importance=48,
)


def flagship(eval_mode: bool = False, ess: bool = False,
             **overrides) -> TriPlaneGenerator:
    """The ecrutileE_eclustrousC 512² generator.

    eval_mode=True applies the eval settings of eg3dc_v0.py:30-31,55-56 +
    generate.py:53: doubled ray samples (96+96) and force_sigmoid.

    ess=True enables empty-space skipping (TPU-native addition, see
    models/volumetric/renderer.py ess_occupancy): a per-planes occupancy
    grid narrows each ray's sample interval to the occupied span, so a
    48+48 budget matches or beats the reference 96+96-over-[0.5,1.5]
    effective sample spacing whenever the occupied span is ≤ half the
    interval (a head in the 0.7 box typically spans ~0.3-0.4 of it).
    Halved budget = ~2x fewer triplane gathers, the measured render
    bottleneck. Settings-parity runs (vs the reference quadrature) use
    ess=False. Override sample counts via rendering_kwargs as usual.
    """
    rk = dict(FLAGSHIP_RENDERING_KWARGS)
    if eval_mode:
        rk["depth_resolution"] = 96
        rk["depth_resolution_importance"] = 96
    if ess:
        rk["ess"] = dict(grid=32, taps=64, thresh=0.01, margin=1.0)
        rk["depth_resolution"] = 48
        rk["depth_resolution_importance"] = 48
    rk.update(overrides.pop("rendering_kwargs", {}))
    kwargs = dict(
        z_dim=512,
        c_dim=25,
        w_dim=512,
        img_resolution=512,
        img_channels=3,
        backbone_resolution=256,
        triplane_width=32,
        sr_channels_hidden=256,
        cond_mode="ortho_front.add_shuffle2_4.reschonk_add_512",
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=32768, channel_max=512),
        rendering_kwargs=rk,
        neural_rendering_resolution=64,
        force_sigmoid=eval_mode,
        sr_num_fp16_res=4,
    )
    kwargs.update(overrides)
    return TriPlaneGenerator(**kwargs)


def from_snapshot_config(config, eval_mode: bool = False,
                         ess: bool = False) -> TriPlaneGenerator:
    """Rebuild the generator a trainer snapshot was trained with.

    Prefers the explicit `model_kwargs` dict the trainer stores in the
    snapshot config (the role of init_args/init_kwargs riding inside the
    reference pickles, eg3dc_v0.py:41-52); falls back to mapping the flat
    trainer args of pre-round-3 snapshots (cond_mode/triplane_width/... as
    written by vars(args)). Without either, the default flagship."""
    config = dict(config or {})
    mk = dict(config.get("model_kwargs") or {})
    family = mk.pop("family", "flagship")
    if config.get("model_kwargs") is not None:
        if family == "tiny":
            mk.setdefault("force_sigmoid", eval_mode)
            return tiny(**mk)
        return flagship(eval_mode=eval_mode, ess=ess, **mk)
    if config.get("tiny"):
        return tiny(cond_mode="ortho_front.add_4.reschonk_add_16",
                    force_sigmoid=eval_mode)
    if "cond_mode" in config:
        return flagship(
            eval_mode=eval_mode, ess=ess,
            cond_mode=config["cond_mode"],
            triplane_width=config.get("triplane_width", 32),
            backbone_resolution=config.get("backbone_resolution", 256),
            img_resolution=config.get("resolution", 512),
            rendering_kwargs=dict(triplane_depth=config.get("triplane_depth", 1)),
        )
    return flagship(eval_mode=eval_mode, ess=ess)


def tiny(**overrides) -> TriPlaneGenerator:
    """Small config for tests and dry-runs (CPU-friendly)."""
    kwargs = dict(
        z_dim=64,
        c_dim=25,
        w_dim=64,
        img_resolution=128,
        img_channels=3,
        backbone_resolution=64,
        triplane_width=8,
        sr_channels_hidden=32,
        cond_mode="ortho_front.add_shuffle2_4.reschonk_add_16",
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=2048, channel_max=64),
        rendering_kwargs=dict(
            superresolution_module="training.superresolution.SuperresolutionHybrid2X",
            depth_resolution=8,
            depth_resolution_importance=8,
            box_warp=0.7,
            ray_start=0.5,
            ray_end=1.5,
            white_back=True,
            use_triplane=True,
        ),
        neural_rendering_resolution=16,
    )
    kwargs.update(overrides)
    return TriPlaneGenerator(**kwargs)
