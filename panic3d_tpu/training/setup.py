"""Wiring: flax modules -> OrthoCondLoss apply adapters -> train step.

The glue the reference spreads across training_loop_v0.py:150-266
(model construction, loss construction, phase setup) — here a few factory
functions that close flax modules + variables into the pure loss fns.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from ..eval.lpips import LPIPS
from ..models.dual_discriminator import DualDiscriminator
from ..models.triplane import TriPlaneGenerator
from .loop import TrainConfig, build_train_step, init_state
from .loss import LossConfig, OrthoCondLoss


def make_loss(
    G: TriPlaneGenerator,
    D: DualDiscriminator,
    lpips_vars,
    cfg: LossConfig,
    noise_mode: str = "random",
    augment: bool = False,
    augment_cfg=None,
    deterministic: bool = False,
    ray_sharding=None,
    lpips_bf16: bool = False,
):
    """deterministic=True pins the renderer to its key-free quadrature
    (midpoint stratified, deterministic importance draws) — used by the
    gradient-accumulation equivalence test.

    ray_sharding: optional NamedSharding (spec [batch, rays]) partitioning
    the volume render's ray axis across the mesh inside the train step —
    combined dp x ray parallelism (SURVEY.md §5).

    lpips_bf16=True runs the recon-loss AlexNet tower in bfloat16 (params
    and reductions fp32) — a TPU-native training-time setting; the loss is
    an optimization signal here, not the reported metric."""
    import jax.numpy as jnp

    lpips_module = LPIPS(
        compute_dtype=jnp.bfloat16 if lpips_bf16 else None
    )

    def G_f(vars_G, xin, key):
        k_noise, k_render = jax.random.split(key)
        return G.apply(
            vars_G, xin,
            method=TriPlaneGenerator.f,
            rngs={"noise": k_noise} if noise_mode == "random" else {},
            noise_mode=noise_mode,
            render_key=None if deterministic else k_render,
            ray_sharding=ray_sharding,
        )

    def G_mapping(vars_G, z, c, cond):
        return G.apply(vars_G, z, c, cond, method=TriPlaneGenerator.mapping)

    def G_planes(vars_G, ws, cond, key):
        """Backbone-only synthesis: ws -> triplanes (fused recon phase)."""
        return G.apply(
            vars_G, ws, cond,
            method=TriPlaneGenerator._planes_from_ws,
            rngs={"noise": key} if noise_mode == "random" else {},
            noise_mode=noise_mode,
        )

    def G_sample_mixed(vars_G, coords, dirs, ws, cond):
        return G.apply(
            vars_G, coords, dirs, ws, cond,
            method=TriPlaneGenerator.sample_mixed,
            rngs={"noise": jax.random.PRNGKey(0)} if noise_mode == "random" else {},
            noise_mode=noise_mode,
        )

    def D_apply(vars_D, img, c, cond, key):
        rngs = {"noise": key} if D.disc_c_noise > 0 else {}
        return D.apply(vars_D, img, c, cond, rngs=rngs)

    def lpips_fn(a, b):
        return lpips_module.apply(lpips_vars, a, b)

    augment_fn = None
    if augment:
        from .augment import AugmentConfig, augment_pipe

        acfg = augment_cfg if augment_cfg is not None else AugmentConfig.bgc()

        def augment_fn(images, key, p):
            return augment_pipe(images, key, p, acfg)

    return OrthoCondLoss(cfg, G_f, G_mapping, G_sample_mixed, D_apply, lpips_fn,
                         augment_fn=augment_fn, G_planes=G_planes)


def init_lpips(key=None):
    """Random-init LPIPS vars (use runtime.convert tools for real weights)."""
    import jax.numpy as jnp

    key = key if key is not None else jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, 64, 64))
    return LPIPS().init(key, x, x)
