"""Training-system tests: loss phases, one full train step, multi-chip DP.

SURVEY.md §4: the reference has no trainer tests; the closest is
check_ddp_consistency at snapshot time. Here the whole phase loop runs on a
virtual 8-device CPU mesh (conftest) with a tiny model and synthetic batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu import configs
from panic3d_tpu.data.dataset import synthetic_batch
from panic3d_tpu.models.dual_discriminator import DualDiscriminator
from panic3d_tpu.models.triplane import TriPlaneGenerator
from panic3d_tpu.parallel import make_mesh, shard_batch
from panic3d_tpu.training import (
    LossConfig,
    TrainConfig,
    build_train_step,
    init_state,
)
from panic3d_tpu.training.setup import init_lpips, make_loss


BS = 2
SIZE = 64


def tiny_models():
    g = configs.tiny(
        img_resolution=SIZE * 2,
        backbone_resolution=32,
        neural_rendering_resolution=16,
        cond_mode="ortho_front.add_4.reschonk_add_16",
        rendering_kwargs=dict(
            superresolution_module="training.superresolution.SuperresolutionHybrid2X",
            depth_resolution=6,
            depth_resolution_importance=6,
            box_warp=0.7,
            ray_start=0.5,
            ray_end=1.5,
            white_back=True,
            use_triplane=True,
        ),
    )
    d = DualDiscriminator(
        c_dim=25, img_resolution=SIZE * 2, img_channels=3,
        channel_base=1024, channel_max=32,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    return g, d


def make_batch():
    b = synthetic_batch(bs=BS, size=SIZE * 2, chonk_ch=16, feat_dim=32)
    return jax.tree_util.tree_map(jnp.asarray, b)


@pytest.fixture(scope="module")
def rig():
    g, d = tiny_models()
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    xin = {
        "z": jnp.zeros((BS, g.z_dim)),
        "camera_params": batch["camera"],
        "cond": batch["cond"],
    }
    vars_G = g.init({"params": key, "noise": key}, xin, method=TriPlaneGenerator.f,
                    noise_mode="const")
    img = {
        "image": batch["image"],
        "image_raw": jnp.zeros((BS, 3, 16, 16)),
    }
    vars_D = d.init({"params": key}, img, batch["camera"], batch["cond"])
    lpips_vars = init_lpips()
    cfg = LossConfig(
        lambda_gcond_alpha_l2=1.0,
        lambda_gcond_depth_l2=1.0,
        lambda_gcond_sides_lpips=1.0,
        lambda_gcond_rand_lpips=1.0,
        lossmask_mode_adv="replace_16",
        lossmask_mode_recon="dilate_16",
        lambda_recon_l1=1.0,
        blur_init_sigma=0.0,
    )
    loss = make_loss(g, d, lpips_vars, cfg, noise_mode="const")
    return g, d, vars_G, vars_D, loss, batch


def test_g_cond_losses_finite_and_grad(rig):
    g, d, vars_G, vars_D, loss, batch = rig
    z = jax.random.normal(jax.random.PRNGKey(1), (BS, g.z_dim))
    for view in ("front", "left", "rand"):
        (l, stats), grads = jax.value_and_grad(
            lambda p: loss.g_cond_loss(dict(vars_G, params=p), batch, z,
                                       jax.random.PRNGKey(2), view=view),
            has_aux=True,
        )(vars_G["params"])
        assert np.isfinite(float(l)), view
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(g_).sum()) > 0 for g_ in leaves), view


def test_adversarial_and_r1(rig):
    g, d, vars_G, vars_D, loss, batch = rig
    z = jax.random.normal(jax.random.PRNGKey(1), (BS, g.z_dim))
    c = batch["camera"]
    k = jax.random.PRNGKey(3)

    l_g, _ = loss.g_main_loss(vars_G, vars_D, batch, z, c, k, cur_nimg=0)
    assert np.isfinite(float(l_g))

    l_d, _ = loss.d_main_loss(vars_D, vars_G, batch, z, c, k, cur_nimg=0)
    assert np.isfinite(float(l_d))

    (l_r1, stats), grads = jax.value_and_grad(
        lambda p: loss.d_reg_loss(dict(vars_D, params=p), batch, c, k, 0),
        has_aux=True,
    )(vars_D["params"])
    assert np.isfinite(float(l_r1))
    assert any(
        float(jnp.abs(g_).sum()) > 0 for g_ in jax.tree_util.tree_leaves(grads)
    )


def test_density_reg(rig):
    g, d, vars_G, vars_D, loss, batch = rig
    z = jax.random.normal(jax.random.PRNGKey(1), (BS, g.z_dim))
    l, stats = loss.g_reg_loss(vars_G, batch, z, batch["camera"],
                               jax.random.PRNGKey(4), 0)
    assert np.isfinite(float(l))


def test_full_train_step_multichip(rig):
    """One full multi-phase step, DP-sharded over the 8-device CPU mesh."""
    g, d, vars_G, vars_D, loss, batch = rig
    tcfg = TrainConfig(batch_size=BS, phases=(
        "Gmain", "Gcond", "Greg", "Dmain", "Dreg",
    ))
    state = init_state(vars_G, vars_D, tcfg)
    step = build_train_step(loss, tcfg, g.z_dim,
                            ("Gmain", "Gcond", "Greg", "Dmain", "Dreg"))

    mesh = make_mesh(n_data=2, n_rays=1)
    sharded = shard_batch(batch, mesh)
    jstep = jax.jit(step)
    new_state, stats = jstep(state, sharded, jax.random.PRNGKey(5))
    assert int(new_state.cur_nimg) == BS
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    # params actually changed
    p0 = jax.tree_util.tree_leaves(state.vars_G["params"])[0]
    p1 = jax.tree_util.tree_leaves(new_state.vars_G["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # EMA moved toward params
    e1 = jax.tree_util.tree_leaves(new_state.vars_Gema["params"])[0]
    assert np.isfinite(np.asarray(e1)).all()
