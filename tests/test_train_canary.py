"""Fast-tier train-step canary (<60 s): the round gate exercises the
multi-phase GAN train step end-to-end.

The full equivalence batteries (grad accumulation vs full batch, fused
recon vs separate phases, remat invariance) are slow-tier; this canary
compiles ONE micro-config step with the adversarial G and D phases and
asserts the invariants that need no second compile:

  - all phase losses are finite and both nets actually move;
  - the step is deterministic (same state + key -> bitwise-equal state),
    the single-process stand-in for the reference's check_ddp_consistency
    (training_loop_v0.py:478);
  - the G_ema lerp matches the reference formula exactly
    (training_loop_v0.py:381-392), recomputed on host.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu import configs
from panic3d_tpu.data.dataset import synthetic_batch
from panic3d_tpu.models.dual_discriminator import DualDiscriminator
from panic3d_tpu.models.triplane import TriPlaneGenerator
from panic3d_tpu.training import LossConfig, TrainConfig, build_train_step, init_state
from panic3d_tpu.training.setup import init_lpips, make_loss

pytestmark = pytest.mark.fast

BS = 2
IMG = 128  # SuperresolutionHybrid2X is fixed-128² (reference parity)
PHASES = ("Gmain", "Dmain")


@pytest.mark.fast
def test_train_step_canary():
    g = configs.tiny(
        img_resolution=IMG,
        backbone_resolution=32,
        neural_rendering_resolution=8,
        cond_mode="ortho_front.add_4.reschonk_add_16",
        rendering_kwargs=dict(
            superresolution_module="training.superresolution.SuperresolutionHybrid2X",
            depth_resolution=4,
            depth_resolution_importance=4,
            box_warp=0.7, ray_start=0.5, ray_end=1.5,
            white_back=True, use_triplane=True,
        ),
    )
    d = DualDiscriminator(
        c_dim=25, img_resolution=IMG, img_channels=3,
        channel_base=1024, channel_max=32,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(bs=BS, size=IMG, chonk_ch=16, feat_dim=32)
    )
    key = jax.random.PRNGKey(0)
    xin = {"z": jnp.zeros((BS, g.z_dim)), "camera_params": batch["camera"],
           "cond": batch["cond"]}
    init_G = jax.jit(
        lambda k, x: g.init({"params": k, "noise": k}, x,
                            method=TriPlaneGenerator.f, noise_mode="const")
    )
    vars_G = init_G(key, xin)
    img = {"image": batch["image"], "image_raw": jnp.zeros((BS, 3, 8, 8))}
    init_D = jax.jit(
        lambda k, i, c, cond: d.init({"params": k}, i, c, cond)
    )
    vars_D = init_D(key, img, batch["camera"], batch["cond"])

    # L1-only recon: compiling LPIPS into Gcond doubles the canary's cost
    # and is covered by the slow-tier equivalence batteries
    cfg = LossConfig(lambda_gcond_lpips=0.0, lambda_gcond_l1=1.0,
                     blur_init_sigma=0.0)
    loss = make_loss(g, d, init_lpips(), cfg, noise_mode="const",
                     deterministic=True)
    tcfg = TrainConfig(batch_size=BS, phases=PHASES)
    state = init_state(vars_G, vars_D, tcfg)
    step = jax.jit(build_train_step(loss, tcfg, g.z_dim, PHASES))

    new1, stats = step(state, batch, jax.random.PRNGKey(7))
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    assert {"Loss/G/loss", "Loss/D/loss"} <= set(stats)

    # both nets moved
    dG = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree_util.tree_leaves(new1.vars_G["params"]),
                             jax.tree_util.tree_leaves(state.vars_G["params"])))
    dD = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree_util.tree_leaves(new1.vars_D["params"]),
                             jax.tree_util.tree_leaves(state.vars_D["params"])))
    assert dG > 0 and dD > 0

    # determinism: bitwise-equal re-run (replica-consistency canary)
    new2, _ = step(state, batch, jax.random.PRNGKey(7))
    for a, b in zip(jax.tree_util.tree_leaves(new1.vars_G["params"]),
                    jax.tree_util.tree_leaves(new2.vars_G["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # G_ema lerp (training_loop_v0.py:381-392) recomputed on host
    ema_beta = 0.5 ** (BS / (tcfg.ema_kimg * 1000))
    got = jax.tree_util.tree_leaves(new1.vars_Gema["params"])
    want = jax.tree_util.tree_map(
        lambda p, e: p + (e - p) * ema_beta,
        new1.vars_G["params"], state.vars_Gema["params"],
    )
    for a, b in zip(got, jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert int(new1.cur_nimg) == BS
