"""Round-2 training features: gradient accumulation, ADA, style mixing,
rank-sharded batching, trainer flag plumbing.

Reference roles: batch_gpu micro-batching (training_loop_v0.py:336-347),
ADA heuristic (training_loop_v0.py:398-402) + joint-pair augmentation in
run_D (loss_orthocondA.py:189-195), vanilla style mixing
(src/training/loss.py:87-92), InfiniteSampler shared-order partition
(src/torch_utils/misc.py:113-147).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu import configs
from panic3d_tpu.data.dataset import InfiniteBatcher, synthetic_batch
from panic3d_tpu.models.dual_discriminator import DualDiscriminator
from panic3d_tpu.models.triplane import TriPlaneGenerator
from panic3d_tpu.training import LossConfig, TrainConfig, build_train_step, init_state
from panic3d_tpu.training.loop import ada_update
from panic3d_tpu.training.setup import init_lpips, make_loss

BS = 4
SIZE = 64  # Hybrid2X SR is hardwired 64->128 (reference superresolution.py:93-121)


def tiny_models():
    g = configs.tiny(
        img_resolution=SIZE * 2,
        backbone_resolution=32,
        neural_rendering_resolution=16,
        cond_mode="ortho_front.add_4.reschonk_add_16",
        rendering_kwargs=dict(
            superresolution_module="training.superresolution.SuperresolutionHybrid2X",
            depth_resolution=4,
            depth_resolution_importance=4,
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
        epilogue_kwargs=dict(mbstd_group_size=1),
    )
    return g, d


@pytest.fixture(scope="module")
def rig():
    g, d = tiny_models()
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(bs=BS, size=SIZE * 2, chonk_ch=16, feat_dim=32)
    )
    key = jax.random.PRNGKey(0)
    xin = {
        "z": jnp.zeros((BS, g.z_dim)),
        "camera_params": batch["camera"],
        "cond": batch["cond"],
    }
    vars_G = g.init({"params": key, "noise": key}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")
    vars_D = d.init(
        {"params": key},
        {"image": batch["image"], "image_raw": jnp.zeros((BS, 3, 16, 16))},
        batch["camera"], batch["cond"],
    )
    return g, d, vars_G, vars_D, init_lpips(), batch


def test_grad_accumulation_equals_full_batch(rig, monkeypatch):
    """batch_gpu accumulation == full-batch gradient for a separable,
    deterministic phase (Gcond with key-free quadrature).

    The optimizer is pinned to SGD(1.0) so the param delta IS the averaged
    gradient — Adam's step-1 update is lr*sign(g), which amplifies
    fp-reduction-order noise on near-zero grads into 2*lr jumps and would
    make the comparison meaningless.
    """
    import optax

    import panic3d_tpu.training.loop as loop_mod

    monkeypatch.setattr(
        loop_mod, "make_optimizers",
        lambda cfg: (optax.sgd(1.0), optax.sgd(1.0)),
    )

    g, d, vars_G, vars_D, lpips_vars, batch = rig
    cfg = LossConfig(lambda_gcond_lpips=1.0, lambda_gcond_l1=1.0,
                     lambda_gcond_alpha_l2=1.0, lambda_gcond_depth_l2=1.0)
    loss = make_loss(g, d, lpips_vars, cfg, noise_mode="const",
                     deterministic=True)

    key = jax.random.PRNGKey(7)
    out, losses = {}, {}
    for bg in (None, 1, 2):
        tcfg = TrainConfig(batch_size=BS, batch_gpu=bg, phases=("Gcond",))
        state = loop_mod.init_state(vars_G, vars_D, tcfg)
        step = jax.jit(loop_mod.build_train_step(loss, tcfg, g.z_dim, ("Gcond",)))
        new_state, stats = step(state, batch, key)
        out[bg] = new_state
        losses[bg] = float(stats["Loss/G/front"])
        assert np.isfinite(losses[bg])

    # forward: micro-batch-averaged loss == full-batch loss (tight)
    for bg in (1, 2):
        np.testing.assert_allclose(losses[bg], losses[None], rtol=1e-5)

    # backward: averaged accumulated grads == full-batch grads, on weight
    # leaves. Rank<=1 leaves (conv biases, noise_strength) are excluded:
    # their grads are catastrophically-cancelling spatial sums — a control
    # experiment showed a pure batch PERMUTATION (mathematically identity)
    # already perturbs them 10-20% at fp32, so relative comparison there
    # measures reduction-order noise, not accumulation correctness. Weight
    # grads tolerate a per-mille of discrete subgradient flips (L1 sign(),
    # >0.5 masks). An averaging/slicing bug would show O(1) discrepancies.
    base = {k: np.asarray(v) for k, v in enumerate(
        jax.tree_util.tree_leaves(vars_G["params"]))}
    full = jax.tree_util.tree_leaves(out[None].vars_G["params"])
    n_checked = 0
    for bg in (1, 2):
        acc = jax.tree_util.tree_leaves(out[bg].vars_G["params"])
        for i, (a, b) in enumerate(zip(full, acc)):
            if np.asarray(a).ndim <= 1:
                continue
            # compare gradients (= base - new under SGD(1.0))
            ga = base[i] - np.asarray(a)
            gb = base[i] - np.asarray(b)
            scale = np.abs(ga).max() + 1e-12
            bad = np.abs(ga - gb) / scale > 5e-3
            assert bad.mean() <= 2e-2, (
                f"leaf {i}: {bad.mean():.2%} of grads differ beyond 5e-3"
            )
            n_checked += 1
    assert n_checked > 20


def test_grad_accumulation_all_phases_run(rig):
    """Micro-batched step with D phases + adversarial G compiles and is finite."""
    g, d, vars_G, vars_D, lpips_vars, batch = rig
    cfg = LossConfig(lambda_gcond_l1=1.0)
    loss = make_loss(g, d, lpips_vars, cfg, noise_mode="const")
    phases = ("Gmain", "Gcond", "Dmain", "Dreg")
    tcfg = TrainConfig(batch_size=BS, batch_gpu=2, phases=phases)
    state = init_state(vars_G, vars_D, tcfg)
    step = jax.jit(build_train_step(loss, tcfg, g.z_dim, phases))
    new_state, stats = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.cur_nimg) == BS
    for k, v in stats.items():
        assert np.isfinite(float(v)), k


def test_ada_augmented_step_and_heuristic(rig):
    """ADA: augment-wired step trains finite at p>0; p-heuristic adapts
    toward the target and clamps at zero."""
    g, d, vars_G, vars_D, lpips_vars, batch = rig
    cfg = LossConfig(lambda_gcond_l1=1.0)
    loss = make_loss(g, d, lpips_vars, cfg, noise_mode="const", augment=True)
    assert loss.augment_fn is not None
    phases = ("Gmain", "Dmain", "Dreg")
    tcfg = TrainConfig(batch_size=BS, phases=phases)
    state = init_state(vars_G, vars_D, tcfg).replace(aug_p=jnp.float32(0.7))
    step = jax.jit(build_train_step(loss, tcfg, g.z_dim, phases))
    new_state, stats = step(state, batch, jax.random.PRNGKey(2))
    for k, v in stats.items():
        assert np.isfinite(float(v)), k
    assert "Loss/signs/real" in stats and "Loss/signs/fake" in stats

    # heuristic: overfit D (signs/real above target) -> p rises
    s1 = ada_update(new_state, signs_real=1.0, ada_target=0.6,
                    batch_size=BS, ada_interval=4, ada_kimg=1.0)
    assert float(s1.aug_p) > float(new_state.aug_p)
    # signs below target -> p falls, clamped at 0
    s2 = new_state.replace(aug_p=jnp.float32(0.001))
    s3 = ada_update(s2, signs_real=-1.0, ada_target=0.6,
                    batch_size=BS, ada_interval=4, ada_kimg=1.0)
    assert float(s3.aug_p) == 0.0


def test_augment_changes_discriminator_input(rig):
    """With p=1 the augment pipe actually perturbs the D input pair."""
    from panic3d_tpu.training.augment import AugmentConfig, augment_pipe

    img = jnp.asarray(np.random.RandomState(0).rand(2, 6, 32, 32), jnp.float32)
    out0 = augment_pipe(img, jax.random.PRNGKey(0), 0.0, AugmentConfig.bgc())
    out1 = augment_pipe(img, jax.random.PRNGKey(0), 1.0, AugmentConfig.bgc())
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1e-5)
    assert float(jnp.abs(out1 - img).max()) > 1e-3


def test_style_mixing(rig):
    """style_mixing_prob=1 re-draws ws past the cutoff -> output differs
    from the unmixed render under the same key (loss.py:87-92)."""
    g, d, vars_G, vars_D, lpips_vars, batch = rig
    z = jax.random.normal(jax.random.PRNGKey(3), (BS, g.z_dim))
    c = batch["camera"]
    key = jax.random.PRNGKey(4)
    outs = {}
    for prob in (0.0, 1.0):
        cfg = LossConfig(style_mixing_prob=prob)
        loss = make_loss(g, d, lpips_vars, cfg, noise_mode="const",
                         deterministic=True)
        outs[prob] = loss.run_G(vars_G, z, c, batch["cond"], key,
                                swapping_prob=None,
                                neural_rendering_resolution=16)
    diff = float(jnp.abs(outs[0.0]["image"] - outs[1.0]["image"]).max())
    assert diff > 1e-4


def test_infinite_batcher_partitions_across_ranks():
    """World>1: ranks share one shuffle and the strided slices partition
    each epoch exactly (misc.py:113-147 semantics)."""

    class Idx:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"i": np.asarray(i)}

    world = 4
    per_rank_epoch = 16 // world
    seen = []
    for rank in range(world):
        it = iter(InfiniteBatcher(Idx(), batch_size=2, rank=rank, world=world,
                                  seed=123))
        got = []
        while len(got) < per_rank_epoch:
            got.extend(int(x) for x in next(it)["i"])
        seen.append(got[:per_rank_epoch])
    flat = sorted(x for r in seen for x in r)
    assert flat == list(range(16)), f"ranks do not partition the epoch: {seen}"


def test_trainer_flag_plumbing():
    """--triplane-depth and --batch-gpu actually reach the built objects."""
    from panic3d_tpu.training.trainer import build_models, parse_args

    args = parse_args(["--name", "t", "--triplane-depth", "3",
                       "--batch-gpu", "2", "--mesh-rays", "2"])
    g, d, _, _, model_kwargs = build_models(args)
    assert g.triplane_depth == 3
    assert args.batch_gpu == 2
    assert args.mesh_rays == 2
    assert model_kwargs["rendering_kwargs"]["triplane_depth"] == 3
    tcfg = TrainConfig(batch_size=4, batch_gpu=2)
    assert tcfg.n_micro == 2

    # capacity / precision / SR / conditioning knobs reach the modules
    # (train_eclustrousC.py:239-264, 480-556)
    args = parse_args([
        "--name", "t", "--cbase-g", "16384", "--cmax-g", "256",
        "--cbase-d", "8192", "--cmax-d", "128", "--map-depth", "3",
        "--mbstd-group", "2", "--g-num-fp16-res", "0",
        "--d-num-fp16-res", "2", "--sr-num-fp16-res", "1",
        "--sr-channels-hidden", "128", "--sr-noise-mode", "random",
        "--decoder-lr-mul", "0.5", "--use-triplane", "0",
        "--tanh-rgb-output", "--c-scale", "0.5", "--c-noise", "0.1",
        "--density-reg-p-dist", "0.01", "--neural-res-initial", "32",
    ])
    g, d, _, _, mk = build_models(args)
    assert g.synthesis_kwargs == dict(channel_base=16384, channel_max=256,
                                      num_fp16_res=0, conv_clamp=None)
    assert g.mapping_kwargs == dict(num_layers=3)
    assert g.sr_num_fp16_res == 1 and g.sr_channels_hidden == 128
    assert g.rk["superresolution_noise_mode"] == "random"
    assert g.rk["decoder_lr_mul"] == 0.5 and not g.rk["use_triplane"]
    assert g.rk["tanh_rgb_output"] and g.rk["c_scale"] == 0.5
    assert g.rk["density_reg_p_dist"] == 0.01
    assert g.neural_rendering_resolution == 32
    assert d.channel_base == 8192 and d.channel_max == 128
    assert d.num_fp16_res == 2 and d.disc_c_noise == 0.1
    assert d.epilogue_kwargs == dict(mbstd_group_size=2)
    # snapshot config rebuilds the same architecture
    from panic3d_tpu import configs as _cfgs
    g2 = _cfgs.from_snapshot_config({"model_kwargs": mk})
    assert g2.synthesis_kwargs == g.synthesis_kwargs
    assert g2.neural_rendering_resolution == 32

    # --fp32 zeroes every num_fp16_res (reference --fp32)
    args = parse_args(["--name", "t", "--fp32"])
    assert (args.g_num_fp16_res, args.d_num_fp16_res,
            args.sr_num_fp16_res) == (0, 0, 0)


# ---------------------------------------------------------------------------
# auto-resume discovery + snapshot-time metric eval (training_loop_v0.py
# :487-498; train_eclustrousC.py:301-337)

def test_find_resume_skips_unusable_snapshots(tmp_path):
    from panic3d_tpu.training.trainer import find_resume

    run = tmp_path / "run"
    for name, usable in [
        ("network-snapshot-000100", True),
        ("network-snapshot-000200", True),
        ("network-snapshot-000300", False),  # crash mid-save: empty state
    ]:
        d = run / name
        d.mkdir(parents=True)
        st = d / "state.msgpack"
        st.write_bytes(b"x" * 16 if usable else b"")
    assert find_resume(str(run)).endswith("network-snapshot-000200")
    assert find_resume(str(tmp_path / "missing")) is None


def test_trainer_writes_snapshot_metric_jsonl(tmp_path):
    """A tiny synthetic run with --metrics fid_clip must evaluate FID at
    the snapshot and write metric-fid_clip.jsonl (random-init feature
    net: the MECHANISM is under test, not the value; fid_clip rather than
    fid50k_full keeps the 299² Inception compile out of this e2e — the
    fid50k_full->Inception routing is covered by test_round3_fixes.py and
    the detector itself by test_inception.py)."""
    import json
    import os

    from panic3d_tpu.training import trainer

    out = str(tmp_path)
    trainer.main([
        "--name", "msmoke", "--tiny", "--synthetic", "--batch", "2",
        "--gamma", "1", "--max-steps", "3", "--tick-steps", "1",
        "--snap", "2", "--metrics", "fid_clip", "--metric-items", "4",
        "--tensorboard", "--outdir", out,
    ])
    run_dir = os.path.join(out, "msmoke")
    jl = os.path.join(run_dir, "metric-fid_clip.jsonl")
    assert os.path.isfile(jl), os.listdir(run_dir)
    rec = json.loads(open(jl).read().strip().splitlines()[-1])
    assert "results" in rec and "fid_clip" in rec["results"]
    assert np.isfinite(rec["results"]["fid_clip"])
    # --tensorboard: tick stats also land as TB event files (<run>/tb,
    # training_loop_v0.py:518-523 role)
    tb_dir = os.path.join(run_dir, "tb")
    assert os.path.isdir(tb_dir) and any(
        "tfevents" in f for f in os.listdir(tb_dir)), os.listdir(run_dir)


def test_trainer_neural_res_ramp_and_desc(tmp_path):
    """--neural-res-final ramps the rendering resolution on the HOST
    (loss_orthocondA.py:214-218: int(rint(lerp))), compiling one step per
    distinct resolution; --desc suffixes the run dir. Gmain+Dmain only
    (lambdas/regs zeroed) to keep the three per-resolution compiles small."""
    import os

    from panic3d_tpu.training import trainer

    out = str(tmp_path)
    trainer.main([
        "--name", "ramp", "--desc", "a", "--tiny", "--synthetic",
        "--batch", "2", "--gamma", "0", "--density-reg", "0",
        "--lambda-gcond-lpips", "0", "--lambda-gcond-l1", "0",
        "--max-steps", "3", "--tick-steps", "1",
        "--neural-res-initial", "16", "--neural-res-final", "8",
        "--neural-res-fade-kimg", "0.004", "--neural-res-quantize", "1",
        "--outdir", out,
    ])
    run_dir = os.path.join(out, "ramp-a")  # <name>-<desc>
    assert os.path.isdir(run_dir), os.listdir(out)
    # the run completed through all three ramped resolutions — 16 (a=0),
    # 12 (a=0.5), 8 (a=1) per the reference formula — each as its own
    # compiled step; the final snapshot exists
    assert any(f.startswith("network-snapshot-") for f in os.listdir(run_dir))


def test_freeze_d_layers(rig):
    """--freezed N: the first N discriminator layers (reference indexing,
    networks_stylegan2.py:788-810) take no update in a Dmain step; all
    other D params move."""
    from flax import traverse_util

    from panic3d_tpu.training.trainer import d_frozen_paths

    g, d, vars_G, vars_D, lpips_vars, batch = rig
    # tiny D at 128²: first block b128 has fromrgb+conv0+conv1+skip = 4
    frozen = d_frozen_paths(d.img_resolution, 4)
    assert frozen == (("b128", "fromrgb"), ("b128", "conv0"),
                      ("b128", "conv1"), ("b128", "skip"))
    # 5th layer crosses into the next block
    assert d_frozen_paths(d.img_resolution, 5)[-1] == ("b64", "conv0")

    cfg = LossConfig()
    loss = make_loss(g, d, lpips_vars, cfg, noise_mode="const")
    tcfg = TrainConfig(batch_size=BS, phases=("Dmain",), d_frozen=frozen)
    state = init_state(vars_G, vars_D, tcfg)
    step = jax.jit(build_train_step(loss, tcfg, g.z_dim, ("Dmain",)))
    new_state, _ = step(state, batch, jax.random.PRNGKey(3))

    before = traverse_util.flatten_dict(vars_D["params"])
    after = traverse_util.flatten_dict(new_state.vars_D["params"])
    moved_frozen, moved_rest, n_frozen = 0.0, 0.0, 0
    for k in before:
        delta = float(jnp.abs(after[k] - before[k]).max())
        if any((k[i], k[i + 1]) in set(frozen) for i in range(len(k) - 1)):
            moved_frozen += delta
            n_frozen += 1
        else:
            moved_rest += delta
    assert n_frozen >= 4  # the four first-block layers' params were seen
    assert moved_frozen == 0.0
    assert moved_rest > 0.0
