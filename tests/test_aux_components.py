"""Tests: export (ply/mrc), ADA augment, misc, GAN metrics, rmline pipeline,
resnet extractor, lpips/clip shapes, video quickspin."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_ply_roundtrip(tmp_path):
    from panic3d_tpu.eval.export import load_ply, save_ply

    rng = np.random.RandomState(0)
    v = rng.randn(10, 3).astype(np.float32)
    f = rng.randint(0, 10, (6, 3)).astype(np.int32)
    c = rng.rand(10, 3).astype(np.float32)
    p = str(tmp_path / "m.ply")
    save_ply(p, v, f, c)
    v2, f2, c2 = load_ply(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(f2, f)
    np.testing.assert_allclose(c2, c, atol=1 / 255 + 1e-6)


def test_mrc_writes(tmp_path):
    from panic3d_tpu.eval.export import save_mrc

    vol = np.random.RandomState(0).rand(8, 8, 8).astype(np.float32)
    p = save_mrc(str(tmp_path / "v.mrc"), vol)
    import os

    assert os.path.getsize(p) == 1024 + vol.nbytes


def test_augment_pipe_zero_p_identity():
    from panic3d_tpu.training.augment import augment_pipe

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32))
    out = augment_pipe(x, jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_augment_pipe_full_p_changes_and_finite():
    from panic3d_tpu.training.augment import augment_pipe, AugmentConfig

    x = jnp.asarray(np.random.RandomState(0).randn(4, 3, 16, 16).astype(np.float32))
    cfg = AugmentConfig(
        xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
        brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
        noise=1, cutout=1,
    )
    out = augment_pipe(x, jax.random.PRNGKey(1), p=1.0, cfg=cfg)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_assert_shape_and_summary():
    from panic3d_tpu.utils.misc import assert_shape, count_params, print_module_summary

    assert_shape(jnp.zeros((2, 3, 4)), (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(jnp.zeros((2, 3)), (2, 4))
    tree = {"params": {"a": {"w": jnp.zeros((3, 4))}, "b": {"w": jnp.zeros(5)}}}
    assert count_params(tree) == 17
    assert print_module_summary(None, tree) == 17


def test_fid_kid_math():
    from panic3d_tpu.eval.gan_metrics import (
        FeatureStats, calc_metric, frechet_distance, is_valid_metric, kid_mmd,
    )

    rng = np.random.RandomState(0)
    a = rng.randn(500, 16)
    b = rng.randn(500, 16) + 0.0
    # identical distributions -> small FID; shifted -> larger
    sa, sb = FeatureStats(), FeatureStats()
    sa.append(a)
    sb.append(b)
    fid_same = frechet_distance(*sa.get_mean_cov(), *sb.get_mean_cov())
    sc = FeatureStats()
    sc.append(b + 3.0)
    fid_shift = frechet_distance(*sa.get_mean_cov(), *sc.get_mean_cov())
    assert fid_shift > fid_same
    assert fid_shift > 100
    k_same = kid_mmd(a, b, num_subsets=5, max_subset_size=200)
    k_shift = kid_mmd(a, b + 3.0, num_subsets=5, max_subset_size=200)
    assert k_shift > k_same
    assert is_valid_metric("fid50k_full")
    r = calc_metric("fid50k_full", gen_features=b, real_features=a)
    assert np.isfinite(r["results"]["fid50k_full"])


def test_rmline_generator_shapes():
    from panic3d_tpu.models.rmlinegan import (
        RMLineGenerator, facehull, generator_forward, lerp_output,
    )

    gen = RMLineGenerator()
    img = jnp.asarray(np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
    mask = (jnp.asarray(np.random.RandomState(1).rand(1, 1, 64, 64)) > 0.8).astype(
        jnp.float32
    )
    hull = jnp.zeros((1, 1, 64, 64))
    stackin = jnp.concatenate([img * (1 - mask), hull], axis=1)
    d = gen.depth
    stackin_p = jnp.pad(stackin, ((0, 0), (0, 0), (d, d), (d, d)), mode="edge")
    variables = gen.init(jax.random.PRNGKey(0), stackin_p)
    out = generator_forward(gen, variables, img, mask, hull)
    assert out.shape == (1, 3, 64, 64)
    final = lerp_output(img, out, mask)
    assert np.isfinite(np.asarray(final)).all()

    kpts = np.random.RandomState(2).rand(28, 2) * 60
    fh = facehull((64, 64), kpts)
    assert fh.shape == (1, 1, 64, 64)
    assert fh.max() == 1.0


def test_rmline_wrapper_end_to_end():
    from panic3d_tpu.models.rmlinegan import RMLineGenerator, RMLineWrapper

    gen = RMLineGenerator()
    img = jnp.asarray(np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32))
    d = gen.depth
    stackin = jnp.zeros((1, 4, 64 + 2 * d, 64 + 2 * d))
    variables = gen.init(jax.random.PRNGKey(0), stackin)
    kpts = np.random.RandomState(2).rand(28, 2) * 60
    out, mask, hull = RMLineWrapper(gen, variables)(img, kpts)
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_extractor_shapes():
    from panic3d_tpu.models.resnet import ResNet50, ResnetFeatureExtractorPCA

    resnet = ResNet50(num_classes=10)
    x = jnp.zeros((1, 3, 64, 64))
    variables = resnet.init(jax.random.PRNGKey(0), x)
    taps = resnet.apply(variables, x, return_taps=True)
    assert taps["layer4"].shape == (1, 2048, 2, 2)
    assert taps["fc"].shape == (1, 10)

    rng = np.random.RandomState(0)
    ext = ResnetFeatureExtractorPCA(
        resnet, variables, rng.randn(8, 2048).astype(np.float32),
        np.zeros(2048, np.float32), dim_out=8,
    )
    # extractor resizes to 256 internally -> layer4 is always 8x8
    chonk = ext(jnp.zeros((3, 64, 64)))
    assert chonk.shape == (2, 8, 8, 8)
    feats = ext.global_feats(jnp.zeros((3, 64, 64)))
    assert feats.shape == (2, 8)


def test_lpips_and_clip_shapes():
    from panic3d_tpu.eval.lpips import LPIPS
    from panic3d_tpu.eval.metrics2d import CLIPSimilarity, psnr

    a = jnp.zeros((2, 3, 64, 64))
    b = jnp.ones((2, 3, 64, 64)) * 0.5
    m = LPIPS()
    v = m.init(jax.random.PRNGKey(0), a, b)
    d = m.apply(v, a, b)
    assert d.shape == (2,)
    assert float(jnp.abs(m.apply(v, a, a)).max()) < 1e-6

    p = psnr(a, a + 0.1)
    np.testing.assert_allclose(float(p), 20.0, atol=0.1)

    clip = CLIPSimilarity()
    s = clip(a[:1], a[:1])
    np.testing.assert_allclose(float(s[0]), 1.0, atol=1e-3)


def test_tagger_loss_and_f2():
    from panic3d_tpu.training.aux_trainers import f_beta

    logits = jnp.asarray([[10.0, -10.0, 10.0]])
    labels = jnp.asarray([[1.0, 0.0, 1.0]])
    assert float(f_beta(logits, labels)) == 1.0


def test_filtered_warp_matches_torch_ada_rotation():
    """execute_geometric_filtered vs the reference AugmentPipe running the
    same deterministic rotation (debug_percentile makes the transform
    parameters deterministic; reference augment.py:242-246)."""
    import sys

    import torch

    from tests.ref_torch import SRC

    if SRC not in sys.path:
        sys.path.insert(0, SRC)
    import training.augment as ref_aug

    from panic3d_tpu.training.augment import (
        _rot2,
        execute_geometric_filtered,
    )

    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    q = 0.75
    theta = (q * 2 - 1) * np.pi * 0.25

    pipe = ref_aug.AugmentPipe(rotate=1.0, rotate_max=0.25)
    pipe.p.copy_(torch.as_tensor(1.0))
    with torch.no_grad():
        want = pipe(torch.tensor(x), debug_percentile=q).numpy()

    Ginv = _rot2(jnp.full((2,), theta, jnp.float32))
    got = np.asarray(execute_geometric_filtered(jnp.asarray(x), Ginv))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_save_animation_mp4_roundtrip(tmp_path):
    """mp4 writer (reference VideoWriterCV2, video_v1.py:183-217): frames
    round-trip through cv2.VideoCapture with the right count and size."""
    import cv2

    from panic3d_tpu.eval.video import save_animation

    rng = np.random.RandomState(0)
    frames = [rng.rand(3, 32, 48).astype(np.float32) for _ in range(5)]
    p = save_animation(frames, str(tmp_path / "spin.mp4"), fps=12)
    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (32, 48, 3)
        n += 1
    cap.release()
    assert n == 5


def test_imgfilter_matches_torch_ada():
    """apply_imgfilter + the filter bank vs the reference AugmentPipe's
    imgfilter path (augment.py:382-411) under deterministic
    debug_percentile parameters."""
    import sys

    import torch

    from tests.ref_torch import SRC

    if SRC not in sys.path:
        sys.path.insert(0, SRC)
    import training.augment as ref_aug

    from panic3d_tpu.training.augment import (
        HZ_FBANK,
        IMGFILTER_EXPECTED_POWER,
        apply_imgfilter,
    )

    pipe = ref_aug.AugmentPipe(imgfilter=1.0, imgfilter_std=1.0)
    np.testing.assert_allclose(
        HZ_FBANK, pipe.Hz_fbank.numpy(), rtol=0, atol=1e-7
    )

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    q = 0.75
    pipe.p.copy_(torch.as_tensor(1.0))
    with torch.no_grad():
        want = pipe(torch.tensor(x), debug_percentile=q).numpy()

    # the deterministic debug gains: every band amplified by the same
    # erfinv-percentile factor, power-normalized per band
    t_i = float(torch.exp2(torch.erfinv(torch.tensor(q * 2 - 1.0))))
    gains = np.ones((2, 4), np.float32)
    for i in range(4):
        t = np.ones((2, 4), np.float32)
        t[:, i] = t_i
        t = t / np.sqrt(
            (IMGFILTER_EXPECTED_POWER * t ** 2).sum(-1, keepdims=True)
        )
        gains = gains * t
    got = np.asarray(apply_imgfilter(jnp.asarray(x), jnp.asarray(gains)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rmline_train_loop_steps():
    """Dual-Adam patch-GAN training drives losses finite and moves params
    (rmlineganA.py:209-233 role, collapsed into one jitted step)."""
    from panic3d_tpu.training.aux_trainers import train_rmline

    rng = np.random.RandomState(0)

    def batches():
        while True:
            yield {
                "image": rng.rand(4, 3, 25, 25).astype(np.float32),
                "line_mask": (rng.rand(4, 1, 25, 25) > 0.8).astype(np.float32),
                "face_hull": (rng.rand(4, 1, 25, 25) > 0.9).astype(np.float32),
                "real_label": np.asarray([0, 1, 0, 1], np.float32),
            }

    vars_g, vars_d = train_rmline(batches(), steps=3, log_every=10)
    flat = jax.tree_util.tree_leaves(vars_g["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_tagger_train_step_improves_loss():
    from panic3d_tpu.models.resnet import ResNet50
    from panic3d_tpu.training.aux_trainers import make_tagger_train_step

    rng = np.random.RandomState(0)
    net = ResNet50(num_classes=8)
    imgs = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
    labels = jnp.asarray((rng.rand(2, 8) > 0.5).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), imgs)
    init, step = make_tagger_train_step(net, lr=1e-2)
    state = init(variables)
    losses = []
    for _ in range(4):
        state, stats = step(state, imgs, labels)
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_lerpspin_interpolates_and_renders(tmp_path):
    """lerpspin (gen_videos.py gen_interp_video role): cyclic cubic ws
    interpolation through seed keyframes + batched ws-input renders; frame 0
    sits ON the first keyframe, and lerp.gif writes next to spin.gif."""
    from test_training_round2 import tiny_models
    from panic3d_tpu.data.dataset import synthetic_batch
    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.eval.video import lerpspin, save_animation

    g, _ = tiny_models()
    batch = synthetic_batch(bs=1, size=128, chonk_ch=16, feat_dim=32)
    cond = jax.tree_util.tree_map(jnp.asarray, batch["cond"])
    xin0 = {"z": jnp.zeros((1, g.z_dim)), "elevations": jnp.zeros(1),
            "azimuths": jnp.zeros(1), "cond": cond}
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin0,
                       method=TriPlaneGenerator.f, noise_mode="const")

    zs = jax.random.normal(jax.random.PRNGKey(1), (3, g.z_dim))
    frames = lerpspin(g, variables, {"cond": cond}, zs, n=6, batch=6)
    assert len(frames) == 6
    assert all(f.shape == frames[0].shape and np.isfinite(f).all()
               for f in frames)
    # frame 0 = keyframe 0 at azimuth 0 == direct z-render of seed 0
    out0 = g.apply(variables,
                   dict(xin0, z=zs[:1]),
                   method=TriPlaneGenerator.f, noise_mode="const")
    np.testing.assert_allclose(frames[0],
                               np.clip(np.asarray(out0["image"][0]), 0, 1),
                               atol=1e-5)
    p = save_animation(frames, str(tmp_path / "lerp.gif"))
    import os
    assert os.path.getsize(p) > 0
