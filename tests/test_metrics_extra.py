"""Round-2 parity fills: pr/is/ppl metric math, Deepfp32 SR variant, the
reference-format rmline patch-pickle loader.

Reference roles: precision_recall.py (kNN manifold P/R),
inception_score.py (IS splits), perceptual_path_length.py (percentile
-filtered mean), superresolution.py:126-154 (Deepfp32),
_train/img2img/datasets/rmlineE.py:43-131 (patch pickles).
"""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast


def test_knn_precision_recall_identical_and_disjoint():
    from panic3d_tpu.eval.gan_metrics import knn_precision_recall

    rng = np.random.RandomState(0)
    a = rng.randn(256, 8)
    # identical distributions: both near 1
    p, r = knn_precision_recall(a, a + rng.randn(256, 8) * 1e-3)
    assert p > 0.95 and r > 0.95
    # far-disjoint clusters: both 0
    p, r = knn_precision_recall(a, a + 1000.0)
    assert p == 0.0 and r == 0.0


def test_pr_metric_registered():
    from panic3d_tpu.eval.gan_metrics import calc_metric

    rng = np.random.RandomState(1)
    res = calc_metric("pr50k3_full", gen_features=rng.randn(128, 4),
                      real_features=rng.randn(128, 4))
    assert 0 <= res["results"]["pr50k3_full_precision"] <= 1
    assert 0 <= res["results"]["pr50k3_full_recall"] <= 1


def test_inception_score_bounds():
    from panic3d_tpu.eval.gan_metrics import is50k

    n_cls = 10
    # uniform probs -> IS == 1
    uni = np.full((200, n_cls), 1.0 / n_cls)
    r = is50k(gen_probs=uni)
    assert abs(r["is50k_mean"] - 1.0) < 1e-6
    # diverse one-hot (uniform marginal) -> IS == n_cls
    eye = np.eye(n_cls)[np.arange(200) % n_cls] * (1 - 1e-9) + 1e-10
    r = is50k(gen_probs=eye)
    assert abs(r["is50k_mean"] - n_cls) < 0.1


def test_ppl_percentile_filter():
    from panic3d_tpu.eval.gan_metrics import ppl_from_distances

    # sub-1% tails fall outside [P1, P99] -> dropped
    d = np.concatenate([np.ones(990), np.full(5, 1e9), np.zeros(5)])
    assert abs(ppl_from_distances(d) - 1.0) < 1e-6
    # clean data unaffected
    assert abs(ppl_from_distances(np.ones(100)) - 1.0) < 1e-6


def test_compute_ppl_tiny():
    from panic3d_tpu import configs
    from panic3d_tpu.data.dataset import synthetic_batch
    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.training.metric_eval import compute_ppl

    g = configs.tiny()
    b = synthetic_batch(bs=2, size=64, chonk_ch=16, feat_dim=32)
    xin = {"z": jnp.zeros((2, g.z_dim)),
           "camera_params": jnp.asarray(b["camera"]),
           "cond": jax.tree_util.tree_map(jnp.asarray, b["cond"])}
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                       xin, method=TriPlaneGenerator.f)

    def lpips_fn(a, bb):
        return jnp.mean((a - bb) ** 2, axis=(1, 2, 3))

    def factory():
        while True:
            yield b

    d = compute_ppl(g, variables, factory, lpips_fn, num_samples=4,
                    batch_size=2)
    assert d.shape == (4,)
    assert np.isfinite(d).all()


def test_superresolution_deepfp32_shape():
    from panic3d_tpu.models.superresolution import SuperresolutionHybridDeepfp32

    sr = SuperresolutionHybridDeepfp32(channels=16, img_resolution=256,
                                       w_dim=32)
    rgb = jnp.zeros((1, 3, 64, 64))
    x = jnp.zeros((1, 16, 64, 64))
    ws = jnp.zeros((1, 5, 32))
    vars_ = sr.init({"params": jax.random.PRNGKey(0)}, rgb, x, ws,
                    noise_mode="const")
    out = sr.apply(vars_, rgb, x, ws, noise_mode="const")
    assert out.shape == (1, 3, 256, 256)


def _fake_patch_pickle(path, n=6, size=21, seed=0):
    rng = np.random.RandomState(seed)
    data = {
        "bns": [(f"fn{i}", (0, 0)) for i in range(n)],
        "images": [rng.rand(3, size, size).astype(np.float32) for _ in range(n)],
        "line_masks": [
            (rng.rand(1, size, size) > 0.8).astype(np.float32) for _ in range(n)
        ],
        "face_hulls": [
            (rng.rand(1, size, size) > 0.9).astype(np.float32) for _ in range(n)
        ],
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


def test_rmline_patch_loader(tmp_path):
    from panic3d_tpu.data.rmline_dataset import RMLinePatchDataset

    dn = tmp_path / "_data" / "lustrous" / "preprocessed" / "patches"
    os.makedirs(dn)
    _fake_patch_pickle(str(dn / "rmlineERA_train.pkl"), n=6)
    _fake_patch_pickle(str(dn / "rmlineEIA_test.pkl"), n=4, seed=1)

    tr = RMLinePatchDataset(str(tmp_path), split="train")
    assert len(tr) == 6
    s = tr[0]
    # train pairs illustration (label 0) + render (label 1)
    assert s["image"].shape == (2, 3, 21, 21)
    np.testing.assert_array_equal(s["real_label"], [0.0, 1.0])

    va = RMLinePatchDataset(str(tmp_path), split="val")
    assert len(va) == 4
    s = va[0]
    assert s["image"].shape == (1, 3, 21, 21)
    np.testing.assert_array_equal(s["real_label"], [0.0])

    # dilation augmentation only grows the mask
    s_det = tr.__getitem__(1, det=True)
    tr.rng = np.random.RandomState(123)
    grew = False
    for _ in range(8):
        s_aug = tr.__getitem__(1, det=False)
        assert (s_aug["line_mask"] >= 0).all()
        if s_aug["line_mask"].sum() > s_det["line_mask"].sum():
            grew = True
    assert grew

    batch = next(tr.batches(2))
    assert batch["image"].shape == (4, 3, 21, 21)  # 2 samples x (illust+render)
