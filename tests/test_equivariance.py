"""Equivariance metrics: operator parity vs the reference torch oracle +
end-to-end PSNRs on an analytically equivariant toy generator.

The oracle is the REAL `/root/reference/.../src/metrics/equivariance.py`
(imported via the parity-suite path setup; its upfirdn2d falls back to the
pure-torch ref impl off-GPU), so every data-dependent slicing subtlety the
jnp static-shape rewrite re-derives is checked numerically.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from panic3d_tpu.eval import equivariance as eqj

sys.path.insert(0, "tests")


@pytest.fixture(scope="module")
def eqt():
    from ref_torch import load_reference_triplane

    load_reference_triplane()  # installs reference sys.path + stubs
    import importlib

    return importlib.import_module("metrics.equivariance")


def _x(n=2, c=3, h=32, w=32, seed=0):
    return np.random.RandomState(seed).randn(n, c, h, w).astype(np.float32)


@pytest.mark.parametrize("tx,ty", [(0.1, -0.07), (0.0, 0.0), (0.45, 0.3),
                                   (-0.2, 0.499)])
def test_integer_translation_parity(eqt, tx, ty):
    x = _x()
    zt, mt = eqt.apply_integer_translation(torch.from_numpy(x), tx, ty)
    zj, mj = eqj.apply_integer_translation(jnp.asarray(x), tx, ty)
    np.testing.assert_array_equal(np.asarray(mj), mt.numpy())
    np.testing.assert_allclose(np.asarray(zj), zt.numpy(), atol=1e-6)


@pytest.mark.parametrize("tx,ty", [(0.063, -0.041), (0.3, 0.26), (-0.12, 0.0),
                                   (0.009, 0.009)])
def test_fractional_translation_parity(eqt, tx, ty):
    x = _x(seed=1)
    zt, mt = eqt.apply_fractional_translation(torch.from_numpy(x), tx, ty)
    zj, mj = eqj.apply_fractional_translation(jnp.asarray(x), tx, ty)
    np.testing.assert_array_equal(np.asarray(mj), mt.numpy())
    # compare under the mask: outside it the reference zeroes a larger
    # region than the roll-based rewrite, and the metric never reads there
    np.testing.assert_allclose(np.asarray(zj * mj), (zt * mt).numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("angle", [0.3, -1.1, 2.7])
def test_bandlimit_filter_parity(eqt, angle):
    mat = eqj.rotation_matrix(angle)
    ft = eqt.construct_affine_bandlimit_filter(
        torch.from_numpy(np.asarray(mat)), a=3, amax=6)
    fj = eqj.construct_affine_bandlimit_filter(mat, a=3, amax=6)
    np.testing.assert_allclose(np.asarray(fj), ft.numpy(), atol=1e-6)


@pytest.mark.parametrize("angle", [0.3, -1.1])
def test_fractional_rotation_parity(eqt, angle):
    x = _x(seed=2)
    zt, mt = eqt.apply_fractional_rotation(torch.from_numpy(x),
                                           torch.tensor(angle))
    zj, mj = eqj.apply_fractional_rotation(jnp.asarray(x), angle)
    np.testing.assert_allclose(np.asarray(mj), mt.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zj * mj), (zt * mt).numpy(),
                               atol=2e-4)


@pytest.mark.parametrize("angle", [0.3, -1.1])
def test_pseudo_rotation_parity(eqt, angle):
    x = _x(seed=3)
    zt, mt = eqt.apply_fractional_pseudo_rotation(torch.from_numpy(x),
                                                  torch.tensor(angle))
    zj, mj = eqj.apply_fractional_pseudo_rotation(jnp.asarray(x), angle)
    np.testing.assert_array_equal(np.asarray(mj), mt.numpy())
    np.testing.assert_allclose(np.asarray(zj), zt.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# end-to-end metric on an analytically equivariant generator

RES = 64


def _blob_synthesis(ws, transform):
    """A perfectly equivariant toy 'generator': renders smooth Gaussian
    blobs whose continuous coordinates ride the user transform, exactly the
    role of G.synthesis.input.transform."""
    # sample source coords M·p: with M[:2,2] = -t content moves by +t. Grid
    # spans ONE image width (t in fraction-of-image units, the SG3
    # input-transform convention the metric's operators assume).
    xs = -0.5 + (jnp.arange(RES, dtype=jnp.float32) + 0.5) / RES
    gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
    pts = jnp.stack([gx, gy, jnp.ones_like(gx)], -1) @ transform.T  # [H,W,3]

    def one(w):
        cx, cy, sg = w[0] * 0.2, w[1] * 0.2, 0.06 + 0.025 * jax.nn.sigmoid(w[2])
        d2 = (pts[..., 0] - cx) ** 2 + (pts[..., 1] - cy) ** 2
        img = jnp.exp(-d2 / (2 * sg**2))
        return jnp.stack([img, 0.5 * img, img * img], 0)

    return jax.vmap(one)(ws)


def _ws_iter(bs=4):
    key = jax.random.PRNGKey(5)
    while True:
        key, k = jax.random.split(key)
        yield jax.random.normal(k, (bs, 3))


def test_equivariance_metrics_e2e():
    """The registry entries compute all three PSNRs; the toy generator is
    equivariant by construction so every PSNR must be high, and int
    translation (exact for this generator) must beat fractional."""
    from panic3d_tpu.eval.gan_metrics import calc_metric

    vals = {}
    for name in ("eqt50k_int", "eqt50k_frac", "eqr50k"):
        r = calc_metric(name, synthesis_fn=_blob_synthesis,
                        ws_iter=_ws_iter(), num_samples=8,
                        img_resolution=RES, key=jax.random.PRNGKey(0))
        vals[name] = r["results"][name]
    assert vals["eqt50k_int"] > 55, vals
    assert vals["eqt50k_frac"] > 40, vals
    assert vals["eqr50k"] > 30, vals
