"""TriPlaneGenerator end-to-end module tests (tiny config, SURVEY.md §4 c/d).

Covers: G.f kwargs protocol, cond_mode injections, ortho cameras,
crop/cull filters, paste_front, sample_mixed, determinism.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu.models import TriPlaneGenerator


TINY = dict(
    z_dim=64,
    c_dim=25,
    w_dim=64,
    img_resolution=128,
    img_channels=3,
    backbone_resolution=64,
    triplane_width=8,
    sr_channels_hidden=32,
    cond_mode="ortho_front.add_shuffle2_4.reschonk_add_16.resnetcond_32",
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
        c_gen_conditioning_zero=True,
    ),
    neural_rendering_resolution=16,
)


def tiny_cond(bs=1, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "image_ortho_front": jnp.asarray(rng.rand(bs, 3, 64, 64).astype(np.float32)),
        "resnet_chonk": jnp.asarray(rng.randn(bs, 16, 8, 8).astype(np.float32)),
        "resnet_feats": jnp.asarray(rng.randn(bs, 32).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def tiny_g():
    g = TriPlaneGenerator(**TINY)
    xin = {
        "elevations": jnp.zeros(1),
        "azimuths": jnp.zeros(1),
        "cond": tiny_cond(),
        "seeds": [0],
    }
    params = g.init(
        {"params": jax.random.PRNGKey(0)},
        xin,
        noise_mode="const",
        method=TriPlaneGenerator.f,
    )
    return g, params


def test_f_protocol_shapes(tiny_g):
    g, params = tiny_g
    xin = {
        "elevations": jnp.zeros(1),
        "azimuths": 30 * jnp.ones(1),
        "cond": tiny_cond(),
        "seeds": [0],
    }
    out = g.apply(params, xin, noise_mode="const", method=TriPlaneGenerator.f)
    assert out["image"].shape == (1, 3, 128, 128)
    assert out["image_raw"].shape == (1, 3, 16, 16)
    assert out["image_depth"].shape == (1, 1, 16, 16)
    assert out["image_weights"].shape == (1, 1, 16, 16)
    assert out["image_xyz"].shape == (1, 3, 16, 16)
    assert out["triplane"].shape == (1, 3, 8, 64, 64)
    for k in ("image", "image_raw", "image_depth", "image_weights", "image_xyz"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_f_deterministic_and_jittable(tiny_g):
    g, params = tiny_g
    xin = {
        "elevations": jnp.zeros(1),
        "azimuths": jnp.zeros(1),
        "cond": tiny_cond(),
        "z": jnp.asarray(np.random.RandomState(1).randn(1, 64).astype(np.float32)),
    }

    @jax.jit
    def render(params, xin):
        return g.apply(params, xin, noise_mode="const", method=TriPlaneGenerator.f)

    o1 = render(params, xin)
    o2 = render(params, xin)
    np.testing.assert_array_equal(np.asarray(o1["image"]), np.asarray(o2["image"]))


def test_f_ortho_camera_and_filters(tiny_g):
    g, params = tiny_g
    xin = {
        "elevations": jnp.zeros(1),
        "azimuths": jnp.zeros(1),
        "fovs": -jnp.ones(1),  # orthographic
        "cond": tiny_cond(),
        "seeds": [0],
        "triplane_crop": 0.1,
        "cull_clouds": 0.5,
    }
    out = g.apply(params, xin, noise_mode="const", method=TriPlaneGenerator.f)
    assert np.isfinite(np.asarray(out["image"])).all()
    # ortho rays are parallel: all directions equal
    fr = xin.get("force_rays")


def test_f_paste_front(tiny_g):
    g, params = tiny_g
    xin = {
        "elevations": jnp.zeros(1),
        "azimuths": 90 * jnp.ones(1),
        "cond": tiny_cond(),
        "seeds": [0],
        "paste_params": {
            "mode": "default",
            "thresh_weight": 0.95,
            "thresh_edges": 0.02,
            "thresh_occ": 0.05,
            "offset_occ": 0.01,
            "thresh_dxyz": 0.000005,
        },
    }
    out = g.apply(params, xin, noise_mode="const", method=TriPlaneGenerator.f)
    assert "paste" in out and "image_prepaste" in out
    assert out["image"].shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(out["image"])).all()
    assert np.isfinite(np.asarray(out["paste"]["mask"])).all()


def test_sample_mixed(tiny_g):
    g, params = tiny_g
    bs, M = 1, 37
    ws = jnp.asarray(np.random.RandomState(2).randn(bs, 10, 64).astype(np.float32))
    coords = jnp.asarray(
        (np.random.RandomState(3).rand(bs, M, 3).astype(np.float32) - 0.5) * 0.7
    )
    out = g.apply(
        params, coords, coords, ws, tiny_cond(),
        noise_mode="const", method=TriPlaneGenerator.sample_mixed,
    )
    assert out["sigma"].shape == (bs, M, 1)
    assert out["rgb"].shape == (bs, M, 32)
    assert np.isfinite(np.asarray(out["sigma"])).all()


def test_mapping_zplus_diagonal(tiny_g):
    """z+ mapping: slot i of output must equal slot i of mapping(z_i)."""
    g, params = tiny_g
    bs = 1
    rng = np.random.RandomState(4)
    num_ws = 10
    zs = jnp.asarray(rng.randn(bs, num_ws, 64).astype(np.float32))
    c = jnp.zeros((bs, 25))
    cond = tiny_cond()
    ws = g.apply(params, zs, c, cond, method=TriPlaneGenerator.mapping_zplus)
    assert ws.shape == (bs, num_ws, 64)
    for i in [0, 3, 9]:
        wi = g.apply(params, zs[:, i], c, cond, method=TriPlaneGenerator.mapping)
        np.testing.assert_allclose(
            np.asarray(ws[:, i]), np.asarray(wi[:, i]), rtol=1e-5, atol=1e-6
        )
