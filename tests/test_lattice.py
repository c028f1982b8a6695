"""Factorized lattice decode + front-occlusion volume (models/volumetric/lattice.py).

Reuses test_ess's analytic ramp-plane scene: plane channels are (u, v, 1)
linear ramps, so bilinear sampling is exact and the decoder recovers world
position analytically — letting decode parity and occlusion integrals be
checked without trained weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panic3d_tpu.models.volumetric import lattice as vl
from panic3d_tpu.models.volumetric import renderer as vr
from panic3d_tpu.ops.grid_sample import grid_sample_2d_points

from test_ess import BW, CENTER, RADIUS, _decode_fn, _ramp_planes

RNG = np.random.RandomState(11)


@pytest.mark.fast
def test_resample_matrix_matches_grid_sample():
    """The 1-D resample matrix reproduces grid_sample's bilinear weights
    (align_corners=False, zeros padding) including out-of-range taps."""
    W = 13
    sig = RNG.randn(1, 3, 1, W).astype(np.float32)     # [N,C,H=1,W]
    coords = np.linspace(-1.3, 1.3, 41).astype(np.float32)
    m = vl.resample_matrix_1d(coords, W)               # [41, W]
    want = np.asarray(
        grid_sample_2d_points(
            jnp.asarray(sig),
            jnp.asarray(np.stack([coords, np.zeros_like(coords)], -1))[None],
        )
    )[0]                                               # [41, C]
    got = np.einsum("gw,cw->gc", m, sig[0, :, 0])
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.fast
def test_decode_lattice_exact_at_plane_res():
    """grid == plane resolution: cell centers coincide with texel centers,
    the resample matrices are one-hots, and the factorized decode feeds the
    decoder the EXACT plane values the gather path feeds it — outputs agree
    to fp32 ulp (residual is XLA fusing the decoder differently across
    layouts, not sampling error)."""
    H = 16
    planes = _ramp_planes(H)
    grid = (H, H, H)
    sigma_fac = np.asarray(
        vl.decode_lattice(planes, _decode_fn, BW, grid, use_triplane=True)
    )
    coords = np.asarray(vl.lattice_world_coords(grid, BW)).reshape(1, -1, 3)
    axes = vr.generate_plane_axes(use_triplane=True)
    _, sigma_pts = vr.run_model(
        axes, planes, _decode_fn, jnp.asarray(coords), BW
    )
    np.testing.assert_allclose(
        sigma_fac.reshape(-1), np.asarray(sigma_pts).reshape(-1),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.fast
def test_decode_lattice_matches_run_model_offres():
    """grid != plane resolution (both finer and coarser) agrees with the
    gather path to float tolerance; chunking is exercised too."""
    planes = _ramp_planes(16)
    for grid in ((8, 12, 24), (24, 24, 24)):
        sigma_fac = np.asarray(
            vl.decode_lattice(
                planes, _decode_fn, BW, grid, use_triplane=True,
                chunk_points=257,
            )
        )
        coords = np.asarray(vl.lattice_world_coords(grid, BW)).reshape(1, -1, 3)
        axes = vr.generate_plane_axes(use_triplane=True)
        _, sigma_pts = vr.run_model(
            axes, planes, _decode_fn, jnp.asarray(coords), BW
        )
        np.testing.assert_allclose(
            sigma_fac.reshape(-1), np.asarray(sigma_pts).reshape(-1),
            atol=2e-4, rtol=1e-5,
        )


@pytest.mark.fast
def test_decode_lattice_premean_matches_stack():
    """plane_reduce='mean' (the fused production fast path) vs 'stack' with
    a mean-linear decoder (OSGDecoder's structure): identical up to fp32
    reassociation of the 3-term mean."""
    planes = jnp.asarray(RNG.randn(1, 3, 5, 16, 16).astype(np.float32))
    W1 = jnp.asarray(RNG.randn(5, 7).astype(np.float32))

    def mean_decoder(feats):
        x = jnp.mean(feats.astype(jnp.float32), axis=1)   # [N,M,C]
        h = jax.nn.softplus(x @ W1)
        return h[..., 1:], h[..., :1]

    got = {}
    for pr in ("stack", "mean"):
        got[pr] = np.asarray(vl.decode_lattice(
            planes, mean_decoder, BW, (8, 12, 10), use_triplane=True,
            chunk_points=300, plane_reduce=pr,
        ))
    np.testing.assert_allclose(got["mean"], got["stack"],
                               rtol=1e-5, atol=1e-6)


def _occlusion_via_render(points, offset=0.01, S=96, ray_start=0.5,
                          ray_end=1.5, **filters):
    """The reference-shaped occlusion: a +z hierarchical re-render from each
    surface point (what _get_front_occlusion computes in image_weights)."""
    ro = np.asarray(points, np.float32).copy()
    ro[..., 2] -= (ray_start - offset)
    rd = np.zeros_like(ro)
    rd[..., 2] = 1.0
    out = vr.render(
        _ramp_planes(64), _decode_fn,
        jnp.asarray(ro)[None], jnp.asarray(rd)[None],
        dict(
            box_warp=BW, ray_start=ray_start, ray_end=ray_end,
            depth_resolution=S, depth_resolution_importance=S,
            white_back=False, use_triplane=True, render_dtype="float32",
            ray_chunk=None,
        ),
        **filters,
    )
    return np.asarray(out.weights)[0, :, 0]


@pytest.mark.fast
def test_front_occlusion_volume_matches_render_path():
    """The suffix-integral volume interpolated at surface points agrees with
    the per-point +z re-render on the analytic ball — both in value (where
    it matters, away from the 0/1 plateaus' knife edge) and as the 0.05
    paste mask."""
    planes = _ramp_planes(64)
    opts = dict(use_triplane=True)
    vol = vl.front_occlusion_volume(
        planes, _decode_fn, BW, opts, grid=(64, 64, 128)
    )

    # probe points: in front of the ball (occ~0), behind it (occ~1), and a
    # ring near its silhouette (the mask boundary)
    n = 24
    lin = np.linspace(-0.30, 0.30, n, dtype=np.float32)
    xx, yy = np.meshgrid(lin, lin, indexing="ij")
    pts = []
    for z in (0.30, CENTER[2], -0.30):
        pts.append(np.stack([xx, yy, np.full_like(xx, z)], -1).reshape(-1, 3))
    pts = np.concatenate(pts, axis=0)

    occ_grid = np.asarray(
        vl.sample_front_occlusion(vol, jnp.asarray(pts)[None], 0.01, 1.0)
    )[0, :, 0]
    occ_rend = _occlusion_via_render(pts)

    mask_g = occ_grid < 0.05
    mask_r = occ_rend < 0.05
    agree = float((mask_g == mask_r).mean())
    assert agree > 0.99, agree
    # value agreement away from the decision boundary
    far = np.abs(occ_rend - 0.05) > 0.02
    assert np.max(np.abs(occ_grid[far] - occ_rend[far])) < 0.05


@pytest.mark.fast
def test_front_occlusion_outside_box_and_filters():
    """x/y outside the box fall back to the zero-feature density (here
    culled to 0 by the valid-channel trick -> occ 0); density filters thread
    through (cull_clouds high enough wipes the ball -> occ ~0 everywhere)."""
    planes = _ramp_planes(64)
    opts = dict(use_triplane=True)
    vol = vl.front_occlusion_volume(
        planes, _decode_fn, BW, opts, grid=(32, 32, 64)
    )
    outside = np.array([[0.9, 0.0, 0.0], [0.0, -0.8, 0.1]], np.float32)
    occ = np.asarray(
        vl.sample_front_occlusion(vol, jnp.asarray(outside)[None], 0.01, 1.0)
    )
    np.testing.assert_allclose(occ, 0.0, atol=1e-6)

    vol_culled = vl.front_occlusion_volume(
        planes, _decode_fn, BW, opts, cull_clouds=1.0, grid=(32, 32, 64)
    )
    behind = np.array([[CENTER[0], CENTER[1], -0.3]], np.float32)
    occ_c = np.asarray(
        vl.sample_front_occlusion(
            vol_culled, jnp.asarray(behind)[None], 0.01, 1.0)
    )
    occ_u = np.asarray(
        vl.sample_front_occlusion(vol, jnp.asarray(behind)[None], 0.01, 1.0)
    )
    # ball occludes the point behind it (analytic optical depth ~1.7
    # through the softplus(8-1) core over the 0.24 diameter -> occ ~0.82)
    assert occ_u[0, 0, 0] > 0.7
    assert occ_c[0, 0, 0] < 1e-3         # unless culled away


@pytest.mark.slow
def test_generator_grid_occlusion_agrees_with_render_path():
    """Through the full G.f paste path: occ_impl='grid' produces the same
    paste mask as occ_impl='render' on a tiny generator (trained-free
    random init; agreement is on the 0.05-thresholded mask)."""
    from panic3d_tpu import configs
    from panic3d_tpu.models import TriPlaneGenerator

    g = configs.tiny()
    rng = np.random.RandomState(0)
    xin = {
        "elevations": jnp.zeros(1),
        "azimuths": 60 * jnp.ones(1),
        "cond": {
            "image_ortho_front": jnp.asarray(
                rng.rand(1, 3, 64, 64).astype(np.float32)),
            "resnet_chonk": jnp.asarray(
                rng.randn(1, 16, 8, 8).astype(np.float32)),
        },
        "seeds": [0],
        "triplane_crop": 0.1,
        "cull_clouds": 0.5,
    }
    base_paste = {
        "mode": "default", "thresh_weight": 0.95, "thresh_edges": 0.02,
        "thresh_occ": 0.05, "offset_occ": 0.01, "thresh_dxyz": 5e-6,
    }
    params = g.init(
        {"params": jax.random.PRNGKey(0)},
        dict(xin, paste_params=dict(base_paste)),
        noise_mode="const", method=TriPlaneGenerator.f,
    )
    outs = {}
    for impl in ("render", "grid"):
        out = g.apply(
            params, dict(xin, paste_params=dict(base_paste, occ_impl=impl)),
            noise_mode="const", method=TriPlaneGenerator.f,
        )
        outs[impl] = {
            "mask_occ": np.asarray(out["paste"]["mask_occ"]),
            "image": np.asarray(out["image"]),
        }
    agree = float(
        (outs["grid"]["mask_occ"] == outs["render"]["mask_occ"]).mean()
    )
    assert agree > 0.98, agree
    # pasted images differ only where the mask flips
    diff = np.abs(outs["grid"]["image"] - outs["render"]["image"]).max()
    assert np.isfinite(diff)
