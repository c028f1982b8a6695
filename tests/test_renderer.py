"""Volumetric renderer numerics vs torch oracles (SURVEY.md §4 level b).

Oracles reproduce: MipRayMarcher2 (ray_marcher.py:25-57), sample_pdf
(renderer.py:348-387), sample_from_planes (renderer.py:68-93),
get_ray_limits_box (math_utils.py:46-98).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from panic3d_tpu.models.volumetric import renderer as vr


RNG = np.random.RandomState(7)


def torch_ray_march(colors, densities, depths, white_back):
    colors = torch.tensor(colors)
    densities = torch.tensor(densities)
    depths = torch.tensor(depths)
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    densities_mid = F.softplus(densities_mid - 1)
    density_delta = densities_mid * deltas
    alpha = 1 - torch.exp(-density_delta)
    alpha_shifted = torch.cat(
        [torch.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], -2
    )
    weights = alpha * torch.cumprod(alpha_shifted, -2)[:, :, :-1]
    composite_rgb = torch.sum(weights * colors_mid, -2)
    weight_total = weights.sum(2)
    composite_depth = torch.sum(weights * depths_mid, -2) / weight_total
    composite_depth = torch.nan_to_num(composite_depth, float("inf"))
    composite_depth = torch.clamp(
        composite_depth, torch.min(depths), torch.max(depths)
    )
    if white_back:
        composite_rgb = composite_rgb + 1 - weight_total
    composite_rgb = composite_rgb * 2 - 1
    return composite_rgb.numpy(), composite_depth.numpy(), weights.numpy()


@pytest.mark.parametrize("white_back", [True, False])
def test_ray_march_matches_reference(white_back):
    B, R, S, C = 2, 5, 12, 4
    colors = RNG.rand(B, R, S, C).astype(np.float32)
    densities = RNG.randn(B, R, S, 1).astype(np.float32) * 2
    depths = np.sort(RNG.rand(B, R, S, 1).astype(np.float32), axis=2) + 0.5
    got_rgb, got_d, got_w = vr.ray_march(
        jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths), white_back
    )
    want_rgb, want_d, want_w = torch_ray_march(colors, densities, depths, white_back)
    np.testing.assert_allclose(np.asarray(got_rgb), want_rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w, rtol=1e-4, atol=1e-5)


def torch_sample_pdf_det(bins, weights, N_importance, eps=1e-5):
    bins = torch.tensor(bins)
    weights = torch.tensor(weights)
    N_rays, N_samples_ = weights.shape
    weights = weights + eps
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
    u = torch.linspace(0, 1, N_importance)
    u = u.expand(N_rays, N_importance).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp_min(inds - 1, 0)
    above = torch.clamp_max(inds, N_samples_)
    inds_sampled = torch.stack([below, above], -1).view(N_rays, 2 * N_importance)
    cdf_g = torch.gather(cdf, 1, inds_sampled).view(N_rays, N_importance, 2)
    bins_g = torch.gather(bins, 1, inds_sampled).view(N_rays, N_importance, 2)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom[denom < eps] = 1
    return (
        bins_g[..., 0] + (u - cdf_g[..., 0]) / denom * (bins_g[..., 1] - bins_g[..., 0])
    ).numpy()


def test_sample_pdf_matches_reference_deterministic():
    R, S, K = 6, 10, 8
    bins = np.sort(RNG.rand(R, S).astype(np.float32), axis=1)
    weights = RNG.rand(R, S - 2).astype(np.float32)
    got = np.asarray(vr.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), K))
    want = torch_sample_pdf_det(bins, weights, K)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_onehot_bitexact():
    """One-hot select (default, VPU-fusable) vs take_along_axis: both pick
    exact array elements, so the outputs must be bit-identical — including
    the boundary indices (below clamped to 0, above clamped to S)."""
    R, S, K = 16, 12, 9
    bins = np.sort(RNG.rand(R, S).astype(np.float32), axis=1)
    weights = RNG.rand(R, S - 2).astype(np.float32)
    # force boundary brackets: one row of all-zero weight mass at each end
    weights[0, :] = 1e-12
    got_oh = np.asarray(vr.sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), K, gather_impl="onehot"))
    got_ta = np.asarray(vr.sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), K, gather_impl="take"))
    np.testing.assert_array_equal(got_oh, got_ta)

    # random-u path too
    key = jax.random.PRNGKey(3)
    got_oh = np.asarray(vr.sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), K, key=key,
        gather_impl="onehot"))
    got_ta = np.asarray(vr.sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), K, key=key,
        gather_impl="take"))
    np.testing.assert_array_equal(got_oh, got_ta)


def test_sample_importance_shapes_and_order():
    B, R, S = 1, 4, 12
    z = np.sort(RNG.rand(B, R, S, 1).astype(np.float32), axis=2)
    w = RNG.rand(B, R, S - 1, 1).astype(np.float32)
    out = vr.sample_importance(jnp.asarray(z), jnp.asarray(w), 6)
    assert out.shape == (B, R, 6, 1)
    o = np.asarray(out)
    assert (o >= z.min() - 1e-5).all() and (o <= z.max() + 1e-5).all()


def test_sample_from_planes_matches_torch_grid_sample():
    """Full triplane lookup vs the reference composition in torch."""
    N, C, H = 2, 6, 16
    M = 25
    box_warp = 0.7
    use_triplane = True
    planes = RNG.randn(N, 3, C, H, H).astype(np.float32)
    coords = (RNG.rand(N, M, 3).astype(np.float32) - 0.5) * box_warp

    got = np.asarray(
        vr.sample_from_planes(
            vr.generate_plane_axes(use_triplane), jnp.asarray(planes),
            jnp.asarray(coords), box_warp,
        )
    )

    # torch oracle (renderer.py:52-93)
    plane_axes = torch.tensor(vr.generate_plane_axes(use_triplane))
    tp = torch.tensor(planes).view(N * 3, C, H, H)
    tc = torch.tensor(coords) * (2 / box_warp)
    n_planes = 3
    tcc = tc.unsqueeze(1).expand(-1, n_planes, -1, -1).reshape(N * n_planes, M, 3)
    inv_planes = torch.linalg.inv(plane_axes).unsqueeze(0).expand(N, -1, -1, -1).reshape(N * n_planes, 3, 3)
    projections = torch.bmm(tcc, inv_planes)[..., :2].unsqueeze(1)
    out = F.grid_sample(tp, projections.float(), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    want = out.permute(0, 3, 2, 1).reshape(N, n_planes, M, C).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ray_limits_box_matches_reference():
    rng = np.random.RandomState(3)
    o = rng.randn(40, 3).astype(np.float32) * 2
    d = rng.randn(40, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmin, tmax, valid = vr.get_ray_limits_box(jnp.asarray(o), jnp.asarray(d), 0.7)
    tmin, tmax = np.asarray(tmin)[:, 0], np.asarray(tmax)[:, 0]
    # brute-force oracle: slab method in numpy float64
    half = 0.35
    t_lo = (-half - o) / d
    t_hi = (half - o) / d
    lo = np.minimum(t_lo, t_hi).max(axis=1)
    hi = np.maximum(t_lo, t_hi).min(axis=1)
    ok = lo <= hi
    np.testing.assert_allclose(tmin[ok], lo[ok], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(tmax[ok], hi[ok], rtol=1e-3, atol=1e-4)
    assert (tmin[~ok] == -1).all() and (tmax[~ok] == -2).all()


def test_full_render_smoke_deterministic():
    """End-to-end render with a fixed decoder: shapes, finiteness, determinism."""
    N, R = 1, 16
    planes = jnp.asarray(RNG.randn(N, 3, 8, 16, 16).astype(np.float32)) * 0.1

    def decode_fn(feats):  # [N, 3, M, C] -> mean planes, linear decode
        x = jnp.mean(feats, axis=1)
        rgb = jax.nn.sigmoid(x[..., 1:])
        sigma = x[..., :1] * 5
        return rgb, sigma

    o = jnp.concatenate(
        [jnp.zeros((N, R, 2)), jnp.ones((N, R, 1))], axis=-1
    )
    d = jnp.concatenate(
        [jnp.zeros((N, R, 2)), -jnp.ones((N, R, 1))], axis=-1
    )
    options = dict(
        box_warp=0.7, ray_start=0.5, ray_end=1.5, depth_resolution=12,
        depth_resolution_importance=12, white_back=True, use_triplane=True,
        disparity_space_sampling=False,
    )
    out1 = vr.render(planes, decode_fn, o, d, options)
    out2 = vr.render(planes, decode_fn, o, d, options)
    assert out1.rgb.shape == (N, R, 7)
    assert out1.depth.shape == (N, R, 1)
    assert out1.weights.shape == (N, R, 1)
    assert out1.xyz.shape == (N, R, 3)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()
    # ray_start='auto' mode also works
    options2 = dict(options, ray_start="auto", ray_end="auto")
    out3 = vr.render(planes, decode_fn, o, d, options2)
    assert np.isfinite(np.asarray(out3.rgb)).all()


def test_render_packed_gather_matches_unpacked():
    """The corner-packed single-row-gather path (default) reproduces the
    4-corner-gather render to fp32 tolerance (same arithmetic, reordered
    weighted sum)."""
    N, R = 2, 16
    planes = jnp.asarray(RNG.randn(N, 3, 8, 16, 16).astype(np.float32)) * 0.1

    def decode_fn(feats):
        x = jnp.mean(feats, axis=1)
        return jax.nn.sigmoid(x[..., 1:]), x[..., :1] * 5

    o = jnp.concatenate([jnp.zeros((N, R, 2)), jnp.ones((N, R, 1))], axis=-1)
    d = jnp.concatenate([jnp.zeros((N, R, 2)), -jnp.ones((N, R, 1))], axis=-1)
    options = dict(
        box_warp=0.7, ray_start=0.5, ray_end=1.5, depth_resolution=12,
        depth_resolution_importance=12, white_back=True, use_triplane=True,
        disparity_space_sampling=False, render_dtype="float32",
    )
    got = vr.render(planes, decode_fn, o, d, options)
    want = vr.render(planes, decode_fn, o, d, dict(options, packed_gather=False))
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("flat_take", [True, False])
def test_merge_composite_matches_unify_plus_ray_march(flat_take):
    """merge_composite is ray_march(unify_samples(...)) reassociated: the
    scatter-back-coefficients form must reproduce the sorted-gather form."""
    B, R, S1, S2, C = 2, 8, 6, 5, 7
    d1 = jnp.asarray(np.sort(RNG.rand(B, R, S1, 1), axis=2).astype(np.float32))
    d2 = jnp.asarray(np.sort(RNG.rand(B, R, S2, 1), axis=2).astype(np.float32))
    c1 = jnp.asarray(RNG.rand(B, R, S1, C).astype(np.float32))
    c2 = jnp.asarray(RNG.rand(B, R, S2, C).astype(np.float32))
    s1 = jnp.asarray(RNG.randn(B, R, S1, 1).astype(np.float32) * 3)
    s2 = jnp.asarray(RNG.randn(B, R, S2, 1).astype(np.float32) * 3)
    x1 = jnp.asarray(RNG.randn(B, R, S1, 3).astype(np.float32))
    x2 = jnp.asarray(RNG.randn(B, R, S2, 3).astype(np.float32))

    for white_back in (False, True):
        ad, ac, asig, ax = vr.unify_samples(d1, c1, s1, x1, d2, c2, s2, x2)
        want_rgb, want_depth, want_w = vr.ray_march(
            jnp.concatenate([ac, ax], axis=-1), asig, ad, white_back=white_back
        )
        got_rgb, got_depth, got_wsum = vr.merge_composite(
            d1, c1, s1, x1, d2, c2, s2, x2,
            white_back=white_back, flat_take=flat_take,
        )
        np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_wsum), np.asarray(jnp.sum(want_w, axis=2)),
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.fast
def test_merge_composite_gathers_only_bit_identical():
    """gathers_only (cross-count merge, sorted pack via two half-gathers,
    coefficient pullback via rank gather — no argsort, no scatter) is a
    pure re-derivation of the same permutation: output must be BIT-equal
    to the argsort path, including duplicate-depth tie handling."""
    B, R, S1, S2, C = 2, 8, 6, 5, 7
    d1n = np.sort(RNG.rand(B, R, S1, 1), axis=2).astype(np.float32)
    d2n = np.sort(RNG.rand(B, R, S2, 1), axis=2).astype(np.float32)
    # inject exact ties: across halves and within a half
    d2n[:, :, 2] = d1n[:, :, 3]
    d1n[:, :, 1] = d1n[:, :, 2]
    d1 = jnp.asarray(np.sort(d1n, axis=2))
    d2 = jnp.asarray(np.sort(d2n, axis=2))
    c1 = jnp.asarray(RNG.rand(B, R, S1, C).astype(np.float32))
    c2 = jnp.asarray(RNG.rand(B, R, S2, C).astype(np.float32))
    s1 = jnp.asarray(RNG.randn(B, R, S1, 1).astype(np.float32) * 3)
    s2 = jnp.asarray(RNG.randn(B, R, S2, 1).astype(np.float32) * 3)
    x1 = jnp.asarray(RNG.randn(B, R, S1, 3).astype(np.float32))
    x2 = jnp.asarray(RNG.randn(B, R, S2, 3).astype(np.float32))

    for white_back in (False, True):
        want = vr.merge_composite(
            d1, c1, s1, x1, d2, c2, s2, x2, white_back=white_back,
        )
        got = vr.merge_composite(
            d1, c1, s1, x1, d2, c2, s2, x2, white_back=white_back,
            gathers_only=True,
        )
        for a, b in zip(got, want):
            assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.fast
def test_packed_corners_fused_decode_matches_mean_path():
    """run_model(packed_corners=True) — lerp + plane mean + net0 as ONE
    tiled MXU dot (sample_from_planes_packed_scaled) — must agree with the
    standard packed bf16 path up to bf16 reassociation, and sit no farther
    from the exact fp32 path than that path's own bf16 noise."""
    from panic3d_tpu.models.triplane import OSGDecoder

    N, C, H, W, M = 2, 32, 33, 33, 517
    axes = vr.generate_plane_axes(False)
    planes = RNG.randn(N, 3, C, H, W).astype(np.float32)
    # spread coords past the box so out-of-bounds masking is exercised
    coords = jnp.asarray(((RNG.rand(N, M, 3) - 0.5) * 0.9).astype(np.float32))
    bw = 0.7

    dec = OSGDecoder(n_features=C)
    feats0 = vr.sample_from_planes(axes, jnp.asarray(planes), coords, bw)
    params = dec.init(jax.random.PRNGKey(3), feats0)
    decode_fn = lambda feats, **kw: dec.apply(params, feats, **kw)

    rgb_f32, sig_f32 = vr.run_model(
        axes, jnp.asarray(planes), decode_fn, coords, bw
    )
    packed = vr.pack_planes(jnp.asarray(planes).astype(jnp.bfloat16))
    rgb_mean, sig_mean = vr.run_model(axes, packed, decode_fn, coords, bw)
    rgb_fuse, sig_fuse = vr.run_model(
        axes, packed, decode_fn, coords, bw, packed_corners=True
    )

    assert rgb_fuse.shape == rgb_mean.shape and sig_fuse.shape == sig_mean.shape
    # both bf16 paths should sit at comparable distance from the f32 truth
    def dist(a, b):
        return float(jnp.abs(jnp.asarray(a, jnp.float32) - b).max())

    d_mean = dist(rgb_mean, rgb_f32) + dist(sig_mean, sig_f32)
    d_fuse = dist(rgb_fuse, rgb_f32) + dist(sig_fuse, sig_f32)
    assert d_fuse <= 2.0 * d_mean + 1e-2, (d_fuse, d_mean)
    # and directly close to each other (bf16-level reassociation only)
    np.testing.assert_allclose(
        np.asarray(rgb_fuse, np.float32), np.asarray(rgb_mean, np.float32),
        atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(sig_fuse, np.float32), np.asarray(sig_mean, np.float32),
        atol=0.2,
    )


@pytest.mark.fast
def test_packed_corners_z_aligned_matches_generic():
    """The z-aligned fused path (plane-0 rows broadcast per ray, per-plane
    scaled blocks concatenated) equals generic packed_corners run_model on
    z-aligned coordinates."""
    from panic3d_tpu.models.triplane import OSGDecoder

    N, C, H, W = 2, 32, 17, 17
    R, S = 37, 5
    axes = vr.generate_plane_axes(False)
    planes = RNG.randn(N, 3, C, H, W).astype(np.float32)
    bw = 0.7
    xy = (RNG.rand(N, R, 2) - 0.5) * 0.8
    z = np.sort((RNG.rand(N, R, S) - 0.5) * 0.8, axis=-1)
    coords = np.concatenate(
        [np.repeat(xy[:, :, None, :], S, axis=2), z[..., None]], axis=-1
    ).reshape(N, R * S, 3).astype(np.float32)
    coords = jnp.asarray(coords)

    dec = OSGDecoder(n_features=C)
    feats0 = vr.sample_from_planes(axes, jnp.asarray(planes), coords, bw)
    params = dec.init(jax.random.PRNGKey(5), feats0)
    decode_fn = lambda feats, **kw: dec.apply(params, feats, **kw)

    packed = vr.pack_planes(jnp.asarray(planes).astype(jnp.bfloat16))
    rgb_g, sig_g = vr.run_model(
        axes, packed, decode_fn, coords, bw, packed_corners=True
    )
    rgb_z, sig_z = vr.run_model_z_aligned(
        axes, packed, decode_fn, coords, R, S, bw, packed_corners=True
    )
    np.testing.assert_allclose(
        np.asarray(rgb_z, np.float32), np.asarray(rgb_g, np.float32),
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(sig_z, np.float32), np.asarray(sig_g, np.float32),
        atol=1e-1,
    )
