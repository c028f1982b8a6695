"""Empty-space skipping (ESS): correctness + quality-per-sample evidence.

The scene is analytic: ramp planes encode position (bilinear sampling of a
linear ramp is exact), so the decoder recovers world coordinates and places
a dense ball at a known off-center location inside the 0.7 box. This lets
the tests assert, without trained weights, the three claims the renderer's
ESS design rests on (models/volumetric/renderer.py ess_occupancy):

  1. the occupancy machinery is conservative (narrowed intervals never drop
     visible density): ESS at the SAME 96+96 budget matches the plain
     render tightly;
  2. ESS at HALF the budget (48+48) is at least as accurate as the plain
     96+96 reference quadrature (the speed claim's quality side);
  3. plain 48+48 is measurably worse — the win is the narrowing, not the
     scene being easy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panic3d_tpu.models.volumetric import renderer as vr

# renderer-level tests are fast-tier; the generator+paste smoke is
# compile-heavy and rides the slow tier
BW = 0.7
CENTER = np.array([0.10, 0.05, -0.08], np.float32)
RADIUS = 0.12


def _ramp_planes(H=64):
    """[1,3,3,H,H] planes whose channels are (u, v, 1) linear ramps."""
    # pixel centers at (i+0.5)/H*2-1 (align_corners=False convention)
    lin = ((np.arange(H, dtype=np.float32) + 0.5) / H) * 2 - 1
    u = np.broadcast_to(lin[None, :], (H, H))       # along W (points[...,0])
    v = np.broadcast_to(lin[:, None], (H, H))       # along H (points[...,1])
    one = np.ones((H, H), np.float32)
    plane = np.stack([u, v, one], axis=0)           # [3,H,H]
    return jnp.asarray(np.broadcast_to(plane[None, None], (1, 3, 3, H, H)))


def _decode_fn(feats):
    """feats [N,3,M,3] -> (rgb [N,M,3], sigma [N,M,1]) analytic ball."""
    feats = feats.astype(jnp.float32)
    # plane 0 projects to (x,y), plane 1 to (x,z) (use_triplane axes)
    xn = feats[:, 0, :, 0:1]
    yn = feats[:, 0, :, 1:2]
    zn = feats[:, 1, :, 1:2]
    valid = jnp.minimum(feats[:, 0, :, 2:3], feats[:, 1, :, 2:3])
    pos = jnp.concatenate([xn, yn, zn], axis=-1) * (BW / 2)
    d = jnp.linalg.norm(pos - CENTER, axis=-1, keepdims=True)
    sigma = 8.0 - 400.0 * jnp.maximum(d - RADIUS, 0.0)
    sigma = jnp.where(valid > 0.99, sigma, -100.0)
    rgb = 0.5 + 0.5 * pos / (BW / 2)
    return rgb, sigma


def _rays(n=16):
    """Front ortho rays looking -z through the ball region."""
    lin = np.linspace(-0.28, 0.28, n, dtype=np.float32)
    xx, yy = np.meshgrid(lin, lin, indexing="ij")
    origins = np.stack([xx, yy, np.ones_like(xx)], axis=-1).reshape(1, -1, 3)
    dirs = np.zeros_like(origins)
    dirs[..., 2] = -1.0
    return jnp.asarray(origins), jnp.asarray(dirs)


def _options(S, S_imp, ess=False):
    opts = dict(
        box_warp=BW, ray_start=0.5, ray_end=1.5,
        depth_resolution=S, depth_resolution_importance=S_imp,
        white_back=True, use_triplane=True, render_dtype="float32",
        ray_chunk=None,
    )
    if ess:
        opts["ess"] = dict(grid=32, taps=64, thresh=0.01, margin=1.0)
    return opts


def _render(S, S_imp, ess=False):
    planes = _ramp_planes()
    ro, rd = _rays()
    out = vr.render(planes, _decode_fn, ro, rd, _options(S, S_imp, ess=ess))
    return np.asarray(out.rgb), np.asarray(out.depth), np.asarray(out.weights)


@pytest.mark.fast
def test_position_recovery_sanity():
    """The ramp-plane scene is self-validating: sampled features invert to
    the query position (exactness of bilinear over a linear ramp)."""
    planes = _ramp_planes()
    axes = vr.generate_plane_axes(use_triplane=True)
    pts = jnp.asarray(
        np.array([[[0.1, -0.2, 0.05], [0.0, 0.0, 0.0], [-0.25, 0.3, -0.3]]],
                 np.float32)
    )
    feats = vr.sample_from_planes(axes, planes, pts, box_warp=BW)
    rgb, sigma = _decode_fn(feats)
    pos = (rgb - 0.5) / 0.5 * (BW / 2)
    np.testing.assert_allclose(np.asarray(pos)[0], np.asarray(pts)[0],
                               atol=1e-5)


@pytest.mark.fast
def test_ess_intervals_bracket_the_ball():
    planes = _ramp_planes()
    ro, rd = _rays()
    opts = _options(48, 48, ess=True)
    axes = vr.generate_plane_axes(use_triplane=True)
    occ, occ_out = vr.ess_occupancy(
        axes, planes, _decode_fn, BW, opts, None, None, None, 1
    )
    assert float(occ_out) == 0.0  # zero features decode to an empty point
    t0, t1 = vr.ess_narrow_intervals(
        occ, occ_out, ro, rd, 0.5, 1.5, BW, opts
    )
    t0, t1 = np.asarray(t0)[0, :, 0], np.asarray(t1)[0, :, 0]
    ro_np = np.asarray(ro)[0]
    # rays that pierce the ball (with slack for dilation): interval covers
    # the analytic [t_in, t_out]
    off = ro_np[:, :2] - CENTER[None, :2]
    b2 = RADIUS ** 2 - (off ** 2).sum(-1)
    hit = b2 > 1e-6
    # p_z(t) = o_z - t crosses the ball's z-extent at t = 1 - c_z -/+ chord
    t_in = 1.0 - CENTER[2] - np.sqrt(np.maximum(b2, 0.0))
    t_out = 1.0 - CENTER[2] + np.sqrt(np.maximum(b2, 0.0))
    assert hit.sum() > 20
    assert np.all(t0[hit] <= t_in[hit] + 1e-4)
    assert np.all(t1[hit] >= t_out[hit] - 1e-4)
    # and the narrowing is real: hit rays get a fraction of the full 1.0
    # interval (miss rays keep it — they composite to background anyway)
    assert float((t1 - t0)[hit].mean()) < 0.55


@pytest.mark.fast
def test_ess_same_budget_matches_plain():
    rgb_p, dep_p, w_p = _render(96, 96, ess=False)
    rgb_e, dep_e, w_e = _render(96, 96, ess=True)
    # same budget, concentrated: quadrature positions differ, output must
    # agree to well under a grey level
    assert np.max(np.abs(rgb_e - rgb_p)) < 2e-3
    assert np.max(np.abs(w_e - w_p)) < 2e-3


@pytest.mark.fast
def test_z_aligned_fast_path_bit_equal():
    """run_model_z_aligned (one (x,y)-plane gather row per ray) is
    bit-identical to the generic path on exactly z-directed rays — the
    rays paste-front's occlusion render uses."""
    planes = _ramp_planes()
    ro, rd = _rays()
    base = _options(24, 24)
    out_generic = vr.render(planes, _decode_fn, ro, rd, dict(base))
    out_fast = vr.render(
        planes, _decode_fn, ro, rd, dict(base, rays_z_aligned=True)
    )
    for a, b in zip(out_generic, out_fast):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ess_through_generator_f_with_paste():
    """ESS threads through the full G.f path (incl. paste-front's
    plane-reused auxiliary renders) without shape or NaN fallout."""
    from panic3d_tpu.models import TriPlaneGenerator
    from panic3d_tpu import configs

    g = configs.tiny()
    rk = dict(g.rendering_kwargs)
    rk["ess"] = dict(grid=8, taps=16, thresh=0.01, margin=1.0)
    g = configs.tiny(rendering_kwargs=rk)
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
        "paste_params": {
            "mode": "default", "thresh_weight": 0.95, "thresh_edges": 0.02,
            "thresh_occ": 0.05, "offset_occ": 0.01, "thresh_dxyz": 5e-6,
        },
    }
    params = g.init({"params": jax.random.PRNGKey(0)}, xin,
                    noise_mode="const", method=TriPlaneGenerator.f)
    out = g.apply(params, xin, noise_mode="const", method=TriPlaneGenerator.f)
    assert out["image"].shape == (1, 3, 128, 128)
    for k in ("image", "image_raw", "image_depth", "image_weights"):
        assert np.isfinite(np.asarray(out[k])).all(), k


@pytest.mark.fast
def test_ess_half_budget_beats_plain_reference_quadrature():
    rgb_gt, dep_gt, _ = _render(384, 384, ess=False)   # dense ground truth
    rgb_96, _, _ = _render(96, 96, ess=False)          # reference quadrature
    rgb_e48, _, _ = _render(48, 48, ess=True)          # ESS at half budget
    rgb_p48, _, _ = _render(48, 48, ess=False)         # plain at half budget
    err = lambda a: float(np.sqrt(np.mean((a - rgb_gt) ** 2)))
    e96, e_e48, e_p48 = err(rgb_96), err(rgb_e48), err(rgb_p48)
    # claim 2: half-budget ESS is at least as accurate as the reference's
    # full-budget uniform quadrature
    assert e_e48 <= e96 * 1.05, (e_e48, e96)
    # claim 3: the plain half-budget render is measurably worse than ESS
    assert e_p48 > e_e48 * 1.5, (e_p48, e_e48)


@pytest.mark.fast
def test_per_portrait_occ_cache_matches_per_call():
    """eval.generate's cached-plane path precomputes the ESS occupancy once
    per portrait (_get_planes_jit) and threads it into every view batch —
    must match the per-call occupancy render exactly (same function of the
    same planes+filters)."""
    import jax
    from panic3d_tpu import configs
    from panic3d_tpu.eval.generate import _get_planes_jit, _get_render_jit
    from panic3d_tpu.models.triplane import TriPlaneGenerator

    base = configs.tiny()
    rk = dict(base.rendering_kwargs)
    rk["ess"] = dict(grid=8, taps=16, thresh=0.01, margin=1.0)
    g = configs.tiny(rendering_kwargs=rk, force_sigmoid=True)

    from panic3d_tpu.data.dataset import synthetic_batch

    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_batch(bs=1, size=64, chonk_ch=16, feat_dim=32))
    cond = batch["cond"]
    xin = {"seeds": [7], "elevations": jnp.zeros(1), "azimuths": jnp.zeros(1),
           "cond": cond}
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin,
                       method=TriPlaneGenerator.f, noise_mode="const")

    opts = dict(triplane_crop=0.1, cull_clouds=0.5)
    el = jnp.asarray([10.0, -5.0])
    az = jnp.asarray([0.0, 120.0])
    fovs = jnp.asarray([30.0, 30.0])

    full = _get_render_jit(g, opts, 7, 2)(variables, el, az, fovs, cond)
    pl = _get_planes_jit(g, 7, opts)(variables, cond)
    assert set(pl) == {"ws", "planes", "occ", "occ_out"}
    cached = _get_render_jit(g, opts, 7, 2, from_planes=True)(
        variables, el, az, fovs, cond, pl
    )
    for k in full:
        np.testing.assert_allclose(
            np.asarray(cached[k]), np.asarray(full[k]), atol=2e-5, rtol=1e-5,
            err_msg=k,
        )


@pytest.mark.fast
def test_merge_presorted_bit_equals_argsort():
    """merge_composite(presorted=True) — cross-count merge ranks of two
    sorted sample lists — is bit-identical to the argsort path, including
    exact depth ties (which follow stable-argsort order: coarse first)."""
    rng = np.random.RandomState(5)
    B, R, S1, S2 = 2, 33, 9, 7
    d1 = np.sort(rng.rand(B, R, S1, 1), axis=2).astype(np.float32)
    d2 = np.sort(rng.rand(B, R, S2, 1), axis=2).astype(np.float32)
    d2[:, ::3, 2] = d1[:, ::3, 4]  # exact ties on every third ray
    d2 = np.sort(d2, axis=2)       # keep the presorted contract
    c1 = rng.randn(B, R, S1, 5).astype(np.float32)
    c2 = rng.randn(B, R, S2, 5).astype(np.float32)
    s1 = rng.randn(B, R, S1, 1).astype(np.float32)
    s2 = rng.randn(B, R, S2, 1).astype(np.float32)
    x1 = rng.randn(B, R, S1, 3).astype(np.float32)
    x2 = rng.randn(B, R, S2, 3).astype(np.float32)
    args = [jnp.asarray(t) for t in (d1, c1, s1, x1, d2, c2, s2, x2)]
    for flat in (True, False):
        ref = vr.merge_composite(*args, white_back=True, flat_take=flat,
                                 presorted=False)
        got = vr.merge_composite(*args, white_back=True, flat_take=flat,
                                 presorted=True)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
