"""Hierarchical (coarse + importance) triplane volume renderer, TPU-native.

Role of `src/training/volumetric_rendering/{renderer,ray_marcher,math_utils}.py`.

Design notes (TPU-first):
- Pure functions over static shapes: the reference's boolean-indexed density
  overwrites (``densities[mask] = -1e3``, renderer.py:191-198) become
  ``jnp.where``; ray-validity fixups (renderer.py:167-170) become masked
  min/max reductions; searchsorted becomes a vectorized compare-and-sum.
- The decoder is passed in as a callable ``decode_fn(features [N,M,C]) ->
  (rgb [N,M,32], sigma [N,M,1])`` so the renderer stays model-agnostic and
  the whole coarse->importance->composite pipeline jits as one program.
- Rays are embarrassingly parallel: everything here is batched over
  [N, rays], which is the axis sharded across the device mesh by
  panic3d_tpu.parallel (the framework's analog of sequence parallelism,
  SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grid_sample import (
    grid_sample_2d_points,
    grid_sample_2d_points_packed,
    grid_sample_2d_points_packed_scaled,
    grid_sample_3d_points,
    pack_bilinear_2d,
)


# ---------------------------------------------------------------------------
# plane geometry

def generate_plane_axes(use_triplane: bool = False) -> np.ndarray:
    """The three plane bases (renderer.py:26-50).

    With use_triplane=True the third plane uses the corrected rotation (the
    EG3D bug-fixed variant); the shipped PAniC-3D model trains with
    use_triplane=1 (train_eclustrousC.py:192).
    """
    third = (
        [[0, 1, 0], [0, 0, 1], [1, 0, 0]]
        if use_triplane
        else [[0, 0, 1], [1, 0, 0], [0, 1, 0]]
    )
    return np.asarray(
        [
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
            third,
        ],
        dtype=np.float32,
    )


def project_onto_planes(plane_axes: np.ndarray, coordinates: jax.Array) -> jax.Array:
    """[N,M,3] -> [N,3,M,3] plane-local coordinates (renderer.py:52-66)."""
    inv = jnp.asarray(np.linalg.inv(plane_axes))  # [3,3,3]
    return jnp.einsum("nmc,pcd->npmd", coordinates, inv)


def sample_from_planes(
    plane_axes: np.ndarray,
    plane_features: jax.Array,   # [N, 3, C*D, H, W]
    coordinates: jax.Array,      # [N, M, 3] world coords
    box_warp: float,
    triplane_depth: int = 1,
) -> jax.Array:
    """Bilinear triplane lookup -> [N, 3, M, C] (renderer.py:68-93)."""
    N, n_planes, CD, H, W = plane_features.shape
    M = coordinates.shape[1]
    coordinates = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coordinates)  # [N,3,M,3]

    if triplane_depth == 1:
        feats = plane_features.reshape(N * n_planes, CD, H, W)
        pts = proj[..., :2].reshape(N * n_planes, M, 2)
        out = grid_sample_2d_points(feats, pts, padding_mode="zeros")  # [N*3,M,C]
        return out.reshape(N, n_planes, M, CD)
    C, D = CD // triplane_depth, triplane_depth
    feats = plane_features.reshape(N * n_planes, C, D, H, W)
    pts = proj.reshape(N * n_planes, M, 3)
    out = grid_sample_3d_points(feats, pts, padding_mode="zeros")  # [N*3,M,C]
    return out.reshape(N, n_planes, M, C)


def pack_planes(plane_features: jax.Array) -> jax.Array:
    """Corner-pack [N,3,C,H,W] triplanes -> [N*3, H+1, W+1, 4C].

    TPU gather optimization: the bilinear lookup becomes ONE row gather per
    (point, plane) instead of four (ops/grid_sample.pack_bilinear_2d) — with
    C=32 the packed row is exactly the 128-lane register width. Build cost
    is a single elementwise pass over 4x the plane bytes, amortized over the
    ~R*S gathers of a render (or the 256³ of a volume decode); callers hoist
    it out of chunk loops. run_model dispatches on ndim (4 = packed).
    """
    N, n_planes, C, H, W = plane_features.shape
    return pack_bilinear_2d(plane_features.reshape(N * n_planes, C, H, W))


def sample_from_planes_packed(
    plane_axes: np.ndarray,
    packed: jax.Array,           # [N*3, H+1, W+1, 4C]
    coordinates: jax.Array,      # [N, M, 3] world coords
    box_warp: float,
) -> jax.Array:
    """Packed-row bilinear triplane lookup -> [N, 3, M, C]."""
    NP = packed.shape[0]
    N, M, _ = coordinates.shape
    n_planes = NP // N
    coordinates = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coordinates)  # [N,3,M,3]
    pts = proj[..., :2].reshape(NP, M, 2)
    out = grid_sample_2d_points_packed(packed, pts)  # [N*3, M, C]
    return out.reshape(N, n_planes, M, -1)


def sample_from_planes_packed_scaled(
    plane_axes: np.ndarray,
    packed: jax.Array,           # [N*3, H+1, W+1, 4C]
    coordinates: jax.Array,      # [N, M, 3] world coords
    box_warp: float,
) -> jax.Array:
    """Corner-weighted SAMPLE-major packed lookup -> [N, M, 3*4C].

    The bilinear corner weights AND the decoder's 1/n_planes mean are
    pre-multiplied into the raw gathered rows, so a plane-mean decoder's
    first linear layer consumes this block directly as one MXU dot against
    its (4*n_planes)-tiled kernel (OSGDecoder packed_corners=True) — the
    lerp, the plane mean, and net0 become a single matmul and the [M, C]
    f32 intermediates (measured 4x~1.5 ms/call of lane-wasted loop fusions,
    xprof r5) are never materialized.
    """
    NP = packed.shape[0]
    N, M, _ = coordinates.shape
    n_planes = NP // N
    coordinates = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coordinates)  # [N,3,M,3]
    pts = proj[..., :2].reshape(NP, M, 2)
    return grid_sample_2d_points_packed_scaled(
        packed, pts, n_planes, scale=1.0 / n_planes
    )


# ---------------------------------------------------------------------------
# math utils (math_utils.py)

def get_ray_limits_box(rays_o, rays_d, box_side_length):
    """Ray/AABB entry+exit distances; invalid rays get (-1,-2)
    (math_utils.py:46-98). rays_o/rays_d: [..., 3]."""
    half = box_side_length / 2
    inv_d = 1.0 / rays_d
    t_lo = (-half - rays_o) * inv_d
    t_hi = (half - rays_o) * inv_d
    tmin3 = jnp.minimum(t_lo, t_hi)
    tmax3 = jnp.maximum(t_lo, t_hi)
    tmin = jnp.max(tmin3, axis=-1)
    tmax = jnp.min(tmax3, axis=-1)
    is_valid = tmin <= tmax
    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None], is_valid[..., None]


def batched_linspace(start, stop, num: int):
    """[num, *start.shape] linspace (math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]


# ---------------------------------------------------------------------------
# ray marcher (ray_marcher.py:20-63)

def _at_least_f32(x):
    """Upcast sub-fp32 inputs (bf16) to fp32; leave fp32/f64 untouched —
    'compute in at least fp32' without clamping x64 discrimination runs
    (scripts/flagship_parity.py X64=1) back down to fp32."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def ray_march(colors, densities, depths, white_back: bool):
    """MipNeRF-style midpoint quadrature compositing.

    colors [B,R,S,C], densities [B,R,S,1], depths [B,R,S,1]
    -> (composite [B,R,C], depth [B,R,1], weights [B,R,S-1,1]).
    """
    colors = _at_least_f32(colors)  # composite math in at least fp32
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    # softplus(x-1): activation bias of -1 improves initialization
    densities_mid = jax.nn.softplus(densities_mid - 1)
    density_delta = densities_mid * deltas
    alpha = 1 - jnp.exp(-density_delta)

    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], axis=-2
    )
    transmittance = jnp.cumprod(shifted, axis=-2)[:, :, :-1]
    weights = alpha * transmittance

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1 - weight_total
    composite_rgb = composite_rgb * 2 - 1  # scale to (-1, 1)
    return composite_rgb, composite_depth, weights


# ---------------------------------------------------------------------------
# density filters (renderer.py:138-153)

def triplane_crop_mask(xyz, thresh, boxwarp, allow_bottom: bool = True):
    """True where density must be culled (outside the crop box)."""
    bw, tc = boxwarp, thresh
    flip = jnp.asarray([-1.0, 1.0, -1.0])
    xyz = xyz * flip
    ans = jnp.all(jnp.abs(xyz[..., [0, 2]]) <= (bw / 2 - tc), axis=-1, keepdims=True)
    if allow_bottom:
        ans = ans | (
            (xyz[..., 1:2] <= -(bw / 2 - tc))
            & jnp.all(jnp.abs(xyz[..., [0, 2]]) <= (bw / 2 - tc), axis=-1, keepdims=True)
        )
    return ~ans


def cull_clouds_mask(densities, thresh):
    densities = jax.nn.softplus(densities - 1)
    alpha = 1 - jnp.exp(-densities)
    return alpha < thresh


def _apply_density_filters(
    densities, xyz, box_warp, triplane_crop, cull_clouds, binarize_clouds
):
    if triplane_crop:
        cropmask = triplane_crop_mask(xyz, triplane_crop, box_warp)
        densities = jnp.where(cropmask, -1e3, densities)
    if binarize_clouds:
        ccmask = cull_clouds_mask(densities, binarize_clouds)
        densities = jnp.where(ccmask, -1e3, 1e3)
    elif cull_clouds:
        ccmask = cull_clouds_mask(densities, cull_clouds)
        densities = jnp.where(ccmask, -1e3, densities)
    return densities


# ---------------------------------------------------------------------------
# empty-space skipping (TPU-native addition; no reference counterpart)
#
# The reference marches 96+96 samples uniformly over the full [0.5, 1.5]
# interval (renderer.py:162-264 with the ecrutileE rendering config) even
# though the scene is a head occupying a fraction of the 0.7 box — most
# samples decode empty space. On TPU the render cost is the per-row gather
# count (see PARITY.md "Gather roofline"), so the win is taken as a
# quality-per-sample improvement: a coarse occupancy grid (decoded once per
# set of planes) narrows each ray's [t0, t1] to the occupied span, letting a
# smaller static sample budget match the reference's effective sample
# spacing wherever density lives. Static shapes throughout: same tensor
# shapes per config, narrower intervals per ray.

def zero_feature_density(planes, decode_fn, cull_clouds, binarize_clouds):
    """Filtered density of the zero-plane-feature decode (outside the box,
    where grid_sample pads zeros) — a position-independent scalar.
    triplane_crop is deliberately NOT applied (it would need a position) —
    conservative. ``planes`` supplies only dtype + channel count (raw
    [N,3,C*D,H,W] or packed [N*3,H+1,W+1,4C])."""
    if planes.ndim == 4:
        C, n_planes = planes.shape[-1] // 4, 3
    else:
        C, n_planes = planes.shape[2], planes.shape[1]
    zero_feats = jnp.zeros((1, n_planes, 1, C), planes.dtype)
    _, sigma0 = decode_fn(zero_feats)
    density0 = jax.nn.softplus(sigma0.astype(jnp.float32) - 1)
    if binarize_clouds:
        density0 = jnp.where(
            cull_clouds_mask(sigma0.astype(jnp.float32), binarize_clouds),
            0.0, jnp.inf,
        ).reshape(-1)[0]
    elif cull_clouds:
        density0 = jnp.where(
            cull_clouds_mask(sigma0.astype(jnp.float32), cull_clouds),
            0.0, density0,
        ).reshape(-1)[0]
    else:
        density0 = density0.reshape(-1)[0]
    return density0


def ess_occupancy(
    plane_axes, planes, decode_fn, box_warp: float, options: dict,
    triplane_crop, cull_clouds, binarize_clouds, n_batch: int,
):
    """Conservative occupancy for empty-space skipping.

    Decodes density on a supersampled (ess.supersample × G)³ cell-center
    lattice over the box (through the SAME density filters the render
    applies) via the gather-free factorized lattice decode
    (lattice.decode_lattice), max-pools the thresholded field down to G³ —
    so density registering at ANY sub-cell sample marks the cell, not only
    cell centers — and dilates by one cell (3³ max-pool) so any density a
    render sample could see marks a cell. Returns (occ [N,G,G,G] float 0/1,
    occ_outside [] float 0/1). Always computed from the RAW planes in fp32
    (the render's bf16 pack happens downstream), so every call path yields
    the same occupancy for the same planes.

    Packed (ndim=4) or 3D (triplane_depth>1) planes fall back to the
    per-point gather decode at the plain G³ centers.
    """
    from . import lattice as _lat

    ess = options["ess"]
    G = int(ess.get("grid", 32))
    ss = int(ess.get("supersample", 2))
    thresh = float(ess.get("thresh", 0.01))
    bw = box_warp
    factorized = planes.ndim == 5 and options.get("triplane_depth", 1) == 1
    if not factorized:
        ss = 1
    Gs = G * ss
    if factorized:
        sigma = _lat.decode_lattice(
            planes.astype(jnp.float32), decode_fn, bw, (Gs, Gs, Gs),
            use_triplane=options.get("use_triplane", False),
            # 'mean' is opted into by callers whose decoder is linear in
            # the plane axis (triplane.py sets decoder_mean_linear for
            # OSGDecoder); generic decode_fns get the stacked contract
            plane_reduce=(
                "mean" if options.get("decoder_mean_linear") else "stack"
            ),
        ).reshape(n_batch, -1, 1)
        coords = jnp.broadcast_to(
            _lat.lattice_world_coords((Gs, Gs, Gs), bw).reshape(1, -1, 3),
            (n_batch, Gs ** 3, 3),
        )
    else:
        lin = (jnp.arange(Gs, dtype=jnp.float32) + 0.5) / Gs * bw - bw / 2
        X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
        coords = jnp.stack([X, Y, Z], axis=-1).reshape(1, -1, 3)
        coords = jnp.broadcast_to(coords, (n_batch, Gs ** 3, 3))
        _, sigma = run_model(
            plane_axes, planes, decode_fn, coords, bw,
            options.get("triplane_depth", 1),
        )
    sigma = _apply_density_filters(
        sigma, coords, bw, triplane_crop, cull_clouds, binarize_clouds
    )
    density = jax.nn.softplus(sigma.astype(jnp.float32) - 1)
    occ = (density > thresh).astype(jnp.float32).reshape(n_batch, Gs, Gs, Gs)
    if ss > 1:
        occ = jax.lax.reduce_window(
            occ, 0.0, jax.lax.max, (1, ss, ss, ss), (1, ss, ss, ss), "VALID"
        )
    occ = jax.lax.reduce_window(
        occ, 0.0, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "SAME"
    )

    density0 = zero_feature_density(
        planes, decode_fn, cull_clouds, binarize_clouds
    )
    occ_outside = (density0 > thresh).astype(jnp.float32)
    return jax.lax.stop_gradient(occ), jax.lax.stop_gradient(occ_outside)


def ess_narrow_intervals(
    occ, occ_outside, ray_origins, ray_directions,
    ray_start, ray_end, box_warp: float, options: dict,
):
    """Per-ray [t0, t1] covering the occupied span (+margin taps).

    K occupancy taps along each ray's current interval; the narrowed
    interval spans the first..last occupied tap padded by `margin` tap
    spacings. Tap spacing (interval/K) is kept below the occupancy cell size
    by construction of the defaults (1.0/64 < 0.7/32 · dilation), so a ray
    cannot step over an occupied dilated cell. Rays with no occupied tap
    keep their full interval (they composite to background regardless).
    Returns ([N,R,1] t0, [N,R,1] t1), stop-gradiented.
    """
    ess = options["ess"]
    K = int(ess.get("taps", 64))
    margin = float(ess.get("margin", 1))
    N, R, _ = ray_origins.shape
    G = occ.shape[-1]
    # no-step-over invariant: tap spacing (max interval length / K) must not
    # exceed the occupancy cell size bw/G, or a ray could straddle an
    # occupied dilated cell between taps (dropped geometry). Static config
    # check — interval length is the configured span for numeric
    # ray_start/end, or the box diagonal bound for per-ray ('auto') spans.
    if isinstance(ray_start, (int, float)) and isinstance(ray_end, (int, float)):
        max_len = float(ray_end) - float(ray_start)
    else:
        max_len = float(np.sqrt(3.0)) * box_warp
    if max_len / K > box_warp / G:
        raise ValueError(
            f"ess: taps={K} cannot cover interval length {max_len:g} at "
            f"grid={G} (tap spacing {max_len / K:g} > cell {box_warp / G:g})"
            f"; need taps >= {int(np.ceil(max_len * G / box_warp))}"
        )
    if isinstance(ray_start, (int, float)):
        rs = jnp.full((N, R, 1), float(ray_start), jnp.float32)
        re = jnp.full((N, R, 1), float(ray_end), jnp.float32)
    else:
        rs = jnp.broadcast_to(ray_start, (N, R, 1)).astype(jnp.float32)
        re = jnp.broadcast_to(ray_end, (N, R, 1)).astype(jnp.float32)
    L = re - rs                                                  # [N,R,1]
    frac = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    tk = rs + frac[None, None, :] * L                            # [N,R,K]
    pts = (
        ray_origins[:, :, None, :] + tk[..., None] * ray_directions[:, :, None, :]
    )                                                            # [N,R,K,3]
    gidx = jnp.floor((pts / box_warp + 0.5) * G).astype(jnp.int32)
    inside = jnp.all((gidx >= 0) & (gidx < G), axis=-1)          # [N,R,K]
    gc = jnp.clip(gidx, 0, G - 1)
    flat = (gc[..., 0] * G + gc[..., 1]) * G + gc[..., 2]
    flat = flat + (jnp.arange(N, dtype=jnp.int32) * G ** 3)[:, None, None]
    occ_t = jnp.take(occ.reshape(-1), flat.reshape(-1)).reshape(N, R, K)
    occ_t = jnp.where(inside, occ_t > 0, occ_outside > 0)        # [N,R,K] bool

    kk = jnp.arange(K, dtype=jnp.float32)
    first = jnp.min(jnp.where(occ_t, kk, jnp.inf), axis=-1)      # [N,R]
    last = jnp.max(jnp.where(occ_t, kk, -jnp.inf), axis=-1)
    hit = jnp.isfinite(first)
    step = L[..., 0] / K
    t0 = rs[..., 0] + jnp.maximum(first - margin, 0.0) * step
    t1 = rs[..., 0] + jnp.minimum(last + 1 + margin, float(K)) * step
    t0 = jnp.where(hit, t0, rs[..., 0])
    t1 = jnp.where(hit, t1, re[..., 0])
    return (
        jax.lax.stop_gradient(t0[..., None]),
        jax.lax.stop_gradient(t1[..., None]),
    )


# ---------------------------------------------------------------------------
# sampling

def sample_stratified(
    ray_origins, ray_start, ray_end, depth_resolution: int,
    key: Optional[jax.Array] = None,
    disparity_space_sampling: bool = False,
):
    """Jittered uniform depths [N,M,S,1] (renderer.py:303-326).

    ray_start/ray_end may be floats or per-ray [N,M,1] tensors ('auto' mode).
    key=None -> deterministic midpoints (jitter 0.5) for reproducible eval.
    """
    N, M, _ = ray_origins.shape
    S = depth_resolution
    if disparity_space_sampling:
        d = jnp.broadcast_to(
            jnp.linspace(0, 1, S).reshape(1, 1, S, 1), (N, M, S, 1)
        )
        delta = 1 / (S - 1)
        jitter = (
            jax.random.uniform(key, d.shape) if key is not None else 0.5
        )
        d = d + jitter * delta
        return 1.0 / (1.0 / ray_start * (1.0 - d) + 1.0 / ray_end * d)
    if isinstance(ray_start, (int, float)):
        depths = jnp.broadcast_to(
            jnp.linspace(ray_start, ray_end, S).reshape(1, 1, S, 1), (N, M, S, 1)
        )
        delta = (ray_end - ray_start) / (S - 1)
        jitter = jax.random.uniform(key, (N, M, S, 1)) if key is not None else 0.5
        return depths + jitter * delta
    depths = batched_linspace(ray_start, ray_end, S)  # [S,N,M,1]
    depths = jnp.transpose(depths, (1, 2, 0, 3))
    delta = (ray_end - ray_start) / (S - 1)  # [N,M,1]
    jitter = jax.random.uniform(key, depths.shape) if key is not None else 0.5
    return depths + jitter * delta[..., None]


def _searchsorted_right(cdf, u):
    """index of first cdf element > u; cdf [R,S], u [R,K] -> [R,K] int32.

    Vectorized compare-and-sum instead of torch.searchsorted: S is small
    (~samples/ray) so the [R,K,S] compare lowers to pure VPU work without
    gathers.
    """
    return jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(jnp.int32)


def sample_pdf(bins, weights, n_importance: int,
               key: Optional[jax.Array] = None, eps: float = 1e-5,
               gather_impl: str = "onehot"):
    """Inverse-CDF sampling (renderer.py:348-387). bins [R,B], weights [R,B-?].

    gather_impl='onehot' (default) selects the bracketing cdf/bin values via
    one-hot compare-and-sum over the small S axis instead of four
    take_along_axis calls: TPU lowers take_along_axis to per-ELEMENT row
    gathers at the ~2.5 ns/row floor (measured 16 ms/eval-forward, the #2
    op after the plane gathers — scripts/profile_forward.py r5), while the
    one-hot form fuses with the searchsorted compare into pure VPU work.
    Both paths select exact array elements — bit-identical outputs
    (tests/test_renderer.py::test_sample_pdf_onehot_bitexact).
    """
    R, S = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R,S+1]

    if key is None:
        u = jnp.broadcast_to(jnp.linspace(0, 1, n_importance), (R, n_importance))
    else:
        u = jax.random.uniform(key, (R, n_importance))

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, S)

    if gather_impl == "onehot":
        def onehot_take(arr, idx):
            # arr [R,W], idx [R,K] with values < W -> [R,K]; exact-element
            # select, lowers to compare+where+reduce (VPU) instead of gather
            sidx = jnp.arange(arr.shape[-1], dtype=jnp.int32)
            oh = sidx[None, None, :] == idx[:, :, None]        # [R,K,W]
            return jnp.sum(jnp.where(oh, arr[:, None, :], 0.0), axis=-1)

        cdf_lo = onehot_take(cdf, below)
        cdf_hi = onehot_take(cdf, above)
        bins_lo = onehot_take(bins, below)
        bins_hi = onehot_take(bins, above)
    else:
        cdf_lo = jnp.take_along_axis(cdf, below, axis=1)
        cdf_hi = jnp.take_along_axis(cdf, above, axis=1)
        bins_lo = jnp.take_along_axis(bins, below, axis=1)
        bins_hi = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def sample_importance(z_vals, weights, n_importance: int,
                      key: Optional[jax.Array] = None):
    """Importance depths from smoothed coarse weights (renderer.py:328-346)."""
    B, R, S, _ = z_vals.shape
    z = z_vals.reshape(B * R, S)
    w = weights.reshape(B * R, -1)

    # max_pool1d(k=2,s=1,p=1) then avg_pool1d(k=2,s=1): smooth the pdf
    wpad = jnp.pad(w, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    wmax = jnp.maximum(wpad[:, :-1], wpad[:, 1:])      # [BR, S'+1]
    wavg = (wmax[:, :-1] + wmax[:, 1:]) / 2            # [BR, S']
    w = wavg + 0.01

    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
    samples = sample_pdf(z_mid, w[:, 1:-1], n_importance, key=key)
    samples = jax.lax.stop_gradient(samples)
    return samples.reshape(B, R, n_importance, 1)


def unify_samples(d1, c1, s1, x1, d2, c2, s2, x2, flat_take: bool = True):
    """Concatenate coarse+fine and sort by depth (renderer.py:289-301).

    TPU: the per-ray reorder is done with one flat global-index row gather
    over [B*R*S, C] (see ops/grid_sample.py note) instead of a batched
    take_along_axis per tensor. When the ray axis is SHARDED over the mesh
    (flat_take=False) the reorder instead uses take_along_axis along the
    local S axis — a bit-identical permutation the SPMD partitioner keeps
    fully device-local (the flat global-index form would force an
    all-gather of the sample tensor).
    """
    B, R = d1.shape[:2]
    depths = jnp.concatenate([d1, d2], axis=-2)
    S = depths.shape[2]
    colors = jnp.concatenate([c1, c2], axis=-2)
    xyz = jnp.concatenate([x1, x2], axis=-2)
    densities = jnp.concatenate([s1, s2], axis=-2)
    idx = jnp.argsort(depths[..., 0], axis=-1).astype(jnp.int32)  # [B,R,S]

    if flat_take:
        base = (jnp.arange(B * R, dtype=jnp.int32) * S).reshape(B, R, 1)
        gidx = (idx + base).reshape(-1)

        def take(a):
            C = a.shape[-1]
            return jnp.take(a.reshape(B * R * S, C), gidx, axis=0).reshape(B, R, S, C)
    else:
        def take(a):
            return jnp.take_along_axis(a, idx[..., None], axis=2)

    # colors (the wide block) reorder at their native dtype (bf16 when the
    # render runs bf16); depth/sigma/xyz ride a narrow fp32 gather
    pack_precise = jnp.concatenate([depths, densities, xyz], axis=-1)
    out_p = take(pack_precise)
    out_c = take(colors)
    return out_p[..., :1], out_c, out_p[..., 1:2], out_p[..., 2:]


def merge_composite(d1, c1, s1, x1, d2, c2, s2, x2, white_back: bool,
                    flat_take: bool = True, presorted: bool = False,
                    gathers_only: bool = False):
    """Composite the merged coarse+fine sample set WITHOUT gathering colors.

    Exactly ``ray_march(unify_samples(...))`` reassociated: only the narrow
    (depth, sigma) pack rides the sorted gather; per-sample composite
    coefficients v_j = (w_{j-1} + w_j)/2 (midpoint linearity:
    sum_i w_i (c_i + c_{i+1})/2 = sum_j c_j v_j) are scattered back to
    original order, and the wide color/xyz block composites as an
    order-independent weighted sum in the order it was produced. On TPU
    this removes the dominant 32-channel sorted row gather — gathers are
    row-cost-bound, so shrinking sorted traffic to 2 fp32 channels + a
    1-channel scatter is ~2x cheaper than reordering the full sample block.

    Returns (composite [B,R,C], depth [B,R,1], weight_total [B,R,1]).
    """
    B, R = d1.shape[:2]
    depths = jnp.concatenate([d1, d2], axis=-2)[..., 0]    # [B,R,S]
    sigmas = jnp.concatenate([s1, s2], axis=-2)[..., 0]
    colors = jnp.concatenate([c1, c2], axis=-2)            # [B,R,S,Cc]
    xyz = jnp.concatenate([x1, x2], axis=-2)
    S = depths.shape[-1]

    pack = jnp.stack([depths, sigmas], axis=-1)            # [B,R,S,2] fp32
    if gathers_only:
        # all-GATHER merge (eval path, both halves already depth-sorted):
        # no argsort network, no scatter. Cross counts give each original
        # sample's merged slot (rank, as in presorted), and a second
        # cross count n_a[j] = #{i: slot_a[i] <= j} tells which half and
        # which half-index owns sorted slot j — so the sorted (depth,
        # sigma) pack is TWO narrow half-gathers + a select, and the
        # coefficient pullback is a rank gather. Tie rule (d1 first)
        # matches stable argsort of [d1;d2] — bit-identical output.
        a = d1[..., 0]                                     # [B,R,Sa] sorted
        b = d2[..., 0]                                     # [B,R,Sb] sorted
        Sa = a.shape[-1]
        slot_a = (
            jnp.arange(Sa, dtype=jnp.int32)
            + jnp.sum(b[:, :, None, :] < a[:, :, :, None], axis=-1)
        )                                                  # [B,R,Sa] strictly inc
        slot_b = (
            jnp.arange(S - Sa, dtype=jnp.int32)
            + jnp.sum(a[:, :, None, :] <= b[:, :, :, None], axis=-1)
        )
        rank = jnp.concatenate([slot_a, slot_b], axis=-1)  # orig -> sorted
        j = jnp.arange(S, dtype=jnp.int32)
        n_a = jnp.sum(
            slot_a[:, :, None, :] <= j[None, None, :, None], axis=-1
        ).astype(jnp.int32)                                # [B,R,S]
        from_a = n_a > jnp.pad(n_a[..., :-1], ((0, 0), (0, 0), (1, 0)))
        ia = jnp.maximum(n_a - 1, 0)
        ib = jnp.clip(j[None, None, :] - n_a, 0, S - Sa - 1)
        pack_a = pack[..., :Sa, :]
        pack_b = pack[..., Sa:, :]
        pack_s = jnp.where(
            from_a[..., None],
            jnp.take_along_axis(pack_a, ia[..., None], axis=2),
            jnp.take_along_axis(pack_b, ib[..., None], axis=2),
        )                                                  # [B,R,S,2]
    elif presorted:
        # eval path (key=None): d1 (midpoint-stratified) and d2
        # (inverse-CDF at monotone u) are each already depth-sorted, so
        # the merged order comes from a vectorized two-list merge rank
        # (i + strict/non-strict cross counts; tie rule matches stable
        # argsort with d1 first) instead of a per-ray argsort network.
        # rank maps original index -> sorted slot: the sorted pack is a
        # SCATTER and the coefficient pullback a GATHER (the argsort form
        # below does the converse) — bit-identical output.
        a = d1[..., 0]
        b = d2[..., 0]
        cnt_a = jnp.sum(b[:, :, None, :] < a[:, :, :, None], axis=-1)
        cnt_b = jnp.sum(a[:, :, None, :] <= b[:, :, :, None], axis=-1)
        rank = jnp.concatenate(
            [jnp.arange(a.shape[-1], dtype=jnp.int32) + cnt_a,
             jnp.arange(b.shape[-1], dtype=jnp.int32) + cnt_b],
            axis=-1,
        )                                                  # [B,R,S]
        if flat_take:
            base = (jnp.arange(B * R, dtype=jnp.int32) * S).reshape(B, R, 1)
            gidx = (rank + base).reshape(-1)
            pack_s = (
                jnp.zeros((B * R * S, 2), pack.dtype)
                .at[gidx].set(pack.reshape(B * R * S, 2), unique_indices=True)
                .reshape(B, R, S, 2)
            )
        else:
            bi = jnp.arange(B)[:, None, None]
            ri = jnp.arange(R)[None, :, None]
            pack_s = (
                jnp.zeros((B, R, S, 2), pack.dtype)
                .at[bi, ri, rank].set(pack, unique_indices=True)
            )
    elif flat_take:
        idx = jnp.argsort(depths, axis=-1).astype(jnp.int32)   # [B,R,S]
        base = (jnp.arange(B * R, dtype=jnp.int32) * S).reshape(B, R, 1)
        gidx = (idx + base).reshape(-1)
        pack_s = jnp.take(pack.reshape(B * R * S, 2), gidx, axis=0)
        pack_s = pack_s.reshape(B, R, S, 2)
    else:
        idx = jnp.argsort(depths, axis=-1).astype(jnp.int32)   # [B,R,S]
        pack_s = jnp.take_along_axis(pack, idx[..., None], axis=2)
    d_s = pack_s[..., 0]
    sig_s = pack_s[..., 1]

    # ray_march midpoint quadrature in the sorted domain (fp32)
    deltas = d_s[..., 1:] - d_s[..., :-1]
    d_mid = (d_s[..., 1:] + d_s[..., :-1]) / 2
    sig_mid = jax.nn.softplus((sig_s[..., 1:] + sig_s[..., :-1]) / 2 - 1)
    alpha = 1 - jnp.exp(-sig_mid * deltas)                 # [B,R,S-1]
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], axis=-1
    )
    transmittance = jnp.cumprod(shifted, axis=-1)[..., :-1]
    w = alpha * transmittance                              # [B,R,S-1]

    weight_total = jnp.sum(w, axis=-1, keepdims=True)      # [B,R,1]
    composite_depth = jnp.sum(w * d_mid, axis=-1, keepdims=True) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(
        composite_depth, jnp.min(depths), jnp.max(depths)
    )

    # per-sample coefficient in sorted order, scattered back to original
    # order (positions are argsort output, hence unique)
    v = (
        jnp.pad(w, ((0, 0), (0, 0), (1, 0)))
        + jnp.pad(w, ((0, 0), (0, 0), (0, 1)))
    ) / 2                                                  # [B,R,S]
    if gathers_only:
        v_orig = jnp.take_along_axis(v, rank, axis=2)
    elif presorted:
        if flat_take:
            v_orig = jnp.take(v.reshape(-1), gidx, axis=0).reshape(B, R, S)
        else:
            v_orig = jnp.take_along_axis(v, rank, axis=2)
    elif flat_take:
        v_orig = (
            jnp.zeros((B * R * S,), v.dtype)
            .at[gidx].set(v.reshape(-1), unique_indices=True)
            .reshape(B, R, S)
        )
    else:
        bi = jnp.arange(B)[:, None, None]
        ri = jnp.arange(R)[None, :, None]
        v_orig = (
            jnp.zeros((B, R, S), v.dtype)
            .at[bi, ri, idx].set(v, unique_indices=True)
        )

    colors_aug = jnp.concatenate(
        [_at_least_f32(colors), _at_least_f32(xyz)], axis=-1
    )
    composite = jnp.sum(v_orig[..., None] * colors_aug, axis=-2)
    if white_back:
        # ray_march applies the white background to EVERY composited
        # channel (the xyz channels ride along, exactly as in the
        # reference where xyz is appended to the color block)
        composite = composite + (1 - weight_total)
    composite = composite * 2 - 1
    return composite, composite_depth, weight_total


# ---------------------------------------------------------------------------
# full renderer (renderer.py:156-280)

class RenderOutput(NamedTuple):
    rgb: jax.Array       # [N, R, C-3] feature image samples
    depth: jax.Array     # [N, R, 1]
    weights: jax.Array   # [N, R, 1] accumulated alpha
    xyz: jax.Array       # [N, R, 3] composited world position


def run_model(plane_axes, planes, decode_fn, sample_coordinates,
              box_warp: float, triplane_depth: int = 1,
              packed_corners: bool = False):
    """Triplane lookup + decoder MLP (renderer.py:266-280).

    ``planes`` may be raw [N,3,C*D,H,W] or corner-packed [N*3,H+1,W+1,4C]
    (pack_planes); dispatch is on ndim. packed_corners=True (packed planes
    only) hands the decoder the corner-weighted sample-major row block so
    lerp + plane mean + first layer fuse into one MXU dot — the decoder
    must accept packed_corners (OSGDecoder; opt-in via
    rendering_kwargs['decoder_packed_corners']).
    """
    if planes.ndim == 4 and packed_corners:
        feats = sample_from_planes_packed_scaled(
            plane_axes, planes, sample_coordinates, box_warp
        )
        return decode_fn(feats, packed_corners=True)
    if planes.ndim == 4:
        feats = sample_from_planes_packed(
            plane_axes, planes, sample_coordinates, box_warp
        )
    else:
        feats = sample_from_planes(
            plane_axes, planes, sample_coordinates, box_warp, triplane_depth
        )
    rgb, sigma = decode_fn(feats)
    return rgb, sigma


def run_model_z_aligned(plane_axes, packed, decode_fn, coordinates,
                        R: int, S: int, box_warp: float,
                        packed_corners: bool = False):
    """run_model for rays with EXACTLY z-aligned directions (d = (0,0,±1)).

    Along such rays x and y are bitwise constant, so the (x,y)-plane
    (plane 0 in both plane bases) resolves to ONE gather row per ray
    instead of one per sample — gathers are row-rate-bound on TPU, so this
    removes a third of the render's gather rows exactly (bit-equal output).
    Used by paste-front's occlusion render, whose force_rays are constructed
    +z (triplane.py _get_front_occlusion), and by pure-front-ortho batches.

    coordinates must be ray-major [N, R*S, 3]; packed planes only.
    """
    N = coordinates.shape[0]
    coords = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coords)        # [N,3,M,3]
    M = R * S

    # plane 0: per-ray points (sample 0 of each ray — identical across S)
    pts0 = proj[:, 0, :, :2].reshape(N, R, S, 2)[:, :, 0]  # [N,R,2]

    if packed_corners:
        # corner-weighted sample-major blocks; the decoder's tiled first
        # layer is invariant to plane-block order (every 4C block hits the
        # same tiled kernel), so plane 0's broadcast rows just concatenate
        s0 = grid_sample_2d_points_packed_scaled(
            packed[0::3], pts0, 1, scale=1.0 / 3.0
        )                                                  # [N,R,4C]
        C4 = s0.shape[-1]
        s0 = jnp.broadcast_to(
            s0[:, :, None, :], (N, R, S, C4)
        ).reshape(N, M, C4)
        s1 = grid_sample_2d_points_packed_scaled(
            packed[1::3], proj[:, 1, :, :2], 1, scale=1.0 / 3.0
        )
        s2 = grid_sample_2d_points_packed_scaled(
            packed[2::3], proj[:, 2, :, :2], 1, scale=1.0 / 3.0
        )
        feats = jnp.concatenate([s0, s1, s2], axis=-1)     # [N,M,3*4C]
        return decode_fn(feats, packed_corners=True)

    out0 = grid_sample_2d_points_packed(packed[0::3], pts0)  # [N,R,C]
    C = out0.shape[-1]
    out0 = jnp.broadcast_to(out0[:, :, None, :], (N, R, S, C)).reshape(N, M, C)

    # planes 1, 2: full per-sample gathers
    p12 = jnp.concatenate([packed[1::3], packed[2::3]], axis=0)  # [2N,...]
    pts12 = proj[:, 1:, :, :2].transpose(1, 0, 2, 3).reshape(2 * N, M, 2)
    out12 = grid_sample_2d_points_packed(p12, pts12)      # [2N,M,C]
    out12 = out12.reshape(2, N, M, C).transpose(1, 0, 2, 3)

    feats = jnp.concatenate([out0[:, None], out12], axis=1)  # [N,3,M,C]
    rgb, sigma = decode_fn(feats)
    return rgb, sigma


def render(
    planes: jax.Array,            # [N, 3, C*D, H, W]
    decode_fn: Callable,
    ray_origins: jax.Array,       # [N, R, 3]
    ray_directions: jax.Array,    # [N, R, 3]
    options: dict,
    key: Optional[jax.Array] = None,
    triplane_crop: Optional[float] = None,
    cull_clouds: Optional[float] = None,
    binarize_clouds: Optional[float] = None,
) -> RenderOutput:
    """Two-pass hierarchical render (renderer.py:162-264).

    ``options`` carries the reference rendering_kwargs: box_warp, ray_start,
    ray_end ('auto' supported), depth_resolution,
    depth_resolution_importance, white_back, use_triplane, triplane_depth,
    disparity_space_sampling. ``ray_chunk`` ('auto' default) bounds the
    ray-gather working set per device step: on TPU the gather throughput
    degrades superlinearly past ~10M gathered rows per call, so large
    batches are lax.map'ed over ray chunks (each ray is independent).
    """
    N = ray_origins.shape[0]
    R = ray_origins.shape[1]
    # 'rays'-axis mesh sharding (SURVEY.md §5 sequence-parallel analog):
    # rays are independent, so a NamedSharding over [N, R] partitions the
    # whole render across chips with zero collectives (the per-ray cumprod
    # and sort stay local). Auto-chunking is skipped — sharding already
    # bounds the per-device gather working set.
    # empty-space skipping: the occupancy grid depends only on the planes,
    # so it is computed ONCE here (hoisted out of the ray-chunk loop and
    # shared by the coarse and importance passes) and threaded through
    # options. Callers rendering several views from the SAME planes (paste
    # compositing, turntables) may pre-seed options['_ess_occ']. Computed
    # BEFORE the bf16 corner-pack below so every call path derives the
    # occupancy from the same raw fp32 planes.
    if options.get("ess") and "_ess_occ" not in options:
        options = dict(
            options,
            _ess_occ=ess_occupancy(
                generate_plane_axes(options.get("use_triplane", False)),
                planes, decode_fn, options["box_warp"], options,
                triplane_crop, cull_clouds, binarize_clouds, N,
            ),
        )
    # corner-pack the planes BEFORE any chunk split so the packed build is
    # hoisted out of the lax.map body (it is loop-invariant) and shared by
    # the coarse and importance passes. Disable with
    # rendering_kwargs['packed_gather']=False for bit-parity vs the
    # 4-corner-gather form.
    if (
        planes.ndim == 5
        and options.get("packed_gather", True)
        and options.get("triplane_depth", 1) == 1
    ):
        render_dtype_ = dict(float32=jnp.float32, bfloat16=jnp.bfloat16,
                             float64=jnp.float64)[
            options.get("render_dtype", "bfloat16")
        ]
        planes = pack_planes(planes.astype(render_dtype_))
    ray_sharding = options.get("ray_sharding")
    if ray_sharding is not None:
        ray_origins = jax.lax.with_sharding_constraint(ray_origins, ray_sharding)
        ray_directions = jax.lax.with_sharding_constraint(
            ray_directions, ray_sharding
        )
    ray_chunk = options.get("ray_chunk", "auto")
    if ray_chunk == "auto":
        ray_chunk = None if ray_sharding is not None else max(4096 // N, 256)
    if ray_chunk and R > ray_chunk and R % ray_chunk == 0:
        n_chunks = R // ray_chunk
        oc = ray_origins.reshape(N, n_chunks, ray_chunk, 3).transpose(1, 0, 2, 3)
        dc = ray_directions.reshape(N, n_chunks, ray_chunk, 3).transpose(1, 0, 2, 3)
        opts_inner = dict(options, ray_chunk=None)

        def run_chunk(i, oo, dd):
            k = jax.random.fold_in(key, i) if key is not None else None
            return render(
                planes, decode_fn, oo, dd, opts_inner, key=k,
                triplane_crop=triplane_crop, cull_clouds=cull_clouds,
                binarize_clouds=binarize_clouds,
            )

        # chunk 0 runs in the outer trace so flax submodules (the decoder)
        # create their variables OUTSIDE the scan (lax.map) body
        out0 = run_chunk(0, oc[0], dc[0])
        rest = jax.lax.map(
            lambda args: run_chunk(*args),
            (jnp.arange(1, n_chunks), oc[1:], dc[1:]),
        )  # leaves: [n_chunks-1, N, rc, ...]
        outs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), out0, rest
        )

        def merge(a):
            return a.transpose(1, 0, 2, 3).reshape(N, R, a.shape[-1])

        return RenderOutput(*(merge(a) for a in outs))
    plane_axes = generate_plane_axes(options.get("use_triplane", False))
    box_warp = options["box_warp"]
    tdepth = options.get("triplane_depth", 1)
    N = ray_origins.shape[0]
    R = ray_origins.shape[1]

    # TPU: the triplane gather is HBM-random-access bound; bf16 halves the
    # gathered bytes (the decoder MLP and compositing stay fp32). Set
    # rendering_kwargs['render_dtype']='float32' for bit-parity checks.
    render_dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16,
                        float64=jnp.float64)[
        options.get("render_dtype", "bfloat16")
    ]
    planes = planes.astype(render_dtype)

    k_strat = k_imp = None
    if key is not None:
        k_strat, k_imp = jax.random.split(key)

    if options["ray_start"] == options["ray_end"] == "auto":
        ray_start, ray_end, valid = get_ray_limits_box(
            ray_origins, ray_directions, box_side_length=box_warp
        )
        # invalid rays: start at min valid start, end at max valid start
        big = jnp.where(valid, ray_start, jnp.inf)
        small = jnp.where(valid, ray_start, -jnp.inf)
        ray_start = jnp.where(valid, ray_start, jnp.min(big))
        ray_end = jnp.where(valid, ray_end, jnp.max(small))
    else:
        ray_start, ray_end = options["ray_start"], options["ray_end"]

    if options.get("ess") and not options.get("disparity_space_sampling"):
        occ, occ_out = options["_ess_occ"]
        ray_start, ray_end = ess_narrow_intervals(
            occ, occ_out, ray_origins, ray_directions,
            ray_start, ray_end, box_warp, options,
        )

    depths_coarse = sample_stratified(
        ray_origins, ray_start, ray_end, options["depth_resolution"],
        key=k_strat,
        disparity_space_sampling=options.get("disparity_space_sampling", False),
    )
    S = depths_coarse.shape[2]

    z_aligned = (
        options.get("rays_z_aligned", False)
        and planes.ndim == 4
        and ray_sharding is None
    )

    # fused corner-dot decode: lerp + plane mean + decoder first layer in
    # one MXU dot (sample_from_planes_packed_scaled); opt-in by decoders
    # linear in the plane mean whose __call__ accepts packed_corners
    # (OSGDecoder). bf16 packed planes only — the fp32 path keeps the
    # reference-exact lerp->mean->dot order for parity runs.
    packed_corners = (
        planes.ndim == 4
        and planes.dtype == jnp.bfloat16
        and options.get("decoder_packed_corners", False)
    )

    def eval_pass(depths):
        n_samples = depths.shape[2]
        coords = (
            ray_origins[:, :, None, :] + depths * ray_directions[:, :, None, :]
        ).reshape(N, -1, 3)
        if z_aligned:
            rgb, sigma = run_model_z_aligned(
                plane_axes, planes, decode_fn, coords, R, n_samples, box_warp,
                packed_corners=packed_corners,
            )
        else:
            rgb, sigma = run_model(
                plane_axes, planes, decode_fn, coords, box_warp, tdepth,
                packed_corners=packed_corners,
            )
        sigma = _apply_density_filters(
            sigma, coords, box_warp, triplane_crop, cull_clouds, binarize_clouds
        )
        # colors travel at render_dtype through the sort-reorder; composite
        # math upcasts (ray_march)
        rgb = rgb.astype(render_dtype).reshape(N, R, n_samples, -1)
        sigma = sigma.reshape(N, R, n_samples, 1)
        xyz = coords.reshape(N, R, n_samples, 3)
        return rgb, sigma, xyz

    colors_coarse, densities_coarse, xyz_coarse = eval_pass(depths_coarse)

    n_imp = options["depth_resolution_importance"]
    if n_imp and n_imp > 0:
        _, _, weights = ray_march(
            colors_coarse, densities_coarse, depths_coarse,
            white_back=options.get("white_back", False),
        )
        depths_fine = sample_importance(depths_coarse, weights, n_imp, key=k_imp)
        colors_fine, densities_fine, xyz_fine = eval_pass(depths_fine)
        rgb_final, depth_final, wsum = merge_composite(
            depths_coarse, colors_coarse, densities_coarse, xyz_coarse,
            depths_fine, colors_fine, densities_fine, xyz_fine,
            white_back=options.get("white_back", False),
            flat_take=ray_sharding is None,
            # presorted (cross-count merge ranks instead of argsort) is
            # bit-identical but measured SLOWER on the chip (r4 bench:
            # 27.8 -> 19.7 sustained views/s — the sorted pack becomes a
            # narrow SCATTER, and TPU scatters lower worse than the
            # argsort+row-gather they replace), so it stays off
            presorted=False,
            # all-gather merge (no argsort, no scatter) — requires both
            # halves depth-sorted, true exactly when key=None (eval:
            # deterministic midpoints + monotone inverse-CDF importance)
            gathers_only=(
                options.get("merge_gathers_only", False) and k_imp is None
            ),
        )
        return RenderOutput(
            rgb=rgb_final[..., :-3],
            depth=depth_final,
            weights=wsum,
            xyz=rgb_final[..., -3:],
        )

    # no importance pass: the coarse samples are already depth-ordered
    colors_aug = jnp.concatenate([colors_coarse, xyz_coarse], axis=-1)
    rgb_final, depth_final, weights = ray_march(
        colors_aug, densities_coarse, depths_coarse,
        white_back=options.get("white_back", False),
    )
    return RenderOutput(
        rgb=rgb_final[..., :-3],
        depth=depth_final,
        weights=jnp.sum(weights, axis=2),
        xyz=rgb_final[..., -3:],
    )
