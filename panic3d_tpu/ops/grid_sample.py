"""Bilinear grid sampling (2D and 3D) as gather + lerp.

Role of ``torch.nn.functional.grid_sample`` as used by the reference's
triplane lookup (`src/training/volumetric_rendering/renderer.py:68-93`,
align_corners=False, padding 'zeros') and the paste-front compositor
(`src/training/triplane.py:555-563`, padding 'border'). This is THE hot
inner op of the volume renderer.

TPU layout note: gathers are performed on a channels-last [N, H*W, C]
matrix — each gathered element is a contiguous C-vector in the lane
dimension, which XLA lowers to an efficient row gather. Gathering along
the last axis instead (channels in sublanes) scalarizes on TPU and is
orders of magnitude slower.

Gradients w.r.t. both input and grid come from JAX autodiff, covering the
role of the reference's `grid_sample_gradfix.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    size = jnp.asarray(size, dtype=coord.dtype)
    if align_corners:
        return (coord + 1) / 2 * (size - 1)
    return ((coord + 1) * size - 1) / 2


def _bilinear_setup(gx, gy, H, W, align_corners):
    ix = _unnormalize(gx.astype(jnp.float32), W, align_corners)
    iy = _unnormalize(gy.astype(jnp.float32), H, align_corners)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1 = ix - ix0
    wy1 = iy - iy0
    return ix0.astype(jnp.int32), iy0.astype(jnp.int32), wx1, wy1


def grid_sample_2d_points(input, points, padding_mode="zeros",
                          align_corners=False):
    """Sample input [N,C,H,W] at points [N,P,2] (x,y in [-1,1]) -> [N,P,C].

    The batch dim is folded into a single global row index and gathered with
    one-axis jnp.take: on TPU this lowers ~3x faster than a batched
    take_along_axis (and is the only form where bf16 rows pay off).
    """
    assert padding_mode in ("zeros", "border")
    N, C, H, W = input.shape
    P = points.shape[1]
    flat = input.reshape(N, C, H * W).transpose(0, 2, 1).reshape(N * H * W, C)
    dtype = input.dtype

    ix0, iy0, wx1, wy1 = _bilinear_setup(
        points[..., 0], points[..., 1], H, W, align_corners
    )
    base = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None]

    def gather(iy, ix):
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1) + base
        vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(N, P, C)
        if padding_mode == "zeros":
            vals = jnp.where(valid[:, :, None], vals, 0)
        return vals

    wx1 = wx1[..., None].astype(dtype)
    wy1 = wy1[..., None].astype(dtype)
    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix0 + 1)
    v10 = gather(iy0 + 1, ix0)
    v11 = gather(iy0 + 1, ix0 + 1)
    top = v00 + (v01 - v00) * wx1
    bot = v10 + (v11 - v10) * wx1
    return top + (bot - top) * wy1


def pack_bilinear_2d(input):
    """Corner-pack a plane batch for single-row bilinear gathers.

    input [N,C,H,W] -> packed [N, H+1, W+1, 4C] where row (n,y,x) holds the
    2x2 footprint [v(y-1,x-1) | v(y-1,x) | v(y,x-1) | v(y,x)] of the
    zero-padded plane (i.e. packed row (by,bx) covers unpadded corners
    (by-1,bx-1)..(by,bx); base indices are clip(floor)+1).

    Why: TPU gathers are row-rate-bound — one 4C-lane row per point per
    plane replaces four C-lane corner gathers (4x fewer descriptors for
    the same bytes). With C=32 the packed row is exactly 128 lanes.
    """
    N, C, H, W = input.shape
    cl = jnp.pad(
        input.transpose(0, 2, 3, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )  # [N, H+2, W+2, C] zero ring
    return jnp.concatenate(
        [
            cl[:, 0 : H + 1, 0 : W + 1],
            cl[:, 0 : H + 1, 1 : W + 2],
            cl[:, 1 : H + 2, 0 : W + 1],
            cl[:, 1 : H + 2, 1 : W + 2],
        ],
        axis=-1,
    )  # [N, H+1, W+1, 4C]


def grid_sample_2d_points_packed(packed, points, align_corners=False):
    """Sample a pack_bilinear_2d output at points [N,P,2] -> [N,P,C].

    Zeros padding-mode semantics (the renderer's). One flat row gather
    per (point, plane): the padded zero ring makes border-straddling
    footprints exact; points whose footprint lies fully outside get all
    four weights masked to 0.
    """
    Np, Hp1, Wp1, C4 = packed.shape
    H, W, C = Hp1 - 1, Wp1 - 1, C4 // 4
    P = points.shape[1]
    dtype = packed.dtype
    flat = packed.reshape(Np * Hp1 * Wp1, C4)

    ix0, iy0, wx1, wy1 = _bilinear_setup(
        points[..., 0], points[..., 1], H, W, align_corners
    )
    inb = (ix0 >= -1) & (ix0 <= W - 1) & (iy0 >= -1) & (iy0 <= H - 1)
    bx = jnp.clip(ix0, -1, W - 1) + 1
    by = jnp.clip(iy0, -1, H - 1) + 1
    base = (jnp.arange(Np, dtype=jnp.int32) * (Hp1 * Wp1))[:, None]
    lin = base + by * Wp1 + bx
    rows = jnp.take(flat, lin.reshape(-1), axis=0)  # [Np*P, 4C]

    # corner reduction via 32-lane-aligned slices of the gathered row —
    # NOT a (..., 4, C) reshape: splitting the 128-lane minor dim forces a
    # physical relayout copy (measured ~4-5 ms/call per instance at the
    # flagship working set, 4 instances ≈ 17% of the eval forward;
    # scripts/profile_forward.py). Per-row scalar weights broadcast free
    # along lanes, so the whole reduction fuses into one VPU kernel.
    mask = inb.astype(jnp.float32)
    wx1f = wx1 * mask
    wx0f = (1 - wx1) * mask
    w00 = (wx0f * (1 - wy1)).reshape(-1, 1).astype(dtype)
    w01 = (wx1f * (1 - wy1)).reshape(-1, 1).astype(dtype)
    w10 = (wx0f * wy1).reshape(-1, 1).astype(dtype)
    w11 = (wx1f * wy1).reshape(-1, 1).astype(dtype)
    out = (rows[:, :C] * w00 + rows[:, C: 2 * C] * w01
           + rows[:, 2 * C: 3 * C] * w10 + rows[:, 3 * C:] * w11)
    return out.reshape(Np, P, C)


def grid_sample_2d_points_packed_scaled(packed, points, n_planes,
                                        scale=1.0, align_corners=False):
    """Packed gather, SAMPLE-major, corner weights pre-multiplied.

    Input as grid_sample_2d_points_packed, but the batch axis is treated as
    ``n_groups * n_planes`` plane-major plane stacks and the output is the
    raw 4C-lane rows of all planes of one sample laid out contiguously,
    each 32-lane corner block already multiplied by its bilinear weight
    (and ``scale``):

        out [n_groups, P, n_planes*4C],  out[..., (p*4+c)*C:(p*4+c+1)*C]
            = w_c(point, plane p) * scale * corner_c row of plane p

    Purpose: the corner lerp, the decoder's plane mean (fold 1/n_planes
    into ``scale``) and its first linear layer collapse into ONE MXU dot —
    ``out @ tile(W, (4*n_planes, 1))`` — so the lane-wasted [M, C]
    intermediate (C=32 occupies a quarter of a 128-lane vreg) is never
    written. Zeros padding-mode semantics (weights masked outside).
    """
    NP, Hp1, Wp1, C4 = packed.shape
    N = NP // n_planes
    H, W, C = Hp1 - 1, Wp1 - 1, C4 // 4
    P = points.shape[1]
    dtype = packed.dtype
    flat = packed.reshape(NP * Hp1 * Wp1, C4)

    ix0, iy0, wx1, wy1 = _bilinear_setup(
        points[..., 0], points[..., 1], H, W, align_corners
    )
    inb = (ix0 >= -1) & (ix0 <= W - 1) & (iy0 >= -1) & (iy0 <= H - 1)
    bx = jnp.clip(ix0, -1, W - 1) + 1
    by = jnp.clip(iy0, -1, H - 1) + 1
    base = (jnp.arange(NP, dtype=jnp.int32) * (Hp1 * Wp1))[:, None]
    lin = base + by * Wp1 + bx                      # [NP, P] plane-major
    # sample-major interleave (n, point, plane): the gathered block is then
    # a contiguous [N, P, n_planes*4C] view — no relayout of the wide rows
    lin = lin.reshape(N, n_planes, P).transpose(0, 2, 1)
    rows = jnp.take(flat, lin.reshape(-1), axis=0)  # [N*P*n_planes, 4C]
    rows = rows.reshape(N, P, n_planes * C4)

    mask = inb.astype(jnp.float32) * scale
    wx1f = wx1 * mask
    wx0f = (1 - wx1) * mask
    corner_w = [
        (wx0f * (1 - wy1)), (wx1f * (1 - wy1)), (wx0f * wy1), (wx1f * wy1),
    ]
    # [NP, P] -> [N, P, n_planes]; per-(sample, plane) scalars broadcast
    # free along the 32 corner lanes in the multiply below
    corner_w = [
        w.reshape(N, n_planes, P).transpose(0, 2, 1).astype(dtype)
        for w in corner_w
    ]
    # 32-lane-aligned slice multiplies (NOT a (..., 4, C) reshape — see
    # grid_sample_2d_points_packed); the concatenate is layout-only and
    # fuses with its elementwise producers
    scaled = jnp.concatenate(
        [
            rows[:, :, (p * 4 + c) * C:(p * 4 + c + 1) * C]
            * corner_w[c][:, :, p:p + 1]
            for p in range(n_planes)
            for c in range(4)
        ],
        axis=-1,
    )
    return scaled                                   # [N, P, n_planes*4C]


def grid_sample_2d_points_packed_border(packed, points, align_corners=False):
    """Border-padding sampling of a pack_bilinear_2d output -> [N,P,C].

    Border semantics via coordinate clamping: clipping the CONTINUOUS
    unnormalized coordinate to [0, size-1] before floor reproduces
    torch's border mode exactly (outside points collapse both corners of
    the straddled axis onto the edge texel with weight 1). The lerp uses
    the same association as grid_sample_2d_points, so results are
    bit-equal to the unpacked border path. One row gather per point
    instead of four — the paste-front compositor's 512^2 front-projection
    (triplane.py _sample_orthofront) is row-rate-bound like the renderer.
    """
    Np, Hp1, Wp1, C4 = packed.shape
    H, W, C = Hp1 - 1, Wp1 - 1, C4 // 4
    P = points.shape[1]
    dtype = packed.dtype
    flat = packed.reshape(Np * Hp1 * Wp1, C4)

    ix = _unnormalize(points[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(points[..., 1].astype(jnp.float32), H, align_corners)
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    ix0f = jnp.floor(ix)
    iy0f = jnp.floor(iy)
    wx1 = (ix - ix0f).reshape(-1, 1).astype(dtype)
    wy1 = (iy - iy0f).reshape(-1, 1).astype(dtype)
    bx = ix0f.astype(jnp.int32) + 1
    by = iy0f.astype(jnp.int32) + 1
    base = (jnp.arange(Np, dtype=jnp.int32) * (Hp1 * Wp1))[:, None]
    lin = base + by * Wp1 + bx
    rows = jnp.take(flat, lin.reshape(-1), axis=0)  # [Np*P, 4C]

    v00, v01 = rows[:, :C], rows[:, C: 2 * C]
    v10, v11 = rows[:, 2 * C: 3 * C], rows[:, 3 * C:]
    top = v00 + (v01 - v00) * wx1
    bot = v10 + (v11 - v10) * wx1
    return (top + (bot - top) * wy1).reshape(Np, P, C)


def grid_sample_2d(input, grid, padding_mode="zeros", align_corners=False):
    """torch-layout API: grid [N,Hg,Wg,2] -> [N,C,Hg,Wg]."""
    N, C, H, W = input.shape
    gshape = grid.shape[1:-1]
    out = grid_sample_2d_points(
        input, grid.reshape(N, -1, 2), padding_mode, align_corners
    )
    return out.transpose(0, 2, 1).reshape(N, C, *gshape)


def grid_sample_3d_points(input, points, padding_mode="zeros",
                          align_corners=False):
    """Sample input [N,C,D,H,W] at points [N,P,3] (x,y,z) -> [N,P,C]."""
    assert padding_mode in ("zeros", "border")
    N, C, D, H, W = input.shape
    P = points.shape[1]
    flat = (
        input.reshape(N, C, D * H * W).transpose(0, 2, 1).reshape(N * D * H * W, C)
    )
    dtype = input.dtype
    base = (jnp.arange(N, dtype=jnp.int32) * (D * H * W))[:, None]

    ix0, iy0, wx1, wy1 = _bilinear_setup(
        points[..., 0], points[..., 1], H, W, align_corners
    )
    iz = _unnormalize(points[..., 2].astype(jnp.float32), D, align_corners)
    iz0f = jnp.floor(iz)
    wz1 = (iz - iz0f)[..., None].astype(dtype)
    iz0 = iz0f.astype(jnp.int32)

    def gather(iz_, iy, ix):
        if padding_mode == "zeros":
            valid = (
                (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                & (iz_ >= 0) & (iz_ < D)
            )
        lin = (
            jnp.clip(iz_, 0, D - 1) * H + jnp.clip(iy, 0, H - 1)
        ) * W + jnp.clip(ix, 0, W - 1) + base
        vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(N, P, C)
        if padding_mode == "zeros":
            vals = jnp.where(valid[:, :, None], vals, 0)
        return vals

    wx1 = wx1[..., None].astype(dtype)
    wy1 = wy1[..., None].astype(dtype)
    out = 0
    for dz, wz in ((0, 1 - wz1), (1, wz1)):
        v00 = gather(iz0 + dz, iy0, ix0)
        v01 = gather(iz0 + dz, iy0, ix0 + 1)
        v10 = gather(iz0 + dz, iy0 + 1, ix0)
        v11 = gather(iz0 + dz, iy0 + 1, ix0 + 1)
        top = v00 + (v01 - v00) * wx1
        bot = v10 + (v11 - v10) * wx1
        out = out + (top + (bot - top) * wy1) * wz
    return out


def grid_sample_3d(input, grid, padding_mode="zeros", align_corners=False):
    """torch-layout API: grid [N,Dg,Hg,Wg,3] -> [N,C,Dg,Hg,Wg]."""
    N, C, D, H, W = input.shape
    gshape = grid.shape[1:-1]
    out = grid_sample_3d_points(
        input, grid.reshape(N, -1, 3), padding_mode, align_corners
    )
    return out.transpose(0, 2, 1).reshape(N, C, *gshape)
