"""Factorized axis-aligned lattice decode + front-occlusion volume.

TPU-native addition (no reference counterpart). The reference evaluates
regular lattices point-by-point through grid_sample gathers — e.g. the
256³ eval volume (`_util/eg3d_metrics3d.py:60-99`) and paste-front's
occlusion re-render (`_train/eg3dc/src/training/triplane.py:565-577`),
which both reduce to per-point triplane lookups. On TPU, gathers are
row-rate-bound (~2.5 ns/row, PARITY.md "Gather roofline"), so a G³ lattice
pays 3·G³ gather rows the MXU never sees.

But an axis-aligned lattice factorizes exactly: each triplane is a function
of two world axes, so resampling it onto the lattice needs only two small
1-D bilinear resample matrices (two dense matmuls on the MXU, zero
gathers), and the per-point triplane feature is the broadcast sum

    feat[i,j,k] = (F_xy[i,j] + F_xz[i,k] + F_yz[j,k]) / 3

which XLA fuses into the decoder's first matmul. When the lattice
resolution equals the plane resolution (cell centers == texel centers under
the align_corners=False convention), the resample matrices are identity
one-hots and the decoder sees the exact plane values the gather path sees
(outputs agree to fp32 ulp; tests/test_lattice.py).

Consumers:
- `ess_occupancy` (renderer.py): supersampled conservative occupancy;
- `front_occlusion_volume` + `sample_front_occlusion`: replaces
  paste-front's per-view occlusion re-render (a full 48+48 hierarchical
  render, ~44 ms/call of the r4 eval forward — scripts/profile_forward.py)
  with one per-portrait suffix-integrated opacity volume.

NOT a consumer: eval/volume.py's 256³ mesh decode. Its lattice replicates
the reference's float-division shear (x/y drift with the z index,
eg3d_metrics3d.py:70-92) because reference meshes bake it in at the F1@5
threshold scale — a sheared lattice is not a product grid, so the
factorization does not apply there.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grid_sample import grid_sample_3d_points


def resample_matrix_1d(norm_coords: np.ndarray, size: int) -> np.ndarray:
    """Dense [G, size] bilinear resample matrix at normalized coords.

    Row g holds the bilinear weights that grid_sample (align_corners=False,
    zeros padding) would use to sample a length-`size` signal at
    norm_coords[g] ∈ [-1, 1]: weight (1-w) at floor texel, w at the next,
    taps outside [0, size) dropped (== zero padding). Built in float64 and
    cast so the weights are exact for power-of-two grids.
    """
    p = ((norm_coords.astype(np.float64) + 1.0) * size - 1.0) / 2.0
    p0 = np.floor(p)
    w1 = p - p0
    cols = np.arange(size, dtype=np.int64)[None, :]
    m = (
        (cols == p0[:, None]) * (1.0 - w1[:, None])
        + (cols == (p0[:, None] + 1)) * w1[:, None]
    )
    return m.astype(np.float32)


def plane_axis_map(plane_axes: np.ndarray):
    """Which world axis feeds each plane's local (u, v), with sign.

    Returns [((axis_u, sign_u), (axis_v, sign_v)), ...] per plane. Requires
    every plane basis to be a signed permutation (true for both EG3D plane
    bases — renderer.generate_plane_axes); asserts otherwise.
    """
    inv = np.linalg.inv(plane_axes)  # [P,3,3]
    out = []
    for p in range(inv.shape[0]):
        axes = []
        for d in range(2):  # u, v
            col = inv[p][:, d]
            nz = np.nonzero(np.abs(col) > 1e-8)[0]
            assert len(nz) == 1, (
                "factorized lattice decode requires axis-aligned plane bases"
            )
            axes.append((int(nz[0]), float(col[nz[0]])))
        out.append(axes)
    return out


def lattice_axis_coords(grid, box_warp: float):
    """Per-axis world coords of lattice CELL CENTERS: [(Gx,), (Gy,), (Gz,)].

    Cell g center = (g+0.5)/G * bw - bw/2 — under align_corners=False these
    coincide with plane texel centers when G equals the plane resolution.
    """
    bw = float(box_warp)
    return [
        (np.arange(g, dtype=np.float64) + 0.5) / g * bw - bw / 2
        for g in grid
    ]


def _plane_lattice_features(planes, plane_axes, axis_coords, box_warp):
    """Resample each plane onto its two lattice axes. Zero gathers.

    planes [N,3,C,H,W] raw; returns list of (F [N,Ga,Gb,C], axis_a, axis_b)
    with axis_a < axis_b in world-axis order.
    """
    amap = plane_axis_map(plane_axes)
    inv_half = 2.0 / float(box_warp)
    out = []
    for p, ((au, su), (av, sv)) in enumerate(amap):
        H, W = planes.shape[-2:]
        Su = jnp.asarray(resample_matrix_1d(
            np.asarray(axis_coords[au]) * su * inv_half, W))   # u indexes W
        Sv = jnp.asarray(resample_matrix_1d(
            np.asarray(axis_coords[av]) * sv * inv_half, H))   # v indexes H
        # F[n, a_u, a_v, c] = sum_{h,w} plane[n,c,h,w] Sv[a_v,h] Su[a_u,w]
        F = jnp.einsum(
            "nchw,vh,uw->nuvc", planes[:, p].astype(jnp.float32), Sv, Su
        )
        if au < av:
            out.append((F, au, av))
        else:
            out.append((jnp.swapaxes(F, 1, 2), av, au))
    return out


def _broadcast_term(F, aa, ab):
    """Place F [N,Ga,Gb,C] on lattice axes (aa < ab) of [N,Gx,Gy,Gz,C]."""
    missing = 3 - aa - ab  # the world axis F does not depend on
    return jnp.expand_dims(F, axis=1 + missing)


def decode_lattice(
    planes: jax.Array,            # [N, 3, C, H, W] raw (not packed)
    decode_fn: Callable,          # feats [N,P,M,C] -> (rgb, sigma)
    box_warp: float,
    grid: Tuple[int, int, int],
    use_triplane: bool = False,
    chunk_points: int = 2 ** 21,
    with_rgb: bool = False,
    plane_reduce: str = "stack",
):
    """Decode (sigma[, rgb]) on a Gx×Gy×Gz cell-center lattice, gather-free.

    Output-identical to run_model() on the same lattice points (bit-equal
    when grid == plane resolution; tests/test_lattice.py). sigma is
    returned [N,Gx,Gy,Gz]; rgb (optional) [N,Gx,Gy,Gz,Cr].

    plane_reduce:
      'stack' (default, general) — decode_fn receives the standard stacked
        per-plane features [N,3,M,C], valid for ANY decoder.
      'mean' — the plane MEAN is taken here, fused into the broadcast-add
        of the three axis-factorized terms, and decode_fn receives it as a
        stacked [N,1,M,C] (its mean over the size-1 plane axis is the
        identity). Valid ONLY for decoders linear in the plane axis (a
        mean) — true of OSGDecoder (triplane.py:516-548) and any
        EG3D-style decoder; production call sites opt in. Stacking the
        three G³-sized broadcast terms instead measures 2×~9 ms/call of
        pure reshape/copy at the 128·128·256 occlusion grid (xprof r5) —
        the pre-mean form writes ONE M×C block per chunk.
    Chunked over z so per-chunk feature blocks stay under ~chunk_points
    rows.
    """
    assert plane_reduce in ("stack", "mean"), plane_reduce
    from .renderer import generate_plane_axes  # local: avoid import cycle

    assert planes.ndim == 5, "decode_lattice needs raw [N,3,C,H,W] planes"
    N = planes.shape[0]
    Gx, Gy, Gz = grid
    plane_axes = generate_plane_axes(use_triplane)
    axis_coords = lattice_axis_coords(grid, box_warp)
    terms = [
        _broadcast_term(F, aa, ab)
        for (F, aa, ab) in _plane_lattice_features(
            planes, plane_axes, axis_coords, box_warp
        )
    ]

    # z-chunking: slice every term that has extent along world axis 2
    cz = max(1, min(Gz, chunk_points // max(1, Gx * Gy)))
    n_chunks = (Gz + cz - 1) // cz

    sig_chunks, rgb_chunks = [], []
    for ci in range(n_chunks):
        k0, k1 = ci * cz, min((ci + 1) * cz, Gz)
        ck = k1 - k0
        parts = [
            t if t.shape[3] == 1 else t[:, :, :, k0:k1] for t in terms
        ]
        M = Gx * Gy * ck
        C = parts[0].shape[-1]
        if plane_reduce == "mean":
            # broadcast-add + mean in one fused expression: the only
            # M×C-sized write is the meaned feature block itself
            feat = sum(parts[1:], parts[0]) / len(parts)  # [N,Gx,Gy,ck,C]
            feat = feat.reshape(N, 1, M, C)
        else:
            feat = jnp.stack(
                [
                    jnp.broadcast_to(p, (N, Gx, Gy, ck, C)).reshape(N, M, C)
                    for p in parts
                ],
                axis=1,
            )                                           # [N,3,M,C]
        rgb, sigma = decode_fn(feat)
        sig_chunks.append(sigma.reshape(N, Gx, Gy, k1 - k0))
        if with_rgb:
            rgb_chunks.append(
                rgb.reshape(N, Gx, Gy, k1 - k0, rgb.shape[-1])
            )
    sigma = (
        sig_chunks[0] if n_chunks == 1
        else jnp.concatenate(sig_chunks, axis=3)
    )
    if with_rgb:
        rgb = (
            rgb_chunks[0] if n_chunks == 1
            else jnp.concatenate(rgb_chunks, axis=3)
        )
        return sigma, rgb
    return sigma


def lattice_world_coords(grid, box_warp: float) -> jax.Array:
    """[Gx,Gy,Gz,3] world coords of the cell centers (for density filters)."""
    ax = lattice_axis_coords(grid, box_warp)
    X, Y, Z = jnp.meshgrid(
        jnp.asarray(ax[0], jnp.float32),
        jnp.asarray(ax[1], jnp.float32),
        jnp.asarray(ax[2], jnp.float32),
        indexing="ij",
    )
    return jnp.stack([X, Y, Z], axis=-1)


def front_occlusion_volume(
    planes: jax.Array,            # [N, 3, C, H, W] raw
    decode_fn: Callable,
    box_warp: float,
    options: dict,
    triplane_crop=None,
    cull_clouds=None,
    binarize_clouds=None,
    grid: Tuple[int, int, int] = (128, 128, 256),
    plane_reduce: str = "stack",
):
    """Per-portrait +z opacity integral volume for paste-front occlusion.

    Replaces `_get_front_occlusion`'s per-view re-render (a second full
    hierarchical render whose rays are all exactly +z —
    reference triplane.py:565-577): along +z the integral
    ∫ density dz at fixed (x,y) is shared by every view, so it is computed
    ONCE per set of planes as a suffix cumsum over a fine lattice and each
    view just interpolates it.

    Returns dict:
      A        [N,Gx,Gy,Gz]  ∫_{z_k}^{bw/2} density dz at cell centers
                             (suffix integral, cell-center one-sided)
      density0 [N]           filtered zero-feature density outside the box
      grid, box_warp         metadata for sample_front_occlusion
    """
    from .renderer import (
        _apply_density_filters, zero_feature_density,
    )

    N = planes.shape[0]
    Gx, Gy, Gz = grid
    bw = float(box_warp)
    sigma = decode_lattice(
        planes, decode_fn, bw, grid,
        use_triplane=options.get("use_triplane", False),
        plane_reduce=plane_reduce,
    )                                                   # [N,Gx,Gy,Gz]
    xyz = lattice_world_coords(grid, bw)                # [Gx,Gy,Gz,3]
    sigma = _apply_density_filters(
        sigma.reshape(N, -1, 1),
        jnp.broadcast_to(xyz.reshape(1, -1, 3), (N, Gx * Gy * Gz, 3)),
        bw, triplane_crop, cull_clouds, binarize_clouds,
    ).reshape(N, Gx, Gy, Gz)
    density = jax.nn.softplus(sigma.astype(jnp.float32) - 1)

    dz = bw / Gz
    # suffix integral at cell centers: own cell contributes a half step
    # (piecewise-constant density, center -> cell top), cells above a full
    # step. flip-cumsum-flip keeps the op a plain cumulative sum.
    suffix = jnp.flip(jnp.cumsum(jnp.flip(density, axis=3), axis=3), axis=3)
    A = (suffix - 0.5 * density) * dz                   # [N,Gx,Gy,Gz]

    density0 = zero_feature_density(
        planes, decode_fn, cull_clouds, binarize_clouds
    )                                                   # scalar (broadcasts)
    return {
        "A": jax.lax.stop_gradient(A),
        "density0": jax.lax.stop_gradient(density0),
        "grid": grid,
        "box_warp": bw,
    }


def sample_front_occlusion(
    vol: dict,
    points: jax.Array,            # [N, M, 3] plane-space surface points
    offset: float,
    seg_len: float,
):
    """Occlusion (accumulated alpha toward +z) at each surface point.

    Mirrors what `_get_front_occlusion`'s re-render returns in
    image_weights: total opacity of the segment [p_z + offset,
    p_z + offset + seg_len] along +z at (p_x, p_y). The suffix integral A
    is interpolated (A is smooth; exp is applied after interpolation), the
    out-of-box remainder of the segment accumulates the constant
    zero-feature density. Returns [N, M, 1] in [0, 1].
    """
    A = vol["A"]
    N, Gx, Gy, Gz = A.shape
    bw = vol["box_warp"]
    d0 = jnp.broadcast_to(jnp.asarray(vol["density0"]), (N,))

    z0 = points[..., 2] + offset                         # [N,M]
    z_hi = bw / 2
    # interpolate A at (x, y, z0): border clamp keeps the lattice value at
    # the box faces; align_corners=False cell centers match
    # lattice_axis_coords exactly. Volume layout [N, C=1, D=Gx, H=Gy,
    # W=Gz], and grid_sample_3d_points maps pts (0,1,2) -> (W,H,D), so the
    # query order is (z, y, x).
    feats = A[:, None]                                   # [N,1,Gx,Gy,Gz]
    pts = jnp.stack(
        [z0, points[..., 1], points[..., 0]], axis=-1
    ) * (2.0 / bw)
    A_p = grid_sample_3d_points(feats, pts, padding_mode="border")[..., 0]

    inside_xy = (
        (jnp.abs(points[..., 0]) <= bw / 2)
        & (jnp.abs(points[..., 1]) <= bw / 2)
    )
    seg_end = z0 + seg_len
    # zero-feature spans: below the box (z0 < -bw/2) and above it
    # (seg_end > bw/2); both carry density0
    len_below = jnp.clip(-bw / 2 - z0, 0.0, seg_len)
    len_above = jnp.clip(seg_end - z_hi, 0.0, seg_len)
    A_total = jnp.where(
        inside_xy,
        A_p + d0[:, None] * (len_below + len_above),
        d0[:, None] * seg_len,
    )
    # a segment ending inside the box under-integrates vs the render only
    # when seg_len < box span — flagship seg_len (ray_end - ray_start = 1.0)
    # always exits the 0.7 box, so no correction term is carried.
    return (1.0 - jnp.exp(-A_total))[..., None]
