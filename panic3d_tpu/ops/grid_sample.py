"""Bilinear grid sampling (2D and 3D) as gather + lerp.

Role of ``torch.nn.functional.grid_sample`` as used by the reference's
triplane lookup (`src/training/volumetric_rendering/renderer.py:68-93`,
align_corners=False, padding 'zeros') and the paste-front compositor
(`src/training/triplane.py:555-563`, padding 'border'). This is THE hot
inner op of the volume renderer; this jnp version is the reference
implementation and the correctness oracle for the fused Pallas render kernel
(ops/pallas/). XLA lowers the gathers to TPU dynamic-gather; the lerp fuses.

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


def _gather_2d(flat, iy, ix, H, W, padding_mode):
    """flat: [N, C, H*W]; iy/ix: int32 [N, P] -> [N, C, P]."""
    if padding_mode == "zeros":
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    lin = iyc * W + ixc
    vals = jnp.take_along_axis(flat, lin[:, None, :], axis=2)
    if padding_mode == "zeros":
        vals = jnp.where(valid[:, None, :], vals, 0)
    return vals


def grid_sample_2d(input, grid, padding_mode="zeros", align_corners=False):
    """Bilinear sample: input [N,C,H,W], grid [N,Hg,Wg,2] (x,y in [-1,1]).

    Returns [N,C,Hg,Wg]. Matches torch grid_sample semantics.
    """
    assert padding_mode in ("zeros", "border")
    N, C, H, W = input.shape
    gshape = grid.shape[1:-1]
    grid = grid.reshape(N, -1, 2)
    compute_dtype = input.dtype

    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1 = (ix - ix0).astype(compute_dtype)
    wy1 = (iy - iy0).astype(compute_dtype)
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    flat = input.reshape(N, C, H * W)
    v00 = _gather_2d(flat, iy0, ix0, H, W, padding_mode)
    v01 = _gather_2d(flat, iy0, ix1, H, W, padding_mode)
    v10 = _gather_2d(flat, iy1, ix0, H, W, padding_mode)
    v11 = _gather_2d(flat, iy1, ix1, H, W, padding_mode)

    wx1 = wx1[:, None, :]
    wy1 = wy1[:, None, :]
    out = (
        v00 * (1 - wy1) * (1 - wx1)
        + v01 * (1 - wy1) * wx1
        + v10 * wy1 * (1 - wx1)
        + v11 * wy1 * wx1
    )
    return out.reshape(N, C, *gshape)


def _gather_3d(flat, iz, iy, ix, D, H, W, padding_mode):
    if padding_mode == "zeros":
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    izc = jnp.clip(iz, 0, D - 1)
    lin = (izc * H + iyc) * W + ixc
    vals = jnp.take_along_axis(flat, lin[:, None, :], axis=2)
    if padding_mode == "zeros":
        vals = jnp.where(valid[:, None, :], vals, 0)
    return vals


def grid_sample_3d(input, grid, padding_mode="zeros", align_corners=False):
    """Trilinear sample: input [N,C,D,H,W], grid [N,Dg,Hg,Wg,3] (x,y,z).

    x indexes W, y indexes H, z indexes D (torch convention). Used for the
    reference's triplane_depth>1 "multiplane" variant (renderer.py:82-93).
    """
    assert padding_mode in ("zeros", "border")
    N, C, D, H, W = input.shape
    gshape = grid.shape[1:-1]
    grid = grid.reshape(N, -1, 3)
    compute_dtype = input.dtype

    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    iz = _unnormalize(grid[..., 2].astype(jnp.float32), D, align_corners)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    iz0 = jnp.floor(iz)
    wx1 = (ix - ix0).astype(compute_dtype)[:, None, :]
    wy1 = (iy - iy0).astype(compute_dtype)[:, None, :]
    wz1 = (iz - iz0).astype(compute_dtype)[:, None, :]
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    iz0 = iz0.astype(jnp.int32)

    flat = input.reshape(N, C, D * H * W)
    out = 0
    for dz, wz in ((0, 1 - wz1), (1, wz1)):
        for dy, wy in ((0, 1 - wy1), (1, wy1)):
            for dx, wx in ((0, 1 - wx1), (1, wx1)):
                v = _gather_3d(
                    flat, iz0 + dz, iy0 + dy, ix0 + dx, D, H, W, padding_mode
                )
                out = out + v * (wz * wy * wx)
    return out.reshape(N, C, *gshape)
