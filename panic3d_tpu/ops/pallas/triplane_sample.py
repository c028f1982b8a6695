"""Pallas TPU kernel: fused triplane bilinear gather.

The flagship fusion target (SURVEY.md §7.4, BASELINE north star): the
volume renderer's hot inner op. XLA's gather lowering sustains only ~2 GB/s
of random row access on this hardware; this kernel keeps the three
(256², 32ch) feature planes resident in VMEM (bf16: 12.6 MB) and performs
the per-point corner reads as VMEM dynamic slices inside a fori_loop, with
corner weights (including zeros-padding masks) precomputed on the VPU side.

Interface matches renderer.sample_from_planes: planes [N,3,C,H,W] + world
coords -> [N,3,M,C] features (mean over planes happens in the decoder).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corner_data(points, H, W):
    """points [P,2] in [-1,1] (x,y) -> idx4 [P,4] int32 flat indices into
    [H*W] and w4 [P,4] f32 weights with zeros-padding folded in."""
    ix = ((points[:, 0] + 1) * W - 1) / 2
    iy = ((points[:, 1] + 1) * H - 1) / 2
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1 = (ix - ix0)
    wy1 = (iy - iy0)
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)

    idxs = []
    ws = []
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            x = ix0 + dx
            y = iy0 + dy
            valid = (x >= 0) & (x < W) & (y >= 0) & (y < H)
            lin = jnp.clip(y, 0, H - 1) * W + jnp.clip(x, 0, W - 1)
            idxs.append(lin)
            ws.append(jnp.where(valid, wx * wy, 0.0))
    return jnp.stack(idxs, axis=1), jnp.stack(ws, axis=1)


def _gather_kernel(idx_ref, w_ref, planes_ref, out_ref, *, block: int, C: int):
    """idx_ref [B,16] int32 (12 used), w_ref [B,16] f32, planes [3*H*W, C]."""

    def body(i, _):
        acc = jnp.zeros((1, C), dtype=jnp.float32)
        for c in range(12):
            row = planes_ref[pl.ds(idx_ref[i, c], 1), :].astype(jnp.float32)
            acc = acc + row * w_ref[i, c]
        out_ref[pl.ds(i, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, block, body, 0)


@functools.partial(jax.jit, static_argnames=("block",))
def triplane_gather_sum(planes, idx12, w12, block: int = 512):
    """Weighted sum of plane rows: out[p] = sum_c w12[p,c]*planes[idx12[p,c]].

    planes: [3*H*W, C] (plane offset folded into indices); idx12/w12:
    [P, 12]. Returns [P, C] f32 (= 3 x mean-ready plane features summed).
    """
    P, _ = idx12.shape
    C = planes.shape[-1]
    pad = (-P) % block
    idx12 = jnp.pad(idx12, ((0, pad), (0, 0)))
    w12 = jnp.pad(w12, ((0, pad), (0, 0)))
    # pad the index/weight lane dim to 16 for friendlier SMEM/VMEM tiling
    idx16 = jnp.pad(idx12, ((0, 0), (0, 4)))
    w16 = jnp.pad(w12, ((0, 0), (0, 4)))
    n_blocks = (P + pad) // block

    out = pl.pallas_call(
        functools.partial(_gather_kernel, block=block, C=C),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full planes resident
        ],
        out_specs=pl.BlockSpec((block, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P + pad, C), jnp.float32),
    )(idx16, w16, planes)
    return out[:P]


def sample_from_planes_pallas(plane_axes, plane_features, coordinates,
                              box_warp, block: int = 512):
    """Drop-in for renderer.sample_from_planes (triplane_depth=1 only).

    plane_features [N,3,C,H,W]; coordinates [N,M,3] -> [N,3,M,C].
    """
    from ...models.volumetric.renderer import project_onto_planes

    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    coords = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coords)[..., :2]  # [N,3,M,2]

    outs = []
    for n in range(N):  # N is tiny (1-4 views per call)
        pts = proj[n].reshape(n_planes * M, 2)
        idx4, w4 = _corner_data(pts, H, W)  # [3M,4]
        # fold plane offset into indices
        offs = jnp.repeat(jnp.arange(n_planes, dtype=jnp.int32) * (H * W), M)
        idx4 = idx4 + offs[:, None]
        # reshape to [M, 12]: each output point gathers 4 corners x 3 planes?
        # NO - output here is per (plane, point): keep [3M, 4] but kernel
        # wants 12 lanes; pack 4 corners + zero-pad
        idx12 = jnp.pad(idx4, ((0, 0), (0, 8)))
        w12 = jnp.pad(w4, ((0, 0), (0, 8)))
        flat_planes = plane_features[n].transpose(0, 2, 3, 1).reshape(
            n_planes * H * W, C
        )
        feats = triplane_gather_sum(flat_planes, idx12, w12, block=block)
        outs.append(feats.reshape(n_planes, M, C))
    return jnp.stack(outs)
