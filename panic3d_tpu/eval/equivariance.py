"""Equivariance metrics EQ-T / EQ-T_frac / EQ-R (Alias-Free GAN).

Role of `src/metrics/equivariance.py` + registry entries
`metric_main.py:117-132` (eqt50k_int / eqt50k_frac / eqr50k): measure how
well a transform-capable synthesis network commutes with image-space
translation/rotation, as PSNR between the transformed render and the
render of the transformed input grid.

TPU design: unlike the reference (host `if`/tensor-slicing per random
shift, one CUDA launch chain per op), every operator here is static-shape
and fully traceable — shifts arrive as TRACED scalars, integer shifting is
roll+mask arithmetic, the fractional/rotation filters are computed inside
the graph — so the whole per-batch metric step jits ONCE and is reused for
all 50k samples. Filters ride the oracle-tested `ops.upfirdn2d` pack.

The metric applies to synthesis networks that accept a user-specified 3x3
input transform (the reference raises for others, equivariance.py:198-201;
`synthesis_fn(ws, transform) -> NCHW image` here).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import filter2d, upsample2d
from ..ops.grid_sample import grid_sample_2d


def sinc(x):
    y = jnp.abs(x * jnp.pi)
    z = jnp.sin(y) / jnp.clip(y, 1e-30, None)
    return jnp.where(y < 1e-30, jnp.ones_like(z), z)


def lanczos_window(x, a):
    x = jnp.abs(x) / a
    return jnp.where(x < 1, sinc(x), jnp.zeros_like(x))


def rotation_matrix(angle):
    angle = jnp.asarray(angle, jnp.float32)
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, s, zero]),
        jnp.stack([-s, c, zero]),
        jnp.stack([zero, zero, one]),
    ])


def _axis_mask(n, lo, hi, dtype):
    """[n] float mask of indices in [lo, hi) — lo/hi may be traced."""
    idx = jnp.arange(n)
    return ((idx >= lo) & (idx < hi)).astype(dtype)


def apply_integer_translation(x, tx, ty):
    """T_x operator (equivariance.py:46-60): shift by round(t*size) pixels.

    tx/ty are fractions of the image size and may be traced; the reference's
    data-dependent slicing becomes roll + index-arithmetic masks (the roll's
    wrapped rows/cols are always outside the mask)."""
    N, C, H, W = x.shape
    ix = jnp.round(jnp.asarray(tx, jnp.float32) * W).astype(jnp.int32)
    iy = jnp.round(jnp.asarray(ty, jnp.float32) * H).astype(jnp.int32)
    z = jnp.roll(x, (iy, ix), axis=(2, 3))
    m = (_axis_mask(H, iy, H + iy, x.dtype)[:, None]
         * _axis_mask(W, ix, W + ix, x.dtype)[None, :])
    m = jnp.broadcast_to(m, x.shape)
    return z * m, m


def apply_fractional_translation(x, tx, ty, a=3):
    """T_x with subpixel shifts (equivariance.py:66-99): separable windowed
    -sinc interpolation for the fractional part, integer roll for the rest.

    Derivation of the roll: the reference filters with pad [b, a] (width
    grows to W+b+a) then realigns so destination column d reads filtered
    column d + b - ix; mask validity is [i+a, size+i-b) per axis, which
    keeps every wrapped index out of frame."""
    N, C, H, W = x.shape
    tx = jnp.asarray(tx, jnp.float32) * W
    ty = jnp.asarray(ty, jnp.float32) * H
    ix = jnp.floor(tx).astype(jnp.int32)
    iy = jnp.floor(ty).astype(jnp.int32)
    fx = tx - ix
    fy = ty - iy
    b = a - 1

    taps = jnp.arange(a * 2, dtype=jnp.float32) - b
    fil_x = sinc(taps - fx) * sinc((taps - fx) / a)
    fil_y = sinc(taps - fy) * sinc((taps - fy) / a)
    y = filter2d(x, (fil_x / fil_x.sum())[None, :], padding=[b, a, 0, 0])
    y = filter2d(y, (fil_y / fil_y.sum())[:, None], padding=[0, 0, b, a])
    z = jnp.roll(y, (iy - b, ix - b), axis=(2, 3))[:, :, :H, :W]
    m = (_axis_mask(H, iy + a, H + iy - b, x.dtype)[:, None]
         * _axis_mask(W, ix + a, W + ix - b, x.dtype)[None, :])
    m = jnp.broadcast_to(m, x.shape)
    return z * m, m


def construct_affine_bandlimit_filter(mat, a=3, amax=16, aflt=64, up=4,
                                      cutoff_in=1, cutoff_out=1):
    """Oriented low-pass for an affine transform (equivariance.py:105-137):
    windowed convolution (via FFT) of input- and output-space sinc filters."""
    assert a <= amax < aflt
    mat = jnp.asarray(mat, jnp.float32)
    taps = jnp.roll(
        (jnp.arange(aflt * up * 2 - 1, dtype=jnp.float32) + 1) / up - aflt,
        1 - aflt * up,
    )
    yi, xi = jnp.meshgrid(taps, taps, indexing="ij")
    out = jnp.stack([xi, yi], axis=2) @ mat[:2, :2].T
    xo, yo = out[..., 0], out[..., 1]

    fi = sinc(xi * cutoff_in) * sinc(yi * cutoff_in)
    fo = sinc(xo * cutoff_out) * sinc(yo * cutoff_out)
    f = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(fi) * jnp.fft.fftn(fo)))

    wi = lanczos_window(xi, a) * lanczos_window(yi, a)
    wo = lanczos_window(xo, a) * lanczos_window(yo, a)
    w = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(wi) * jnp.fft.fftn(wo)))

    f = f * w
    c = (aflt - amax) * up
    f = jnp.roll(f, (aflt * up - 1, aflt * up - 1), axis=(0, 1))[c:-c, c:-c]
    f = jnp.pad(f, ((0, 1), (0, 1))).reshape(amax * 2, up, amax * 2, up)
    f = f / f.sum(axis=(0, 2), keepdims=True) / (up**2)
    return f.reshape(amax * 2 * up, amax * 2 * up)[:-1, :-1]


def _affine_grid(theta, N, H, W):
    """torch affine_grid(align_corners=False): half-pixel-centred base grid
    mapped by the 2x3 theta; -> [N, H, W, 2] xy in [-1, 1]."""
    xs = -1.0 + (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W
    ys = -1.0 + (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [H,W,3]
    return jnp.einsum("nij,hwj->nhwi", theta, base)


def _grid_sample_nearest(x, grid):
    """Nearest-neighbour grid sample, zeros padding, align_corners=False."""
    N, C, H, W = x.shape
    ix = jnp.round((grid[..., 0] + 1) * W / 2 - 0.5).astype(jnp.int32)
    iy = jnp.round((grid[..., 1] + 1) * H / 2 - 0.5).astype(jnp.int32)
    valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    out = jax.vmap(lambda img, yy, xx: img[:, yy, xx])(x, iyc, ixc)
    return out * valid[:, None].astype(x.dtype)


def apply_affine_transformation(x, mat, up=4, **filter_kwargs):
    """Bandlimited affine resampling (equivariance.py:143-171): filtered
    up-x4, bilinear resample on the transformed grid, border mask."""
    N, C, H, W = x.shape
    mat = jnp.asarray(mat, jnp.float32)
    f = construct_affine_bandlimit_filter(mat, up=up, **filter_kwargs)
    p = f.shape[0] // 2

    theta = jnp.linalg.inv(mat)
    theta = theta.at[:2, 2].multiply(2)
    theta = theta.at[0, 2].add(1 / up / W)
    theta = theta.at[1, 2].add(1 / up / H)
    theta = theta.at[0, :].multiply(W / (W + p / up * 2))
    theta = theta.at[1, :].multiply(H / (H + p / up * 2))
    theta = jnp.broadcast_to(theta[:2, :3][None], (N, 2, 3))
    g = _affine_grid(theta, N, H, W)

    y = upsample2d(x=x, f=f, up=up, padding=p)
    z = grid_sample_2d(y, g, padding_mode="zeros", align_corners=False)

    c = p * 2 + 1
    Hy, Wy = y.shape[2], y.shape[3]
    m = (_axis_mask(Hy, c, Hy - c, x.dtype)[:, None]
         * _axis_mask(Wy, c, Wy - c, x.dtype)[None, :])
    m = jnp.broadcast_to(m, (N, C, Hy, Wy))
    m = _grid_sample_nearest(m, g)
    return z, m


def apply_fractional_rotation(x, angle, a=3, **filter_kwargs):
    """R_alpha operator (equivariance.py:177-181)."""
    mat = rotation_matrix(jnp.asarray(angle, jnp.float32))
    return apply_affine_transformation(x, mat, a=a, amax=a * 2, **filter_kwargs)


def apply_fractional_pseudo_rotation(x, angle, a=3, **filter_kwargs):
    """R*_alpha (equivariance.py:187-195): rotation's frequency-content
    change without the rotation, for comparing against R_alpha renders."""
    mat = rotation_matrix(-jnp.asarray(angle, jnp.float32))
    f = construct_affine_bandlimit_filter(mat, a=a, amax=a * 2, up=1,
                                          **filter_kwargs)
    y = filter2d(x=x, f=f)
    c = f.shape[0] // 2
    N, C, H, W = y.shape
    m = (_axis_mask(H, c, H - c, x.dtype)[:, None]
         * _axis_mask(W, c, W - c, x.dtype)[None, :])
    return y, jnp.broadcast_to(m, y.shape)


# ---------------------------------------------------------------------------
# sampling loop (equivariance.py:206-277 compute_equivariance_metrics)

def compute_equivariance_metrics(
    synthesis_fn,
    ws_iter,
    num_samples: int,
    img_resolution: int,
    translate_max: float = 0.125,
    rotate_max: float = 1.0,
    compute_eqt_int: bool = False,
    compute_eqt_frac: bool = False,
    compute_eqr: bool = False,
    key=None,
):
    """-> PSNR (or tuple of PSNRs, metric order int/frac/rot).

    synthesis_fn(ws, transform[3,3]) -> NCHW image; the transform plays the
    role of `G.synthesis.input.transform` (a generator without one cannot
    support this metric — reference raises, equivariance.py:198-201).
    ws_iter yields latent batches."""
    assert compute_eqt_int or compute_eqt_frac or compute_eqr
    key = key if key is not None else jax.random.PRNGKey(0)
    I3 = jnp.eye(3)

    @jax.jit
    def step(ws, key):
        orig = synthesis_fn(ws, I3)
        s = []
        kt, kf, kr = jax.random.split(key, 3)
        if compute_eqt_int:
            t = (jax.random.uniform(kt, (2,)) * 2 - 1) * translate_max
            t = jnp.round(t * img_resolution) / img_resolution
            img = synthesis_fn(ws, I3.at[:2, 2].set(-t))
            ref, mask = apply_integer_translation(orig, t[0], t[1])
            s += [jnp.square(ref - img) * mask, mask]
        if compute_eqt_frac:
            t = (jax.random.uniform(kf, (2,)) * 2 - 1) * translate_max
            img = synthesis_fn(ws, I3.at[:2, 2].set(-t))
            ref, mask = apply_fractional_translation(orig, t[0], t[1])
            s += [jnp.square(ref - img) * mask, mask]
        if compute_eqr:
            angle = (jax.random.uniform(kr, ()) * 2 - 1) * (rotate_max * np.pi)
            img = synthesis_fn(ws, rotation_matrix(-angle))
            ref, ref_mask = apply_fractional_rotation(orig, angle)
            pseudo, pseudo_mask = apply_fractional_pseudo_rotation(img, angle)
            mask = ref_mask * pseudo_mask
            s += [jnp.square(ref - pseudo) * mask, mask]
        # per-batch fp32 reduction; the 50k-sample accumulation runs on the
        # host in fp64 below (reference sums everything in fp64 on device)
        return jnp.stack([v.sum() for v in s])

    sums = None
    done = 0
    while done < num_samples:
        ws = next(ws_iter)
        key, k = jax.random.split(key)
        s = np.asarray(step(ws, k), np.float64)
        sums = s if sums is None else sums + s
        done += int(np.asarray(ws).shape[0])
    mses = sums[0::2] / sums[1::2]
    psnrs = np.log10(2) * 20 - np.log10(mses) * 10
    return psnrs[0] if len(psnrs) == 1 else tuple(psnrs)
