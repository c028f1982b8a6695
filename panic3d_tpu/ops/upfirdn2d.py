"""Fused upsample → FIR filter → downsample, TPU-native.

Role of the reference CUDA op pack `src/torch_utils/ops/upfirdn2d.{cpp,cu,py}`
(semantics defined by `_upfirdn2d_ref`, upfirdn2d.py:169-213). Instead of a
hand-written kernel, the whole pipeline (zero-insert upsample, pad/crop, FIR
correlate, decimate) is expressed as a single depthwise
``lax.conv_general_dilated`` call: ``lhs_dilation`` performs the zero
insertion, the conv padding performs pad/crop (negative padding = crop), and
``window_strides`` performs the decimation. XLA maps this onto the TPU
convolution units and fuses surrounding elementwise ops, so no Pallas kernel
is needed for this op.

Layout is NCHW to match the reference API; XLA's layout assignment picks the
TPU-friendly physical layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def _get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    return int(f.shape[-1]), int(f.shape[0])


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a FIR filter for :func:`upfirdn2d`.

    Mirrors reference `upfirdn2d.setup_filter` (upfirdn2d.py:73-119): 1D taps
    with fewer than 8 elements become a 2D outer-product filter; normalize to
    unit DC gain.
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[None]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_fir(x, f2d, up, down, pad, channels):
    """One depthwise conv doing zero-insert upsample + pad/crop + FIR + decimate.

    ``lhs_dilation`` yields size (H-1)*up+1 (no trailing zeros), while the
    reference zero-insert yields H*up; the (up-1) missing trailing zeros are
    folded into the trailing pad so outputs match element-for-element.
    """
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = pad
    kernel = jnp.broadcast_to(
        f2d[None, None], (channels, 1) + f2d.shape
    ).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((py0, py1 + upy - 1), (px0, px1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=channels,
        precision=jax.lax.Precision.HIGHEST,
    )


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Pad, upsample, FIR-filter, and downsample a batch of NCHW images.

    Numerics match the reference `_upfirdn2d_ref` (upfirdn2d.py:169-213):
    zero-insert upsample by ``up``, zero-pad/crop by ``padding`` (w.r.t. the
    upsampled image), correlate with ``f`` (flipped unless ``flip_filter``),
    keep every ``down``-th pixel. Fully differentiable via XLA.
    """
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.ndim in (1, 2)
    batch, channels, in_h, in_w = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    if f.ndim == 1:
        # Separable: horizontal then vertical pass.
        x = _depthwise_fir(
            x, f[None, :], (upx, 1), (downx, 1), (px0, px1, 0, 0), channels
        )
        x = _depthwise_fir(
            x, f[:, None], (1, upy), (1, downy), (0, 0, py0, py1), channels
        )
        return x
    return _depthwise_fir(
        x, f, (upx, upy), (downx, downy), (px0, px1, py0, py1), channels
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """FIR-filter without scaling (reference upfirdn2d.py:255+)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + fw // 2,
        px1 + (fw - 1) // 2,
        py0 + fh // 2,
        py1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Filtered 2x upsample (reference upfirdn2d.py:315-351)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Filtered 2x downsample (reference upfirdn2d.py:355-391)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
