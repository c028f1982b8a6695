"""Fused upsample → FIR filter → downsample, TPU-native.

Role of the reference CUDA op pack `src/torch_utils/ops/upfirdn2d.{cpp,cu,py}`
(semantics defined by `_upfirdn2d_ref`, upfirdn2d.py:169-213). Instead of a
hand-written kernel, the whole pipeline (zero-insert upsample, pad/crop, FIR
correlate, decimate) is lowered per case (measured dispatch, see
``_depthwise_fir``): resampling uses one depthwise
``lax.conv_general_dilated`` (``lhs_dilation`` zero-inserts, conv padding
pads/crops — negative padding = crop — and ``window_strides`` decimates);
pure small-filter blurs use an unrolled shifted-slice sum that XLA fuses
into a single VPU kernel. No Pallas kernel is needed for this op.

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


# Per-call unroll budget for the slice-based paths (taps_h * taps_w terms).
# StyleGAN2/EG3D filters are 4-tap separable (16 terms as outer products);
# StyleGAN3's long Kaiser filters exceed this and take the conv fallback.
_MAX_UNROLL_TERMS = 64

# bench override: None = auto dispatch, or one of "conv"/"unroll"/"poly"
# (scripts/bench_upfirdn.py flips this to compare lowerings in isolation)
FORCE_IMPL = None


def _fir_conv(x, f2d, up, down, pad, channels):
    """Depthwise ``conv_general_dilated``: ``lhs_dilation`` zero-inserts,
    conv padding pads/crops, ``window_strides`` decimates. One channel per
    group — a poor MXU contraction, kept for long filters only."""
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


def _fir_unrolled(x, f2d, up, down, pad):
    """Unrolled sum of shifted (strided for down>1) slices over the
    zero-inserted grid — pure VPU work XLA fuses into one kernel.
    fp32 accumulation to match the conv path's HIGHEST precision."""
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = pad
    fh, fw = int(f2d.shape[0]), int(f2d.shape[1])
    n, c, h, w = x.shape
    # zero-insert upsample to exactly H*up (incl. trailing zeros, like the
    # reference's zero-insert; the conv path folds them into pad instead)
    if upy > 1 or upx > 1:
        x = x[:, :, :, None, :, None]
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (0, upy - 1), (0, 0), (0, upx - 1))
        )
        x = x.reshape(n, c, h * upy, w * upx)
    # pad (positive) / crop (negative) on the upsampled grid
    x = jnp.pad(
        x,
        ((0, 0), (0, 0), (max(py0, 0), max(py1, 0)),
         (max(px0, 0), max(px1, 0))),
    )
    x = x[
        :, :,
        max(-py0, 0): x.shape[2] - max(-py1, 0),
        max(-px0, 0): x.shape[3] - max(-px1, 0),
    ]
    hp, wp = x.shape[2], x.shape[3]
    oh = (hp - fh) // downy + 1
    ow = (wp - fw) // downx + 1
    f32 = f2d.astype(jnp.float32)
    acc = None
    for a in range(fh):
        for b in range(fw):
            sl = x[
                :, :,
                a: a + (oh - 1) * downy + 1: downy,
                b: b + (ow - 1) * downx + 1: downx,
            ].astype(jnp.float32)
            term = f32[a, b] * sl
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def _fir_poly_up(x, f2d, up, pad):
    """Polyphase upsampling FIR (down == 1): each of the up_y*up_x output
    phases is a plain contiguous slice multiply-add over the ORIGINAL grid
    (no zero-inserted intermediate, no strided lane access), interleaved
    once at the end by a stack+reshape. fp32 accumulation."""
    upx, upy = up
    px0, px1, py0, py1 = pad
    fh, fw = int(f2d.shape[0]), int(f2d.shape[1])
    n, c, h, w = x.shape
    oh = h * upy + py0 + py1 - fh + 1
    ow = w * upx + px0 + px1 - fw + 1
    my = -(-oh // upy)  # per-phase output length (ceil)
    mx = -(-ow // upx)

    def phase_info(r, u, p0, k):
        # taps of output phase r: f[k0], f[k0+u], ...; source offset s
        k0 = (p0 - r) % u
        nj = max(0, -(-(k - k0) // u))
        s = (r + k0 - p0) // u
        return k0, nj, s

    ys = [phase_info(r, upy, py0, fh) for r in range(upy)]
    xs = [phase_info(r, upx, px0, fw) for r in range(upx)]
    # one shared pad of x covering every phase's source index range
    ly = max(max(0, -s) for _, nj, s in ys)
    lx = max(max(0, -s) for _, nj, s in xs)
    ry_pad = max(max(0, (my - 1) + (nj - 1) + s - (h - 1)) if nj else 0
                 for _, nj, s in ys)
    rx_pad = max(max(0, (mx - 1) + (nj - 1) + s - (w - 1)) if nj else 0
                 for _, nj, s in xs)
    xp = jnp.pad(x, ((0, 0), (0, 0), (ly, ry_pad), (lx, rx_pad)))
    f32 = f2d.astype(jnp.float32)

    rows = []
    for k0y, njy, sy in ys:
        row = []
        for k0x, njx, sx in xs:
            acc = None
            for j in range(njy):
                for i in range(njx):
                    a = ly + sy + j
                    b = lx + sx + i
                    sl = xp[:, :, a: a + my, b: b + mx].astype(jnp.float32)
                    term = f32[k0y + upy * j, k0x + upx * i] * sl
                    acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros((n, c, my, mx), jnp.float32)
            row.append(acc)
        # phases along a new minor axis -> (n, c, my, mx, upx)
        rows.append(row[0] if upx == 1 else jnp.stack(row, axis=-1))
    y = rows[0][:, :, :, None] if upy == 1 else jnp.stack(rows, axis=3)
    # (n, c, my, upy, mx[, upx]) -> (n, c, my*upy, mx*upx)
    y = y.reshape(n, c, my * upy, mx * upx)
    return y[:, :, :oh, :ow].astype(x.dtype)


def _depthwise_fir(x, f2d, up, down, pad, channels):
    """Zero-insert upsample + pad/crop + FIR correlate + decimate.

    Dispatch (measured on v5e, scripts/bench_upfirdn.py, floor-subtracted):
    resampling (up>1 or down>1) keeps the depthwise conv — XLA's conv
    emitter handles lhs_dilation/strides well (~0.4-1.2 ms at SR shapes),
    while slice lowerings pay a strided-lane relayout storm (up to 24 ms).
    Pure filtering (up=down=1, small filter) uses the unrolled slice sum —
    plain shifted slices fuse into one VPU kernel and beat the one-channel-
    per-group conv ~2x at 512² (0.92 vs 1.73 ms).
    """
    fh, fw = int(f2d.shape[0]), int(f2d.shape[1])
    impl = FORCE_IMPL
    if impl is None:
        if fh * fw > _MAX_UNROLL_TERMS:
            impl = "conv"
        elif up == (1, 1) and down == (1, 1):
            impl = "unroll"
        else:
            impl = "conv"
    if impl == "poly" and down == (1, 1):
        return _fir_poly_up(x, f2d, up, pad)
    if impl == "unroll":
        return _fir_unrolled(x, f2d, up, down, pad)
    return _fir_conv(x, f2d, up, down, pad, channels)


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
