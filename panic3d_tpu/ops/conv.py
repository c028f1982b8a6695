"""2D convolution with fused FIR up/downsampling + StyleGAN2 modulated conv.

Role of the reference `src/torch_utils/ops/conv2d_resample.py` and
`modulated_conv2d` (`src/training/networks_stylegan2.py:39-97`).

TPU-first design notes:
- The reference splits up/down resampling across conv_transpose + CUDA
  upfirdn2d kernels. Here resampling is a depthwise ``conv_general_dilated``
  (see ops/upfirdn2d.py) and the weight conv is a single dense conv; XLA
  schedules both on the MXU and fuses the elementwise epilogue.
- Modulated conv always uses the "non-fused" formulation (scale activations
  by styles, shared-weight conv, scale outputs by demod coefficients). It is
  mathematically identical to the grouped-conv trick but avoids per-sample
  grouped convolutions, which tile poorly on the MXU. (The reference itself
  trains with this path via fused_modconv='inference_only',
  train_eclustrousC.py:397.)
- Demodulation statistics are computed in float32 regardless of the compute
  dtype; bfloat16 has full float32 range so the reference's fp16 overflow
  pre-normalization (networks_stylegan2.py:59-62) is unnecessary, but kept
  behind a flag for checkpoint-parity testing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .upfirdn2d import upfirdn2d, _parse_padding, _get_filter_size


def _conv2d(x, w, stride=1, padding=(0, 0, 0, 0), groups=1, flip_weight=True):
    """Plain 2D correlation (flip_weight=True matches torch F.conv2d)."""
    if not flip_weight:
        w = jnp.flip(w, axis=(-1, -2))
    px0, px1, py0, py1 = padding
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


def conv2d_resample(
    x,
    w,
    f=None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
):
    """2D conv with optional FIR-filtered up/downsampling.

    Padding is interpreted w.r.t. the upsampled image, matching reference
    `conv2d_resample.py:47-144` (including its filter-size pad adjustments).
    """
    assert x.ndim == 4 and w.ndim == 4
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        # Zero-insert upsample + FIR + pad in one depthwise conv, then the
        # weight conv. FIR and weight convs commute (both LTI), so this is
        # numerically the reference's conv_transpose+FIR fast path.
        x = upfirdn2d(
            x, f, up=up, padding=[px0, px1, py0, py1], gain=up**2, flip_filter=flip_filter
        )
        px0 = px1 = py0 = py1 = 0
        if down > 1 and f is not None:
            x = upfirdn2d(x, f, flip_filter=flip_filter)
    elif down > 1 and f is not None:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        px0 = px1 = py0 = py1 = 0

    return _conv2d(
        x, w, stride=down, padding=(px0, px1, py0, py1), groups=groups, flip_weight=flip_weight
    )


def modulated_conv2d(
    x,                      # [N, C_in, H, W]
    weight,                 # [C_out, C_in, kh, kw]
    styles,                 # [N, C_in]
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter=None,
    demodulate: bool = True,
    flip_weight: bool = True,
    pre_normalize: bool = False,
):
    """StyleGAN2 modulated convolution (networks_stylegan2.py:39-97).

    Scales input channels by per-sample ``styles``, convolves with the shared
    ``weight``, and rescales output channels by the demodulation coefficient
    ``1/sqrt(sum((w*s)^2))`` computed in float32.
    """
    batch_size = x.shape[0]
    out_channels, in_channels, kh, kw = weight.shape
    assert styles.shape == (batch_size, in_channels)

    if pre_normalize and demodulate:
        # fp16-overflow guard kept for bit-parity experiments with reference
        # checkpoints (networks_stylegan2.py:59-62); off by default on TPU.
        wnorm = jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True)
        weight = weight * (1 / jnp.sqrt(in_channels * kh * kw) / wnorm)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        w32 = weight.astype(jnp.float32)[None] * styles.astype(jnp.float32)[:, None, :, None, None]
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w32), axis=(2, 3, 4)) + 1e-8)  # [N, C_out]

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(
        x,
        weight.astype(x.dtype),
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )
    if demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x
