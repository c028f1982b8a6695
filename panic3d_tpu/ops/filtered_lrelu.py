"""Filtered leaky-ReLU: upsample -> bias+lrelu+clamp -> downsample.

Role of the reference CUDA monster `src/torch_utils/ops/filtered_lrelu.*`
(~1.7k lines of templated kernels). Its only consumer is the StyleGAN3
alias-free SynthesisLayer, which the shipped PAniC-3D model never
instantiates (SURVEY.md §2.2), so this is the reference-equivalent
composition (filtered_lrelu.py:123+): upfirdn2d -> bias_act -> upfirdn2d.
XLA fuses the elementwise middle into the second conv; no sign buffer is
needed because autodiff handles the backward.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .bias_act import bias_act
from .upfirdn2d import upfirdn2d, _parse_padding, _get_filter_size


def filtered_lrelu(
    x,
    fu=None,
    fd=None,
    b=None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2)),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
):
    px0, px1, py0, py1 = _parse_padding(padding)

    # exact ref-impl pipeline (filtered_lrelu.py:123-155): bias FIRST (so the
    # zero padding stays zero and the low-pass sees the biased signal), then
    # upsample, lrelu+clamp, downsample. The caller's padding already
    # accounts for both filters' tap counts (SG3 layer pad_total math).
    x = bias_act(x, b)
    x = upfirdn2d(
        x, fu, up=up, padding=[px0, px1, py0, py1], gain=up**2,
        flip_filter=flip_filter,
    )
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
