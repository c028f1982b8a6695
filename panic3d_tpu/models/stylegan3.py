"""StyleGAN3 alias-free synthesis layer.

Role of `src/training/networks_stylegan3.py:255-393` (SynthesisLayer) — the
component the reference's superresolution module imports as
`AFSynthesisLayer` (superresolution.py:22). The shipped PAniC-3D model never
instantiates it (SURVEY.md §2.2), but it is reference API surface: provided
for parity and for SG3-style SR experiments.

TPU notes: the up-filter → lrelu → down-filter pipeline is the
ops/filtered_lrelu composition (XLA fuses the elementwise act into the
dilated convs); the Kaiser/jinc filter design is host-side numpy/scipy at
module setup (static buffers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import modulated_conv2d
from ..ops.filtered_lrelu import filtered_lrelu
from .stylegan2 import FullyConnectedLayer


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser separable / jinc radial low-pass (networks_stylegan3.py:367-387)."""
    import scipy.signal
    import scipy.special

    assert numtaps >= 1
    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, np.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f = np.nan_to_num(f, nan=float(cutoff))  # r=0 limit of j1(2c·πr)/(πr)
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2))
    )
    w = np.kaiser(numtaps, beta)
    f = f * np.outer(w, w)
    f = f / np.sum(f)
    return np.asarray(f, np.float32)


class AFSynthesisLayer(nn.Module):
    """Alias-free modulated conv + filtered lrelu (networks_stylegan3.py:255).

    Static sampling-rate/cutoff geometry mirrors the reference constructor;
    the magnitude EMA rides the 'buffers' collection (updated when
    update_emas=True, like the reference's magnitude_ema buffer).
    """

    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    use_fp16: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256
    magnitude_ema_beta: float = 0.999

    def setup(self):
        kernel = 1 if self.is_torgb else self.conv_kernel
        tmp_rate = max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )
        up_factor = int(np.rint(tmp_rate / self.in_sampling_rate))
        assert self.in_sampling_rate * up_factor == tmp_rate
        up_taps = (
            self.filter_size * up_factor
            if up_factor > 1 and not self.is_torgb else 1
        )
        down_factor = int(np.rint(tmp_rate / self.out_sampling_rate))
        assert self.out_sampling_rate * down_factor == tmp_rate
        down_taps = (
            self.filter_size * down_factor
            if down_factor > 1 and not self.is_torgb else 1
        )
        down_radial = self.use_radial_filters and not self.is_critically_sampled

        self._kernel = kernel
        self._up_factor = up_factor
        self._down_factor = down_factor
        self._up_filter = design_lowpass_filter(
            numtaps=up_taps, cutoff=self.in_cutoff,
            width=self.in_half_width * 2, fs=tmp_rate,
        )
        self._down_filter = design_lowpass_filter(
            numtaps=down_taps, cutoff=self.out_cutoff,
            width=self.out_half_width * 2, fs=tmp_rate, radial=down_radial,
        )

        # symmetric-interpretation padding (networks_stylegan3.py:325-331)
        pad_total = (self.out_size - 1) * down_factor + 1
        pad_total -= (self.in_size + kernel - 1) * up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo
        self._padding = [int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)]

        self.affine = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, name="affine"
        )
        self.weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels, kernel, kernel),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,)
        )

    @nn.compact
    def __call__(self, x, w, force_fp32: bool = False, update_emas: bool = False):
        magnitude_ema = self.variable(
            "buffers", "magnitude_ema", lambda: jnp.ones((), jnp.float32)
        )
        if update_emas and not self.is_initializing():
            cur = jnp.mean(jax.lax.stop_gradient(x).astype(jnp.float32) ** 2)
            magnitude_ema.value = (
                cur + (magnitude_ema.value - cur) * self.magnitude_ema_beta
            )
        input_gain = jax.lax.rsqrt(magnitude_ema.value)

        styles = self.affine(w)
        if self.is_torgb:
            styles = styles * (
                1 / np.sqrt(self.in_channels * (self._kernel**2))
            )

        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        # scalar input_gain commutes with the (post-demod) conv: scale x
        x = modulated_conv2d(
            (x * input_gain).astype(dtype), self.weight, styles,
            padding=self._kernel - 1, demodulate=not self.is_torgb,
        )

        gain = 1.0 if self.is_torgb else float(np.sqrt(2))
        slope = 1.0 if self.is_torgb else 0.2
        x = filtered_lrelu(
            x,
            fu=None if self._up_filter is None else jnp.asarray(self._up_filter),
            fd=None if self._down_filter is None else jnp.asarray(self._down_filter),
            b=self.bias.astype(x.dtype),
            up=self._up_factor, down=self._down_factor,
            padding=self._padding, gain=gain, slope=slope, clamp=self.conv_clamp,
        )
        assert x.shape == (x.shape[0], self.out_channels, self.out_size, self.out_size)
        return x
