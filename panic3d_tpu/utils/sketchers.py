"""Difference-of-Gaussians line extraction.

Role of `_util/sketchers_v2.py:48-83` (batch_dog, as used by the rmline
wrapper with t=1.0 sigma=0.5 k=1.6). Gaussian blurs are fixed-size kornia
-style kernels (truncated at 2*int(sigma*kernel_factor)+1, replicate
padding) implemented as depthwise convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernel1d(kern: int, sigma: float) -> np.ndarray:
    # kornia convention: centered taps, normalized to sum 1
    x = np.arange(kern, dtype=np.float64) - (kern - 1) / 2
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def gaussian_blur2d(img, kern: int, sigma: float):
    """Separable gaussian blur, replicate padding, NCHW."""
    k = jnp.asarray(_gauss_kernel1d(kern, sigma), dtype=img.dtype)
    C = img.shape[1]
    pad = (kern - 1) // 2, kern // 2

    xp = jnp.pad(img, ((0, 0), (0, 0), pad, (0, 0)), mode="edge")
    kv = jnp.broadcast_to(k[None, None, :, None], (C, 1, kern, 1))
    x = jax.lax.conv_general_dilated(
        xp, kv, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), pad), mode="edge")
    kh = jnp.broadcast_to(k[None, None, None, :], (C, 1, 1, kern))
    return jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


def rgb_to_grayscale(img):
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    return jnp.einsum("nchw,c->nhw", img[:, :3], w)[:, None]


def batch_dog(img, t=2.0, sigma=1.0, k=1.6, epsilon=0.01, kernel_factor=4,
              clip=True):
    """(bs, {1,3,4}, h, w) -> (bs, 1, h, w) line-ness map."""
    bs, ch, h, w = img.shape
    if ch in (3, 4):
        img = rgb_to_grayscale(img)
    else:
        assert ch == 1
    kern0 = max(2 * int(sigma * kernel_factor) + 1, 3)
    kern1 = max(2 * int(sigma * k * kernel_factor) + 1, 3)
    g0 = gaussian_blur2d(img, kern0, sigma)
    g1 = gaussian_blur2d(img, kern1, sigma * k)
    ans = 0.5 + t * (g1 - g0) - epsilon
    return jnp.clip(ans, 0, 1) if clip else ans
