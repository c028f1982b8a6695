"""Small image ops: bilinear/nearest resize, sobel magnitude, morphology.

Replaces the reference's kornia usage (`triplane.py:632,654` sobel/erosion,
`loss_orthocondA.py` dilation) and torch interpolate modes, as pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_nearest(x, size: int):
    """torch F.interpolate(mode='nearest') on NCHW (floor-index convention)."""
    N, C, H, W = x.shape
    idx_y = jnp.floor(jnp.arange(size) * (H / size)).astype(jnp.int32)
    idx_x = jnp.floor(jnp.arange(size) * (W / size)).astype(jnp.int32)
    return x[:, :, idx_y][:, :, :, idx_x]


def sobel_magnitude(x):
    """kornia.filters.sobel followed by L2 over channels.

    kornia normalizes the sobel kernel (normalized=True default): the classic
    [[-1,0,1],[-2,0,2],[-1,0,1]] divided by 8. Input NCHW, reflect padding.
    Returns [N,1,H,W] norm over (channel, direction).
    """
    kx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=x.dtype
    ) / 8.0
    ky = kx.T
    N, C, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")

    def dconv(inp, k):
        kern = jnp.broadcast_to(k[None, None], (C, 1, 3, 3))
        return jax.lax.conv_general_dilated(
            inp, kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        )

    gx = dconv(xp, jnp.flip(kx, (0, 1)))
    gy = dconv(xp, jnp.flip(ky, (0, 1)))
    mag = jnp.sqrt(jnp.sum(gx**2 + gy**2, axis=1, keepdims=True) + 1e-12)
    return mag


def _morph(x, kernel_size: int, op: str):
    """Binary-ish morphology with an all-ones square structuring element."""
    pad = [(0, 0), (0, 0)] + [
        ((kernel_size - 1) // 2, kernel_size // 2) for _ in range(2)
    ]
    if op == "erode":
        init, fn = jnp.inf, jax.lax.min
        x = jnp.pad(x, pad, constant_values=jnp.inf)
    else:
        init, fn = -jnp.inf, jax.lax.max
        x = jnp.pad(x, pad, constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, init, fn,
        window_dimensions=(1, 1, kernel_size, kernel_size),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )


def erosion(x, kernel_size: int):
    """kornia.morphology.erosion with ones(k,k) (values-only, flat kernel)."""
    return _morph(x, kernel_size, "erode")


def dilation(x, kernel_size: int):
    """kornia.morphology.dilation with ones(k,k)."""
    return _morph(x, kernel_size, "dilate")


def gaussian_blur(x, sigma: float, truncate: float = 4.0):
    """Separable gaussian blur on NCHW (reflect padding), scipy convention."""
    radius = int(truncate * sigma + 0.5)
    t = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    k = jnp.asarray(k, dtype=x.dtype)
    C = x.shape[1]

    xp = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (0, 0)), mode="reflect")
    kern = jnp.broadcast_to(k[None, None, :, None], (C, 1, k.size, 1))
    x = jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (radius, radius)), mode="reflect")
    kern = jnp.broadcast_to(k[None, None, None, :], (C, 1, 1, k.size))
    return jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )
