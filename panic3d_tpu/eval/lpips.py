"""LPIPS perceptual distance (AlexNet backbone) in flax.

Role of the reference's `lpips` pip package usage (`_util/pytorch_v1.py:
159-168`, loss_orthocondA.py:282): LPIPS(alex) on [-1,1] images.

The architecture matches lpips.LPIPS(net='alex') exactly: AlexNet features,
per-layer unit-normalization, squared diff, learned 1x1 non-negative linear
heads, spatial mean, layer sum. Pretrained weights are loaded from an .npz
(produced by runtime/convert_lpips.py from the torch package); without
weights the net is randomly initialized — structurally correct for training
-system tests, NOT metric-comparable to the paper numbers.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# channel counts of the five tapped AlexNet stages
ALEX_CHANNELS = (64, 192, 384, 256, 256)

# input normalization (lpips.ScalingLayer)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], dtype=np.float32)


def _conv(x, w, b, stride=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet .features trunk, returning the 5 relu taps.

    compute_dtype: dtype the conv tower runs in. Params stay fp32;
    bfloat16 halves the tower's activation traffic and doubles its MXU
    rate — the right training-time setting on TPU (the loss is an
    optimization signal, not a reported metric). Metric-grade eval keeps
    the fp32 default.
    """

    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cd = self.compute_dtype

        def conv_params(name, cout, cin, k):
            w = self.param(
                f"{name}_w",
                lambda key: jax.random.normal(key, (cout, cin, k, k), jnp.float32)
                * np.sqrt(2.0 / (cin * k * k)),
            )
            b = self.param(f"{name}_b", nn.initializers.zeros, (cout,))
            if cd is not None:
                w, b = w.astype(cd), b.astype(cd)
            return w, b

        if cd is not None:
            x = x.astype(cd)

        taps = []
        w, b = conv_params("conv1", 64, 3, 11)
        x = jax.nn.relu(_conv(x, w, b, stride=4, padding=2))
        taps.append(x)
        x = _maxpool(x)
        w, b = conv_params("conv2", 192, 64, 5)
        x = jax.nn.relu(_conv(x, w, b, padding=2))
        taps.append(x)
        x = _maxpool(x)
        w, b = conv_params("conv3", 384, 192, 3)
        x = jax.nn.relu(_conv(x, w, b, padding=1))
        taps.append(x)
        w, b = conv_params("conv4", 256, 384, 3)
        x = jax.nn.relu(_conv(x, w, b, padding=1))
        taps.append(x)
        w, b = conv_params("conv5", 256, 256, 3)
        x = jax.nn.relu(_conv(x, w, b, padding=1))
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='alex'): distance between [-1,1] NCHW images.

    compute_dtype=bfloat16 runs the AlexNet tower in bf16 (params fp32,
    unit-normalization and the layer reductions stay fp32) — the
    training-loss configuration; None (default) is full fp32 for
    metric-grade eval."""

    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x0, x1):
        shift = jnp.asarray(_SHIFT)[None, :, None, None]
        scale = jnp.asarray(_SCALE)[None, :, None, None]
        net = AlexNetFeatures(name="alex", compute_dtype=self.compute_dtype)
        f0 = net((x0 - shift) / scale)
        f1 = net((x1 - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            a = a * jax.lax.rsqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = self.param(
                f"lin{i}",
                lambda key, c=ALEX_CHANNELS[i]: jnp.full((c,), 0.1, jnp.float32),
            )
            # non-negative 1x1 head (lpips constrains weights >= 0)
            val = jnp.sum(jnp.abs(lin)[None, :, None, None] * diff, axis=1,
                          keepdims=True)
            total = total + jnp.mean(val, axis=(2, 3))
        return total[:, 0]  # [N]


def load_lpips_params(path: str):
    """Load converted weights (.npz with keys matching the param tree)."""
    data = np.load(path)
    params = {"alex": {}, }
    for k in data.files:
        parts = k.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[k])
    return {"params": params}
