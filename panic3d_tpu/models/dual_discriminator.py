"""Dual discriminator: discriminates [512² image, upsampled raw render].

Role of `src/training/dual_discriminator.py:86-251` (DualDiscriminator +
filtered_resizing). The two streams are concatenated on channels (6-ch
input); pose conditioning label optionally noised by disc_c_noise.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .stylegan2 import Discriminator, resize_bilinear
from ..ops.upfirdn2d import setup_filter, upsample2d, downsample2d


def filtered_resizing(image, size: int, f=None, filter_mode="antialiased"):
    """dual_discriminator.py:86-102."""
    if filter_mode == "antialiased":
        return jax.image.resize(
            image, image.shape[:2] + (size, size), method="bilinear", antialias=True
        )
    if filter_mode == "classic":
        x = upsample2d(image, f, up=2)
        x = resize_bilinear(x, size * 2 + 2)
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if filter_mode == "none":
        return resize_bilinear(image, size)
    if isinstance(filter_mode, float):
        filtered = jax.image.resize(
            image, image.shape[:2] + (size, size), method="bilinear", antialias=True
        )
        aliased = resize_bilinear(image, size)
        return (1 - filter_mode) * aliased + filter_mode * filtered
    raise ValueError(filter_mode)


class DualDiscriminator(nn.Module):
    """dual_discriminator.py:106-176."""

    c_dim: int
    img_resolution: int
    img_channels: int = 3
    cond_mode: str = "none"
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256
    cmap_dim: Optional[int] = None
    disc_c_noise: float = 0.0
    block_kwargs: dict = None  # type: ignore[assignment]
    mapping_kwargs: dict = None  # type: ignore[assignment]
    epilogue_kwargs: dict = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, img: dict, c, cond=None, update_emas=False, force_fp32=False):
        image = img["image"]
        image_raw = filtered_resizing(img["image_raw"], image.shape[-1])
        x = jnp.concatenate([image, image_raw], axis=1)
        if self.disc_c_noise > 0:
            noise = jax.random.normal(self.make_rng("noise"), c.shape)
            c = c + noise * jnp.std(c, axis=0, keepdims=True) * self.disc_c_noise
        return Discriminator(
            c_dim=self.c_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels * 2,
            cond_mode=self.cond_mode,
            architecture=self.architecture,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
            cmap_dim=self.cmap_dim,
            block_kwargs=self.block_kwargs,
            mapping_kwargs=self.mapping_kwargs,
            epilogue_kwargs=self.epilogue_kwargs,
            name="disc",
        )(x, c, cond, force_fp32=force_fp32)
