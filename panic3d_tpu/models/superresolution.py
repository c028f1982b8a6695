"""Superresolution modules (64²/128² feature image -> final image).

Role of `src/training/superresolution.py`. The flagship 512² model uses
SuperresolutionHybrid8XDC (2 SynthesisBlocks, hidden width configurable,
superresolution.py:263-293; selected by trainers/train_eclustrousC.py:397).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .stylegan2 import SynthesisBlock, resize_bilinear


def __getattr__(name):
    # API parity with the reference's `from ... networks_stylegan3 import
    # SynthesisLayer as AFSynthesisLayer` (superresolution.py:22); lazy so
    # scipy (filter design) is only imported when actually used.
    if name == "AFSynthesisLayer":
        from .stylegan3 import AFSynthesisLayer

        return AFSynthesisLayer
    raise AttributeError(name)


class _SRBase(nn.Module):
    channels: int
    img_resolution: int
    sr_num_fp16_res: int = 0
    sr_antialias: bool = True
    channels_hidden: int = 256
    w_dim: int = 512

    input_resolution: int = 128
    block0_res: int = 256
    block0_out: int = 128
    block1_out: int = 64
    block0_no_up: bool = False

    @nn.compact
    def __call__(self, rgb, x, ws, **block_kwargs):
        use_fp16 = self.sr_num_fp16_res > 0
        conv_clamp = 256 if use_fp16 else None
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)

        if x.shape[-1] != self.input_resolution:
            antialias = self.sr_antialias and x.shape[-1] > self.input_resolution
            x = resize_bilinear(x, self.input_resolution, antialias=antialias)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=antialias)

        x, rgb = SynthesisBlock(
            in_channels=self.channels,
            out_channels=self.block0_out,
            w_dim=self.w_dim,
            resolution=self.block0_res,
            img_channels=3,
            is_last=False,
            use_fp16=use_fp16,
            conv_clamp=conv_clamp,
            no_up=self.block0_no_up,
            name="block0",
        )(x, rgb, ws, **block_kwargs)
        x, rgb = SynthesisBlock(
            in_channels=self.block0_out,
            out_channels=self.block1_out,
            w_dim=self.w_dim,
            resolution=self.block0_res * 2,
            img_channels=3,
            is_last=True,
            use_fp16=use_fp16,
            conv_clamp=conv_clamp,
            name="block1",
        )(x, rgb, ws, **block_kwargs)
        return rgb


class SuperresolutionHybrid8XDC(_SRBase):
    """512² output; hidden width = channels_hidden (superresolution.py:263-293)."""

    input_resolution: int = 128
    block0_res: int = 256

    @nn.compact
    def __call__(self, rgb, x, ws, **block_kwargs):
        use_fp16 = self.sr_num_fp16_res > 0
        conv_clamp = 256 if use_fp16 else None
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[-1] != self.input_resolution:
            antialias = self.sr_antialias and x.shape[-1] > self.input_resolution
            x = resize_bilinear(x, self.input_resolution, antialias=antialias)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=antialias)
        x, rgb = SynthesisBlock(
            in_channels=self.channels,
            out_channels=self.channels_hidden,
            w_dim=self.w_dim,
            resolution=256,
            img_channels=3,
            is_last=False,
            use_fp16=use_fp16,
            conv_clamp=conv_clamp,
            name="block0",
        )(x, rgb, ws, **block_kwargs)
        x, rgb = SynthesisBlock(
            in_channels=self.channels_hidden,
            out_channels=self.channels_hidden // 2,
            w_dim=self.w_dim,
            resolution=512,
            img_channels=3,
            is_last=True,
            use_fp16=use_fp16,
            conv_clamp=conv_clamp,
            name="block1",
        )(x, rgb, ws, **block_kwargs)
        return rgb


class SuperresolutionHybrid8X(_SRBase):
    """512² output (superresolution.py:28-57)."""

    input_resolution: int = 128
    block0_res: int = 256
    block0_out: int = 128
    block1_out: int = 64


class SuperresolutionHybrid4X(_SRBase):
    """256² output (superresolution.py:61-89); first block has no upsample."""

    input_resolution: int = 128
    block0_res: int = 128
    block0_out: int = 128
    block1_out: int = 64
    block0_no_up: bool = True

    @nn.compact
    def __call__(self, rgb, x, ws, **block_kwargs):
        use_fp16 = self.sr_num_fp16_res > 0
        conv_clamp = 256 if use_fp16 else None
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[-1] < self.input_resolution:
            x = resize_bilinear(x, self.input_resolution, antialias=False)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=False)
        x, rgb = SynthesisBlock(
            in_channels=self.channels, out_channels=128, w_dim=self.w_dim, resolution=128,
            img_channels=3, is_last=False, use_fp16=use_fp16, conv_clamp=conv_clamp,
            no_up=True, name="block0",
        )(x, rgb, ws, **block_kwargs)
        x, rgb = SynthesisBlock(
            in_channels=128, out_channels=64, w_dim=self.w_dim, resolution=256,
            img_channels=3, is_last=True, use_fp16=use_fp16, conv_clamp=conv_clamp,
            name="block1",
        )(x, rgb, ws, **block_kwargs)
        return rgb


class SuperresolutionHybrid2X(_SRBase):
    """128² output (superresolution.py:93-121); first block has no upsample."""

    input_resolution: int = 64

    @nn.compact
    def __call__(self, rgb, x, ws, **block_kwargs):
        use_fp16 = self.sr_num_fp16_res > 0
        conv_clamp = 256 if use_fp16 else None
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[-1] != self.input_resolution:
            x = resize_bilinear(x, self.input_resolution, antialias=self.sr_antialias)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=self.sr_antialias)
        x, rgb = SynthesisBlock(
            in_channels=self.channels, out_channels=128, w_dim=self.w_dim, resolution=64,
            img_channels=3, is_last=False, use_fp16=use_fp16, conv_clamp=conv_clamp,
            no_up=True, name="block0",
        )(x, rgb, ws, **block_kwargs)
        x, rgb = SynthesisBlock(
            in_channels=128, out_channels=64, w_dim=self.w_dim, resolution=128,
            img_channels=3, is_last=True, use_fp16=use_fp16, conv_clamp=conv_clamp,
            name="block1",
        )(x, rgb, ws, **block_kwargs)
        return rgb


class SuperresolutionHybridDeepfp32(_SRBase):
    """256² output from a 128² hybrid input (superresolution.py:126-154);
    first block at 128 with no upsample, second block upsamples to 256."""

    input_resolution: int = 128

    @nn.compact
    def __call__(self, rgb, x, ws, **block_kwargs):
        use_fp16 = self.sr_num_fp16_res > 0
        conv_clamp = 256 if use_fp16 else None
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[-1] < self.input_resolution:
            x = resize_bilinear(x, self.input_resolution, antialias=False)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=False)
        x, rgb = SynthesisBlock(
            in_channels=self.channels, out_channels=128, w_dim=self.w_dim,
            resolution=128, img_channels=3, is_last=False, use_fp16=use_fp16,
            conv_clamp=conv_clamp, no_up=True, name="block0",
        )(x, rgb, ws, **block_kwargs)
        x, rgb = SynthesisBlock(
            in_channels=128, out_channels=64, w_dim=self.w_dim, resolution=256,
            img_channels=3, is_last=True, use_fp16=use_fp16,
            conv_clamp=conv_clamp, name="block1",
        )(x, rgb, ws, **block_kwargs)
        return rgb


SR_MODULES = {
    "training.superresolution.SuperresolutionHybridDeepfp32": SuperresolutionHybridDeepfp32,
    "SuperresolutionHybridDeepfp32": SuperresolutionHybridDeepfp32,
    "training.superresolution.SuperresolutionHybrid8XDC": SuperresolutionHybrid8XDC,
    "training.superresolution.SuperresolutionHybrid8X": SuperresolutionHybrid8X,
    "training.superresolution.SuperresolutionHybrid4X": SuperresolutionHybrid4X,
    "training.superresolution.SuperresolutionHybrid2X": SuperresolutionHybrid2X,
    "SuperresolutionHybrid8XDC": SuperresolutionHybrid8XDC,
    "SuperresolutionHybrid8X": SuperresolutionHybrid8X,
    "SuperresolutionHybrid4X": SuperresolutionHybrid4X,
    "SuperresolutionHybrid2X": SuperresolutionHybrid2X,
}
