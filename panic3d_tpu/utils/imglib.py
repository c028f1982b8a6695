"""Minimal functional image type.

Role of the chainable image class ``I`` (`_util/twodee_v1.py:36-124`) for
the ops this framework's data/eval paths actually use: load, resize,
convert, background-composite, alpha split, to/from CHW float arrays, save.
Images are numpy float32 CHW in [0,1] internally (channels 1/3/4).
"""

from __future__ import annotations

import os
from typing import Optional, Union

import numpy as np

try:
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover
    _PILImage = None

_BG_COLORS = {
    "w": (1.0, 1.0, 1.0),
    "k": (0.0, 0.0, 0.0),
}


class Img:
    """Immutable CHW float image with chainable ops."""

    def __init__(self, data):
        if isinstance(data, Img):
            self.data = data.data
            return
        if isinstance(data, str):
            data = _load(data)
        data = np.asarray(data)
        if data.dtype == np.uint8:
            data = data.astype(np.float32) / 255.0
        if data.ndim == 2:
            data = data[None]
        if data.ndim == 3 and data.shape[-1] in (1, 3, 4) and data.shape[0] not in (1, 3, 4):
            data = data.transpose(2, 0, 1)  # HWC -> CHW
        if data.ndim == 4:
            data = data[0]
        assert data.ndim == 3 and data.shape[0] in (1, 3, 4), data.shape
        self.data = np.clip(data.astype(np.float32), 0.0, 1.0)

    @property
    def size(self):
        return self.data.shape[-1]

    @property
    def channels(self):
        return self.data.shape[0]

    def t(self) -> np.ndarray:
        """CHW float32 array (the reference's .t() tensor accessor)."""
        return self.data

    def convert(self, mode: str) -> "Img":
        c = self.channels
        if mode == "RGB":
            if c == 3:
                return self
            if c == 4:
                return Img(self.data[:3])
            if c == 1:
                return Img(np.repeat(self.data, 3, axis=0))
        if mode == "RGBA":
            if c == 4:
                return self
            if c == 3:
                a = np.ones_like(self.data[:1])
                return Img(np.concatenate([self.data, a], axis=0))
            if c == 1:
                rgb = np.repeat(self.data, 3, axis=0)
                return Img(np.concatenate([rgb, np.ones_like(self.data[:1])], axis=0))
        if mode in ("L", "A"):
            if c == 1:
                return self
            if c >= 3:
                lum = (
                    0.299 * self.data[0] + 0.587 * self.data[1] + 0.114 * self.data[2]
                )
                return Img(lum[None])
        raise ValueError(mode)

    def bg(self, color: Union[str, tuple] = "w") -> "Img":
        """Composite over a solid background (twodee_v1.py:533)."""
        if self.channels != 4:
            return self
        rgb, a = self.data[:3], self.data[3:4]
        c = np.asarray(_BG_COLORS.get(color, color), dtype=np.float32)[:, None, None]
        out = rgb * a + c * (1 - a)
        return Img(np.concatenate([out, np.ones_like(a)], axis=0))

    def alpha(self) -> np.ndarray:
        if self.channels == 4:
            return self.data[3:4]
        return np.ones_like(self.data[:1])

    def resize(self, size: int, mode: str = "bilinear") -> "Img":
        if self.size == size and self.data.shape[-2] == size:
            return self
        if _PILImage is not None:
            pil = self.pil()
            resample = (
                _PILImage.Resampling.LANCZOS
                if mode == "lanczos" or self.size > size
                else _PILImage.Resampling.BILINEAR
            )
            return Img(np.asarray(pil.resize((size, size), resample)))
        # numpy fallback: nearest
        idx = np.floor(np.arange(size) * (self.data.shape[-1] / size)).astype(int)
        idy = np.floor(np.arange(size) * (self.data.shape[-2] / size)).astype(int)
        return Img(self.data[:, idy][:, :, idx])

    def crop(self, left, top, right, bottom) -> "Img":
        return Img(self.data[:, top:bottom, left:right])

    def pil(self):
        assert _PILImage is not None, "PIL unavailable"
        arr = (self.data.transpose(1, 2, 0) * 255).round().astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        return _PILImage.fromarray(arr)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.pil().save(path)
        return self

    def numpy_uint8(self) -> np.ndarray:
        return (self.data * 255).round().astype(np.uint8)


def _load(path: str) -> np.ndarray:
    assert _PILImage is not None, "PIL unavailable"
    return np.asarray(_PILImage.open(path))


def from_model_output(x, normalize=True) -> Img:
    """[-1,1] (or [0,1]) CHW jnp/np array -> Img."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    if normalize:
        x = x * 0.5 + 0.5
    return Img(np.clip(x, 0, 1))
