"""Line-filling img2img GAN (rmlineganA) + inference wrapper.

Role of `_train/img2img/models/rmlineganA.py` (patch pix2pix: generator of
6 unpadded 3x3 convs width 32 + tanh over masked-RGB+hull input; PatchGAN
discriminator of 4 convs width 16 -> mean logit; L1 + label-smoothed BCE)
and `_train/img2img/util/rmline_wrapper.py` (DoG line mask, anime-face
keypoint hull, lerp composition).

Note: the reference trains with BatchNorm (gen_batchnorm=True); here norm
layers carry running stats in the 'batch_stats' collection and inference
uses them frozen — converted checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.imageops import dilation
from ..utils.sketchers import batch_dog

# 28-keypoint groups of the anime-face-detector (rmline_wrapper.py:65-88)
KEYPOINT_GROUPS = dict(
    chin=[0, 1, 2, 3, 4],
    eyelash_right=[5, 6, 7],
    eyelash_left=[8, 9, 10],
    eye_right=[11, 12, 13, 14, 15, 16],
    eye_left=[17, 18, 19, 20, 21, 22],
    nose=[23],
    mouth=[24, 25, 26, 27],
)


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return out + b[None, :, None, None]


class RMLineGenerator(nn.Module):
    """6 valid-padding 3x3 convs, width 32, lrelu+BN between, tanh out."""

    depth: int = 6
    width: int = 32
    use_hull: bool = True
    batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        chin = 4 if self.use_hull else 3
        for i in range(self.depth):
            cout = self.width if i != self.depth - 1 else 3
            w = self.param(
                f"conv{i}_w",
                nn.initializers.kaiming_normal(),
                (cout, chin if i == 0 else self.width, 3, 3),
            )
            b = self.param(f"conv{i}_b", nn.initializers.zeros, (cout,))
            x = _conv(x, w.astype(x.dtype), b.astype(x.dtype))
            if i != self.depth - 1:
                x = jnp.where(x >= 0, x, 0.01 * x)  # torch LeakyReLU default
                if self.batchnorm:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, axis=1, name=f"bn{i}",
                    )(x)
        return jnp.tanh(x)


class RMLineDiscriminator(nn.Module):
    """4 valid 3x3 convs width 16 -> mean logit (rmlineganA.py:84-100)."""

    depth: int = 4
    width: int = 16
    use_hull: bool = True
    batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        chin = 4 if self.use_hull else 3
        for i in range(self.depth):
            w = self.param(
                f"conv{i}_w",
                nn.initializers.kaiming_normal(),
                (self.width, chin if i == 0 else self.width, 3, 3),
            )
            b = self.param(f"conv{i}_b", nn.initializers.zeros, (self.width,))
            x = _conv(x, w.astype(x.dtype), b.astype(x.dtype))
            if i != self.depth - 1:
                x = jnp.where(x >= 0, x, 0.01 * x)
                if self.batchnorm:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, axis=1, name=f"bn{i}",
                    )(x)
        return jnp.mean(x, axis=(1, 2, 3))


def generator_forward(gen: RMLineGenerator, variables, image, line_mask,
                      face_hull, mask_input=True, pad=True):
    """rmlineganA.forward (rmlineganA.py:108-143): mask, stack, replicate-pad."""
    img = image * (1 - line_mask) if mask_input else image
    stackin = jnp.concatenate([img, face_hull], axis=1) if gen.use_hull else img
    if pad:
        d = gen.depth
        stackin = jnp.pad(
            stackin, ((0, 0), (0, 0), (d, d), (d, d)), mode="edge"
        )
    return gen.apply(variables, stackin)


def lerp_output(image, out, line_mask):
    """Composite generator output into input via the line mask."""
    return image + (out - image) * line_mask


def facehull(shape_hw, kpts, dilate: int = 5) -> np.ndarray:
    """Rasterized face hull from 28 keypoints (rmline_wrapper.py:88-120):
    convex hulls of eyes+mouth, nose point, eyelash polylines, dilated.

    kpts: [28, 2] in (row, col) pixel coords. Returns [1,1,H,W] float32.
    """
    import scipy.spatial

    H, W = shape_hw
    v = np.zeros((H, W), dtype=np.float32)

    def fill_hull(points):
        pts = np.asarray(points, dtype=np.float64)
        if len(pts) < 3:
            for a, b in pts.astype(int):
                if 0 <= a < H and 0 <= b < W:
                    v[a, b] = 1
            return
        try:
            hull = scipy.spatial.ConvexHull(pts)
        except Exception:
            return
        eq = hull.equations  # [F, 3]: normal + offset
        ys, xs = np.mgrid[0:H, 0:W]
        grid = np.stack([ys.ravel(), xs.ravel()], axis=1)
        inside = np.all(grid @ eq[:, :2].T + eq[:, 2] <= 1e-9, axis=1)
        v[inside.reshape(H, W)] = 1

    fill_hull(kpts[KEYPOINT_GROUPS["eye_right"]])
    fill_hull(kpts[KEYPOINT_GROUPS["eye_left"]])
    fill_hull(kpts[KEYPOINT_GROUPS["mouth"]])
    a, b = kpts[KEYPOINT_GROUPS["nose"][0]].astype(int)
    if 0 <= a < H and 0 <= b < W:
        v[a, b] = 1

    # eyelash polylines
    for grp in ("eyelash_left", "eyelash_right"):
        g = kpts[KEYPOINT_GROUPS[grp]]
        for p0, p1 in zip(g[:-1], g[1:]):
            n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) * 2 + 2
            t = np.linspace(0, 1, n)[:, None]
            line = p0[None] + t * (p1 - p0)[None]
            li = np.round(line).astype(int)
            ok = (li[:, 0] >= 0) & (li[:, 0] < H) & (li[:, 1] >= 0) & (li[:, 1] < W)
            v[li[ok, 0], li[ok, 1]] = 1

    out = np.asarray(dilation(jnp.asarray(v)[None, None], dilate))
    return out.astype(np.float32)


class RMLineWrapper:
    """Inference pipeline (rmline_wrapper.py:22-50): DoG lines minus face
    hull -> generator -> lerp; alpha channel restored by the caller."""

    def __init__(self, gen: RMLineGenerator, variables):
        self.gen = gen
        self.variables = variables

    def __call__(self, image_rgb, kpts):
        """image_rgb: [1,3,H,W] float in [0,1] white-composited; kpts [28,2]."""
        H, W = image_rgb.shape[-2:]
        fhull = jnp.asarray(facehull((H, W), np.asarray(kpts)))
        dog = batch_dog(
            image_rgb, t=1.0, sigma=0.5, k=1.6, epsilon=0.01, kernel_factor=4
        ) > 0.5
        dog = dilation(dog.astype(jnp.float32), 2) > 0.5
        line_mask = (dog & ~(fhull > 0.5)).astype(jnp.float32)
        out = generator_forward(
            self.gen, self.variables, image_rgb, line_mask, fhull
        )
        return lerp_output(image_rgb, out, line_mask), line_mask, fhull
