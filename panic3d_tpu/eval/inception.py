"""InceptionV3 feature network for paper-comparable FID/KID/PR/IS.

Role of the reference's hardcoded metric detector
(`src/metrics/metric_utils.py:209-263` get_feature_detector +
`frechet_inception_distance.py:23-24`): the NVIDIA
`inception-2015-12-05.pkl` — a TorchScript translation of the original TF
FID network. Its architecture is exactly the pytorch-fid / torchvision
`inception_v3` graph with the three FID patches (pool branches use
count_include_pad=False average pooling; Mixed_7c's pool branch uses MAX
pooling; fc has 1008 classes), so converted weights from either source are
paper-equivalent.

TPU design: the net is inference-only, so every Conv+BatchNorm pair is
folded into a single conv+bias at conversion time
(`runtime.convert.convert_inception_v3`) — one MXU op per layer, nothing to
re-normalize at runtime. Layout is NCHW / OIHW like the rest of the repo;
XLA transposes to its preferred layout once at the boundary.

Detector contract (metric_utils.py feature flow):
  * `return_features=True` -> [N, 2048] pool features (FID/KID/PR),
  * otherwise softmax class probs [N, 1008] (IS), with `no_output_bias`
    matching `inception_score.py:23`'s detector_kwargs.
Input: float NCHW in [-1, 1] (the generator's native range); `preprocess`
resizes any HxW to 299x299 bilinear (align_corners=False) first, exactly
the pytorch-fid input pipe.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv(x, w, stride=(1, 1), padding=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


class FConv(nn.Module):
    """BasicConv2d with the BatchNorm pre-folded: conv + bias + relu."""

    cout: int
    cin: int
    kernel: tuple  # (kh, kw)
    stride: int = 1
    padding: tuple = (0, 0)  # (ph, pw)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param("w", nn.initializers.variance_scaling(0.2, "fan_in", "normal"),
                       (self.cout, self.cin, kh, kw))
        b = self.param("b", nn.initializers.zeros, (self.cout,))
        ph, pw = self.padding
        x = _conv(x, w, (self.stride, self.stride), ((ph, ph), (pw, pw)))
        return jax.nn.relu(x + b.astype(x.dtype)[:, None, None])


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _avg_pool_3x3(x, count_include_pad=False, max_pool=False):
    """3x3 stride-1 pad-1 pool branch. The FID patches
    (pytorch-fid FIDInceptionA/C/E_1) use count_include_pad=False — edge
    windows divide by the number of REAL taps — and FIDInceptionE_2
    (Mixed_7c) replaces the average with a max."""
    if max_pool:
        pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)),
                      constant_values=-jnp.inf)
        return jax.lax.reduce_window(
            pad, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "VALID"
        )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    return s / cnt


class InceptionA(nn.Module):
    cin: int
    pool_features: int

    @nn.compact
    def __call__(self, x):
        c = self.cin
        b1 = FConv(64, c, (1, 1), name="branch1x1")(x)
        b5 = FConv(48, c, (1, 1), name="branch5x5_1")(x)
        b5 = FConv(64, 48, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = FConv(64, c, (1, 1), name="branch3x3dbl_1")(x)
        b3 = FConv(96, 64, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = FConv(96, 96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = FConv(self.pool_features, c, (1, 1), name="branch_pool")(
            _avg_pool_3x3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=1)


class InceptionB(nn.Module):
    cin: int

    @nn.compact
    def __call__(self, x):
        c = self.cin
        b3 = FConv(384, c, (3, 3), stride=2, name="branch3x3")(x)
        bd = FConv(64, c, (1, 1), name="branch3x3dbl_1")(x)
        bd = FConv(96, 64, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = FConv(96, 96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool_3x3_s2(x)], axis=1)


class InceptionC(nn.Module):
    cin: int
    c7: int

    @nn.compact
    def __call__(self, x):
        c, c7 = self.cin, self.c7
        b1 = FConv(192, c, (1, 1), name="branch1x1")(x)
        b7 = FConv(c7, c, (1, 1), name="branch7x7_1")(x)
        b7 = FConv(c7, c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = FConv(192, c7, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = FConv(c7, c, (1, 1), name="branch7x7dbl_1")(x)
        bd = FConv(c7, c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = FConv(c7, c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = FConv(c7, c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = FConv(192, c7, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = FConv(192, c, (1, 1), name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=1)


class InceptionD(nn.Module):
    cin: int

    @nn.compact
    def __call__(self, x):
        c = self.cin
        b3 = FConv(192, c, (1, 1), name="branch3x3_1")(x)
        b3 = FConv(320, 192, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = FConv(192, c, (1, 1), name="branch7x7x3_1")(x)
        b7 = FConv(192, 192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = FConv(192, 192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = FConv(192, 192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool_3x3_s2(x)], axis=1)


class InceptionE(nn.Module):
    cin: int
    pool_max: bool = False  # Mixed_7c's FIDInceptionE_2 patch

    @nn.compact
    def __call__(self, x):
        c = self.cin
        b1 = FConv(320, c, (1, 1), name="branch1x1")(x)
        b3 = FConv(384, c, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            FConv(384, 384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            FConv(384, 384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=1)
        bd = FConv(448, c, (1, 1), name="branch3x3dbl_1")(x)
        bd = FConv(384, 448, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            FConv(384, 384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            FConv(384, 384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=1)
        bp = FConv(192, c, (1, 1), name="branch_pool")(
            _avg_pool_3x3(x, max_pool=self.pool_max))
        return jnp.concatenate([b1, b3, bd, bp], axis=1)


class InceptionV3(nn.Module):
    """The FID detector graph. Module names mirror torchvision's
    `inception_v3` so `convert_inception_v3` maps 1:1."""

    num_classes: int = 1008  # the TF net's 1008-way softmax

    @nn.compact
    def __call__(self, x, return_features: bool = True,
                 no_output_bias: bool = False):
        x = FConv(32, 3, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = FConv(32, 32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = FConv(64, 32, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = FConv(80, 64, (1, 1), name="Conv2d_3b_1x1")(x)
        x = FConv(192, 80, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(192, 32, name="Mixed_5b")(x)
        x = InceptionA(256, 64, name="Mixed_5c")(x)
        x = InceptionA(288, 64, name="Mixed_5d")(x)
        x = InceptionB(288, name="Mixed_6a")(x)
        x = InceptionC(768, 128, name="Mixed_6b")(x)
        x = InceptionC(768, 160, name="Mixed_6c")(x)
        x = InceptionC(768, 160, name="Mixed_6d")(x)
        x = InceptionC(768, 192, name="Mixed_6e")(x)
        x = InceptionD(768, name="Mixed_7a")(x)
        x = InceptionE(1280, name="Mixed_7b")(x)
        x = InceptionE(2048, pool_max=True, name="Mixed_7c")(x)
        feat = jnp.mean(x, axis=(2, 3))  # adaptive avg pool -> [N, 2048]
        # params exist regardless of the requested head so init() always
        # builds the full tree the converter fills
        w = self.param("fc_w", nn.initializers.normal(0.01),
                       (self.num_classes, 2048))
        b = self.param("fc_b", nn.initializers.zeros, (self.num_classes,))
        if return_features:
            return feat
        logits = feat @ w.T.astype(feat.dtype)
        if not no_output_bias:
            logits = logits + b.astype(feat.dtype)
        return jax.nn.softmax(logits, axis=-1)

    @staticmethod
    def preprocess(images, in_range=(-1.0, 1.0)):
        """Any-size NCHW -> 299x299, scaled to the net's [-1, 1] domain.

        Bilinear, half-pixel centers (= F.interpolate align_corners=False,
        the pytorch-fid pipe)."""
        lo, hi = in_range
        x = (images - lo) * (2.0 / (hi - lo)) - 1.0
        if x.shape[-2:] != (299, 299):
            # antialias=False: torch F.interpolate(bilinear) does NOT widen
            # the kernel on downscale, and the flagship feeds 512² images —
            # an antialiased resize would systematically shift the features
            x = jax.image.resize(x, x.shape[:-2] + (299, 299),
                                 method="linear", antialias=False)
        return x


def init_inception(key=None):
    """(module, random variables) — structurally exact, NOT paper weights."""
    net = InceptionV3()
    key = key if key is not None else jax.random.PRNGKey(0)
    variables = net.init(key, jnp.zeros((1, 3, 299, 299)))
    return net, variables
