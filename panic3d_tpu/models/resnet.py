"""ResNet50 trunk (danbooru tagger backbone) + PCA feature extractor.

Role of `_train/danbooru_tagger/models/kate.py` (ResNet50 multi-label
tagger — only the trunk is consumed) and
`_train/danbooru_tagger/helpers/{katebackbone,katepca}.py`:
stage taps conv1..layer4 (channels 64/256/512/1024/2048) and the PCA
projection producing `resnet_chonk` (per-pixel 2048->512 on the 8x8 layer4
map, image + its h-flip stacked) and `resnet_feats`.

Architecture is torchvision resnet50 so converted checkpoints map 1:1
(conv->'conv{i}', bn running stats in 'batch_stats').
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


class _ConvBN(nn.Module):
    cout: int
    cin: int
    k: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train=False):
        w = self.param(
            "w", nn.initializers.kaiming_normal(), (self.cout, self.cin, self.k, self.k)
        )
        x = _conv(x, w.astype(x.dtype), self.stride, self.padding)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, axis=1,
            name="bn",
        )(x)


class Bottleneck(nn.Module):
    cin: int
    width: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        out = _ConvBN(self.width, self.cin, 1, name="conv1")(x, train)
        out = jax.nn.relu(out)
        out = _ConvBN(self.width, self.width, 3, self.stride, 1, name="conv2")(out, train)
        out = jax.nn.relu(out)
        out = _ConvBN(self.width * 4, self.width, 1, name="conv3")(out, train)
        if self.downsample:
            identity = _ConvBN(
                self.width * 4, self.cin, 1, self.stride, name="downsample"
            )(x, train)
        else:
            identity = x
        return jax.nn.relu(out + identity)


class ResNet50(nn.Module):
    """torchvision resnet50 trunk with stage taps."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train=False, return_taps=True):
        taps = {}
        x = _ConvBN(64, 3, 7, 2, 3, name="stem")(x, train)
        x = jax.nn.relu(x)
        taps["conv1"] = x
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
        )

        layout = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        cin = 64
        for li, (width, blocks, stride) in enumerate(layout, start=1):
            for bi in range(blocks):
                x = Bottleneck(
                    cin=cin,
                    width=width,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    name=f"layer{li}_{bi}",
                )(x, train)
                cin = width * 4
            taps[f"layer{li}"] = x

        x = jnp.mean(x, axis=(2, 3))
        taps["avgpool"] = x
        w = self.param(
            "fc_w", nn.initializers.normal(0.01), (self.num_classes, 2048)
        )
        b = self.param("fc_b", nn.initializers.zeros, (self.num_classes,))
        logits = x @ w.T + b
        taps["fc"] = logits
        if return_taps:
            return taps
        return logits


CHANNELS = [64, 256, 512, 1024, 2048]


class ResnetFeatureExtractorPCA:
    """katepca.py:6-28: image (+h-flip) -> layer4 8x8 -> per-pixel PCA.

    pca_components: [dim_out, 2048]; pca_mean: [2048].
    Input image: [3,H,W] float [0,1] BLACK-background composited (katepca
    uses .bg('k')); resized to 256 and imagenet-normalized by the caller or
    via `preprocess`.
    """

    def __init__(self, resnet: ResNet50, variables, pca_components, pca_mean,
                 dim_out: int = 512):
        self.resnet = resnet
        self.variables = variables
        self.pw = jnp.asarray(pca_components[:dim_out])  # [D,2048]
        self.pb = jnp.asarray(pca_mean)  # [2048]

    def preprocess(self, img):
        # the reference extractor resizes to 256 internally
        # (katebackbone.py: tv.transforms.Resize), so layer4 is always 8x8
        if img.shape[-1] != 256 or img.shape[-2] != 256:
            img = jax.image.resize(
                img, img.shape[:-2] + (256, 256), method="bilinear",
                antialias=img.shape[-1] > 256,
            )
        mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
        std = jnp.asarray(IMAGENET_STD)[:, None, None]
        return (img - mean) / std

    def __call__(self, img):
        """img: [3,256,256] in [0,1] -> chonk [2, D, 8, 8] (orig, flipped)."""
        x = self.preprocess(img)
        batch = jnp.stack([x, jnp.flip(x, axis=-1)], axis=0)
        taps = self.resnet.apply(self.variables, batch, return_taps=True)
        feats = taps["layer4"]  # [2, 2048, 8, 8]
        centered = feats - self.pb[None, :, None, None]
        chonk = jnp.einsum("dc,nchw->ndhw", self.pw, centered)
        return chonk

    def global_feats(self, img):
        """resnet_feats: PCA of the pooled layer4 vector, orig + flip."""
        x = self.preprocess(img)
        batch = jnp.stack([x, jnp.flip(x, axis=-1)], axis=0)
        taps = self.resnet.apply(self.variables, batch, return_taps=True)
        pooled = taps["avgpool"]  # [2, 2048]
        return (pooled - self.pb[None]) @ self.pw.T


def load_pca_extractor(path: str, dim_out: int = 512) -> ResnetFeatureExtractorPCA:
    """Converted resnet+PCA checkpoint dir (state.msgpack + pca.npz, the
    layout runtime/convert writes) -> ready extractor. Shared by
    eval.generate and the viewer's portrait re-conditioning."""
    import os

    import numpy as np

    from ..runtime.checkpoint import load_checkpoint

    variables, _ = load_checkpoint(path)
    pca = np.load(os.path.join(path, "pca.npz"))
    return ResnetFeatureExtractorPCA(
        ResNet50(), variables, pca["components"], pca["mean"], dim_out)
