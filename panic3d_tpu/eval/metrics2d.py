"""2D eval metrics: PSNR + CLIP image-image cosine similarity.

Role of `_scripts/eval/measure.py:34-50`: CLIP ViT-B/32 cosine ×100,
LPIPS (see eval/lpips.py), torchmetrics PSNR.

CLIP here is the ViT-B/32 image tower in flax with the exact openai
preprocessing; weights load from a converted .npz (runtime tools) — without
them the module is random-init (structurally correct, NOT paper-comparable).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def psnr(pred, target, data_range: float = 1.0):
    """torchmetrics PeakSignalNoiseRatio: 10*log10(range²/mse) over the batch."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


class _MHA(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        D, H = self.dim, self.heads
        w_qkv = self.param("in_proj_w", nn.initializers.normal(0.02), (3 * D, D))
        b_qkv = self.param("in_proj_b", nn.initializers.zeros, (3 * D,))
        w_out = self.param("out_proj_w", nn.initializers.normal(0.02), (D, D))
        b_out = self.param("out_proj_b", nn.initializers.zeros, (D,))
        qkv = x @ w_qkv.T + b_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = x.shape
        hd = D // H

        def heads_split(t):
            return t.reshape(B, N, H, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        att = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) / np.sqrt(hd), axis=-1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        return out @ w_out.T + b_out


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + _MHA(self.dim, self.heads, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.dim * 4, name="mlp_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        h = nn.Dense(self.dim, name="mlp_proj")(h)
        return x + h


class CLIPImageViT(nn.Module):
    """openai CLIP ViT-B/32 visual tower."""

    dim: int = 768
    layers: int = 12
    heads: int = 12
    patch: int = 32
    out_dim: int = 512
    input_res: int = 224

    @nn.compact
    def __call__(self, img):
        """img: [N,3,224,224], already CLIP-normalized. -> [N,512] embeds."""
        N = img.shape[0]
        w = self.param(
            "patch_embed",
            nn.initializers.normal(0.02),
            (self.dim, 3, self.patch, self.patch),
        )
        x = jax.lax.conv_general_dilated(
            img, w, (self.patch, self.patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        x = x.reshape(N, self.dim, -1).transpose(0, 2, 1)  # [N, L, D]
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (N, 1, self.dim)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            ((self.input_res // self.patch) ** 2 + 1, self.dim),
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = _Block(self.dim, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (self.dim, self.out_dim)
        )
        return x @ proj


class CLIPSimilarity:
    """measure.py:34-43: resize to 224, normalize, cosine similarity."""

    def __init__(self, variables=None):
        self.module = CLIPImageViT()
        if variables is None:
            variables = self.module.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224))
            )
            self.pretrained = False
        else:
            self.pretrained = True
        self.variables = variables

    def embed(self, img):
        """img: [N,3,H,W] in [0,1]."""
        img = jax.image.resize(
            img, img.shape[:2] + (224, 224), method="bicubic", antialias=True
        )
        mean = jnp.asarray(CLIP_MEAN)[:, None, None]
        std = jnp.asarray(CLIP_STD)[:, None, None]
        z = self.module.apply(self.variables, (img - mean) / std)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def __call__(self, a, b):
        za, zb = self.embed(a), self.embed(b)
        return jnp.sum(za * zb, axis=-1)


def load_clip_params(path: str):
    data = np.load(path)
    params = {}
    for k in data.files:
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[k])
    return {"params": params}
