"""Deterministic seeded state_dicts + inputs for the metric-net goldens.

Shared by scripts/make_metricnet_goldens.py (which runs the torch replicas
once and commits their outputs) and tests/test_metricnet_goldens.py (which
regenerates the SAME weights here, converts them through runtime/convert.py
and asserts the flax models reproduce the committed outputs — no torch
needed at test time). Key names match the real lpips / openai CLIP
packages so the exercised converter path is the production one.
"""

from __future__ import annotations

import numpy as np

ALEX_SPECS = [
    ("net.slice1.0", 64, 3, 11),
    ("net.slice2.3", 192, 64, 5),
    ("net.slice3.6", 384, 192, 3),
    ("net.slice4.8", 256, 384, 3),
    ("net.slice5.10", 256, 256, 3),
]


def seeded_lpips_state_dict(seed: int = 10):
    rng = np.random.RandomState(seed)
    sd = {}
    for name, cout, cin, k in ALEX_SPECS:
        sd[f"{name}.weight"] = (
            rng.randn(cout, cin, k, k) * np.sqrt(2.0 / (cin * k * k))
        ).astype(np.float32)
        sd[f"{name}.bias"] = 0.1 * rng.randn(cout).astype(np.float32)
    for i, (_, cout, _, _) in enumerate(ALEX_SPECS):
        # the real heads are trained non-negative; seed them non-negative so
        # the flax abs() clamp is the identity
        sd[f"lin{i}.model.1.weight"] = (
            0.1 * np.abs(rng.randn(1, cout, 1, 1)).astype(np.float32)
        )
    return sd


def lpips_inputs(seed: int = 11):
    rng = np.random.RandomState(seed)
    x0 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    x1 = np.clip(x0 + 0.2 * rng.randn(2, 3, 64, 64), -1, 1).astype(np.float32)
    return x0, x1


def seeded_clip_state_dict(seed: int = 12, dim: int = 768, layers: int = 12,
                           patch: int = 32, out_dim: int = 512):
    rng = np.random.RandomState(seed)

    def n(*shape, s=0.02):
        return (s * rng.randn(*shape)).astype(np.float32)

    L = (224 // patch) ** 2 + 1
    sd = {
        "visual.conv1.weight": n(dim, 3, patch, patch),
        "visual.class_embedding": n(dim),
        "visual.positional_embedding": n(L, dim),
        "visual.ln_pre.weight": 1 + n(dim),
        "visual.ln_pre.bias": n(dim),
        "visual.ln_post.weight": 1 + n(dim),
        "visual.ln_post.bias": n(dim),
        "visual.proj": n(dim, out_dim),
    }
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}."
        sd[pre + "ln_1.weight"] = 1 + n(dim)
        sd[pre + "ln_1.bias"] = n(dim)
        sd[pre + "ln_2.weight"] = 1 + n(dim)
        sd[pre + "ln_2.bias"] = n(dim)
        sd[pre + "attn.in_proj_weight"] = n(3 * dim, dim)
        sd[pre + "attn.in_proj_bias"] = n(3 * dim)
        sd[pre + "attn.out_proj.weight"] = n(dim, dim)
        sd[pre + "attn.out_proj.bias"] = n(dim)
        sd[pre + "mlp.c_fc.weight"] = n(4 * dim, dim)
        sd[pre + "mlp.c_fc.bias"] = n(4 * dim)
        sd[pre + "mlp.c_proj.weight"] = n(dim, 4 * dim)
        sd[pre + "mlp.c_proj.bias"] = n(dim)
    return sd


def clip_inputs(seed: int = 13):
    """CLIP-normalized [2,3,224,224] images (normalization applied here so
    replica and flax tower receive identical tensors)."""
    from .metrics2d import CLIP_MEAN, CLIP_STD

    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 1, (2, 3, 224, 224)).astype(np.float32)
    return (
        (img - CLIP_MEAN[None, :, None, None]) / CLIP_STD[None, :, None, None]
    ).astype(np.float32)
