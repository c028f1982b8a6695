"""Generate the metric-net golden corpus (tests/goldens/metricnets.npz).

The paper metrics ride LPIPS(alex) and CLIP ViT-B/32 (`_scripts/eval/
measure.py:34-50`, `_util/pytorch_v1.py:159-168`); their pretrained bytes
are unavailable in this environment (zero egress), so converter+architecture
correctness is locked in against TORCH REPLICAS instead: spec-faithful
torch implementations of the lpips package's forward (ScalingLayer ->
AlexNet taps -> unit-normalize -> squared diff -> non-negative 1x1 heads ->
spatial mean -> layer sum) and the openai CLIP visual tower (patch conv,
class+positional embeddings, pre-LN transformer with QuickGELU, ln_post,
projection), weighted with DETERMINISTIC seeded state_dicts whose key
names match the real packages. The flax models + runtime/convert.py
converters must reproduce these outputs bit-close (tests/
test_metricnet_goldens.py regenerates the same state_dicts from the numpy
seeds, so the test needs no torch at runtime). If real weights ever land,
the same converter path is already drilled.

Run once: python scripts/make_metricnet_goldens.py
"""

import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, ".")

from panic3d_tpu.eval.goldens import (
    clip_inputs,
    lpips_inputs,
    seeded_clip_state_dict,
    seeded_lpips_state_dict,
)

OUT = os.path.join("tests", "goldens", "metricnets.npz")


# ---------------------------------------------------------------------------
# lpips.LPIPS(net='alex') replica

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def torch_lpips(sd, x0, x1):
    def t(k):
        return torch.as_tensor(sd[k])

    def features(x):
        taps = []
        x = F.relu(F.conv2d(x, t("net.slice1.0.weight"),
                            t("net.slice1.0.bias"), stride=4, padding=2))
        taps.append(x)
        x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, t("net.slice2.3.weight"),
                            t("net.slice2.3.bias"), padding=2))
        taps.append(x)
        x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, t("net.slice3.6.weight"),
                            t("net.slice3.6.bias"), padding=1))
        taps.append(x)
        x = F.relu(F.conv2d(x, t("net.slice4.8.weight"),
                            t("net.slice4.8.bias"), padding=1))
        taps.append(x)
        x = F.relu(F.conv2d(x, t("net.slice5.10.weight"),
                            t("net.slice5.10.bias"), padding=1))
        taps.append(x)
        return taps

    def unit_norm(x, eps=1e-10):  # lpips.normalize_tensor
        return x / (torch.sqrt(torch.sum(x**2, dim=1, keepdim=True)) + eps)

    f0 = features((x0 - _SHIFT) / _SCALE)
    f1 = features((x1 - _SHIFT) / _SCALE)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        diff = (unit_norm(a) - unit_norm(b)) ** 2
        w = torch.as_tensor(sd[f"lin{i}.model.1.weight"])  # [1,C,1,1]
        val = F.conv2d(diff, w)
        total = total + val.mean(dim=(2, 3))
    return total[:, 0]


# ---------------------------------------------------------------------------
# openai CLIP ViT-B/32 visual tower replica

def torch_clip_visual(sd, img, dim=768, layers=12, heads=12, patch=32):
    def t(k):
        return torch.as_tensor(sd["visual." + k])

    N = img.shape[0]
    x = F.conv2d(img, t("conv1.weight"), stride=patch)
    x = x.reshape(N, dim, -1).permute(0, 2, 1)  # [N, L, D]
    cls = t("class_embedding").expand(N, 1, dim)
    x = torch.cat([cls, x], dim=1) + t("positional_embedding")
    x = F.layer_norm(x, (dim,), t("ln_pre.weight"), t("ln_pre.bias"))
    for i in range(layers):
        pre = f"transformer.resblocks.{i}."
        h = F.layer_norm(x, (dim,), t(pre + "ln_1.weight"), t(pre + "ln_1.bias"))
        qkv = h @ t(pre + "attn.in_proj_weight").T + t(pre + "attn.in_proj_bias")
        q, k, v = qkv.chunk(3, dim=-1)
        hd = dim // heads

        def split(z):
            return z.reshape(N, -1, heads, hd).permute(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), dim=-1)
        o = (att @ v).permute(0, 2, 1, 3).reshape(N, -1, dim)
        x = x + (o @ t(pre + "attn.out_proj.weight").T
                 + t(pre + "attn.out_proj.bias"))
        h = F.layer_norm(x, (dim,), t(pre + "ln_2.weight"), t(pre + "ln_2.bias"))
        h = h @ t(pre + "mlp.c_fc.weight").T + t(pre + "mlp.c_fc.bias")
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        h = h @ t(pre + "mlp.c_proj.weight").T + t(pre + "mlp.c_proj.bias")
        x = x + h
    x = F.layer_norm(x[:, 0], (dim,), t("ln_post.weight"), t("ln_post.bias"))
    return x @ t("proj")


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with torch.no_grad():
        sd = seeded_lpips_state_dict()
        x0, x1 = lpips_inputs()
        lp = torch_lpips(sd, torch.as_tensor(x0), torch.as_tensor(x1))

        csd = seeded_clip_state_dict()
        ci = clip_inputs()
        ce = torch_clip_visual(csd, torch.as_tensor(ci))

    np.savez(
        OUT,
        lpips_dist=lp.numpy().astype(np.float32),
        clip_embed=ce.numpy().astype(np.float32),
    )
    print("lpips_dist", lp.numpy())
    print("clip_embed", ce.shape, float(ce.abs().mean()))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
