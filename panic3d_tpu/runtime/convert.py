"""Weight converters: torch state_dicts -> this framework's flax trees.

Role of the reference's implicit weight ecosystem (SURVEY.md §5 checkpoint
notes): the released artifacts are torch — EG3D pickles (see checkpoint.py),
Lightning .ckpt for rmline/tagger (serving_v1.py:15-31), torchvision/openai
weights for the metric nets. Each converter maps names + layouts onto the
flax modules defined in panic3d_tpu.models / panic3d_tpu.eval.

All converters take an in-memory state_dict {name: np.ndarray}; loading the
torch file (torch.load / pickle) happens at the call site so these stay
testable without real artifacts.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_resnet50(state_dict: Dict[str, np.ndarray]):
    """torchvision resnet50 (or the danbooru tagger's `resnet.` trunk) ->
    models.resnet.ResNet50 variables."""
    sd = {k.replace("resnet.", ""): _np(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def conv_bn(dst, src_conv, src_bn):
        put(params, dst + ("w",), sd[src_conv + ".weight"])
        put(params, dst + ("bn", "scale"), sd[src_bn + ".weight"])
        put(params, dst + ("bn", "bias"), sd[src_bn + ".bias"])
        put(stats, dst + ("bn", "mean"), sd[src_bn + ".running_mean"])
        put(stats, dst + ("bn", "var"), sd[src_bn + ".running_var"])

    conv_bn(("stem",), "conv1", "bn1")
    layout = [3, 4, 6, 3]
    for li, blocks in enumerate(layout, start=1):
        for bi in range(blocks):
            base = f"layer{li}.{bi}"
            dst = (f"layer{li}_{bi}",)
            for ci in (1, 2, 3):
                conv_bn(dst + (f"conv{ci}",), f"{base}.conv{ci}", f"{base}.bn{ci}")
            if bi == 0:
                conv_bn(dst + ("downsample",), f"{base}.downsample.0",
                        f"{base}.downsample.1")
    params["fc_w"] = sd["fc.weight"]
    params["fc_b"] = sd["fc.bias"]
    return {"params": params, "batch_stats": stats}


def convert_inception_v3(state_dict: Dict[str, np.ndarray], eps: float = 1e-3):
    """torchvision / pytorch-fid `inception_v3` state_dict ->
    eval.inception.InceptionV3 variables, with every BatchNorm FOLDED into
    its conv (the flax net is inference-only: one conv+bias per layer).

    Source names: `<block>.conv.weight` + `<block>.bn.{weight,bias,
    running_mean,running_var}` for every BasicConv2d (block e.g.
    "Conv2d_1a_3x3" or "Mixed_5b.branch1x1"), plus `fc.{weight,bias}`
    ([1008, 2048] in the FID checkpoint, [1000, 2048] in torchvision's —
    both accepted). Folding runs in float64: w' = w * g/sqrt(v+eps),
    b' = beta - mean * g/sqrt(v+eps); eps=0.001 is torchvision's
    BatchNorm2d(eps=0.001) in BasicConv2d. AuxLogits.* entries (absent from
    the FID checkpoint, present in torchvision's) are ignored."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: dict = {}

    def put(path, val):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for k in sorted(sd):
        if not k.endswith(".conv.weight") or k.startswith("AuxLogits."):
            continue
        base = k[: -len(".conv.weight")]
        w = sd[k].astype(np.float64)
        g = sd[base + ".bn.weight"].astype(np.float64)
        beta = sd[base + ".bn.bias"].astype(np.float64)
        mean = sd[base + ".bn.running_mean"].astype(np.float64)
        var = sd[base + ".bn.running_var"].astype(np.float64)
        s = g / np.sqrt(var + eps)
        path = tuple(base.split("."))
        put(path + ("w",), (w * s[:, None, None, None]).astype(np.float32))
        put(path + ("b",), (beta - mean * s).astype(np.float32))
    params["fc_w"] = sd["fc.weight"]
    params["fc_b"] = sd["fc.bias"]
    return {"params": params}


def convert_lpips_alex(state_dict: Dict[str, np.ndarray]):
    """lpips.LPIPS(net='alex') state_dict -> eval.lpips.LPIPS variables.

    torch names: net.slice{1..5}.{i}.weight/bias (alexnet convs) and
    lin{0..4}.model.1.weight ([C,1,1,1] non-negative heads)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    # alexnet conv layer indices within torchvision .features
    conv_map = {
        "conv1": "net.slice1.0",
        "conv2": "net.slice2.3",
        "conv3": "net.slice3.6",
        "conv4": "net.slice4.8",
        "conv5": "net.slice5.10",
    }
    alex = {}
    for dst, src in conv_map.items():
        alex[f"{dst}_w"] = sd[f"{src}.weight"]
        alex[f"{dst}_b"] = sd[f"{src}.bias"]
    params = {"alex": alex}
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"]  # [C,1? or 1,C,1,1]
        params[f"lin{i}"] = w.reshape(-1)
    return {"params": params}


def convert_clip_vit_b32(state_dict: Dict[str, np.ndarray]):
    """openai CLIP ViT-B/32 'visual.' weights -> eval.metrics2d.CLIPImageViT."""
    sd = {
        k[len("visual."):]: _np(v)
        for k, v in state_dict.items()
        if k.startswith("visual.")
    }
    p: dict = {}
    p["patch_embed"] = sd["conv1.weight"]
    p["class_embedding"] = sd["class_embedding"]
    p["positional_embedding"] = sd["positional_embedding"]
    p["ln_pre"] = {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]}
    p["ln_post"] = {"scale": sd["ln_post.weight"], "bias": sd["ln_post.bias"]}
    p["proj"] = sd["proj"]
    for i in range(12):
        src = f"transformer.resblocks.{i}"
        p[f"block{i}"] = {
            "ln_1": {"scale": sd[f"{src}.ln_1.weight"], "bias": sd[f"{src}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{src}.ln_2.weight"], "bias": sd[f"{src}.ln_2.bias"]},
            "attn": {
                "in_proj_w": sd[f"{src}.attn.in_proj_weight"],
                "in_proj_b": sd[f"{src}.attn.in_proj_bias"],
                "out_proj_w": sd[f"{src}.attn.out_proj.weight"],
                "out_proj_b": sd[f"{src}.attn.out_proj.bias"],
            },
            # torch Linear stores [out,in]; flax Dense kernel is [in,out]
            "mlp_fc": {
                "kernel": sd[f"{src}.mlp.c_fc.weight"].T,
                "bias": sd[f"{src}.mlp.c_fc.bias"],
            },
            "mlp_proj": {
                "kernel": sd[f"{src}.mlp.c_proj.weight"].T,
                "bias": sd[f"{src}.mlp.c_proj.bias"],
            },
        }
    return {"params": p}


def convert_rmline(state_dict: Dict[str, np.ndarray], depth=6, use_bn=True):
    """rmlineganA Lightning ckpt ('generator.{i}.*') -> RMLineGenerator vars.

    The torch Sequential interleaves Conv2d/LeakyReLU/BatchNorm: conv at
    indices 0,3,6,... when batchnorm on (stride 3), else 0,2,4,...
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    gen = {k[len("generator."):]: v for k, v in sd.items() if k.startswith("generator.")}
    params: dict = {}
    stats: dict = {}
    stride = 3 if use_bn else 2
    for i in range(depth):
        ci = i * stride
        params[f"conv{i}_w"] = gen[f"{ci}.weight"]
        params[f"conv{i}_b"] = gen[f"{ci}.bias"]
        if use_bn and i != depth - 1:
            bi = ci + 2
            params[f"bn{i}"] = {"scale": gen[f"{bi}.weight"], "bias": gen[f"{bi}.bias"]}
            stats[f"bn{i}"] = {
                "mean": gen[f"{bi}.running_mean"],
                "var": gen[f"{bi}.running_var"],
            }
    return {"params": params, "batch_stats": stats}
