"""Converter structural tests: synthetic torch-layout state dicts must map
onto the flax modules and produce runnable variables."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_convert_resnet50_structure():
    from panic3d_tpu.models.resnet import ResNet50
    from panic3d_tpu.runtime.convert import convert_resnet50

    rng = np.random.RandomState(0)
    sd = {}

    def conv_bn(conv, bn, cout, cin, k):
        sd[conv + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
        sd[bn + ".weight"] = np.ones(cout, np.float32)
        sd[bn + ".bias"] = np.zeros(cout, np.float32)
        sd[bn + ".running_mean"] = np.zeros(cout, np.float32)
        sd[bn + ".running_var"] = np.ones(cout, np.float32)

    conv_bn("conv1", "bn1", 64, 3, 7)
    layout = [(64, 3), (128, 4), (256, 6), (512, 3)]
    cin = 64
    for li, (width, blocks) in enumerate(layout, start=1):
        for bi in range(blocks):
            b = f"layer{li}.{bi}"
            conv_bn(f"{b}.conv1", f"{b}.bn1", width, cin, 1)
            conv_bn(f"{b}.conv2", f"{b}.bn2", width, width, 3)
            conv_bn(f"{b}.conv3", f"{b}.bn3", width * 4, width, 1)
            if bi == 0:
                conv_bn(f"{b}.downsample.0", f"{b}.downsample.1", width * 4, cin, 1)
            cin = width * 4
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros(1000, np.float32)

    variables = convert_resnet50(sd)
    resnet = ResNet50()
    taps = resnet.apply(variables, jnp.zeros((1, 3, 64, 64)), return_taps=True)
    assert taps["fc"].shape == (1, 1000)
    assert np.isfinite(np.asarray(taps["fc"])).all()


def test_convert_lpips_structure():
    from panic3d_tpu.eval.lpips import LPIPS
    from panic3d_tpu.runtime.convert import convert_lpips_alex

    rng = np.random.RandomState(0)
    shapes = {
        "net.slice1.0": (64, 3, 11),
        "net.slice2.3": (192, 64, 5),
        "net.slice3.6": (384, 192, 3),
        "net.slice4.8": (256, 384, 3),
        "net.slice5.10": (256, 256, 3),
    }
    sd = {}
    for src, (co, ci, k) in shapes.items():
        sd[src + ".weight"] = rng.randn(co, ci, k, k).astype(np.float32) * 0.01
        sd[src + ".bias"] = np.zeros(co, np.float32)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.randn(1, c, 1, 1).astype(np.float32)
        )
    variables = convert_lpips_alex(sd)
    m = LPIPS()
    a = jnp.zeros((1, 3, 64, 64))
    d = m.apply(variables, a, a + 0.3)
    assert d.shape == (1,) and float(d[0]) > 0


def test_convert_clip_structure():
    from panic3d_tpu.eval.metrics2d import CLIPImageViT
    from panic3d_tpu.runtime.convert import convert_clip_vit_b32

    rng = np.random.RandomState(0)
    D, L = 768, 12
    sd = {
        "visual.conv1.weight": rng.randn(D, 3, 32, 32).astype(np.float32) * 0.01,
        "visual.class_embedding": rng.randn(D).astype(np.float32) * 0.01,
        "visual.positional_embedding": rng.randn(50, D).astype(np.float32) * 0.01,
        "visual.ln_pre.weight": np.ones(D, np.float32),
        "visual.ln_pre.bias": np.zeros(D, np.float32),
        "visual.ln_post.weight": np.ones(D, np.float32),
        "visual.ln_post.bias": np.zeros(D, np.float32),
        "visual.proj": rng.randn(D, 512).astype(np.float32) * 0.01,
    }
    for i in range(L):
        b = f"visual.transformer.resblocks.{i}"
        sd[f"{b}.ln_1.weight"] = np.ones(D, np.float32)
        sd[f"{b}.ln_1.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.ln_2.weight"] = np.ones(D, np.float32)
        sd[f"{b}.ln_2.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.attn.in_proj_weight"] = rng.randn(3 * D, D).astype(np.float32) * 0.01
        sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * D, np.float32)
        sd[f"{b}.attn.out_proj.weight"] = rng.randn(D, D).astype(np.float32) * 0.01
        sd[f"{b}.attn.out_proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = rng.randn(4 * D, D).astype(np.float32) * 0.01
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * D, np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = rng.randn(D, 4 * D).astype(np.float32) * 0.01
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros(D, np.float32)

    variables = convert_clip_vit_b32(sd)
    m = CLIPImageViT()
    z = m.apply(variables, jnp.zeros((1, 3, 224, 224)))
    assert z.shape == (1, 512)
    assert np.isfinite(np.asarray(z)).all()


def test_convert_rmline_structure():
    from panic3d_tpu.models.rmlinegan import RMLineGenerator
    from panic3d_tpu.runtime.convert import convert_rmline

    rng = np.random.RandomState(0)
    sd = {}
    chin = 4
    width = 32
    for i in range(6):
        ci = i * 3
        cout = width if i != 5 else 3
        sd[f"generator.{ci}.weight"] = rng.randn(
            cout, chin if i == 0 else width, 3, 3
        ).astype(np.float32) * 0.1
        sd[f"generator.{ci}.bias"] = np.zeros(cout, np.float32)
        if i != 5:
            bi = ci + 2
            sd[f"generator.{bi}.weight"] = np.ones(width, np.float32)
            sd[f"generator.{bi}.bias"] = np.zeros(width, np.float32)
            sd[f"generator.{bi}.running_mean"] = np.zeros(width, np.float32)
            sd[f"generator.{bi}.running_var"] = np.ones(width, np.float32)

    variables = convert_rmline(sd)
    gen = RMLineGenerator()
    out = gen.apply(variables, jnp.zeros((1, 4, 33, 33)))
    assert out.shape == (1, 3, 21, 21)


def test_reference_pickle_extraction(tmp_path):
    """Round-trip a persistence-style pickle through the shimmed unpickler."""
    import pickle
    import torch

    from panic3d_tpu.runtime.checkpoint import extract_reference_generator

    # build a nested torch-module-like state the way persistence stores it
    def module_state(params=None, buffers=None, modules=None, extra=None):
        d = {
            "_parameters": params or {},
            "_buffers": buffers or {},
            "_modules": modules or {},
        }
        d.update(extra or {})
        return d

    inner = module_state(params={"weight": torch.ones(2, 3)})
    meta = {
        "type": "class",
        "version": 6,
        "module_src": "print('SHOULD NEVER RUN')",
        "class_name": "Foo",
        "state": module_state(
            params={"bias": torch.zeros(4)},
            buffers={"w_avg": torch.ones(5)},
            modules={"backbone": inner},
            extra={"init_args": (1, 2), "init_kwargs": {"z_dim": 64},
                   "neural_rendering_resolution": 64},
        ),
    }

    # register a fake torch_utils.persistence so pickling records the exact
    # global name the reference uses for its reconstruction hook
    import sys
    import types

    fake_tu = types.ModuleType("torch_utils")
    fake_pers = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(m):  # never called on load (shimmed)
        raise AssertionError("should be shimmed out")

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    fake_pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    fake_tu.persistence = fake_pers
    sys.modules["torch_utils"] = fake_tu
    sys.modules["torch_utils.persistence"] = fake_pers

    class FakePersist:
        def __reduce__(self):
            return (_reconstruct_persistent_obj, (meta,))

    payload = pickle.dumps({"G_ema": FakePersist()})
    del sys.modules["torch_utils"], sys.modules["torch_utils.persistence"]
    p = tmp_path / "net.pkl"
    p.write_bytes(payload)

    sd, init_args, init_kwargs, extras = extract_reference_generator(str(p))
    assert init_args == (1, 2) and init_kwargs == {"z_dim": 64}
    assert extras["neural_rendering_resolution"] == 64
    np.testing.assert_array_equal(sd["bias"], np.zeros(4))
    np.testing.assert_array_equal(sd["w_avg"], np.ones(5))
    np.testing.assert_array_equal(sd["backbone.weight"], np.ones((2, 3)))
