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


def test_reference_persistence_snapshot_roundtrip(tmp_path):
    """Converter drill against a snapshot authored by the reference's OWN
    persistence machinery.

    The real `/root/reference/.../torch_utils/persistence.py` is live in this
    venv the moment the reference triplane module imports (its classes are
    decorated with the real @persistent_class), so pickling a reference G
    exactly as training_loop_v0.py:470-485 does produces a byte-identical
    snapshot format. The drill proves, with zero hand-faked machinery:
      1. the shimmed unpickler walks real nested persistence objects;
      2. `_init_args`/`_init_kwargs` recovery reconstructs the model config
         (the eg3dc_v0.py:41-52 rebuild trick);
      3. the converted weights drive our G.f to 1e-4 of the torch oracle.
    The only remaining real-checkpoint risk is bytes this env cannot have.
    """
    import copy
    import pickle
    import sys

    import torch

    sys.path.insert(0, "tests")
    from ref_torch import deterministic_reference, load_reference_triplane

    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.runtime.checkpoint import (
        convert_generator_state,
        extract_reference_generator,
        generator_config_from_init_kwargs,
    )
    from test_reference_parity import CFG, RK, SYN, _inputs, _jax_x, _torch_x

    t = load_reference_triplane()
    torch.manual_seed(0)
    G = t.TriPlaneGenerator(rendering_kwargs=RK, **SYN, **CFG)
    G.neural_rendering_resolution = 16
    with torch.no_grad():
        G.decoder.net[2].bias[0] += 2.5  # non-degenerate densities

    # author the snapshot EXACTLY as the reference training loop does
    # (training_loop_v0.py:470-485): eval/requires_grad_(False)/cpu deepcopy
    # of each module, training_set_kwargs dict, plain pickle.dump
    import dnnlib  # the reference's dnnlib, importable via ref_torch sys.path

    snapshot_data = dict(
        training_set_kwargs=dnnlib.EasyDict(
            class_name="datasets.ecrutileE.DatasetWrapper", path="/data",
        )
    )
    for name, module in [("G", G), ("D", None), ("G_ema", G),
                         ("augment_pipe", None)]:
        if module is not None:
            module = copy.deepcopy(module).eval().requires_grad_(False).cpu()
        snapshot_data[name] = module
        del module
    snapshot_pkl = tmp_path / "network-snapshot-000000.pkl"
    with open(snapshot_pkl, "wb") as f:
        pickle.dump(snapshot_data, f)

    # ---- converter under test -------------------------------------------
    sd, init_args, init_kwargs, extras = extract_reference_generator(
        str(snapshot_pkl), key="G_ema"
    )
    assert init_args == ()  # trainer constructs by keyword
    # recovered kwargs reconstruct the config (eg3dc_v0.py:41-52 role) —
    # every ctor input we fed in comes back out
    for k, v in CFG.items():
        assert init_kwargs[k] == v, k
    for k, v in SYN.items():
        assert init_kwargs[k] == v, k
    assert dict(init_kwargs["rendering_kwargs"]) == RK
    assert extras["neural_rendering_resolution"] == 16

    cfg = generator_config_from_init_kwargs(init_kwargs, extras)
    assert cfg["synthesis_kwargs"] == SYN
    g = TriPlaneGenerator(**cfg)
    assert g.neural_rendering_resolution == 16

    # state_dict extracted through the pickle == the module's own state_dict
    direct = {k: v.detach().numpy() for k, v in G.state_dict().items()}
    assert set(sd) == set(direct)
    for k in direct:
        np.testing.assert_array_equal(sd[k], direct[k], err_msg=k)

    # converted weights drive our generator to parity
    d = _inputs(bs=2)
    tmpl = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(
            g.init({"params": jax.random.PRNGKey(0)}, _jax_x(d),
                   method=TriPlaneGenerator.f, noise_mode="const")
        ),
    )
    variables, converted, missing = convert_generator_state(sd, tmpl)
    assert missing == []
    with deterministic_reference(G), torch.no_grad():
        out_t = G.f(_torch_x(d, torch))
    out_j = g.apply(variables, _jax_x(d), method=TriPlaneGenerator.f,
                    noise_mode="const")
    for k in ("image", "image_raw", "image_depth"):
        a = np.asarray(out_j[k], dtype=np.float32)
        b = out_t[k].detach().numpy()
        assert np.abs(a - b).max() <= 1e-4, k
