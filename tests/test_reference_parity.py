"""End-to-end numerical parity against the torch reference TriPlaneGenerator.

The reference model (`/root/reference/_train/eg3dc/src/training/triplane.py`)
is instantiated at a tiny-but-complete config on CPU, its state_dict is
converted through `runtime.checkpoint.convert_generator_state`, and `G.f`
outputs are diffed for pinhole AND ortho cameras with crop/cull filters on.

Constraints inherited from the reference:
- z_dim == w_dim (mapping_zplus reshape, triplane.py:142) and w_dim == 512
  (SR blocks hardcode w_dim=512, superresolution.py:276-280), so the tiny
  config shrinks resolution/channels, not w.
- Only SuperresolutionHybrid8XDC accepts `channels_hidden` (the other SR
  variants crash when triplane.py:65 forwards it), so img_resolution=512.
- Both sides run fp32 (num_fp16_res=0): the reference's fp16 is CUDA-gated
  off on CPU, and our bf16 mixed precision is its TPU analog — precision
  policy parity is asserted separately in test_bf16_close.
- The reference renderer is stochastic even at eval; `deterministic_reference`
  pins it to the same quadrature as our key=None path (midpoint stratified
  jitter, det-linspace importance draws).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")
from ref_torch import deterministic_reference, load_reference_triplane  # noqa: E402


RK = dict(
    image_resolution=512,
    disparity_space_sampling=False,
    clamp_mode="softplus",
    superresolution_module="training.superresolution.SuperresolutionHybrid8XDC",
    c_gen_conditioning_zero=True,
    c_scale=1.0,
    superresolution_noise_mode="none",
    density_reg=0.25,
    density_reg_p_dist=0.004,
    reg_type="l1",
    decoder_lr_mul=1.0,
    sr_antialias=True,
    white_back=True,
    triplane_depth=1,
    use_triplane=True,
    tanh_rgb_output=False,
    box_warp=0.7,
    ray_start=0.5,
    ray_end=1.5,
    depth_resolution=8,
    depth_resolution_importance=8,
    density_noise=0,
    render_dtype="float32",
)
CFG = dict(
    z_dim=512,
    c_dim=25,
    w_dim=512,
    img_resolution=512,
    img_channels=3,
    sr_num_fp16_res=0,
    mapping_kwargs={"num_layers": 2},
    cond_mode="ortho_front.add_shuffle2_4.reschonk_add_16.resnetcond_32",
    triplane_width=8,
    sr_channels_hidden=32,
    backbone_resolution=64,
)
SYN = dict(channel_base=2048, channel_max=64, num_fp16_res=0)

OUT_KEYS = ["image", "image_raw", "image_depth", "image_xyz", "image_weights",
            "triplane"]


def _inputs(seed=0, bs=2):
    rng = np.random.RandomState(seed)
    return dict(
        z=rng.randn(bs, 512).astype(np.float32),
        elevations=np.asarray([10.0, 0.0], np.float32)[:bs],
        azimuths=np.asarray([30.0, 0.0], np.float32)[:bs],
        distances=np.ones(bs, np.float32),
        fovs=np.asarray([30.0, -1.0], np.float32)[:bs],  # sample 1 is ortho
        img=rng.rand(bs, 3, 64, 64).astype(np.float32),
        chonk=rng.randn(bs, 16, 8, 8).astype(np.float32),
        feats=rng.randn(bs, 32).astype(np.float32),
    )


def _torch_x(d, torch, **extra):
    x = {
        "z": torch.tensor(d["z"]),
        "elevations": torch.tensor(d["elevations"]),
        "azimuths": torch.tensor(d["azimuths"]),
        "distances": torch.tensor(d["distances"]),
        "fovs": torch.tensor(d["fovs"]),
        "cond": {
            "image_ortho_front": torch.tensor(d["img"]),
            "resnet_chonk": torch.tensor(d["chonk"]),
            "resnet_feats": torch.tensor(d["feats"]),
        },
    }
    x.update(extra)
    return x


def _jax_x(d, **extra):
    x = {
        "z": jnp.asarray(d["z"]),
        "elevations": jnp.asarray(d["elevations"]),
        "azimuths": jnp.asarray(d["azimuths"]),
        "distances": jnp.asarray(d["distances"]),
        "fovs": jnp.asarray(d["fovs"]),
        "cond": {
            "image_ortho_front": jnp.asarray(d["img"]),
            "resnet_chonk": jnp.asarray(d["chonk"]),
            "resnet_feats": jnp.asarray(d["feats"]),
        },
    }
    x.update(extra)
    return x


@pytest.fixture(scope="module")
def pair():
    import torch

    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.runtime.checkpoint import convert_generator_state

    t = load_reference_triplane()
    torch.manual_seed(0)
    G = t.TriPlaneGenerator(rendering_kwargs=RK, **SYN, **CFG)
    G.neural_rendering_resolution = 16
    G.eval()
    with torch.no_grad():
        # random-init densities are uniformly thin; bias sigma up so weights /
        # crop / cull produce non-degenerate spatial structure to compare
        G.decoder.net[2].bias[0] += 2.5
    sd = {k: v.detach().numpy() for k, v in G.state_dict().items()}

    g = TriPlaneGenerator(
        rendering_kwargs=RK, synthesis_kwargs=SYN,
        neural_rendering_resolution=16, **CFG,
    )
    d = _inputs()
    tmpl = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(
            g.init({"params": jax.random.PRNGKey(0)}, _jax_x(d),
                   method=TriPlaneGenerator.f, noise_mode="const")
        ),
    )
    variables, converted, missing = convert_generator_state(sd, tmpl)
    # every reference entry except the recomputed resample_filter constants
    # must land in our tree
    assert missing == []
    n_filters = sum(k.endswith("resample_filter") for k in sd)
    assert len(converted) == len(sd) - n_filters
    return G, g, variables


def _run_both(pair, d, torch_extra=None, jax_extra=None, **f_kwargs):
    import torch

    from panic3d_tpu.models.triplane import TriPlaneGenerator

    G, g, variables = pair
    with deterministic_reference(G), torch.no_grad():
        out_t = G.f(_torch_x(d, torch, **(torch_extra or {})), **f_kwargs)
    out_j = g.apply(variables, _jax_x(d, **(jax_extra or {})),
                    method=TriPlaneGenerator.f, noise_mode="const", **f_kwargs)
    return out_t, out_j


def _assert_match(out_t, out_j, keys=OUT_KEYS, atol=1e-4):
    for k in keys:
        a = np.asarray(out_j[k], dtype=np.float32)
        b = out_t[k].detach().numpy()
        assert a.shape == b.shape, (k, a.shape, b.shape)
        d = np.abs(a - b).max()
        assert d <= atol, f"{k}: maxdiff {d:.3e} > {atol}"


def test_parity_pinhole_ortho_crop_cull(pair):
    """Mixed pinhole+ortho batch with triplane_crop + cull_clouds on."""
    d = _inputs()
    extra = {"triplane_crop": 0.1, "cull_clouds": 0.1}
    out_t, out_j = _run_both(pair, d, torch_extra=extra, jax_extra=extra)
    # sanity: the comparison is not degenerate
    assert out_t["image_weights"].numpy().std() > 1e-3
    _assert_match(out_t, out_j)


def test_parity_zplus_truncation_binarize(pair):
    """Distinct per-slot zs (mapping_zplus diagonal), truncation_psi<1,
    binarize_clouds, unnormalized images."""
    import torch

    d = _inputs(seed=1)
    rng = np.random.RandomState(7)
    num_ws = 10  # backbone 64²: 2*4+1 convs + final torgb
    zs = rng.randn(2, num_ws, 512).astype(np.float32)
    te = {"zs": torch.tensor(zs), "binarize_clouds": 0.05,
          "normalize_images": False}
    je = {"zs": jnp.asarray(zs), "binarize_clouds": 0.05,
          "normalize_images": False}
    out_t, out_j = _run_both(pair, d, torch_extra=te, jax_extra=je,
                             truncation_psi=0.7)
    _assert_match(out_t, out_j)


def test_parity_sample_mixed(pair):
    """G.sample_mixed (the 256³ volume-decode path, eg3d_metrics3d.py:124-151)."""
    import torch

    from panic3d_tpu.models.triplane import TriPlaneGenerator

    G, g, variables = pair
    d = _inputs()
    rng = np.random.RandomState(3)
    coords = (rng.rand(2, 333, 3).astype(np.float32) - 0.5) * 0.7
    dirs = np.zeros_like(coords)
    ws = rng.randn(2, 10, 512).astype(np.float32)
    cond_t = {"image_ortho_front": torch.tensor(d["img"]),
              "resnet_chonk": torch.tensor(d["chonk"]),
              "resnet_feats": torch.tensor(d["feats"])}
    with torch.no_grad():
        out_t = G.sample_mixed(torch.tensor(coords), torch.tensor(dirs),
                               torch.tensor(ws), cond_t)
    cond_j = {"image_ortho_front": jnp.asarray(d["img"]),
              "resnet_chonk": jnp.asarray(d["chonk"]),
              "resnet_feats": jnp.asarray(d["feats"])}
    out_j = g.apply(variables, jnp.asarray(coords), jnp.asarray(dirs),
                    jnp.asarray(ws), cond_j,
                    method=TriPlaneGenerator.sample_mixed, noise_mode="const")
    for k in ("rgb", "sigma"):
        a = np.asarray(out_j[k], dtype=np.float32)
        b = out_t[k].detach().numpy()
        assert np.abs(a - b).max() <= 1e-4, k


def test_bf16_close(pair):
    """Our TPU precision policy (bf16 blocks at high res, analog of the
    reference's CUDA fp16) stays within mixed-precision tolerance of the
    fp32 reference output."""
    import torch

    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.runtime.checkpoint import convert_generator_state

    G, _, _ = pair
    d = _inputs()
    g16 = TriPlaneGenerator(
        rendering_kwargs=dict(RK, render_dtype="bfloat16"),
        synthesis_kwargs=dict(SYN, num_fp16_res=4),
        neural_rendering_resolution=16, **CFG,
    )
    tmpl = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(
            g16.init({"params": jax.random.PRNGKey(0)}, _jax_x(d),
                     method=TriPlaneGenerator.f, noise_mode="const")
        ),
    )
    sd = {k: v.detach().numpy() for k, v in G.state_dict().items()}
    variables, _, missing = convert_generator_state(sd, tmpl)
    assert missing == []
    with deterministic_reference(G), torch.no_grad():
        out_t = G.f(_torch_x(d, torch))
    out_j = g16.apply(variables, _jax_x(d),
                      method=TriPlaneGenerator.f, noise_mode="const")
    for k, tol in [("image_raw", 0.05), ("image", 0.08), ("image_depth", 0.05)]:
        a = np.asarray(out_j[k], dtype=np.float32)
        b = out_t[k].detach().numpy()
        assert np.abs(a - b).max() <= tol, k
