"""Flagship-shape oracle parity vs committed torch goldens (slow tier).

VERDICT r3 item 3: `scripts/flagship_parity.py` ran the converted
torch-vs-JAX G.f diff ONCE at the real ecrutileE_eclustrousC shape
(512² output, triplane_width 32, backbone 256², 96+96 samples, fp32)
and committed the torch reference outputs (64×64 average-pooled) plus
the exact inputs to ``tests/goldens/flagship_parity_golden.npz``.
Measured full-resolution diffs live in ``FLAGSHIP_PARITY.json``
(max|Δimage| 0.021 on outputs in [-1,1]).

This test re-runs ONLY the JAX side: it rebuilds the torch reference
weights (deterministic: ``torch.manual_seed(0)`` init, no forward),
converts them, runs our G.f at the flagship shape, pools to 64×64, and
asserts against the committed torch goldens. Reference shapes:
triplane.py:313-508, eg3dc_v0.py:30-31,55-56.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "flagship_parity_golden.npz")

pytestmark = pytest.mark.slow


def test_flagship_shape_parity_vs_golden():
    import torch

    from ref_torch import load_reference_triplane
    from flagship_parity import CFG, OUT_KEYS, RK, SYN, pool64

    g_npz = np.load(GOLDEN)

    t = load_reference_triplane()
    torch.manual_seed(0)
    G = t.TriPlaneGenerator(rendering_kwargs=RK, **SYN, **CFG)
    G.eval()
    with torch.no_grad():
        G.decoder.net[2].bias[0] += 2.5  # same sigma bias as the script
    sd = {k: v.detach().numpy() for k, v in G.state_dict().items()}
    del G

    import jax
    import jax.numpy as jnp

    from panic3d_tpu.models.triplane import TriPlaneGenerator
    from panic3d_tpu.runtime.checkpoint import convert_generator_state

    g = TriPlaneGenerator(
        rendering_kwargs=RK, synthesis_kwargs=SYN,
        neural_rendering_resolution=64, **CFG,
    )
    x_j = {
        "z": jnp.asarray(g_npz["in_z"]),
        "elevations": jnp.asarray(g_npz["in_elevations"]),
        "azimuths": jnp.asarray(g_npz["in_azimuths"]),
        "distances": jnp.asarray(g_npz["in_distances"]),
        "fovs": jnp.asarray(g_npz["in_fovs"]),
        "cond": {
            "image_ortho_front": jnp.asarray(g_npz["in_img"]),
            "resnet_chonk": jnp.asarray(g_npz["in_chonk"]),
        },
        "triplane_crop": 0.1,
        "cull_clouds": 0.5,
    }
    tmpl = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda: g.init({"params": jax.random.PRNGKey(0)}, x_j,
                           method=TriPlaneGenerator.f, noise_mode="const")
        ),
    )
    variables, _, missing = convert_generator_state(sd, tmpl)
    assert missing == []

    out_j = jax.device_get(
        g.apply(variables, x_j, method=TriPlaneGenerator.f,
                noise_mode="const")
    )
    # pooled-grid tolerance: full-res maxdiff measured 0.026 across keys
    # (FLAGSHIP_PARITY.json); pooling averages it down, leave headroom
    # for BLAS/platform drift between golden capture and CI
    for k in OUT_KEYS:
        ours = pool64(np.asarray(out_j[k], np.float32))
        ref = g_npz[f"t_{k}"]
        assert ours.shape == ref.shape, (k, ours.shape, ref.shape)
        maxdiff = float(np.abs(ours - ref).max())
        scale = max(float(g_npz[f"t_{k}_absmean"]), 1e-3)
        assert maxdiff < 0.03 + 0.02 * scale, (k, maxdiff, scale)
