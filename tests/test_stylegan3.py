"""Alias-free (StyleGAN3) synthesis layer vs the torch reference.

Oracle: `training.networks_stylegan3.SynthesisLayer` imported from
/root/reference on CPU (its filtered_lrelu falls back to the pure-torch ref
impl off-GPU, ops/filtered_lrelu.py:123+), weights copied into our flax
AFSynthesisLayer.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _load_ref_sg3():
    from ref_torch import load_reference_triplane

    load_reference_triplane()  # installs stubs + sys.path
    import training.networks_stylegan3 as sg3  # type: ignore

    return sg3


GEOMS = [
    # (is_torgb, critically_sampled, radial): a mid-band layer, the final
    # torgb (identity filters, 1x1 kernel), and a radial-filter layer
    dict(is_torgb=False, is_critically_sampled=False, use_radial_filters=False),
    dict(is_torgb=True, is_critically_sampled=True, use_radial_filters=False),
    dict(is_torgb=False, is_critically_sampled=False, use_radial_filters=True),
]


@pytest.mark.parametrize("geom", GEOMS)
def test_af_synthesis_layer_matches_reference(geom):
    import torch

    sg3 = _load_ref_sg3()
    from panic3d_tpu.models.stylegan3 import AFSynthesisLayer

    kw = dict(
        w_dim=16, use_fp16=False, in_channels=8, out_channels=8,
        in_size=16, out_size=16, in_sampling_rate=16, out_sampling_rate=16,
        in_cutoff=4.0, out_cutoff=4.0, in_half_width=4.0, out_half_width=4.0,
        conv_clamp=256, **geom,
    )
    ref = sg3.SynthesisLayer(**kw)
    ours = AFSynthesisLayer(**kw)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 16, 16).astype(np.float32)
    w = rng.randn(2, 16).astype(np.float32)

    variables = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(w)
    )
    p = variables["params"]
    with torch.no_grad():
        ref.affine.weight.copy_(torch.tensor(np.asarray(p["affine"]["weight"])))
        ref.affine.bias.copy_(torch.tensor(np.asarray(p["affine"]["bias"])))
        ref.weight.copy_(torch.tensor(np.asarray(p["weight"])))
        ref.bias.copy_(torch.tensor(np.asarray(p["bias"])))
        out_ref = ref(torch.tensor(x), torch.tensor(w)).numpy()

    out_ours = np.asarray(ours.apply(variables, jnp.asarray(x), jnp.asarray(w)))
    assert out_ours.shape == out_ref.shape == (2, 8, 16, 16)
    np.testing.assert_allclose(out_ours, out_ref, atol=2e-4)


def test_af_layer_magnitude_ema_updates():
    from panic3d_tpu.models.stylegan3 import AFSynthesisLayer

    layer = AFSynthesisLayer(
        w_dim=16, is_torgb=False, is_critically_sampled=False, use_fp16=False,
        in_channels=8, out_channels=8, in_size=16, out_size=16,
        in_sampling_rate=16, out_sampling_rate=16,
        in_cutoff=4.0, out_cutoff=4.0, in_half_width=4.0, out_half_width=4.0,
    )
    x = jnp.ones((1, 8, 16, 16)) * 3.0
    w = jnp.zeros((1, 16))
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x, w)
    assert float(variables["buffers"]["magnitude_ema"]) == 1.0
    _, new_vars = layer.apply(variables, x, w, update_emas=True,
                              mutable=["buffers"])
    ema = float(new_vars["buffers"]["magnitude_ema"])
    # moved toward mean(x^2)=9 with beta .999
    assert abs(ema - (9.0 + (1.0 - 9.0) * 0.999)) < 1e-4
