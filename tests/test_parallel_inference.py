"""Mesh-sharded inference test: 8 turntable views sharded over 8 CPU devices
must equal the unsharded render."""

import numpy as np
import jax
import jax.numpy as jnp

from panic3d_tpu import configs
from panic3d_tpu.models.triplane import TriPlaneGenerator
from panic3d_tpu.parallel import make_mesh
from panic3d_tpu.parallel.inference import render_views_sharded


def test_sharded_turntable_matches_single_device():
    g = configs.tiny()
    rng = np.random.RandomState(0)
    cond = {
        "image_ortho_front": jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32)),
        "resnet_chonk": jnp.asarray(rng.randn(1, 16, 8, 8).astype(np.float32)),
    }
    z = jnp.asarray(rng.randn(1, g.z_dim).astype(np.float32))
    xin0 = {"z": z, "elevations": jnp.zeros(1), "azimuths": jnp.zeros(1),
            "cond": cond}
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin0,
                       method=TriPlaneGenerator.f, noise_mode="const")

    azims = np.linspace(0, 315, 8).astype(np.float32)
    mesh = make_mesh(n_data=8, n_rays=1)
    sharded = render_views_sharded(
        g, variables, cond, np.zeros(8, np.float32), azims, mesh, z=z,
    )
    assert sharded.shape == (8, 3, 128, 128)
    assert np.isfinite(sharded).all()

    # reference: same batch, no sharding annotations
    xin = {
        "z": jnp.broadcast_to(z, (8, g.z_dim)),
        "elevations": jnp.zeros(8),
        "azimuths": jnp.asarray(azims),
        "cond": {k: jnp.broadcast_to(v, (8,) + v.shape[1:]) for k, v in cond.items()},
    }
    plain = np.asarray(
        g.apply(variables, xin, method=TriPlaneGenerator.f, noise_mode="const")["image"]
    )
    np.testing.assert_allclose(sharded, plain, atol=2e-4)
