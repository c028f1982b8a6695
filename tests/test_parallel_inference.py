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


def _tiny_rig(bs=2):
    g = configs.tiny()
    rng = np.random.RandomState(0)
    cond = {
        "image_ortho_front": jnp.asarray(rng.rand(bs, 3, 64, 64).astype(np.float32)),
        "resnet_chonk": jnp.asarray(rng.randn(bs, 16, 8, 8).astype(np.float32)),
    }
    z = jnp.asarray(rng.randn(bs, g.z_dim).astype(np.float32))
    xin = {"z": z, "elevations": jnp.zeros(bs),
           "azimuths": jnp.linspace(0, 90, bs), "cond": cond}
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin,
                       method=TriPlaneGenerator.f, noise_mode="const")
    return g, variables, xin


def test_ray_sharded_render_matches_unsharded():
    """The 'rays' mesh axis (SURVEY.md §5): a (2 data, 4 rays) mesh render
    must match the unsharded output — rays are independent, so partitioning
    them is numerically a no-op."""
    from panic3d_tpu.parallel.inference import render_rays_sharded

    g, variables, xin = _tiny_rig(bs=2)
    plain = g.apply(variables, dict(xin, triplane_crop=0.1, cull_clouds=0.5),
                    method=TriPlaneGenerator.f, noise_mode="const")

    mesh = make_mesh(n_data=2, n_rays=4)
    sharded = render_rays_sharded(
        g, variables, dict(xin, triplane_crop=0.1, cull_clouds=0.5), mesh,
    )
    for k in ("image", "image_raw", "image_depth", "image_weights", "image_xyz"):
        np.testing.assert_allclose(
            sharded[k], np.asarray(plain[k]), atol=2e-4, err_msg=k,
        )


def test_ray_sharded_volume_decode_matches():
    """Point-axis sharding of the 256³-style volume decode (here 32³)."""
    from panic3d_tpu.eval.volume import get_volume

    g, variables, xin = _tiny_rig(bs=1)
    xin = {"z": xin["z"], "cond": xin["cond"], "triplane_crop": 0.1,
           "cull_clouds": 0.5}
    v_plain = get_volume(g, variables, xin, resolution=32, chunk=4096)
    mesh = make_mesh(n_data=1, n_rays=8)
    v_shard = get_volume(g, variables, xin, resolution=32, chunk=4096,
                         mesh=mesh)
    np.testing.assert_allclose(
        v_shard.densities, v_plain.densities, atol=1e-5,
    )
    np.testing.assert_allclose(v_shard.rgbs, v_plain.rgbs, atol=1e-5)
