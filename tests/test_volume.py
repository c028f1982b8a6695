"""Volume extraction + mesh path tests on the tiny generator (CPU).

Covers: create_samples grid layout vs the reference index convention,
get_volume reshape/flip convention, extract_mesh consistency with
get_volume + marching_cubes on the same model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu import configs
from panic3d_tpu.eval.volume import (
    create_samples,
    extract_mesh,
    get_volume,
    marching_cubes,
    sigma2density,
)
from panic3d_tpu.models.triplane import TriPlaneGenerator


def test_create_samples_reference_layout():
    """Oracle: the reference's index arithmetic (eg3d_metrics3d.py:70-92)."""
    N, L = 4, 2.0
    s = create_samples(N, L)
    import torch

    voxel_origin = np.array([0, 0, 0]) - L / 2
    voxel_size = L / (N - 1)
    overall_index = torch.arange(0, N**3, 1, out=torch.LongTensor())
    samples = torch.zeros(N**3, 3)
    samples[:, 2] = overall_index % N
    samples[:, 1] = (overall_index.float() / N) % N
    samples[:, 0] = ((overall_index.float() / N) / N) % N
    samples[:, 0] = (samples[:, 0] * voxel_size) + voxel_origin[2]
    samples[:, 1] = (samples[:, 1] * voxel_size) + voxel_origin[1]
    samples[:, 2] = (samples[:, 2] * voxel_size) + voxel_origin[0]
    np.testing.assert_allclose(s, samples.numpy(), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_gv():
    g = configs.tiny()
    rng = np.random.RandomState(0)
    cond = {
        "image_ortho_front": jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32)),
        "resnet_chonk": jnp.asarray(rng.randn(1, 16, 8, 8).astype(np.float32)),
    }
    xin = {"z": jnp.asarray(rng.randn(1, g.z_dim).astype(np.float32)),
           "elevations": jnp.zeros(1), "azimuths": jnp.zeros(1), "cond": cond}
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin,
                       method=TriPlaneGenerator.f, noise_mode="const")
    return g, variables, xin


def test_get_volume_shapes_and_density_range(tiny_gv):
    g, variables, xin = tiny_gv
    vol = get_volume(g, variables, xin, resolution=16, chunk=1024)
    assert vol.densities.shape == (1, 1, 16, 16, 16)
    assert vol.rgbs.shape == (1, 32, 16, 16, 16)
    assert vol.coordinates.shape == (1, 3, 16, 16, 16)
    d = vol.densities
    assert ((d >= 0) & (d <= 1)).all()  # sigma2density range, no filters
    # flip convention: coordinates along axis 2 (x) must be DEscending
    xs = vol.coordinates[0, 0, :, 0, 0]
    assert xs[0] > xs[-1]


def test_extract_mesh_matches_volume_path(tiny_gv):
    g, variables, xin = tiny_gv
    res = 16
    vol = get_volume(g, variables, xin, resolution=res, chunk=1024)
    level = float(np.quantile(vol.densities, 0.7))  # guarantee a surface
    mc_ref = marching_cubes(vol.densities[0, 0], vol.rgbs[0, :3],
                            g.rk["box_warp"], level=level)
    import jax.numpy as _jnp
    mc_fast = extract_mesh(g, variables, xin, resolution=res, chunk=1024,
                           level=level, density_dtype=_jnp.float32)
    # fp16 transfer variant: same topology, sub-voxel vertex shifts only
    mc_16 = extract_mesh(g, variables, xin, resolution=res, chunk=1024,
                         level=level)
    assert len(mc_16.verts) == len(mc_fast.verts)
    assert np.abs(mc_16.verts - mc_fast.verts).max() < 0.01
    assert len(mc_fast.verts) == len(mc_ref.verts)
    assert len(mc_fast.faces) == len(mc_ref.faces)
    np.testing.assert_allclose(mc_fast.verts, mc_ref.verts, atol=1e-4)
    # colors: fast path decodes at exact positions vs ref's integer-index
    # lookup; both in [0,1] and broadly consistent
    assert mc_fast.colors.shape == mc_ref.colors.shape
    assert (mc_fast.colors >= 0).all() and (mc_fast.colors <= 1).all()
    diff = np.abs(mc_fast.colors - mc_ref.colors).mean()
    assert diff < 0.2, diff
