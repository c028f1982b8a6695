"""Library-level Reconstructor API: portrait -> cond -> views + mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_reconstructor_tiny_end_to_end():
    from panic3d_tpu.api import Reconstructor

    # opts={}: random-init density would be fully culled by the
    # default crop/cull filters (all-white renders)
    rec = Reconstructor(tiny=True, view_batch=2, seed=0, opts={})
    # tiny cond_mode (add_shuffle2_4 at channel_max 64) takes a 64² front
    img = np.random.RandomState(0).rand(3, 64, 64).astype(np.float32)
    cond = rec.preprocess(img)
    assert cond["image_ortho_front"].shape == (1, 3, 64, 64)
    assert cond["resnet_chonk"].shape == (1, 16, 8, 8)

    # 3 views through a batch of 2 (exercises padding + multi-batch)
    out = rec.views(cond, elevations=[0, 0, 10], azimuths=[0, 90, 180],
                    fovs=[30, -1, 30])
    assert out.image.shape == (3, 3, 128, 128)
    assert out.image_xyz.shape[0] == 3 and out.image_weights.shape[0] == 3
    assert np.isfinite(out.image).all()
    # padded duplicate must not leak: view 1 (ortho) differs from view 0
    assert not np.allclose(out.image[0], out.image[1])

    spin = rec.turntable(cond, n=2)
    assert spin.shape == (2, 3, 128, 128)

    mesh = rec.mesh(cond, resolution=24)
    assert "verts" in mesh and "faces" in mesh and "colors" in mesh


def test_reconstructor_multichip_mesh_and_turntable():
    """Reconstructor(mesh=...) shards the turntable over 'data' and the
    volume decode over 'rays'; outputs match the unsharded instance."""
    from panic3d_tpu.api import Reconstructor
    from panic3d_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_rays=2)
    rec0 = Reconstructor(tiny=True, seed=0, opts={})
    img = np.random.RandomState(0).rand(3, 64, 64).astype(np.float32)
    cond = rec0.preprocess(img)
    spin0 = rec0.turntable(cond, n=4)

    rec = Reconstructor(tiny=True, seed=0, opts={}, mesh=mesh,
                        model=rec0.g, variables=rec0.variables)
    spin = rec.turntable(cond, n=4)
    np.testing.assert_allclose(np.asarray(spin), np.asarray(spin0),
                               rtol=2e-4, atol=2e-4)

    m0 = rec0.mesh(cond, resolution=16)
    m1 = rec.mesh(cond, resolution=16)
    assert len(m1.verts) == len(m0.verts)
