"""AOT serving bundles (runtime/aot.py): jax.export round-trip parity.

The TPU serving artifact replacing the reference's source-embedding pickle
format (persistence.py:37-134): a code-free StableHLO module + weights.
Checks: exported call == direct apply (bit-equal), serialize/deserialize
round-trip, on-disk bundle reload, and input shape checking at call time.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu.models import TriPlaneGenerator
from panic3d_tpu.runtime.aot import (
    ServingBundle,
    export_view_renderer,
    save_serving_bundle,
)

from test_generator import TINY, tiny_cond

# Only the bundle round-trip rides the fast gate (it covers export +
# serialize + reload + shape-check in one compile); the other two are
# finer-grained slow-tier checks.


@pytest.fixture(scope="module")
def tiny_g_vars():
    g = TriPlaneGenerator(**TINY)
    xin = {
        "z": jnp.asarray(np.random.RandomState(0).randn(1, TINY["z_dim"]),
                         jnp.float32),
        "elevations": jnp.zeros(1),
        "azimuths": jnp.zeros(1),
        "cond": tiny_cond(),
    }
    variables = g.init(
        {"params": jax.random.PRNGKey(0)}, xin,
        method=TriPlaneGenerator.f, noise_mode="const",
    )
    return g, variables, xin


def test_exported_matches_direct_apply(tiny_g_vars):
    g, variables, xin = tiny_g_vars
    exported = export_view_renderer(g, variables, xin)
    got = exported.call(variables, xin)

    # Compare against the same jitted forward the exporter froze — the
    # export must be bit-equal to what jit(forward) computes; eager apply
    # may differ in fp association, so it is not the oracle here.
    @jax.jit
    def forward(variables, xin):
        out = g.apply(variables, xin, method=TriPlaneGenerator.f,
                      noise_mode="const")
        return {k: out[k] for k in ("image", "image_raw", "image_depth")}

    want = forward(variables, xin)
    for k in ("image", "image_raw", "image_depth"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_serialize_roundtrip(tiny_g_vars):
    g, variables, xin = tiny_g_vars
    exported = export_view_renderer(g, variables, xin)
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    re = jax.export.deserialize(bytes(blob))
    got = re.call(variables, xin)
    want = exported.call(variables, xin)
    np.testing.assert_array_equal(np.asarray(got["image"]),
                                  np.asarray(want["image"]))


@pytest.mark.fast
def test_bundle_save_load_and_shape_check(tmp_path, tiny_g_vars):
    g, variables, xin = tiny_g_vars
    path = str(tmp_path / "bundle")
    save_serving_bundle(path, g, variables, xin,
                        config={"model_kwargs": {"family": "tiny"}})
    b = ServingBundle(path)
    assert b.config["model_kwargs"]["family"] == "tiny"
    out = b(xin)

    @jax.jit
    def forward(variables, xin):
        out = g.apply(variables, xin, method=TriPlaneGenerator.f,
                      noise_mode="const")
        return out["image"]

    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  np.asarray(forward(variables, xin)))
    # Shapes/dtypes are frozen into the artifact: a wrong batch errors.
    bad = dict(xin, z=jnp.zeros((2, TINY["z_dim"]), jnp.float32))
    with pytest.raises(Exception):
        b(bad)


@pytest.mark.fast
def test_volume_decoder_export_roundtrip(tmp_path, tiny_g_vars):
    """Bundle with volume decoder: export at resolution 8, reload via
    ServingBundle.volume (regression for the missing module-level jnp
    import in runtime/aot.py — the volume path NameError'd at trace time)."""
    from panic3d_tpu.runtime.aot import export_volume_decoder

    g, variables, xin = tiny_g_vars
    path = str(tmp_path / "bundle")
    save_serving_bundle(path, g, variables, xin,
                        config={"model_kwargs": {"family": "tiny"}},
                        volume_resolution=8,
                        volume_kwargs=dict(chunk=128, triplane_crop=0.1,
                                           cull_clouds=0.5))
    b = ServingBundle(path)
    out = b.volume(xin)
    assert np.asarray(out["densities"]).shape == (1, 1, 8, 8, 8)
    assert np.asarray(out["sigmas"]).shape == (1, 1, 8, 8, 8)
    assert np.asarray(out["rgbs"]).shape[2:] == (8, 8, 8)
    assert np.isfinite(np.asarray(out["rgbs"])).all()
    # Round-trip is bit-equal to a fresh export's direct call.
    e = export_volume_decoder(g, variables, xin, resolution=8, chunk=128,
                              triplane_crop=0.1, cull_clouds=0.5)
    want = e.call(variables, {"z": xin["z"], "cond": xin["cond"]})
    np.testing.assert_array_equal(np.asarray(out["densities"]),
                                  np.asarray(want["densities"]))
    # Batch>1 is rejected up front (fmt() contract is [1, C, N, N, N]).
    bad = dict(xin, z=jnp.zeros((2, TINY["z_dim"]), jnp.float32))
    with pytest.raises(ValueError, match="batch-1"):
        export_volume_decoder(g, variables, bad, resolution=8)


def test_aot_cli_from_snapshot(tmp_path):
    """python -m panic3d_tpu.runtime.aot --ckpt ... --out ... end-to-end."""
    from panic3d_tpu import configs
    from panic3d_tpu.runtime import aot
    from panic3d_tpu.runtime.checkpoint import save_checkpoint

    mk = dict(family="tiny", cond_mode="ortho_front.add_4.reschonk_add_16")
    g = configs.tiny(cond_mode=mk["cond_mode"])
    xin = aot.example_xin_for(g, batch=1)
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin,
                       method=TriPlaneGenerator.f, noise_mode="const")
    snap = tmp_path / "run" / "network-snapshot-000002"
    save_checkpoint(str(snap), jax.device_get(variables),
                    config={"model_kwargs": mk})

    out = str(tmp_path / "bundle")
    aot.main(["--ckpt", str(snap), "--out", out])
    b = ServingBundle(out)
    res = b(aot.example_xin_for(configs.from_snapshot_config(b.config,
                                                            eval_mode=True)))
    img = np.asarray(res["image"])
    assert img.shape[0] == 1 and np.isfinite(img).all()


def test_multiplatform_export_from_cpu(tiny_g_vars):
    """One artifact carries cpu+tpu lowerings, built without a TPU client —
    the build-anywhere / serve-on-TPU property of the bundle format."""
    g, variables, xin = tiny_g_vars
    e = export_view_renderer(g, variables, xin, platforms=("cpu", "tpu"))
    assert tuple(e.platforms) == ("cpu", "tpu")
    re = jax.export.deserialize(bytes(e.serialize()))
    out = re.call(variables, xin)  # runs on the current (cpu) backend
    assert np.isfinite(np.asarray(out["image"])).all()
