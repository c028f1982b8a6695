"""Mesh-sharded inference: view-parallel turntables + batch rendering.

The framework's analog of sequence parallelism (SURVEY.md §5): the natural
long axis at inference is views x rays. Views are embarrassingly parallel,
so a turntable (quickspin, eg3dc_v0.py:64-87) or the eval sweep shards its
view batch across the 'data' axis of the device Mesh — one jitted call
renders n_devices views concurrently; XLA keeps the replicated params
resident and partitions every per-view tensor.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.triplane import TriPlaneGenerator


def render_views_sharded(
    G: TriPlaneGenerator,
    variables,
    cond: dict,
    elevations,
    azimuths,
    mesh,
    fovs=None,
    z=None,
    triplane_crop: Optional[float] = None,
    cull_clouds: Optional[float] = None,
    noise_mode: str = "const",
):
    """Render a batch of views of ONE identity, views sharded over 'data'.

    cond entries are [1, ...] and broadcast; elevations/azimuths [V] with V
    divisible by the data-axis size. Returns host numpy images [V, 3, H, W].
    """
    V = len(elevations)
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    cond_b = {
        k: jnp.broadcast_to(v, (V,) + v.shape[1:]) for k, v in cond.items()
    }
    if z is None:
        z = jnp.zeros((1, G.z_dim))
    z_b = jnp.broadcast_to(z, (V, G.z_dim))

    xin = {
        "z": z_b,
        "elevations": jnp.asarray(elevations, dtype=jnp.float32),
        "azimuths": jnp.asarray(azimuths, dtype=jnp.float32),
        "cond": cond_b,
    }
    if fovs is not None:
        xin["fovs"] = jnp.asarray(fovs, dtype=jnp.float32)
    if triplane_crop:
        xin["triplane_crop"] = triplane_crop
    if cull_clouds:
        xin["cull_clouds"] = cull_clouds

    xin = jax.tree_util.tree_map(lambda a: jax.device_put(a, data_sharding), xin)
    variables = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), variables
    )

    @jax.jit
    def run(variables, xin):
        out = G.apply(variables, xin, method=TriPlaneGenerator.f,
                      noise_mode=noise_mode)
        return out["image"]

    return np.asarray(run(variables, xin))


def render_rays_sharded(
    G: TriPlaneGenerator,
    variables,
    xin: dict,
    mesh,
    noise_mode: str = "const",
    outputs=("image", "image_raw", "image_depth", "image_weights", "image_xyz"),
):
    """Render with the RAY axis of the volume render sharded over 'rays'
    (and the batch over 'data') — the single-portrait latency axis
    (SURVEY.md §5: rays are the framework's sequence dimension).

    The ray partition rides jax.lax.with_sharding_constraint inside the
    renderer (models/volumetric/renderer.py): every per-ray tensor —
    stratified depths, triplane gathers, decoder MLP, importance resample,
    sort, composite — is partitioned by XLA SPMD with no collectives (the
    per-ray cumprod stays local). Bit-matches the unsharded render
    (tests/test_parallel_inference.py).
    """
    repl = NamedSharding(mesh, P())
    rs = NamedSharding(mesh, P("data", "rays"))
    variables = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), variables)

    # shape-determining / python-branch args must stay static under jit
    xin = dict(xin)
    static = {
        k: xin.pop(k)
        for k in ("triplane_crop", "cull_clouds", "binarize_clouds",
                  "paste_params", "neural_rendering_resolution",
                  "normalize_images", "update_emas")
        if k in xin
    }

    @jax.jit
    def run(variables, xin):
        out = G.apply(variables, dict(xin, **static),
                      method=TriPlaneGenerator.f,
                      noise_mode=noise_mode, ray_sharding=rs)
        return {k: out[k] for k in outputs if k in out}

    return jax.tree_util.tree_map(np.asarray, run(variables, xin))
