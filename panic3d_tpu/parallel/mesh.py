"""Device mesh + sharding helpers.

Role of the reference's entire distributed machinery (SURVEY.md §2.8):
process-per-GPU spawn, param broadcast, InfiniteSampler rank sharding, and
the manual flatten->all_reduce gradient sync (training_loop_v0.py:204-211,
363-375) are all replaced by a jax.sharding.Mesh and sharded jit — XLA
inserts the psum/all-gather collectives over ICI.

Axes:
- 'data':  batch-axis data parallelism (the reference's only strategy).
- 'rays':  intra-sample parallelism over the ray/pixel axis of the volume
  renderer — the framework's analog of sequence parallelism (SURVEY.md §5).
  Rays are embarrassingly parallel (per-ray cumprod stays local), so this
  axis scales single-image latency across chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_rays: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_rays
    assert n_data * n_rays <= len(devices)
    dev = np.asarray(devices[: n_data * n_rays]).reshape(n_data, n_rays)
    return Mesh(dev, axis_names=("data", "rays"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [N, rays, ...] tensors: batch over 'data', rays over 'rays'."""
    return NamedSharding(mesh, P("data", "rays"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
