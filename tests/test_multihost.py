"""Multi-host scaffolding tests (faked process counts — one-chip host).

The real multi-process rendezvous cannot run here; these tests pin the
single-process fast paths and the rank/leader logic the multi-host launch
relies on (reference role: train_eclustrousC.py:44-50 rendezvous +
rank-0-only IO; see parallel/multihost.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from panic3d_tpu.parallel import make_mesh
from panic3d_tpu.parallel.mesh import batch_sharding
import pytest

from panic3d_tpu.parallel.multihost import (
    is_leader,
    make_global_batch,
    maybe_initialize_distributed,
    process_rank,
    process_world,
)

pytestmark = pytest.mark.fast


def test_no_distributed_without_config(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False


def test_single_process_identity():
    assert process_rank() == 0
    assert process_world() == 1
    assert is_leader()


def test_leader_gating_faked(monkeypatch):
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert process_rank() == 3
    assert process_world() == 4
    assert not is_leader()


def test_make_global_batch_single_process():
    mesh = make_mesh(n_data=4, n_rays=1)
    sh = batch_sharding(mesh)
    tree = {"x": jnp.arange(8.0).reshape(8, 1), "y": {"z": jnp.ones((8, 3))}}
    out = make_global_batch(tree, mesh, sh)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(tree["x"]))
    assert out["x"].sharding.is_equivalent_to(sh, 2)
    assert len(out["x"].addressable_shards) == 4
