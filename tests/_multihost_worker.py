"""Worker for the real 2-process multi-host test (test_multihost.py).

Run as: python _multihost_worker.py <rank> <world> <port> <out.json>

Each process does a REAL `jax.distributed.initialize` rendezvous on
localhost (the single-host stand-in for the reference's NCCL file-store
rendezvous, train_eclustrousC.py:44-50), feeds its own
`InfiniteBatcher(rank, world)` shard through `make_global_batch`'s
`jax.make_array_from_process_local_data` branch (multihost.py:69-83), and
runs sharded-jit SGD steps whose gradient mean crosses processes. The
leader writes the final params for the parent test to compare against a
single-process run.
"""

import json
import sys


def make_dataset(n=32, d=4, seed=123):
    """Deterministic toy dataset; identical in every process and in the
    parent's single-process reference."""
    import numpy as np

    rng = np.random.RandomState(seed)
    xs = rng.randn(n, d).astype(np.float32)
    w_true = rng.randn(d).astype(np.float32)
    ys = (xs @ w_true).astype(np.float32)
    return [{"x": xs[i], "y": ys[i : i + 1]} for i in range(n)]


def run_steps(batches, mesh, sharding, n_steps=3, d=4, lr=0.1,
              assemble=None):
    """SGD on mean-squared linear regression; batch sharded over 'data'."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(w, batch):
        def loss(w):
            pred = batch["x"] @ w
            return jnp.mean((pred - batch["y"][:, 0]) ** 2)

        g = jax.grad(loss)(w)
        return w - lr * g

    w = jax.device_put(jnp.zeros((d,), jnp.float32), rep)
    for _ in range(n_steps):
        b = next(batches)
        if assemble is not None:
            b = assemble(b)
        w = step(w, b)
    return w


def main():
    rank, world, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=world,
                               process_id=rank)
    import numpy as np

    from panic3d_tpu.data.dataset import InfiniteBatcher
    from panic3d_tpu.parallel import make_mesh
    from panic3d_tpu.parallel.mesh import batch_sharding
    from panic3d_tpu.parallel.multihost import (
        is_leader,
        make_global_batch,
        process_rank,
        process_world,
    )

    assert process_world() == world and process_rank() == rank
    assert len(jax.devices()) == world  # one CPU device per process
    mesh = make_mesh(n_data=world, n_rays=1, devices=jax.devices())
    sharding = batch_sharding(mesh)

    local_bs = 4
    batches = iter(InfiniteBatcher(make_dataset(), batch_size=local_bs,
                                   rank=rank, world=world, seed=7))
    w = run_steps(
        batches, mesh, sharding,
        assemble=lambda b: make_global_batch(b, mesh, sharding),
    )
    if is_leader():
        with open(out, "w") as f:
            json.dump([float(v) for v in np.asarray(w)], f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
