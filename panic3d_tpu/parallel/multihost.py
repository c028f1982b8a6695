"""Multi-host (multi-process) scaffolding: DCN-spanning meshes.

Role of the reference's process-per-GPU + NCCL file-store rendezvous
(`_train/eg3dc/trainers/train_eclustrousC.py:44-50,107-114`) and its
leader-only download barriers (`src/metrics/metric_utils.py:47-58`) —
re-expressed the JAX way: one process per host, `jax.distributed.initialize`
for rendezvous, a global Mesh spanning all processes (DP axis rides DCN
between slices, ICI within), `jax.make_array_from_process_local_data` to
assemble globally-sharded batches from per-host loader shards, and
`process_index()==0` gating for filesystem side effects.

Single-host runs are the no-op fast path throughout; the real multi-process
paths cannot be exercised on this one-chip host and are unit-tested by
faking process counts (tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process launch is configured.

    Configuration comes from explicit args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on TPU
    pods jax.distributed.initialize() also auto-detects from the metadata
    server when called with no args under multi-host TPU env). Returns True
    if initialization was performed.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_rank() -> int:
    return jax.process_index()


def process_world() -> int:
    return jax.process_count()


def is_leader() -> bool:
    """Gate for filesystem side effects (snapshots, stats jsonl, metric
    logs) — the reference's rank-0-only writes (training_loop_v0.py)."""
    return jax.process_index() == 0


def make_global_batch(tree, mesh, sharding):
    """Assemble a globally-sharded batch from per-process local data.

    Each process's loader yields ITS shard (InfiniteBatcher with
    rank=process_index, world=process_count); the returned jax.Arrays are
    globally addressable under `sharding`. Single-process: plain device_put.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), tree
    )
