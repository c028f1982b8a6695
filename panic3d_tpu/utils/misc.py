"""Small invariants + distributed-consistency helpers.

Role of `src/torch_utils/misc.py`: assert_shape (used through the networks),
params/buffers access, cross-replica parameter consistency checking (the
reference's check_ddp_consistency, misc.py:182-196), module summaries.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]):
    """misc.py:84-100: None entries are wildcards."""
    if x.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}"
        )
    for i, (size, ref) in enumerate(zip(x.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(
                f"Wrong size for dimension {i}: got {size}, expected {ref}"
            )


def tree_hash(tree) -> str:
    """Content hash of a pytree of arrays (for snapshot audit trails)."""
    h = hashlib.md5()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(tree)[0], key=lambda kv: str(kv[0])
    ):
        h.update(str(path).encode())
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def check_replica_consistency(tree, mesh=None) -> bool:
    """check_ddp_consistency role (misc.py:182-196): verify every device's
    copy of replicated params is identical.

    Under sharded jit the optimizer state/params are replicated by XLA, so
    this audits the runtime rather than the algorithm; it catches silent
    desync from host bugs or bad donation.
    """
    ok = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        # only replicated leaves can be compared shard-to-shard
        if shards[0].data.shape != leaf.shape:
            continue
        first = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(first, np.asarray(s.data)):
                print(f"replica mismatch at {path}")
                ok = False
                break
    return ok


def count_params(tree) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def print_module_summary(module, variables, depth: int = 2):
    """misc.py:198 role: parameter-count summary per top-level submodule."""
    params = variables.get("params", variables)

    def walk(node, prefix, d):
        rows = []
        if isinstance(node, dict) and d < depth:
            for k, v in node.items():
                rows += walk(v, f"{prefix}/{k}" if prefix else k, d + 1)
        else:
            rows.append((prefix, count_params(node)))
        return rows

    rows = walk(params, "", 0)
    total = sum(n for _, n in rows)
    width = max(len(r[0]) for r in rows) + 2
    lines = [f"{name:<{width}} {n:>12,}" for name, n in rows]
    lines.append(f"{'TOTAL':<{width}} {total:>12,}")
    out = "\n".join(lines)
    print(out)
    return total
