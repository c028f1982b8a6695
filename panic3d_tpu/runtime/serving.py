"""Run-name conventions + checkpoint resolution.

Role of `_util/{serving_v1,training_v1}.py`: run names follow
`<dataset>_<model>_<version>` (training_v1.py:101-207); `Checkpoint(run,
epoch).model()` resolves the newest/named snapshot (serving_v1.py:15-31).
Here runs live under `<outdir>/<name>/network-snapshot-*` (the trainer's
layout) and resolve to (variables, config) pairs.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

from .checkpoint import load_checkpoint


def parse_run_name(name: str) -> dict:
    """'ecrutileE_eclustrousC_n120' -> dataset/model/version parts."""
    parts = name.split("_")
    if len(parts) < 3:
        return {"dataset": name, "model": None, "version": None}
    return {"dataset": parts[0], "model": parts[1], "version": "_".join(parts[2:])}


class Checkpoint:
    """Resolve + load a run snapshot (serving_v1.Checkpoint role)."""

    def __init__(self, run: str, step: Optional[int] = None,
                 outdir: str = "./_runs"):
        self.run_dir = os.path.join(outdir, run)
        self.step = step

    def path(self) -> str:
        if self.step is not None:
            p = os.path.join(self.run_dir, f"network-snapshot-{self.step:06d}")
            if os.path.isdir(p):
                return p
        snaps = sorted(
            d for d in os.listdir(self.run_dir)
            if re.match(r"network-snapshot-\d+$", d)
        )
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self.run_dir}")
        return os.path.join(self.run_dir, snaps[-1])

    def load(self) -> Tuple[dict, Optional[dict]]:
        return load_checkpoint(self.path())
