"""Standalone calc_metrics CLI (src/calc_metrics.py role): load a snapshot,
compute registered metrics off-trainer, append metric-<name>.jsonl."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from panic3d_tpu import configs
from panic3d_tpu.data.dataset import synthetic_batch
from panic3d_tpu.models.triplane import TriPlaneGenerator
from panic3d_tpu.runtime.checkpoint import save_checkpoint


def test_calc_metrics_cli_end_to_end(tmp_path):
    from panic3d_tpu.eval import calc_metrics

    mk = dict(family="tiny", cond_mode="ortho_front.add_4.reschonk_add_16")
    g = configs.tiny(cond_mode=mk["cond_mode"])
    batch = synthetic_batch(bs=2, size=g.img_resolution, chonk_ch=16,
                            feat_dim=32)
    xin = {"z": jnp.zeros((2, g.z_dim)),
           "camera_params": jnp.asarray(batch["camera"]),
           "cond": jax.tree_util.tree_map(jnp.asarray, batch["cond"])}
    variables = g.init({"params": jax.random.PRNGKey(0)}, xin,
                       method=TriPlaneGenerator.f, noise_mode="const")
    snap = tmp_path / "run" / "network-snapshot-000002"
    save_checkpoint(str(snap), jax.device_get(variables),
                    config={"model_kwargs": mk})

    calc_metrics.main([
        "--ckpt", str(snap), "--synthetic", "--batch", "2",
        "--metrics", "fid_clip,ppl2_wend", "--metric-items", "4",
    ])
    run_dir = str(tmp_path / "run")
    for name in ("fid_clip", "ppl2_wend"):
        jl = os.path.join(run_dir, f"metric-{name}.jsonl")
        assert os.path.isfile(jl), os.listdir(run_dir)
        rec = json.loads(open(jl).read().strip().splitlines()[-1])
        assert np.isfinite(rec["results"][name])
        assert rec["snapshot_pkl"] == "network-snapshot-000002"
