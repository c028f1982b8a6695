"""Snapshot-time GAN metric evaluation.

Role of the training loop's metric pass (training_loop_v0.py:487-498 +
src/calc_metrics.py): at each snapshot, generate samples with G_ema,
extract features for reals and fakes, compute the registered metrics
(eval/gan_metrics.py) and append metric-<name>.jsonl in the run dir.

The feature network is pluggable: pass converted InceptionV3/CLIP variables
for paper-comparable FID; default is the CLIP tower (random-init unless
weights are supplied) — relative values still track training progress.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np

from ..eval.gan_metrics import (
    FeatureStats,
    cached_dataset_stats,
    calc_metric,
    report_metric,
)


def make_clip_feature_fn(clip_variables=None):
    import jax.numpy as jnp

    from ..eval.metrics2d import CLIPSimilarity

    sim = CLIPSimilarity(clip_variables)

    def feature_fn(images01):
        """[N,3,H,W] in [0,1] -> [N,512] features."""
        return np.asarray(sim.embed(jnp.asarray(images01)))

    return feature_fn


def generate_fakes(G, vars_Gema, batch_iter: Iterator, n_items: int, key=None):
    """Yield [-1,1]->[0,1] G_ema images batch by batch (metric_utils role)."""
    import jax
    import jax.numpy as jnp

    from ..models.triplane import TriPlaneGenerator

    key = key if key is not None else jax.random.PRNGKey(0)
    done = 0
    while done < n_items:
        batch = next(batch_iter)
        key, zk = jax.random.split(key)
        bs = batch["camera"].shape[0]
        xin = {
            "z": jax.random.normal(zk, (bs, G.z_dim)),
            "camera_params": jnp.asarray(batch["camera"]),
            "cond": jax.tree_util.tree_map(jnp.asarray, batch["cond"]),
            "normalize_images": True,
        }
        out = G.apply(vars_Gema, xin, method=TriPlaneGenerator.f,
                      noise_mode="const")
        yield np.asarray(out["image"]) * 0.5 + 0.5
        done += bs


def evaluate_fid(
    G,
    vars_Gema,
    batch_iter_factory: Callable[[], Iterator],
    feature_fn: Callable,
    n_items: int = 50000,
    run_dir: Optional[str] = None,
    snapshot_name: Optional[str] = None,
    cache_dir: Optional[str] = None,
    dataset_key=None,
):
    """fid50k_full protocol: dataset stats (cached) vs n_items generated."""

    def compute_real():
        st = FeatureStats(max_items=n_items)
        for batch in batch_iter_factory():
            st.append(feature_fn(batch["cond"]["image"] * 0.5 + 0.5))
            if st.is_full:
                break
        return st

    if cache_dir is not None:
        real_stats = cached_dataset_stats(
            cache_dir, ("fid_real", dataset_key, n_items), compute_real
        )
    else:
        real_stats = compute_real()

    gen_stats = FeatureStats(max_items=n_items)
    for fakes in generate_fakes(G, vars_Gema, batch_iter_factory(), n_items):
        gen_stats.append(feature_fn(fakes))
        if gen_stats.is_full:
            break

    gs = gen_stats.get_mean_cov()
    rs = real_stats.get_mean_cov()
    from ..eval.gan_metrics import frechet_distance

    result = {
        "results": {"fid50k_full": frechet_distance(rs[0], rs[1], gs[0], gs[1])},
        "metric": "fid50k_full",
        "total_time": 0.0,
    }
    report_metric(result, run_dir=run_dir, snapshot_pkl=snapshot_name)
    return result
