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


def make_inception_feature_fn(inception_variables=None, probs: bool = False):
    """The reference's FID/KID/PR/IS detector (`inception-2015-12-05.pkl`,
    metric_utils.py:209-263): InceptionV3 pool features [N,2048], or the
    1008-way softmax (probs=True, no_output_bias — inception_score.py:23).

    With converted weights (runtime.convert.convert_inception_v3) the
    values are paper-comparable; random-init otherwise (architecture-exact,
    relative values only)."""
    import jax
    import jax.numpy as jnp

    from ..eval.inception import InceptionV3, init_inception

    if inception_variables is None:
        net, inception_variables = init_inception()
    else:
        net = InceptionV3()

    @jax.jit
    def run(images01):
        x = InceptionV3.preprocess(images01, in_range=(0.0, 1.0))
        return net.apply(inception_variables, x, return_features=not probs,
                         no_output_bias=probs)

    def feature_fn(images01):
        """[N,3,H,W] in [0,1] -> [N,2048] features (or [N,1008] probs)."""
        return np.asarray(run(jnp.asarray(images01)))

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


def compute_ppl(
    G,
    variables,
    batch_iter_factory: Callable[[], Iterator],
    lpips_fn: Callable,
    num_samples: int = 200,
    epsilon: float = 1e-4,
    batch_size: int = 2,
    key=None,
):
    """Perceptual path length, w-space endpoint sampling (the reference's
    ppl2_wend config: perceptual_path_length.py PPLSampler with space='w',
    sampling='end', crop=False, eps=1e-4).

    lpips_fn(img0, img1) -> [N] perceptual distances (the squared-embedding
    form, i.e. standard LPIPS); dist = lpips / eps^2. Images are mean-pooled
    to 256² like the reference (:80-82) before scoring.
    """
    import jax
    import jax.numpy as jnp

    from ..models.triplane import TriPlaneGenerator

    key = key if key is not None else jax.random.PRNGKey(0)
    c_iter = batch_iter_factory()

    def pool256(img):
        factor = img.shape[-1] // 256
        if factor > 1:
            N, C, H, W = img.shape
            img = img.reshape(N, C, H // factor, factor, W // factor, factor)
            img = img.mean(axis=(3, 5))
        return img

    @jax.jit
    def pair_dist(variables, z0, z1, c, cond, key):
        del key
        def render(ws):
            # noise_mode='const' for BOTH endpoints, as the reference
            # PPLSampler does (perceptual_path_length.py:71): any noise
            # difference between the two renders is independent of epsilon
            # and would dominate after the /eps^2 division.
            xin = {"ws": ws, "camera_params": c, "cond": cond,
                   "normalize_images": True}
            out = G.apply(variables, xin, method=TriPlaneGenerator.f,
                          noise_mode="const")
            return pool256(out["image"])

        w0 = G.apply(variables, z0, c, cond, method=TriPlaneGenerator.mapping)
        w1 = G.apply(variables, z1, c, cond, method=TriPlaneGenerator.mapping)
        # endpoint sampling: t = 0
        wt0 = w0
        wt1 = w0 + (w1 - w0) * epsilon
        img0 = render(wt0)
        img1 = render(wt1)
        return lpips_fn(img0, img1) / epsilon**2

    dists = []
    n = 0
    while n < num_samples:
        batch = next(c_iter)
        c = jnp.asarray(batch["camera"])[:batch_size]
        cond = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[:batch_size], batch["cond"]
        )
        key, kz0, kz1, kn = jax.random.split(key, 4)
        z0 = jax.random.normal(kz0, (c.shape[0], G.z_dim))
        z1 = jax.random.normal(kz1, (c.shape[0], G.z_dim))
        dists.append(np.asarray(pair_dist(variables, z0, z1, c, cond, kn)))
        n += c.shape[0]
    return np.concatenate(dists)[:num_samples]


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
    metric_name: str = "fid50k_full",
):
    """fid50k_full protocol: dataset stats (cached) vs n_items generated.

    metric_name labels the report: 'fid50k_full' rides the Inception
    detector (paper protocol); 'fid_clip' marks the CLIP-feature variant."""

    def compute_real():
        st = FeatureStats(max_items=n_items)
        for batch in batch_iter_factory():
            # condition images are already [0,1] (dataset convention)
            st.append(feature_fn(batch["cond"]["image"]))
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
        "results": {metric_name: frechet_distance(rs[0], rs[1], gs[0], gs[1])},
        "metric": metric_name,
        "total_time": 0.0,
    }
    report_metric(result, run_dir=run_dir, snapshot_pkl=snapshot_name)
    return result
