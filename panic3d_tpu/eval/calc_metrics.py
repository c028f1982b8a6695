"""Standalone metric-calculation CLI.

Role of `src/calc_metrics.py`: compute any registered quality metric for a
previously trained snapshot, outside the training loop, and append the
result to `metric-<name>.jsonl` in the run dir. The reference spawns one
torch.distributed process per GPU; here one sharded-jit process covers the
chip(s) (per SURVEY §2.8 the mesh does the scaling), and the feature
networks are the converted flax ones (random-init guarded like the
trainer: values only paper-comparable with converted weights).

Run:
  python -m panic3d_tpu.eval.calc_metrics --ckpt <snapshot-dir> \
      --metrics fid50k_full,kid50k_full,pr50k3_full,is50k,ppl2_wend \
      [--synthetic | --data DIR] [--metric-items N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="trainer snapshot dir")
    ap.add_argument("--metrics", default="fid50k_full",
                    help="comma list (see eval.gan_metrics.list_valid_metrics)")
    ap.add_argument("--metric-items", type=int, default=50000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--data", default=".", help="_data root (ecrutileE)")
    ap.add_argument("--data-subset", default="train")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--run-dir", default=None,
                    help="where metric-*.jsonl lands (default: ckpt parent)")
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--clip-weights", default=None)
    ap.add_argument("--lpips-weights", default=None)
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from .. import configs
    from ..models.triplane import TriPlaneGenerator
    from ..runtime.checkpoint import load_checkpoint
    from ..training.metric_eval import (
        compute_ppl,
        evaluate_fid,
        generate_fakes,
        make_clip_feature_fn,
        make_inception_feature_fn,
    )
    from .gan_metrics import (
        FeatureStats,
        calc_metric,
        is_valid_metric,
        report_metric,
    )

    from ..runtime.checkpoint import extract_generator_variables

    state, config = load_checkpoint(args.ckpt)
    g = configs.from_snapshot_config(config, eval_mode=False)
    vars_Gema = extract_generator_variables(state)

    cfg = dict(config or {})
    size = g.img_resolution
    tiny = (cfg.get("tiny")
            or (cfg.get("model_kwargs") or {}).get("family") == "tiny")
    chonk_ch = 16 if tiny else 512
    feat_dim = 32 if tiny else 512
    if args.synthetic:
        from ..data.dataset import synthetic_batch

        def make_batch_iter():
            i = 0
            while True:
                yield synthetic_batch(bs=args.batch, size=size,
                                      chonk_ch=chonk_ch, feat_dim=feat_dim,
                                      seed=i + args.seed)
                i += 1
    else:
        from ..data.dataset import EcrutileEDataset, InfiniteBatcher

        ds = EcrutileEDataset(args.data, subset=args.data_subset, size=size)

        def to_eval(b):
            img = b["image"].astype(np.float32) / 127.5 - 1
            return {"image": img, "camera": b["camera"],
                    "cond": b["condition"]}

        def make_batch_iter():
            return map(to_eval, iter(InfiniteBatcher(ds, args.batch,
                                                     seed=args.seed)))

    run_dir = args.run_dir or os.path.dirname(os.path.abspath(args.ckpt))
    snapshot_name = os.path.basename(os.path.normpath(args.ckpt))
    requested = [m for m in args.metrics.split(",") if m and m != "none"]
    for name in requested:
        assert name in ("fid_clip",) or is_valid_metric(name), name

    def load_vars(path):
        v, _ = load_checkpoint(path)
        return v

    for name in requested:
        if name in ("fid50k_full", "fid_clip"):
            if name == "fid50k_full":
                fn = make_inception_feature_fn(
                    load_vars(args.inception_weights)
                    if args.inception_weights else None)
            else:
                fn = make_clip_feature_fn(
                    load_vars(args.clip_weights) if args.clip_weights
                    else None)
            evaluate_fid(g, vars_Gema, make_batch_iter, fn,
                         n_items=args.metric_items, run_dir=run_dir,
                         snapshot_name=snapshot_name, metric_name=name)
        elif name in ("kid50k_full", "pr50k3_full"):
            fn = make_inception_feature_fn(
                load_vars(args.inception_weights)
                if args.inception_weights else None)
            real, gen = FeatureStats(capture_all=True), FeatureStats(capture_all=True)
            it = make_batch_iter()
            n = 0
            while n < args.metric_items:
                b = next(it)
                # condition images are [0,1] already (dataset convention)
                real.append(fn(np.asarray(b["cond"]["image"])))
                n += args.batch
            for fakes in generate_fakes(g, vars_Gema, make_batch_iter(),
                                        args.metric_items):
                gen.append(fn(fakes))
                if gen.is_full or gen.num_items >= args.metric_items:
                    break
            r = calc_metric(name, gen_features=gen.get_all(),
                            real_features=real.get_all())
            report_metric(r, run_dir=run_dir, snapshot_pkl=snapshot_name)
        elif name == "is50k":
            fn = make_inception_feature_fn(
                load_vars(args.inception_weights)
                if args.inception_weights else None, probs=True)
            probs = []
            count = 0
            for fakes in generate_fakes(g, vars_Gema, make_batch_iter(),
                                        args.metric_items):
                probs.append(fn(fakes))
                count += len(probs[-1])
                if count >= args.metric_items:
                    break
            r = calc_metric(name, gen_probs=np.concatenate(probs))
            report_metric(r, run_dir=run_dir, snapshot_pkl=snapshot_name)
        elif name == "ppl2_wend":
            from ..training.setup import init_lpips
            from .lpips import LPIPS, load_lpips_params

            lpips_vars = (load_lpips_params(args.lpips_weights)
                          if args.lpips_weights else init_lpips())
            lpips_mod = LPIPS()

            def lpips_fn(a, b):
                return lpips_mod.apply(lpips_vars, a, b)

            d = compute_ppl(g, vars_Gema, make_batch_iter, lpips_fn,
                            num_samples=args.metric_items,
                            batch_size=args.batch)
            r = calc_metric(name, ppl_distances=d)
            report_metric(r, run_dir=run_dir, snapshot_pkl=snapshot_name)
        else:
            raise SystemExit(f"metric {name} needs inputs this CLI does not "
                             f"build (see eval.gan_metrics registry)")
    print(f"done: {requested} -> {run_dir}")


if __name__ == "__main__":
    main()
