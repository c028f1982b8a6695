"""End-to-end inference over the daredemoE_test benchmark.

Role of `_scripts/eval/generate.py`: for each test portrait —
line-fill (rmline) -> resnet PCA features -> marching-cubes mesh pickle +
4 ortho views + 12 spin views, saving RGB + xyza PNGs in the reference's
file layout (temp/eval/<run>/daredemoE/{marching_cubes,ortho,ortho_xyza,
rgb60,xyza60}/franchise/id/view.png).

Run: python -m panic3d_tpu.eval.generate --ckpt <dir> [--data .]
Requires the converted flagship checkpoint + the _data/lustrous tree
(neither ships with the reference repo snapshot; see runtime/checkpoint.py
for the converter).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

INFERENCE_OPTS = dict(
    triplane_crop=0.1,
    cull_clouds=0.5,
    paste_params=dict(
        mode="default",
        thresh_weight=0.95,
        thresh_edges=0.02,
        thresh_occ=0.05,
        offset_occ=0.01,
        thresh_dxyz=0.000005,
    ),
)

EVAL_VIEWS = [
    ("camO", "front", 0, 0, -1),
    ("camO", "left", 0, 90, -1),
    ("camO", "right", 0, -90, -1),
    ("camO", "back", 0, 180, -1),
]

_RENDER_JIT = {}


def _get_render_jit(g, opts, seed, vb, from_planes=False):
    """One jitted view-batch forward per (model, opts, seed, batch) —
    compiled once, reused across every view batch of every portrait.

    The per-view eager G.f this replaces dispatched each op over the host
    link; batching vb views per call also amortizes the per-call RPC
    latency (bench.py: vb=2 is the per-chip optimum at 512²). Ortho and
    pinhole views mix freely in one batch (fov<0 selects ortho rays
    per element).

    from_planes=True returns the plane-reusing variant
    `render(variables, elevations, azimuths, fovs, cond, ws, planes)`:
    (ws, planes) come from `_get_planes_jit` computed ONCE per portrait,
    so the StyleGAN2 backbone runs once per subject instead of once per
    view batch. Output-identical to the full forward when the mapping is
    camera-free (`plane_cache_ok(g)`); call sites gate on that."""
    import jax
    import jax.numpy as jnp

    from ..models.triplane import TriPlaneGenerator

    key = (id(g), repr(opts), seed, vb, from_planes)
    if key not in _RENDER_JIT:

        def _xin(elevations, azimuths, fovs, cond):
            cond_b = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (vb,) + a.shape[1:]), cond
            )
            return {
                "elevations": elevations,
                "azimuths": azimuths,
                "fovs": fovs,
                "cond": cond_b,
                **opts,
            }

        if from_planes:

            @jax.jit
            def render(variables, elevations, azimuths, fovs, cond, pl):
                xin = _xin(elevations, azimuths, fovs, cond)
                ws, planes = pl["ws"], pl["planes"]
                xin["ws"] = jnp.broadcast_to(ws, (vb,) + ws.shape[1:])
                xin["_planes"] = jnp.broadcast_to(
                    planes, (vb,) + planes.shape[1:]
                )
                if "occ" in pl:  # per-portrait ESS occupancy, shared by views
                    occ = pl["occ"]
                    xin["_ess_occ"] = (
                        jnp.broadcast_to(occ, (vb,) + occ.shape[1:]),
                        pl["occ_out"],
                    )
                if "occ_A" in pl:  # per-portrait paste occlusion volume
                    A = pl["occ_A"]
                    xin["_occ_vol"] = {
                        "A": jnp.broadcast_to(A, (vb,) + A.shape[1:]),
                        "density0": pl["occ_d0"],
                        "box_warp": g.rk["box_warp"],
                        "grid": tuple(A.shape[1:]),
                    }
                out = g.apply(
                    variables, xin, method=TriPlaneGenerator.f,
                    noise_mode="const",
                )
                return {
                    k: out[k] for k in ("image", "image_xyz", "image_weights")
                }

        else:

            @jax.jit
            def render(variables, elevations, azimuths, fovs, cond):
                xin = _xin(elevations, azimuths, fovs, cond)
                xin["seeds"] = [seed] * vb
                out = g.apply(
                    variables, xin, method=TriPlaneGenerator.f,
                    noise_mode="const",
                )
                return {
                    k: out[k] for k in ("image", "image_xyz", "image_weights")
                }

        _RENDER_JIT[key] = render
    return _RENDER_JIT[key]


def plane_cache_ok(g):
    """Planes are view-independent iff the mapping ignores the camera
    (c_gen_conditioning_zero, the flagship eval default) — then one
    backbone pass serves every view of a subject, output-identically."""
    return bool(g.rk.get("c_gen_conditioning_zero", False))


def _get_planes_jit(g, seed, opts=None):
    """Jitted once-per-portrait plane bundle for the plane-reusing view
    renders: seeds->z (host), single-z mapping (identical to G.f's
    broadcast shortcut), backbone plane synthesis. Returns a dict with
    'ws', 'planes', plus — each computed once per portrait instead of once
    per view batch, output-identically — the ESS occupancy ('occ',
    'occ_out') when ESS is active and the paste-front occlusion volume
    ('occ_A', 'occ_d0') when paste_params use the grid occlusion."""
    import jax
    import jax.numpy as jnp

    from ..cameras import camera_label
    from ..models.triplane import TriPlaneGenerator, seeds_to_z

    opts = opts or {}
    with_occ = bool(g.rk.get("ess"))
    pp = opts.get("paste_params") or {}
    with_occvol = (
        bool(pp)
        and pp.get("occ_impl", "grid") == "grid"
        and isinstance(g.rk.get("ray_start"), (int, float))
    )
    key = (id(g), seed, "_planes", with_occ, with_occvol,
           repr(sorted((k, repr(v)) for k, v in opts.items())))
    if key not in _RENDER_JIT:
        z = jnp.asarray(seeds_to_z([seed], g.z_dim))
        # camera label is irrelevant under c_gen_conditioning_zero (zeroed
        # inside mapping) — pass the canonical front label like G.f would
        c0 = jnp.asarray(
            np.tile(np.asarray(camera_label(0.0, 0.0, 1.0, 30.0)), (1, 1))
        )

        @jax.jit
        def planes_fn(variables, cond):
            ws = g.apply(variables, z, c0, cond,
                         method=TriPlaneGenerator.mapping)
            planes = g.apply(variables, ws, cond, noise_mode="const",
                             method=TriPlaneGenerator._planes_from_ws)
            out = {"ws": ws, "planes": planes}
            filters = dict(
                triplane_crop=opts.get("triplane_crop"),
                cull_clouds=opts.get("cull_clouds"),
                binarize_clouds=opts.get("binarize_clouds"),
            )
            if with_occ:
                occ = g.apply(
                    variables, planes, **filters,
                    method=TriPlaneGenerator.ess_occupancy_for_planes,
                )
                out["occ"], out["occ_out"] = occ
            if with_occvol:
                vol = g.apply(
                    variables, planes, **filters,
                    method=TriPlaneGenerator.front_occlusion_volume,
                )
                out["occ_A"], out["occ_d0"] = vol["A"], vol["density0"]
            return out

        _RENDER_JIT[key] = planes_fn
    return _RENDER_JIT[key]


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..cameras.conventions import cam60, camsubs
    from ..data.databack import DatabackendMinna
    from ..models.triplane import TriPlaneGenerator
    from ..runtime.checkpoint import load_checkpoint
    from ..utils.imglib import Img, from_model_output
    from .volume import extract_mesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="converted G_ema checkpoint dir")
    ap.add_argument("--data", default=".", help="dir containing _data/lustrous")
    ap.add_argument("--out", default=None)
    ap.add_argument("--name", default="ecrutileE_eclustrousC_n120-00000-000200")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--subset", default="daredemoE_test")
    ap.add_argument("--skip-rmline", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model + random init (pipeline smoke test)")
    ap.add_argument("--mesh-res", type=int, default=256)
    ap.add_argument("--level", type=float, default=0.5,
                    help="marching-cubes iso level (reference: 0.5)")
    ap.add_argument("--no-filters", action="store_true",
                    help="disable triplane_crop/cull_clouds (random-init smoke)")
    ap.add_argument("--view-batch", type=int, default=2,
                    help="views rendered per jitted call (2 = per-chip "
                         "optimum at 512², bench.py)")
    ap.add_argument("--no-ess", action="store_true",
                    help="disable empty-space skipping and render the "
                         "reference's uniform 96+96 quadrature "
                         "(settings-parity runs; ESS is quality-per-sample "
                         "proven >= it, tests/test_ess.py)")
    args = ap.parse_args(argv)

    opts = dict(INFERENCE_OPTS)
    if args.no_filters:
        opts.pop("triplane_crop"); opts.pop("cull_clouds")

    edn = args.out or f"./temp/eval/{args.name}"
    if args.tiny:
        g = configs.tiny(force_sigmoid=True)
        variables = None  # random init below
    else:
        assert args.ckpt, "--ckpt required unless --tiny"
        from ..runtime.checkpoint import extract_generator_variables

        state, config = load_checkpoint(args.ckpt)
        variables = extract_generator_variables(state)
        g = configs.from_snapshot_config(
            config, eval_mode=True, ess=not args.no_ess)

    dk = DatabackendMinna(args.data)
    subset_csv = os.path.join(
        args.data, "_data", "lustrous", "subsets", f"{args.subset}.csv"
    )
    with open(subset_csv) as f:
        bns = [
            f"daredemoE/fandom_align/{l.strip()}/front" for l in f if l.strip()
        ]
    align_pkl = os.path.join(
        args.data, "_data", "lustrous", "renders", "daredemoE",
        "fandom_align_alignment.pkl",
    )
    with open(align_pkl, "rb") as f:
        aligndata = pickle.load(f)

    # aux models
    rmline = resnet = None
    if not args.skip_rmline:
        rmline = _load_rmline(args)
    resnet = _load_resnet(args)

    bw = g.rk["box_warp"]
    spin = [
        ("camP", f"{v:04d}", float(cam60[v][0]), float(cam60[v][1]), 30)
        for v in camsubs["spin12"]
    ]

    for bn in bns:
        x = dk[bn]
        img = x["image"]
        if rmline is not None:
            kpts = _aligned_keypoints(aligndata[bn])
            rgb = jnp.asarray(img.bg("w").convert("RGB").t())[None]
            filled, _, _ = rmline(rgb, kpts)
            img_rmline = np.asarray(filled[0])
        else:
            img_rmline = img.bg("w").convert("RGB").t()

        chonk = resnet(jnp.asarray(img.bg("k").convert("RGB").t()))
        cond = {
            "image_ortho_front": jnp.asarray(img_rmline)[None],
            "resnet_chonk": chonk[None, 0, : 512 if not args.tiny else 16],
        }

        if variables is None:  # --tiny: random init once cond shapes known
            import jax

            variables = g.init(
                {"params": jax.random.PRNGKey(0)},
                {"seeds": [0], "elevations": jnp.zeros(1),
                 "azimuths": jnp.zeros(1), "cond": cond},
                method=TriPlaneGenerator.f, noise_mode="const",
            )

        # geometry (transfer-optimized; numerics per eg3d_metrics3d.py)
        xin = {"cond": cond, "seeds": [args.seed], **opts}
        mc = extract_mesh(g, variables, xin, level=args.level,
                          resolution=args.mesh_res)
        fn_march = os.path.join(
            edn, bn.replace("fandom_align", "marching_cubes") + ".pkl"
        )
        os.makedirs(os.path.dirname(fn_march), exist_ok=True)
        with open(fn_march, "wb") as f:
            pickle.dump(dict(mc), f)

        # images — jitted view batches (compile shared across portraits);
        # PNG saving happens after each batch returns so the device calls
        # pipeline without per-view host syncs
        views = EVAL_VIEWS + spin
        vb = min(args.view_batch, len(views))
        cache_planes = plane_cache_ok(g)
        render = _get_render_jit(g, opts, args.seed, vb,
                                 from_planes=cache_planes)
        if cache_planes:  # one backbone pass per portrait, not per batch
            ws_pl = _get_planes_jit(g, args.seed, opts)(variables, cond)
        for i in range(0, len(views), vb):
            chunk = views[i : i + vb]
            cc = chunk + [chunk[-1]] * (vb - len(chunk))
            out = render(
                variables,
                jnp.asarray([float(c[2]) for c in cc]),
                jnp.asarray([float(c[3]) for c in cc]),
                jnp.asarray([float(c[4]) for c in cc]),
                cond,
                *((ws_pl,) if cache_planes else ()),
            )
            imgs = np.asarray(out["image"])
            xyza = np.concatenate(
                [
                    (np.asarray(out["image_xyz"]) + bw / 2) / bw,
                    np.asarray(out["image_weights"]),
                ],
                axis=1,
            )
            for j, (cm, cam_view, *_rest) in enumerate(chunk):
                sub = "ortho" if cm == "camO" else "rgb60"
                sub_x = "ortho_xyza" if cm == "camO" else "xyza60"
                fn_rgb = os.path.join(
                    edn,
                    bn.replace("fandom_align", sub).replace(
                        "/front", f"/{cam_view}"
                    ) + ".png",
                )
                fn_xyza = os.path.join(
                    edn,
                    bn.replace("fandom_align", sub_x).replace(
                        "/front", f"/{cam_view}"
                    ) + ".png",
                )
                from_model_output(imgs[j : j + 1], normalize=False).save(fn_rgb)
                Img(np.clip(xyza[j], 0, 1)).save(fn_xyza)
        print(bn, "done")


def _aligned_keypoints(aligndata):
    M = aligndata["transformation"]
    kpts = aligndata["_alignment"]["source"]["keypoints"][
        aligndata["_alignment"]["source"]["_detection_used"]
    ]
    pts = np.concatenate([kpts[:, :2], np.ones((len(kpts), 1))], axis=-1)
    return (M @ pts.T).T[:, :2]


def _load_rmline(args):
    from ..models.rmlinegan import RMLineGenerator, RMLineWrapper
    from ..runtime.checkpoint import load_checkpoint

    if not args.ckpt:
        print("WARNING: no rmline checkpoint; skipping line filling")
        return None
    path = os.path.join(os.path.dirname(args.ckpt), "rmline")
    if not os.path.isdir(path):
        print("WARNING: no rmline checkpoint found; skipping line filling")
        return None
    variables, _ = load_checkpoint(path)
    return RMLineWrapper(RMLineGenerator(), variables)


def _load_resnet(args):
    import jax

    from ..models.resnet import (ResNet50, ResnetFeatureExtractorPCA,
                                 load_pca_extractor)

    path = (os.path.join(os.path.dirname(args.ckpt), "resnet")
            if args.ckpt else "")
    if path and os.path.isdir(path):
        return load_pca_extractor(path)
    print("WARNING: no resnet checkpoint; using random features")
    import jax.numpy as jnp

    resnet = ResNet50()
    variables = resnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 256, 256)))
    rng = np.random.RandomState(0)
    return ResnetFeatureExtractorPCA(
        resnet, variables, rng.randn(512, 2048).astype(np.float32),
        np.zeros(2048, np.float32), 512,
    )


if __name__ == "__main__":
    main()
