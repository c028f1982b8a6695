"""Offline model viewer: checkpoint -> turntable animation + mesh + grid.

Role of the reference's interactive imgui visualizer (`src/visualizer.py` +
`src/viz/*`, SURVEY.md §2.7) re-imagined for headless TPU pods: instead of
a GL window with widgets, one command renders the things the widgets show —
a turntable spin (pose widget), a latent grid (latent/stylemix widgets),
the raw/depth/weight channels (layer viewer), and the extracted mesh.

Run: python -m panic3d_tpu.eval.viewer --ckpt <dir> --out /tmp/view
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def save_grid(images, path, cols=4):
    """[N,3,H,W] floats in [0,1] -> one tiled PNG."""
    from ..utils.imglib import Img

    n = len(images)
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    _, H, W = images[0].shape
    grid = np.ones((3, rows * H, cols * W), dtype=np.float32)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        grid[:, r * H : (r + 1) * H, c * W : (c + 1) * W] = np.clip(img, 0, 1)
    Img(grid).save(path)
    return path


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..models.triplane import TriPlaneGenerator, seeds_to_z
    from ..runtime.checkpoint import load_checkpoint
    from .export import save_ply
    from .video import lerpspin, quickspin, save_animation
    from .volume import get_volume, marching_cubes

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (None=random init)")
    ap.add_argument("--out", default="./temp/view")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    ap.add_argument("--spin", type=int, default=12)
    ap.add_argument("--mesh-res", type=int, default=128)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args(argv)

    g = configs.tiny() if args.tiny else configs.flagship(eval_mode=True)
    if args.ckpt:
        variables, _ = load_checkpoint(args.ckpt)
    else:
        print("no checkpoint given: random init (structure viewing only)")
        from __graft_entry__ import _flagship_inputs

        if args.tiny:
            rng = np.random.RandomState(0)
            xin0 = {
                "z": jnp.zeros((1, g.z_dim)),
                "elevations": jnp.zeros(1),
                "azimuths": jnp.zeros(1),
                "cond": {
                    "image_ortho_front": jnp.asarray(
                        rng.rand(1, 3, 64, 64).astype(np.float32)),
                    "resnet_chonk": jnp.asarray(
                        rng.randn(1, 16, 8, 8).astype(np.float32)),
                },
            }
        else:
            xin0 = _flagship_inputs(g, bs=1)
        variables = g.init({"params": jax.random.PRNGKey(0)}, xin0,
                           method=TriPlaneGenerator.f, noise_mode="const")

    os.makedirs(args.out, exist_ok=True)
    cond = xin0["cond"] if not args.ckpt else None
    base = {"cond": cond, "triplane_crop": 0.1, "cull_clouds": 0.5}

    # latent grid (latent widget)
    zs = jnp.asarray(seeds_to_z(args.seeds, g.z_dim))
    outs = []
    for i in range(len(args.seeds)):
        xin = dict(base, z=zs[i : i + 1], elevations=jnp.zeros(1),
                   azimuths=jnp.zeros(1))
        out = g.apply(variables, xin, method=TriPlaneGenerator.f,
                      noise_mode="const")
        outs.append(np.asarray(out["image"][0]))
    save_grid(outs, os.path.join(args.out, "latents.png"))

    # channel views (layer viewer widget): raw, depth, weights
    xin = dict(base, z=zs[:1], elevations=jnp.zeros(1), azimuths=jnp.zeros(1))
    out = g.apply(variables, xin, method=TriPlaneGenerator.f, noise_mode="const")
    chans = [
        np.repeat(np.asarray(out["image_depth"][0]), 3, 0)
        / max(float(out["image_depth"].max()), 1e-6),
        np.repeat(np.asarray(out["image_weights"][0]), 3, 0),
        np.asarray(out["image_raw"][0]),
    ]
    save_grid(chans, os.path.join(args.out, "channels.png"), cols=3)

    # turntable (pose widget)
    frames = quickspin(g, variables, dict(base, z=zs[:1]), n=args.spin)
    save_animation(frames, os.path.join(args.out, "spin.gif"))

    # latent-lerp turntable (gen_videos.py role): interpolate through the
    # seeds' ws while spinning
    frames = lerpspin(g, variables, base, zs, n=args.spin)
    save_animation(frames, os.path.join(args.out, "lerp.gif"))

    # mesh
    vol = get_volume(g, variables, dict(base, z=zs[:1]),
                     resolution=args.mesh_res)
    mc = marching_cubes(vol.densities[0, 0], vol.rgbs[0, :3],
                        g.rk["box_warp"], level=0.5)
    save_ply(os.path.join(args.out, "mesh.ply"), mc.verts, mc.faces, mc.colors)
    print(f"wrote latents.png, channels.png, spin.gif, lerp.gif, mesh.ply to {args.out}")


if __name__ == "__main__":
    main()
