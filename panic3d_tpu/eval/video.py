"""Turntable rendering + animated export.

Role of `_train/eg3dc/util/eg3dc_v0.py:64-87` (quickspin) and the gif/webp
writers of `_util/video_v1.py:112-217` (via PIL; mp4 needs ffmpeg which is
not assumed present — gif/webp cover the eval artifacts).

TPU-first: the reference renders the turntable with a python loop of
single-view G.f calls; here all n views run as ONE batched jitted forward
(cameras are traced tensors, see cameras/conventions.py).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def quickspin(G, variables, xin_base: dict, n: int = 30, batch: int = 12,
              image_key: str = "image", **f_kwargs) -> List[np.ndarray]:
    """Render n azimuths at elevation 0 -> list of [3,H,W] arrays in [0,1]."""
    import jax.numpy as jnp

    from ..models.triplane import TriPlaneGenerator

    azims = np.linspace(0, 360, n + 1)[:-1]
    frames = []
    for i in range(0, n, batch):
        az = azims[i : i + batch]
        b = len(az)
        xin = {
            k: v for k, v in xin_base.items()
            if k not in ("elevations", "azimuths", "fovs", "camera_params",
                         "conditioning_params", "force_rays")
        }
        xin["elevations"] = jnp.zeros(b)
        xin["azimuths"] = jnp.asarray(az, dtype=jnp.float32)
        cond = xin.get("cond")
        if cond is not None:
            xin["cond"] = {
                k: jnp.broadcast_to(v, (b,) + v.shape[1:]) for k, v in cond.items()
            }
        if "z" in xin:
            xin["z"] = jnp.broadcast_to(xin["z"], (b, xin["z"].shape[-1]))
        out = G.apply(variables, xin, method=TriPlaneGenerator.f,
                      noise_mode="const", **f_kwargs)
        img = np.asarray(out[image_key])
        frames.extend(np.clip(img[j], 0, 1) for j in range(b))
    return frames


def lerpspin(G, variables, xin_base: dict, zs, n: int = 60, batch: int = 12,
             wraps: int = 2, kind: str = "cubic", truncation_psi: float = 1.0,
             image_key: str = "image", **f_kwargs) -> List[np.ndarray]:
    """Latent-interpolation turntable (`src/gen_videos.py` gen_interp_video
    role): smooth cyclic interpolation through the seeds' ws keyframes
    (scipy cubic over a wraps-tiled keyframe track, gen_videos.py:103-111)
    while the camera spins a full turn. The reference renders one frame per
    G call; here every frame batch is one jitted ws-input G.f call.

    zs: [K, z_dim] seed latents -> n frames [3,H,W] in [0,1]."""
    import scipy.interpolate
    import jax.numpy as jnp

    from ..cameras.conventions import camera_label
    from ..models.triplane import TriPlaneGenerator

    zs = jnp.asarray(zs)
    K = zs.shape[0]
    cond = xin_base.get("cond")
    zeros = jnp.zeros((K,))
    c_front = camera_label(zeros, zeros, jnp.ones((K,)), 30 * jnp.ones((K,)))
    cond_k = None
    if cond is not None:
        cond_k = {k: jnp.broadcast_to(v, (K,) + v.shape[1:])
                  for k, v in cond.items()}
    ws_k = np.asarray(
        G.apply(variables, zs, c_front, cond_k,
                truncation_psi=truncation_psi,
                method=TriPlaneGenerator.mapping)
    )  # [K, num_ws, w_dim]

    # cyclic keyframe track: tile wraps*2+1 copies so the cubic spline wraps
    # smoothly (the reference's wraps mechanism)
    x = np.arange(-K * wraps, K * (wraps + 1))
    y = np.tile(ws_k, [wraps * 2 + 1, 1, 1])
    interp = scipy.interpolate.interp1d(x, y, kind=kind, axis=0)
    ts = np.linspace(0, K, n, endpoint=False)
    ws_frames = interp(ts).astype(np.float32)  # [n, num_ws, w_dim]
    azims = np.linspace(0, 360, n + 1)[:-1]

    frames = []
    for i in range(0, n, batch):
        b = len(azims[i : i + batch])
        xin = {
            k: v for k, v in xin_base.items()
            if k not in ("elevations", "azimuths", "fovs", "camera_params",
                         "conditioning_params", "force_rays", "z", "zs")
        }
        xin["ws"] = jnp.asarray(ws_frames[i : i + b])
        xin["elevations"] = jnp.zeros(b)
        xin["azimuths"] = jnp.asarray(azims[i : i + b], dtype=jnp.float32)
        if cond is not None:
            xin["cond"] = {
                k: jnp.broadcast_to(v, (b,) + v.shape[1:])
                for k, v in cond.items()
            }
        out = G.apply(variables, xin, method=TriPlaneGenerator.f,
                      noise_mode="const", **f_kwargs)
        img = np.asarray(out[image_key])
        frames.extend(np.clip(img[j], 0, 1) for j in range(b))
    return frames


def save_animation(frames: List[np.ndarray], path: str, fps: int = 15):
    """Save [3,H,W]-float frames as gif/webp (PIL) or mp4 (cv2).

    The mp4 path mirrors the reference's VideoWriterCV2
    (`_util/video_v1.py:183-217`: cv2.VideoWriter, MP4V fourcc, RGB->BGR
    per frame); gif/webp mirror write_gif/write_webp (video_v1.py:120-165).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    u8 = [
        (np.clip(f, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        for f in frames
    ]
    if path.lower().endswith(".mp4"):
        import cv2

        h, w = u8[0].shape[:2]
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"MP4V"), fps, (w, h)
        )
        try:
            for f in u8:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        finally:
            vw.release()
        return path

    from PIL import Image

    imgs = [Image.fromarray(f) for f in u8]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path
