"""Ray generation from camera matrices.

Role of `src/training/volumetric_rendering/ray_sampler.py` (pinhole rays,
OpenCV convention, pixel-center uv grid). Pure batched jnp; traceable.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_rays(cam2world_matrix, intrinsics, resolution: int):
    """Pinhole rays.

    cam2world_matrix: [N,4,4]; intrinsics: [N,3,3] (normalized, OpenCV).
    Returns (ray_origins [N,M,3], ray_directions [N,M,3]) with M=resolution².
    Matches RaySampler.forward (ray_sampler.py:24-62).
    """
    N = cam2world_matrix.shape[0]
    M = resolution * resolution
    cam_pos = cam2world_matrix[:, :3, 3]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    # pixel-center uv grid in [0,1); row-major flatten with x = column coord
    r = jnp.arange(resolution, dtype=jnp.float32) / resolution + 0.5 / resolution
    gy, gx = jnp.meshgrid(r, r, indexing="ij")
    x_cam = jnp.broadcast_to(gx.reshape(1, M), (N, M))
    y_cam = jnp.broadcast_to(gy.reshape(1, M), (N, M))
    z_cam = jnp.ones((N, M), dtype=jnp.float32)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack([x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)
    world = jnp.einsum("nij,nmj->nmi", cam2world_matrix, cam_rel)[..., :3]

    dirs = world - cam_pos[:, None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam_pos[:, None, :], dirs.shape)
    return origins, dirs
