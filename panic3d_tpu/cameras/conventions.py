"""PAniC-3D camera conventions, jit-traceable.

Role of `_databacks/lustrous_renders_v1.py:14-104` (the 'eg3d_lustrousB'
convention, the 60-view render grid, and orthographic ray generation) and of
`src/camera_utils.py` (pose samplers / intrinsics).

Design difference from the reference: everything here is batched jnp math
(Euler rotations spelled out instead of scipy host calls), so camera labels
and rays can be built *inside* a jitted render step and vmapped over views —
the turntable's 60 cameras become one batched tensor program instead of a
python loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# 60-view render grid: 5 elevations x 12 azimuths, transposed meshgrid order
# (lustrous_renders_v1.py:14-17). Row i = (elev, azim).
cam60 = np.stack(
    np.meshgrid(np.linspace(60, -20, 5), np.linspace(-180, 150, 12))
).T.reshape(60, 2).astype(np.float32)

camsubs = {
    "all": list(range(60)),
    "front1": [42],
    "front15": [28, 29, 30, 31, 32, 40, 41, 42, 43, 44, 52, 53, 54, 55, 56],
    "spin12": [*range(42, 48), *range(36, 42)],
}


def _rot_x(a, xp):
    c, s = xp.cos(a), xp.sin(a)
    o, z = xp.ones_like(a), xp.zeros_like(a)
    return xp.stack(
        [xp.stack([o, z, z], -1), xp.stack([z, c, -s], -1), xp.stack([z, s, c], -1)], -2
    )


def _rot_y(a, xp):
    c, s = xp.cos(a), xp.sin(a)
    o, z = xp.ones_like(a), xp.zeros_like(a)
    return xp.stack(
        [xp.stack([c, z, s], -1), xp.stack([z, o, z], -1), xp.stack([-s, z, c], -1)], -2
    )


def _rot_z(a, xp):
    c, s = xp.cos(a), xp.sin(a)
    o, z = xp.ones_like(a), xp.zeros_like(a)
    return xp.stack(
        [xp.stack([c, -s, z], -1), xp.stack([s, c, z], -1), xp.stack([z, z, o], -1)], -2
    )


def euler_xyz_matrix(x_deg, y_deg, z_deg, xp=jnp):
    """Extrinsic-xyz Euler rotation, R = Rz @ Ry @ Rx.

    Matches scipy.spatial.transform.Rotation.from_euler('xyz', ..., degrees=True)
    used throughout the reference camera code. Batched over leading dims.
    """
    to_rad = np.pi / 180.0
    x = xp.asarray(x_deg, dtype=xp.float32) * to_rad
    y = xp.asarray(y_deg, dtype=xp.float32) * to_rad
    z = xp.asarray(z_deg, dtype=xp.float32) * to_rad
    return _rot_z(z, xp) @ _rot_y(y, xp) @ _rot_x(x, xp)


def fov_to_focal(fov_deg, xp=jnp):
    """Normalized focal length from vertical FOV in degrees."""
    fov = xp.asarray(fov_deg, dtype=xp.float32)
    return 0.5 / xp.tan(fov / 2 * np.pi / 180.0)


def camera_label(elev, azim, dist, fov):
    """25-dim camera label: flattened 4x4 cam2world extrinsic + 3x3 intrinsic.

    Matches camera_params_to_matrix('eg3d_lustrousB', ...)
    (lustrous_renders_v1.py:33-75): world rotation R^T with rows [0,2] negated
    and z-translation -dist, conjugated as A @ inv(R4) @ B with the axis-flip
    matrices A=diag(-1,1,-1,1), B=diag(1,-1,-1,1). Batched over leading dims;
    inputs broadcast against each other. Negative fov marks an orthographic
    camera (detected downstream via intrinsics[0,0] < 0, triplane.py:400-412).
    """
    elev, azim, dist, fov = jnp.broadcast_arrays(
        jnp.asarray(elev, dtype=jnp.float32),
        jnp.asarray(azim, dtype=jnp.float32),
        jnp.asarray(dist, dtype=jnp.float32),
        jnp.asarray(fov, dtype=jnp.float32),
    )
    batch = elev.shape

    focal = fov_to_focal(fov)
    z = jnp.zeros_like(focal)
    o = jnp.ones_like(focal)
    h = 0.5 * o
    intr = jnp.stack(
        [
            jnp.stack([focal, z, h], -1),
            jnp.stack([z, focal, h], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )

    rot = euler_xyz_matrix(elev, azim, jnp.zeros_like(elev))
    rot_t = jnp.swapaxes(rot, -1, -2)
    # R4 = eye(4); R4[:3,:3]=rot.T; rows 0,2 *= -1; R4[2,3] = -dist
    r4 = jnp.zeros(batch + (4, 4), dtype=jnp.float32)
    r4 = r4.at[..., :3, :3].set(rot_t)
    r4 = r4.at[..., 3, 3].set(1.0)
    r4 = r4.at[..., 0, :].multiply(-1)
    r4 = r4.at[..., 2, :].multiply(-1)
    r4 = r4.at[..., 2, 3].set(-dist)
    flip_a = jnp.asarray(np.diag([-1.0, 1.0, -1.0, 1.0]).astype(np.float32))
    flip_b = jnp.asarray(np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32))
    extr = flip_a @ jnp.linalg.inv(r4) @ flip_b

    return jnp.concatenate(
        [extr.reshape(batch + (16,)), intr.reshape(batch + (9,))], axis=-1
    )


def get_rays_ortho(elev, azim, dist, boxwarp, resolution):
    """Orthographic rays for fov<0 cameras (lustrous_renders_v1.py:78-104).

    Batched: elev/azim/dist are [...]-shaped; returns
    (ray_origins, ray_directions) each [..., 3, res, res].
    """
    elev, azim, dist = jnp.broadcast_arrays(
        jnp.asarray(elev, dtype=jnp.float32),
        jnp.asarray(azim, dtype=jnp.float32),
        jnp.asarray(dist, dtype=jnp.float32),
    )
    batch = elev.shape
    r, bw = resolution, boxwarp

    mg = jnp.arange(r, dtype=jnp.float32)
    u = (mg + 0.5) / r * bw - bw / 2
    # meshgrid 'xy': gx varies along columns, gy along rows; y negated
    gx, gy = jnp.meshgrid(u, -u, indexing="xy")
    p0 = jnp.stack([gx, gy, jnp.zeros_like(gx)], axis=0)  # [3, r, r]
    p1 = p0 + jnp.asarray([0.0, 0.0, -1.0])[:, None, None]
    # translate by distance along z, per batch element
    dz = dist.reshape(batch + (1, 1, 1)) * jnp.asarray([0.0, 0.0, 1.0]).reshape(
        (1,) * len(batch) + (3, 1, 1)
    )
    p0 = p0 + dz
    p1 = p1 + dz

    rot = euler_xyz_matrix(-elev, azim, jnp.zeros_like(elev))  # [..., 3, 3]
    t0 = jnp.einsum("...ij,...jhw->...ihw", rot, p0)
    t1 = jnp.einsum("...ij,...jhw->...ihw", rot, p1)
    return t0, t1 - t0


def create_cam2world_matrix(forward_vector, origin):
    """LookAt cam2world (camera_utils.py:118-137), y-up, no roll. Batched."""
    fwd = forward_vector / jnp.linalg.norm(forward_vector, axis=-1, keepdims=True)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), fwd.shape)
    right = -jnp.cross(up, fwd)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    up2 = jnp.cross(fwd, right)
    up2 = up2 / jnp.linalg.norm(up2, axis=-1, keepdims=True)
    rot = jnp.stack([right, up2, fwd], axis=-1)  # columns
    n = fwd.shape[:-1]
    m = jnp.zeros(n + (4, 4), dtype=fwd.dtype)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(origin)
    m = m.at[..., 3, 3].set(1.0)
    return m


def lookat_pose(horizontal_radians, vertical_radians, lookat_position, radius=1.0):
    """Deterministic LookAtPoseSampler.sample (camera_utils.py:62-91)."""
    h = jnp.asarray(horizontal_radians, dtype=jnp.float32)
    v = jnp.clip(jnp.asarray(vertical_radians, dtype=jnp.float32), 1e-5, np.pi - 1e-5)
    phi = jnp.arccos(1 - 2 * (v / np.pi))
    origins = jnp.stack(
        [
            radius * jnp.sin(phi) * jnp.cos(np.pi - h),
            radius * jnp.cos(phi),
            radius * jnp.sin(phi) * jnp.sin(np.pi - h),
        ],
        axis=-1,
    )
    fwd = lookat_position - origins
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    return create_cam2world_matrix(fwd, origins)
