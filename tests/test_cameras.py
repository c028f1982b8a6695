"""Camera-convention tests against scipy/torch oracles.

SURVEY.md §4 level (b): golden numerics for camera matrices
(`_databacks/lustrous_renders_v1.py:33-104`) and pinhole rays
(`ray_sampler.py:24-62`), reproduced here via scipy + torch.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.spatial.transform
import torch

pytestmark = pytest.mark.fast

from panic3d_tpu.cameras import (
    cam60,
    camsubs,
    euler_xyz_matrix,
    camera_label,
    get_rays_ortho,
    sample_rays,
    lookat_pose,
)


def scipy_camera_label(elev, azim, dist, fov):
    focal_length = 0.5 / np.tan((fov / 2) * np.pi / 180)
    mat_intr = np.asarray(
        [[focal_length, 0, 0.5], [0, focal_length, 0.5], [0, 0, 1]], dtype=np.float32
    )
    R = np.eye(4)
    R[:3, :3] = (
        scipy.spatial.transform.Rotation.from_euler(
            "xyz", [elev, azim, 0], degrees=True
        )
        .as_matrix()
        .T
    )
    R[[0, 2]] *= -1
    R[2, -1] = -dist
    mat_extr = (
        np.asarray([[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]])
        @ np.linalg.inv(R)
        @ np.asarray([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]])
    )
    return np.concatenate([mat_extr.flatten(), mat_intr.flatten()]).astype(np.float32)


def test_euler_matches_scipy():
    rng = np.random.RandomState(1)
    angles = rng.uniform(-180, 180, size=(10, 3)).astype(np.float32)
    got = np.asarray(euler_xyz_matrix(angles[:, 0], angles[:, 1], angles[:, 2]))
    for i, a in enumerate(angles):
        want = scipy.spatial.transform.Rotation.from_euler(
            "xyz", a, degrees=True
        ).as_matrix()
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("elev,azim,dist,fov", [
    (0.0, 0.0, 1.0, 30.0),
    (60.0, -180.0, 1.0, 30.0),
    (-20.0, 150.0, 1.2, 12.0),
    (13.0, 77.0, 0.9, 30.0),
])
def test_camera_label_matches_reference_formula(elev, azim, dist, fov):
    got = np.asarray(camera_label(elev, azim, dist, fov))
    want = scipy_camera_label(elev, azim, dist, fov)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_camera_label_batched():
    ea = cam60[camsubs["spin12"]]
    got = np.asarray(
        camera_label(ea[:, 0], ea[:, 1], np.ones(12), 30 * np.ones(12))
    )
    assert got.shape == (12, 25)
    for i in range(12):
        want = scipy_camera_label(ea[i, 0], ea[i, 1], 1.0, 30.0)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def torch_get_rays_ortho(e, a, d, bw, r):
    """Oracle: reference get_rays_ortho (lustrous_renders_v1.py:78-104)."""
    mg = torch.arange(r).float()
    mg = torch.stack(
        torch.meshgrid(
            ((mg + 0.5) / r * bw - bw / 2),
            -((mg + 0.5) / r * bw - bw / 2),
            indexing="xy",
        )
        + (torch.zeros(r, r),)
    )
    mg = torch.stack([mg, mg + torch.tensor([0.0, 0.0, -1.0])[:, None, None]])
    mg[:, 2] += d
    rot = torch.tensor(
        scipy.spatial.transform.Rotation.from_euler(
            "xyz", [-e, a, 0.0], degrees=True
        ).as_matrix(),
        dtype=mg.dtype,
    )
    t = (rot @ mg.permute(0, 2, 3, 1)[..., None]).permute(-1, 0, 3, 1, 2)[0]
    return t[0].numpy(), (t[1] - t[0]).numpy()


@pytest.mark.parametrize("elev,azim", [(0.0, 0.0), (0.0, 90.0), (30.0, -45.0)])
def test_get_rays_ortho_matches_reference(elev, azim):
    o_got, d_got = get_rays_ortho(elev, azim, 1.0, 0.7, 8)
    o_want, d_want = torch_get_rays_ortho(elev, azim, 1.0, 0.7, 8)
    np.testing.assert_allclose(np.asarray(o_got), o_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_got), d_want, rtol=1e-4, atol=1e-5)


def test_sample_rays_matches_reference_formula():
    """Oracle: RaySampler.forward math in torch (ray_sampler.py:24-62)."""
    label = scipy_camera_label(10.0, 25.0, 1.0, 30.0)
    c2w = torch.tensor(label[:16]).reshape(1, 4, 4)
    intr = torch.tensor(label[16:25]).reshape(1, 3, 3)
    res = 4

    N, M = 1, res * res
    cam_locs_world = c2w[:, :3, 3]
    fx, fy = intr[:, 0, 0], intr[:, 1, 1]
    cx, cy, sk = intr[:, 0, 2], intr[:, 1, 2], intr[:, 0, 1]
    uv = (
        torch.stack(
            torch.meshgrid(
                torch.arange(res).float(), torch.arange(res).float(), indexing="ij"
            )
        )
        * (1.0 / res)
        + (0.5 / res)
    )
    uv = uv.flip(0).reshape(2, -1).transpose(1, 0)[None]
    x_cam, y_cam = uv[:, :, 0], uv[:, :, 1]
    z_cam = torch.ones((N, M))
    x_lift = (
        (x_cam - cx[:, None] + cy[:, None] * sk[:, None] / fy[:, None]
         - sk[:, None] * y_cam / fy[:, None]) / fx[:, None] * z_cam
    )
    y_lift = (y_cam - cy[:, None]) / fy[:, None] * z_cam
    cam_rel = torch.stack((x_lift, y_lift, z_cam, torch.ones_like(z_cam)), dim=-1)
    world = torch.bmm(c2w, cam_rel.permute(0, 2, 1)).permute(0, 2, 1)[:, :, :3]
    ray_dirs = world - cam_locs_world[:, None, :]
    ray_dirs = torch.nn.functional.normalize(ray_dirs, dim=2)

    o_got, d_got = sample_rays(jnp.asarray(label[:16]).reshape(1, 4, 4),
                               jnp.asarray(label[16:25]).reshape(1, 3, 3), res)
    np.testing.assert_allclose(np.asarray(d_got), ray_dirs.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o_got), cam_locs_world[:, None, :].repeat(1, M, 1).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_lookat_pose_shape_and_position():
    m = np.asarray(lookat_pose(np.pi / 2, np.pi / 2, jnp.zeros(3), radius=2.7))
    assert m.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(m[:3, 3]), 2.7, rtol=1e-5)
    # camera at azimuth pi/2 (front): position along +z
    np.testing.assert_allclose(m[:3, 3], [0, 0, 2.7], atol=1e-5)
