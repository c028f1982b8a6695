"""Kernel-layer unit tests: jnp/XLA ops vs torch-CPU oracles.

Implements SURVEY.md §4 test pyramid level (a): each TPU op is tested against
the exact formulas of the reference's pure-framework fallback implementations
(upfirdn2d.py:169-213, bias_act.py:93-122, grid_sample, modulated conv
networks_stylegan2.py:39-97), here reproduced through torch CPU ops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

pytestmark = pytest.mark.fast

from panic3d_tpu.ops import (
    bias_act,
    setup_filter,
    upfirdn2d,
    upsample2d,
    downsample2d,
    conv2d_resample,
    modulated_conv2d,
    grid_sample_2d,
    grid_sample_3d,
)

RNG = np.random.RandomState(0)


def torch_upfirdn2d_ref(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Oracle: the reference's pure-torch upfirdn2d formula."""
    x = torch.tensor(np.asarray(x), dtype=torch.float64)
    if f is None:
        f = torch.ones([1, 1], dtype=torch.float64)
    else:
        f = torch.tensor(np.asarray(f), dtype=torch.float64)
    batch_size, num_channels, in_height, in_width = x.shape
    upx = upy = up
    downx = downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    padx0, padx1, pady0, pady1 = padding

    x = x.reshape([batch_size, num_channels, in_height, 1, in_width, 1])
    x = torch.nn.functional.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape([batch_size, num_channels, in_height * upy, in_width * upx])
    x = torch.nn.functional.pad(
        x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)]
    )
    x = x[
        :,
        :,
        max(-pady0, 0) : x.shape[2] - max(-pady1, 0),
        max(-padx0, 0) : x.shape[3] - max(-padx1, 0),
    ]
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    f = f[np.newaxis, np.newaxis].repeat([num_channels, 1] + [1] * f.ndim)
    if f.ndim == 4:
        x = F.conv2d(input=x, weight=f, groups=num_channels)
    else:
        x = F.conv2d(input=x, weight=f.unsqueeze(2), groups=num_channels)
        x = F.conv2d(input=x, weight=f.unsqueeze(3), groups=num_channels)
    x = x[:, :, ::downy, ::downx]
    return x.numpy()


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0),
    (2, 1, 1),
    (1, 2, 1),
    (2, 1, [2, 1, 1, 2]),
    (1, 2, [1, 2, 2, 1]),
    (1, 1, [-1, 2, 0, -1]),
    (2, 2, 3),
])
@pytest.mark.parametrize("flip_filter", [False, True])
def test_upfirdn2d_matches_reference_formula(up, down, padding, flip_filter):
    x = RNG.randn(2, 3, 8, 8).astype(np.float32)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    got = np.asarray(
        upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down,
                  padding=padding, flip_filter=flip_filter, gain=1.5)
    )
    want = torch_upfirdn2d_ref(x, f, up=up, down=down, padding=padding,
                               flip_filter=flip_filter, gain=1.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_separable_filter():
    x = RNG.randn(1, 2, 10, 10).astype(np.float32)
    f1d = np.asarray(setup_filter(np.hanning(8), separable=True))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f1d), up=2, padding=3))
    want = torch_upfirdn2d_ref(x, f1d, up=2, padding=3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_downsample_roundtrip_shapes():
    x = jnp.asarray(RNG.randn(1, 4, 16, 16).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (1, 4, 32, 32)
    down = downsample2d(up, f)
    assert down.shape == (1, 4, 16, 16)


@pytest.mark.parametrize("act,gain,clamp", [
    ("linear", None, None),
    ("lrelu", None, 256.0),
    ("lrelu", 1.0, None),
    ("relu", None, None),
    ("tanh", None, None),
    ("sigmoid", None, None),
    ("softplus", None, None),
    ("swish", None, None),
])
def test_bias_act_matches_torch(act, gain, clamp):
    x = RNG.randn(3, 5, 4).astype(np.float32)
    b = RNG.randn(5).astype(np.float32)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act=act,
                              gain=gain, clamp=clamp))

    tx = torch.tensor(x) + torch.tensor(b).reshape(1, -1, 1)
    tfuncs = {
        "linear": lambda t: t,
        "relu": torch.relu,
        "lrelu": lambda t: F.leaky_relu(t, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "softplus": F.softplus,
        "swish": lambda t: torch.sigmoid(t) * t,
    }
    want = tfuncs[act](tx)
    default_gains = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}
    g = gain if gain is not None else default_gains.get(act, 1.0)
    want = want * g
    if clamp is not None:
        want = want.clamp(-clamp, clamp)
    # transcendentals differ slightly between XLA and torch libm
    tol = 1e-3 if act in ("tanh", "sigmoid", "softplus", "swish") else 1e-5
    np.testing.assert_allclose(got, want.numpy(), rtol=tol, atol=tol * 0.1)


@pytest.mark.parametrize("up,down,kernel", [
    (1, 1, 3),
    (2, 1, 3),
    (1, 2, 3),
    (1, 1, 1),
    (2, 1, 1),
    (1, 2, 1),
])
def test_conv2d_resample_against_torch_decomposition(up, down, kernel):
    """Oracle built from the reference decomposition: zero-insert upsample +
    FIR (via torch_upfirdn2d_ref) + plain conv + FIR + decimate."""
    x = RNG.randn(2, 4, 8, 8).astype(np.float32)
    w = RNG.randn(6, 4, kernel, kernel).astype(np.float32)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    padding = kernel // 2

    got = np.asarray(
        conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=jnp.asarray(f),
                        up=up, down=down, padding=padding, flip_weight=(up == 1))
    )

    # reference generic path (conv2d_resample.py:137-144 + pad adjustment)
    fw = fh = f.shape[0]
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    t = torch_upfirdn2d_ref(x, f if up > 1 else None, up=up,
                            padding=[px0, px1, py0, py1], gain=up**2)
    tw = torch.tensor(w, dtype=torch.float64)
    if up > 1:  # flip_weight=False => true convolution
        tw = tw.flip([2, 3])
    t = F.conv2d(torch.tensor(t), tw).numpy()
    if down > 1:
        t = torch_upfirdn2d_ref(t, f, down=down)
    assert got.shape == t.shape
    np.testing.assert_allclose(got, t, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("up", [1, 2])
def test_modulated_conv2d_against_torch_grouped(demodulate, up):
    """Oracle: the reference's fused grouped-conv formulation."""
    N, Cin, Cout, k, H = 2, 4, 6, 3, 8
    x = RNG.randn(N, Cin, H, H).astype(np.float32)
    w = RNG.randn(Cout, Cin, k, k).astype(np.float32)
    s = RNG.randn(N, Cin).astype(np.float32)
    f = np.asarray(setup_filter([1, 3, 3, 1])) if up > 1 else None

    got = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        up=up, padding=k // 2,
        resample_filter=jnp.asarray(f) if f is not None else None,
        demodulate=demodulate, flip_weight=(up == 1),
    ))

    # torch oracle: per-sample weights, grouped conv
    tw = torch.tensor(w, dtype=torch.float64)[None] * torch.tensor(s, dtype=torch.float64).reshape(N, 1, -1, 1, 1)
    if demodulate:
        d = (tw.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
        tw = tw * d.reshape(N, -1, 1, 1, 1)
    tx = torch.tensor(x, dtype=torch.float64).reshape(1, -1, H, H)
    tww = tw.reshape(-1, Cin, k, k)
    if up == 1:
        t = F.conv2d(tx, tww, padding=k // 2, groups=N)
        t = t.reshape(N, Cout, H, H).numpy()
    else:
        # transposed conv + FIR, as in reference conv2d_resample up path
        t = F.conv_transpose2d(tx, tww.transpose(0, 1).reshape(N * Cin, Cout, k, k).reshape(N * Cin, Cout, k, k) if False else tw.transpose(1, 2).reshape(N * Cin, Cout, k, k), stride=2, groups=N)
        t = t.reshape(N, Cout, *t.shape[2:]).numpy()
        fw = f.shape[0]
        pad = k // 2
        px0 = pad + (fw + up - 1) // 2 - (k - 1)
        px1 = pad + (fw - up) // 2 - (k - up)
        t = torch_upfirdn2d_ref(t, f, padding=[px0, px1, px0, px1], gain=up**2)
    assert got.shape == t.shape
    np.testing.assert_allclose(got, t, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("oob", [False, True])
def test_grid_sample_2d_matches_torch(padding_mode, oob):
    N, C, H, W = 2, 3, 7, 5
    x = RNG.randn(N, C, H, W).astype(np.float32)
    scale = 1.6 if oob else 0.95
    grid = (RNG.rand(N, 4, 6, 2).astype(np.float32) * 2 - 1) * scale
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid),
                                    padding_mode=padding_mode))
    want = F.grid_sample(torch.tensor(x), torch.tensor(grid),
                         mode="bilinear", padding_mode=padding_mode,
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(padding_mode):
    N, C, D, H, W = 2, 4, 3, 6, 5
    x = RNG.randn(N, C, D, H, W).astype(np.float32)
    grid = (RNG.rand(N, 2, 3, 4, 3).astype(np.float32) * 2 - 1) * 1.3
    got = np.asarray(grid_sample_3d(jnp.asarray(x), jnp.asarray(grid),
                                    padding_mode=padding_mode))
    want = F.grid_sample(torch.tensor(x), torch.tensor(grid),
                         mode="bilinear", padding_mode=padding_mode,
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_2d_gradients_flow():
    x = jnp.asarray(RNG.randn(1, 2, 5, 5).astype(np.float32))
    grid = jnp.asarray((RNG.rand(1, 3, 3, 2).astype(np.float32) * 2 - 1) * 0.9)

    def loss(x, g):
        return jnp.sum(grid_sample_2d(x, g) ** 2)

    gx, gg = jax.grad(loss, argnums=(0, 1))(x, grid)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gg).sum()) > 0


# ---------------------------------------------------------------------------
# corner-packed bilinear gather (the renderer's single-row-gather fast path)

def test_packed_gather_matches_torch_grid_sample():
    from panic3d_tpu.ops.grid_sample import (
        grid_sample_2d_points_packed, pack_bilinear_2d,
    )

    N, C, H, W = 3, 8, 9, 6
    x = RNG.randn(N, C, H, W).astype(np.float32)
    # include far out-of-range points (oob scale 2.5) to hit the weight mask
    pts = (RNG.rand(N, 50, 2).astype(np.float32) * 2 - 1) * 2.5
    packed = pack_bilinear_2d(jnp.asarray(x))
    assert packed.shape == (N, H + 1, W + 1, 4 * C)
    got = np.asarray(grid_sample_2d_points_packed(packed, jnp.asarray(pts)))

    grid = torch.tensor(pts).unsqueeze(1)  # [N,1,P,2]
    want = (
        F.grid_sample(torch.tensor(x), grid, mode="bilinear",
                      padding_mode="zeros", align_corners=False)
        .squeeze(2).permute(0, 2, 1).numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_packed_sample_from_planes_matches_unpacked():
    from panic3d_tpu.models.volumetric import renderer as vr

    N, C, H, W = 2, 32, 16, 16
    planes = jnp.asarray(RNG.randn(N, 3, C, H, W).astype(np.float32))
    coords = jnp.asarray((RNG.rand(N, 70, 3).astype(np.float32) - 0.5) * 1.2)
    axes = vr.generate_plane_axes(use_triplane=True)
    want = vr.sample_from_planes(axes, planes, coords, box_warp=0.7)
    got = vr.sample_from_planes_packed(
        axes, vr.pack_planes(planes), coords, box_warp=0.7
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_packed_gather_gradients_flow():
    from panic3d_tpu.ops.grid_sample import (
        grid_sample_2d_points_packed, pack_bilinear_2d,
    )

    x = jnp.asarray(RNG.randn(1, 4, 6, 6).astype(np.float32))
    pts = jnp.asarray((RNG.rand(1, 9, 2).astype(np.float32) * 2 - 1) * 0.9)

    def loss(x, p):
        return jnp.sum(grid_sample_2d_points_packed(pack_bilinear_2d(x), p) ** 2)

    gx, gp = jax.grad(loss, argnums=(0, 1))(x, pts)
    assert np.isfinite(np.asarray(gx)).all() and float(jnp.abs(gx).sum()) > 0
    assert np.isfinite(np.asarray(gp)).all() and float(jnp.abs(gp).sum()) > 0


def test_packed_border_gather_bit_equals_unpacked_border():
    """grid_sample_2d_points_packed_border == the unpacked border path
    bitwise (paste-front's _sample_orthofront projection), including
    out-of-range points collapsing onto edge texels, and matches torch
    grid_sample(padding_mode='border')."""
    from panic3d_tpu.ops.grid_sample import (
        grid_sample_2d_points,
        grid_sample_2d_points_packed_border,
        pack_bilinear_2d,
    )

    rng = np.random.RandomState(7)
    N, C, H, W = 2, 3, 17, 23
    x = rng.randn(N, C, H, W).astype(np.float32)
    pts = rng.uniform(-1.6, 1.6, (N, 257, 2)).astype(np.float32)

    want = np.asarray(
        grid_sample_2d_points(jnp.asarray(x), jnp.asarray(pts), "border")
    )
    got = np.asarray(
        grid_sample_2d_points_packed_border(
            pack_bilinear_2d(jnp.asarray(x)), jnp.asarray(pts)
        )
    )
    np.testing.assert_array_equal(got, want)

    ref = F.grid_sample(
        torch.tensor(x), torch.tensor(pts)[:, :, None, :],
        mode="bilinear", padding_mode="border", align_corners=False,
    )[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
