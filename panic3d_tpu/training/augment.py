"""ADA augmentation pipeline.

Role of `src/training/augment.py` (StyleGAN2-ADA AugmentPipe): probability
-gated geometric + color + noise/cutout augmentations applied to
discriminator inputs, with the tunable global strength `p` driven by the
ADA heuristic (training_loop_v0.py:398-402). Disabled in the shipped
PAniC-3D run (--aug noaug, train_eclustrousC.py:208).

Geometric warps run the reference's sym6-wavelet-filtered transform stack
(reflect pad -> filtered 2x upsample -> affine sample -> filtered 2x
downsample, augment.py:273-308), oracle-tested against the torch pipe; the
one deviation is a static pad margin (see execute_geometric_filtered).
AugmentConfig(filtered=False) selects a cheap single bilinear resample
instead. Color transforms, imgfilter (frequency-band amplification through
the sym2 filter bank, augment.py:176-185,382-411), noise and cutout are
exact.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # sym6 wavelet-filtered geometric execution (reference-exact); False
    # selects the cheap single bilinear resample
    filtered: bool = True
    imgfilter: float = 0.0
    imgfilter_bands: tuple = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5

    @staticmethod
    def bgc():
        """The 'bgc' preset: blit + geometric + color all at strength 1."""
        return AugmentConfig(
            xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
            brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
        )

    @staticmethod
    def bgcfnc():
        """The 'bgcfnc' preset: bgc + imgfilter + noise + cutout
        (the reference's augpipe_specs table)."""
        return dataclasses.replace(
            AugmentConfig.bgc(), imgfilter=1, noise=1, cutout=1,
        )


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1),
         jnp.stack([z, z, o], -1)], -2,
    )


def _translate2(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1),
         jnp.stack([z, z, o], -1)], -2,
    )


def _scale2(sx, sy):
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1),
         jnp.stack([z, z, o], -1)], -2,
    )


# sym6 orthogonal-wavelet low-pass, the reference's geometric antialiasing
# filter (augment.py:42,174)
WAVELET_SYM6 = np.asarray([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
], dtype=np.float32)


# sym2 wavelet, basis of the image-space filter bank (augment.py:38,176-185)
WAVELET_SYM2 = np.asarray([
    -0.12940952255092145, 0.22414386804185735,
    0.836516303737469, 0.48296291314469025,
], dtype=np.float64)


def _make_fbank(num_bands: int = 4) -> np.ndarray:
    """4-band bandpass filter bank for image-space filtering
    (augment.py:176-185): band 0 = lowpass, bands 1..3 split successive
    octaves via the quadrature-mirror highpass."""
    Hz_lo = WAVELET_SYM2
    Hz_hi = Hz_lo * ((-1.0) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    fb = np.eye(num_bands, 1)
    for i in range(1, num_bands):
        # zero-interleave (upsample the band layout by 2), then refine
        fb = np.dstack([fb, np.zeros_like(fb)]).reshape(fb.shape[0], -1)[:, :-1]
        fb = np.stack([np.convolve(row, Hz_lo2) for row in fb])
        lo = (fb.shape[1] - Hz_hi2.size) // 2
        fb[i, lo : lo + Hz_hi2.size] += Hz_hi2
    return fb.astype(np.float32)


HZ_FBANK = _make_fbank()
# expected 1/f power of each band (augment.py:385)
IMGFILTER_EXPECTED_POWER = np.asarray([10, 1, 1, 1], np.float32) / 13


def apply_imgfilter(images, gains):
    """Per-sample separable band-amplification filter (augment.py:400-411).

    gains [N, 4] band gains -> combined 1D filter Hz' = gains @ HZ_FBANK,
    applied horizontally then vertically (cross-correlation, matching torch
    conv2d) over a reflect-padded image, one filter per (sample, channel).
    """
    N, C, H, W = images.shape
    Hz_prime = gains @ jnp.asarray(HZ_FBANK)            # [N, taps]
    taps = HZ_FBANK.shape[1]
    pad = taps // 2
    w_h = jnp.repeat(Hz_prime[:, None, :], C, axis=1).reshape(N * C, 1, 1, taps)
    x = jnp.pad(images, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    x = x.reshape(1, N * C, H + 2 * pad, W + 2 * pad)
    dn = jax.lax.conv_dimension_numbers(x.shape, w_h.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, w_h, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=N * C
    )
    w_v = w_h.reshape(N * C, 1, taps, 1)
    x = jax.lax.conv_general_dilated(
        x, w_v, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=N * C
    )
    return x.reshape(N, C, H, W)


def imgfilter_gains(key, N: int, p: float, cfg: "AugmentConfig"):
    """Sample the [N, 4] per-band gain matrix (augment.py:387-398): each
    band amplified by exp2(N(0,std)) with probability imgfilter*p*band,
    power-normalized against the expected 1/f spectrum."""
    expected_power = jnp.asarray(IMGFILTER_EXPECTED_POWER)
    gains = jnp.ones((N, 4), jnp.float32)
    bkeys = jax.random.split(key, 8)
    for i, band_strength in enumerate(cfg.imgfilter_bands):
        t_i = jnp.exp2(jax.random.normal(bkeys[2 * i], (N,)) * cfg.imgfilter_std)
        on = jax.random.uniform(bkeys[2 * i + 1], (N,)) < (
            cfg.imgfilter * p * band_strength
        )
        t_i = jnp.where(on, t_i, 1.0)
        t = jnp.ones((N, 4), jnp.float32).at[:, i].set(t_i)
        t = t / jnp.sqrt(
            jnp.sum(expected_power * t ** 2, axis=-1, keepdims=True)
        )
        gains = gains * t
    return gains


def _const2(m):
    return jnp.asarray(m, dtype=jnp.float32)


def execute_geometric_filtered(images, Ginv_norm, margin: Optional[int] = None):
    """The reference's antialiased geometric warp (augment.py:273-308):
    reflect-pad -> sym6-filtered 2x upsample -> affine bilinear sample at 2x
    -> sym6-filtered 2x downsample with crop. Operation-for-operation port;
    the ONE deviation is a STATIC symmetric pad margin (XLA needs static
    shapes; the reference computes a per-batch dynamic margin from the
    transform's reach, clipped to width-1 — points mapping beyond the
    static margin fall to zeros exactly as the reference's clipped case).

    Ginv_norm: [N,3,3] mapping OUTPUT -> INPUT in align_corners=True
    normalized coords (the accumulation convention of augment_pipe).
    """
    from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

    N, C, H, W = images.shape
    Hz = setup_filter(WAVELET_SYM6)            # 1D separable (12 taps)
    Hz_pad = WAVELET_SYM6.shape[0] // 4        # = 3 (augment.py:284)
    m = margin if margin is not None else min(W - 1, W // 4 + Hz_pad * 2)

    # normalized(align_corners=True) -> centered pixel units
    D = np.diag([(W - 1) / 2.0, (H - 1) / 2.0, 1.0])
    G = _const2(D) @ Ginv_norm @ _const2(np.linalg.inv(D))

    images = jnp.pad(
        images, ((0, 0), (0, 0), (m, m), (m, m)), mode="reflect"
    )

    # upsample (augment.py:297-300): pixel-coordinate corrections exactly
    # as the reference composes them
    images = upsample2d(images, Hz, up=2)
    G = _const2(np.diag([2.0, 2.0, 1.0])) @ G @ _const2(np.diag([0.5, 0.5, 1.0]))
    T = np.eye(3); T[0, 2] = T[1, 2] = -0.5
    G = _const2(T) @ G @ _const2(np.linalg.inv(T))

    # affine sample at 2x over the (H + 2*Hz_pad) target (augment.py:302-305)
    Sh, Sw = (H + Hz_pad * 2) * 2, (W + Hz_pad * 2) * 2
    h_up, w_up = images.shape[2], images.shape[3]
    G = (
        _const2(np.diag([2.0 / w_up, 2.0 / h_up, 1.0]))
        @ G
        @ _const2(np.diag([Sw / 2.0, Sh / 2.0, 1.0]))
    )
    # torch affine_grid(align_corners=False) output coords: (2i+1)/S - 1
    ys = (jnp.arange(Sh, dtype=jnp.float32) + 0.5) * 2 / Sh - 1
    xs = (jnp.arange(Sw, dtype=jnp.float32) + 0.5) * 2 / Sw - 1
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # [Sh,Sw,3]
    warped = jnp.einsum("nij,hwj->nhwi", G, grid)[..., :2]
    images = grid_sample_2d(
        images, warped, padding_mode="zeros", align_corners=False
    )

    # downsample and crop (augment.py:308)
    return downsample2d(
        images, Hz, down=2, padding=-Hz_pad * 2, flip_filter=True
    )


def augment_pipe(images, key, p: float, cfg: AugmentConfig = AugmentConfig.bgc()):
    """Apply probability-p augmentations to NCHW images in [-1,1]."""
    N, C, H, W = images.shape
    keys = jax.random.split(key, 17)
    G = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))

    def gate(k, prob):
        return jax.random.uniform(k, (N,)) < (prob * p)

    # geometric (accumulated into one affine)
    if cfg.xflip > 0:
        flip = gate(keys[0], cfg.xflip)
        sx = jnp.where(flip, -1.0, 1.0)
        G = _scale2(sx, jnp.ones(N)) @ G
    if cfg.rotate90 > 0:
        on = gate(keys[1], cfg.rotate90)
        quarter = jax.random.randint(keys[2], (N,), 0, 4)
        theta = jnp.where(on, quarter * (np.pi / 2), 0.0)
        G = _rot2(theta) @ G
    if cfg.xint > 0:
        on = gate(keys[3], cfg.xint)[:, None]
        t = jax.random.uniform(
            keys[4], (N, 2), minval=-cfg.xint_max, maxval=cfg.xint_max
        )
        t = jnp.where(on, jnp.round(t * jnp.asarray([W, H])) * 2 / jnp.asarray([W, H]), 0.0)
        G = _translate2(t[:, 0], t[:, 1]) @ G
    if cfg.scale > 0:
        on = gate(keys[5], cfg.scale)
        s = jnp.exp2(jax.random.normal(keys[6], (N,)) * cfg.scale_std)
        s = jnp.where(on, s, 1.0)
        G = _scale2(s, s) @ G
    if cfg.rotate > 0:
        on = gate(keys[7], cfg.rotate)
        theta = jax.random.uniform(
            keys[8], (N,), minval=-np.pi * cfg.rotate_max, maxval=np.pi * cfg.rotate_max
        )
        G = _rot2(jnp.where(on, theta, 0.0)) @ G
    if cfg.aniso > 0:
        on = gate(keys[9], cfg.aniso)
        s = jnp.exp2(jax.random.normal(keys[10], (N,)) * cfg.aniso_std)
        s = jnp.where(on, s, 1.0)
        G = _scale2(s, 1 / s) @ G
    if cfg.xfrac > 0:
        on = gate(keys[11], cfg.xfrac)[:, None]
        t = jax.random.normal(keys[12], (N, 2)) * cfg.xfrac_std
        t = jnp.where(on, t, 0.0)
        G = _translate2(t[:, 0], t[:, 1]) @ G

    # resample through the inverse affine
    if cfg.xflip + cfg.rotate90 + cfg.xint + cfg.scale + cfg.rotate + cfg.aniso + cfg.xfrac > 0:
        Ginv = jnp.linalg.inv(G)
        if cfg.filtered:
            images = execute_geometric_filtered(images, Ginv)
        else:
            ys, xs = jnp.meshgrid(
                jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij"
            )
            grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # [H,W,3]
            warped = jnp.einsum("nij,hwj->nhwi", Ginv, grid)[..., :2]
            # grid corner-aligned (linspace(-1,1)) -> align_corners=True
            images = grid_sample_2d(
                images, warped, padding_mode="zeros", align_corners=True
            )

    # color transforms (4x4 homogeneous color matrix)
    Cm = jnp.broadcast_to(jnp.eye(4), (N, 4, 4))
    v = jnp.asarray([1, 1, 1, 0], dtype=jnp.float32) / np.sqrt(3)

    def cmat(diag=None, outer=None, add=None):
        m = jnp.eye(4)
        if diag is not None:
            m = m * diag
        return m

    if cfg.brightness > 0:
        on = gate(keys[13], cfg.brightness)
        b = jnp.where(on, jax.random.normal(keys[13], (N,)) * cfg.brightness_std, 0.0)
        T = jnp.broadcast_to(jnp.eye(4), (N, 4, 4))
        T = T.at[:, :3, 3].set(b[:, None])
        Cm = T @ Cm
    if cfg.contrast > 0:
        on = gate(keys[14], cfg.contrast)
        c = jnp.where(on, jnp.exp2(jax.random.normal(keys[14], (N,)) * cfg.contrast_std), 1.0)
        T = jnp.eye(4)[None] * jnp.stack([c, c, c, jnp.ones_like(c)], -1)[:, :, None]
        Cm = T @ Cm
    if cfg.lumaflip > 0:
        on = gate(keys[15], cfg.lumaflip).astype(jnp.float32)
        refl = jnp.eye(4) - 2 * jnp.outer(v, v)
        T = jnp.eye(4)[None] * (1 - on)[:, None, None] + refl[None] * on[:, None, None]
        Cm = T @ Cm
    if cfg.hue > 0:
        on = gate(keys[5], cfg.hue)
        theta = jax.random.uniform(keys[6], (N,), minval=-np.pi * cfg.hue_max,
                                   maxval=np.pi * cfg.hue_max)
        theta = jnp.where(on, theta, 0.0)
        # Rodrigues rotation about the luma axis
        K = jnp.asarray(
            [[0, -v[2], v[1], 0], [v[2], 0, -v[0], 0],
             [-v[1], v[0], 0, 0], [0, 0, 0, 0]], dtype=jnp.float32,
        )
        T = (
            jnp.eye(4)[None]
            + jnp.sin(theta)[:, None, None] * K[None]
            + (1 - jnp.cos(theta))[:, None, None] * (K @ K)[None]
        )
        Cm = T @ Cm
    if cfg.saturation > 0:
        on = gate(keys[7], cfg.saturation)
        s = jnp.where(on, jnp.exp2(jax.random.normal(keys[8], (N,)) * cfg.saturation_std), 1.0)
        outer_v = jnp.outer(v, v)
        T = outer_v[None] + (jnp.eye(4)[None] - outer_v[None]) * s[:, None, None]
        Cm = T @ Cm

    if cfg.brightness + cfg.contrast + cfg.lumaflip + cfg.hue + cfg.saturation > 0:
        # apply the 3x3+offset color matrix per RGB triple; 6-channel inputs
        # (the joint dual-discrimination pair) get it on each triple
        # independently (reference augment.py:364-376)
        flat = images.reshape(N, C, -1)
        A, b = Cm[:, :3, :3], Cm[:, :3, 3:]
        if C == 3:
            out = A @ flat + b
        elif C == 1:
            Cm1 = jnp.mean(Cm[:, :3, :], axis=1, keepdims=True)
            out = flat * jnp.sum(Cm1[:, :, :3], axis=2, keepdims=True) + Cm1[:, :, 3:]
        elif C % 3 == 0:
            out = jnp.concatenate(
                [A @ flat[:, i : i + 3] + b for i in range(0, C, 3)], axis=1
            )
        else:
            raise ValueError(f"color transform needs C in (1, 3k); got {C}")
        images = out.reshape(N, C, H, W)

    # image-space filtering (frequency-band amplification, augment.py:382-411)
    if cfg.imgfilter > 0:
        images = apply_imgfilter(images, imgfilter_gains(keys[16], N, p, cfg))

    # noise + cutout
    if cfg.noise > 0:
        k1, k2 = jax.random.split(keys[9])
        on = gate(k1, cfg.noise).astype(jnp.float32)[:, None, None, None]
        sigma = jnp.abs(jax.random.normal(k1, (N, 1, 1, 1))) * cfg.noise_std
        images = images + jax.random.normal(k2, images.shape) * sigma * on
    if cfg.cutout > 0:
        k1, k2 = jax.random.split(keys[10])
        on = gate(k1, cfg.cutout).astype(jnp.float32)[:, None, None, None]
        center = jax.random.uniform(k2, (N, 2, 1, 1))
        ys = jnp.linspace(0, 1, H)[None, :, None]
        xs = jnp.linspace(0, 1, W)[None, None, :]
        mask = (
            (jnp.abs(ys - center[:, 0]) < cfg.cutout_size / 2)
            & (jnp.abs(xs - center[:, 1]) < cfg.cutout_size / 2)
        ).astype(jnp.float32)[:, None]
        images = images * (1 - mask * on)
    return images
