"""StyleGAN2 backbone (mapping + synthesis + discriminator) in flax.linen.

Role of `src/training/networks_stylegan2.py` including every PAniC-3D
``cond_mode`` injection (resnet feature conditioning, ortho-front image
injections, symmetry priors, latent injection, stop_level early exit —
networks_stylegan2.py:221-229,258-264,543-714).

TPU-first design:
- Mixed precision is bfloat16 (flag per block), not fp16: params live in
  fp32, block compute casts to bf16, demodulation stats stay fp32. bf16 has
  fp32 exponent range so the reference's fp16 overflow guards are inert.
- Modulated conv uses the non-fused formulation only (see ops/conv.py).
- Per-layer noise comes from the flax 'noise' rng collection; 'const' noise
  is a buffer variable so reference checkpoints can be converted 1:1.
- Parameter names mirror the reference state_dict (b{res}, conv0/conv1,
  torgb, affine, fc{i}, ...) so the checkpoint converter is a pure renamer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import bias_act, activation_funcs
from ..ops.conv import conv2d_resample, modulated_conv2d
from ..ops.upfirdn2d import setup_filter, upsample2d, downsample2d


def normalize_2nd_moment(x, axis=1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def resize_bilinear(x, size, antialias=False):
    """torch F.interpolate(mode='bilinear', align_corners=False) on NCHW."""
    return jax.image.resize(
        x, x.shape[:2] + (size, size), method="bilinear", antialias=antialias
    )


class FullyConnectedLayer(nn.Module):
    """networks_stylegan2.py:101-136: equalized-lr dense layer."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, out_slice=None, accum_f32=False, kernel_tile=1):
        """out_slice: optionally compute only output features
        [out_slice.start, out_slice.stop) — the SAME affine map restricted
        to those rows of the (full-shape) weight. Lets sigma-only decodes
        (OSGDecoder) avoid materializing the 32 rgb channels they drop.

        accum_f32: with a bfloat16 input, run the matmul with bf16
        operands but a float32 result (preferred_element_type) — the MXU's
        native mixed-precision mode. No-op for fp32/f64 inputs.

        kernel_tile: apply the SAME [out, in] kernel to ``kernel_tile``
        stacked input blocks and sum — x [*, in*kernel_tile] against
        tile(w, (1, kernel_tile)). The param keeps its [out, in] shape;
        used by OSGDecoder's packed_corners fused decode, where the input
        blocks are pre-scaled by bilinear/plane-mean weights."""
        w = self.param(
            "weight",
            lambda k: jax.random.normal(
                k, (self.out_features, self.in_features), jnp.float32
            )
            / self.lr_multiplier,
        )
        weight_gain = self.lr_multiplier / np.sqrt(self.in_features)
        w = w.astype(x.dtype) * weight_gain
        if out_slice is not None:
            w = w[out_slice]
        if kernel_tile != 1:
            w = jnp.tile(w, (1, kernel_tile))
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k: jnp.full((self.out_features,), self.bias_init, jnp.float32),
            )
            if self.lr_multiplier != 1:
                b = b * self.lr_multiplier
            if out_slice is not None:
                b = b[out_slice]
        if accum_f32 and x.dtype == jnp.bfloat16:
            x = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)
        else:
            x = x @ w.T
        if self.activation == "linear":
            if b is not None:
                x = x + b.astype(x.dtype)
        else:
            x = bias_act(x, b.astype(x.dtype) if b is not None else None,
                         dim=x.ndim - 1, act=self.activation)
        return x


class Conv2dLayer(nn.Module):
    """networks_stylegan2.py:140-194: unmodulated conv with resampling."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True

    @nn.compact
    def __call__(self, x, gain: float = 1.0):
        init = lambda k: jax.random.normal(
            k, (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
            jnp.float32,
        )
        if self.trainable:
            w = self.param("weight", init)
        else:
            w = self.variable("buffers", "weight", lambda: init(self.make_rng("params"))).value
        f = setup_filter(list(self.resample_filter))
        weight_gain = 1 / np.sqrt(self.in_channels * self.kernel_size**2)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,)) if self.use_bias else None

        x = conv2d_resample(
            x,
            (w * weight_gain).astype(x.dtype),
            f=f,
            up=self.up,
            down=self.down,
            padding=self.kernel_size // 2,
            flip_weight=(self.up == 1),
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, b.astype(x.dtype) if b is not None else None,
            act=self.activation, gain=act_gain, clamp=act_clamp,
        )


class MappingNetwork(nn.Module):
    """networks_stylegan2.py:198-294 incl. resnetcond_N feature conditioning."""

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    cond_mode: str = "none"
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998

    @property
    def resnet_cond(self) -> int:
        for m in self.cond_mode.split("."):
            if m.startswith("resnetcond_"):
                return int(m.split("_")[-1])
        return 0

    @nn.compact
    def __call__(self, z, c, cond=None, truncation_psi=1.0, truncation_cutoff=None,
                 update_emas=False):
        embed_features = self.embed_features
        if embed_features is None:
            embed_features = self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim
        features_list = (
            [self.z_dim + embed_features]
            + [layer_features] * (self.num_layers - 1)
            + [self.w_dim]
        )

        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32), axis=1)
        if self.c_dim > 0:
            if self.resnet_cond > 0:
                assert cond is not None and "resnet_feats" in cond
                c = jnp.concatenate(
                    [c, cond["resnet_feats"][:, : self.resnet_cond]], axis=1
                )
            y = FullyConnectedLayer(
                self.c_dim + self.resnet_cond, embed_features, name="embed"
            )(c.astype(jnp.float32))
            y = normalize_2nd_moment(y, axis=1)
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for idx in range(self.num_layers):
            x = FullyConnectedLayer(
                features_list[idx],
                features_list[idx + 1],
                activation=self.activation,
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )(x)

        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable(
                "buffers", "w_avg", lambda: jnp.zeros((self.w_dim,), jnp.float32)
            )
            if update_emas and not self.is_initializing():
                mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
                w_avg.value = mean_w + (w_avg.value - mean_w) * self.w_avg_beta

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        # `is not 1` would need a host bool; psi may be a TRACED scalar (the
        # interactive viewer jits it as an argument so a slider move never
        # recompiles). The lerp is an identity at psi=1, so apply it
        # unconditionally — one fused FMA, free under XLA.
        if not (isinstance(truncation_psi, (int, float))
                and truncation_psi == 1):
            assert self.w_avg_beta is not None
            w_avg = self.get_variable("buffers", "w_avg")
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + (x - w_avg) * truncation_psi
            else:
                head = w_avg + (x[:, :truncation_cutoff] - w_avg) * truncation_psi
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x


class SynthesisLayer(nn.Module):
    """networks_stylegan2.py:298-358: modulated conv + noise + bias_act."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, w, noise_mode="random", gain: float = 1.0):
        assert noise_mode in ("random", "const", "none")
        styles = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, name="affine"
        )(w)
        weight = self.param(
            "weight",
            lambda k: jax.random.normal(
                k,
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            ),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        noise = None
        if self.use_noise:
            noise_const = self.variable(
                "buffers",
                "noise_const",
                lambda: jax.random.normal(
                    self.make_rng("params"), (self.resolution, self.resolution),
                    jnp.float32,
                ),
            )
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "random":
                noise = (
                    jax.random.normal(
                        self.make_rng("noise"),
                        (x.shape[0], 1, self.resolution, self.resolution),
                    )
                    * noise_strength
                )
            elif noise_mode == "const":
                noise = noise_const.value * noise_strength

        f = setup_filter(list(self.resample_filter))
        x = modulated_conv2d(
            x,
            weight,
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=f,
            flip_weight=(self.up == 1),
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, bias.astype(x.dtype), act=self.activation, gain=act_gain, clamp=act_clamp
        )


class ToRGBLayer(nn.Module):
    """networks_stylegan2.py:362-383."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, w):
        weight_gain = 1 / np.sqrt(self.in_channels * self.kernel_size**2)
        styles = (
            FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0, name="affine")(w)
            * weight_gain
        )
        weight = self.param(
            "weight",
            lambda k: jax.random.normal(
                k,
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            ),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        x = modulated_conv2d(x, weight, styles, demodulate=False,
                             padding=self.kernel_size // 2)
        return bias_act(x, bias.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """networks_stylegan2.py:387-487. up=2 unless no_up (superres variant)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256
    use_fp16: bool = False
    no_up: bool = False  # SynthesisBlockNoUp (superresolution.py:157-260)
    layer_kwargs: dict = None  # type: ignore[assignment]

    @property
    def num_conv(self):
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self):
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x, img, ws, force_fp32=False, update_emas=False, **layer_kwargs):
        del update_emas  # unused (parity with reference signature)
        # full-precision blocks follow the INPUT dtype when it is wider
        # than fp32, so x64 discrimination runs (flagship_parity X64=1)
        # keep f64 through the backbone; fp32/bf16 production is unchanged
        full = jnp.promote_types(
            ws.dtype if x is None else x.dtype, jnp.float32
        )
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else full
        up = 1 if self.no_up else 2
        lk = dict(self.layer_kwargs or {})
        lk.update(layer_kwargs)
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])

        if self.in_channels == 0:
            const = self.param(
                "const",
                lambda k: jax.random.normal(
                    k, (self.out_channels, self.resolution, self.resolution), jnp.float32
                ),
            )
            x = jnp.broadcast_to(
                const[None].astype(dtype),
                (ws.shape[0],) + const.shape,
            )
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = SynthesisLayer(
                self.out_channels, self.out_channels, w_dim=self.w_dim,
                resolution=self.resolution, conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter, name="conv1",
            )(x, next(w_iter), **lk)
        elif self.architecture == "resnet":
            y = Conv2dLayer(
                self.in_channels, self.out_channels, kernel_size=1, use_bias=False,
                up=up, resample_filter=self.resample_filter, name="skip",
            )(x, gain=np.sqrt(0.5))
            x = SynthesisLayer(
                self.in_channels, self.out_channels, w_dim=self.w_dim,
                resolution=self.resolution, up=up, conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter, name="conv0",
            )(x, next(w_iter), **lk)
            x = SynthesisLayer(
                self.out_channels, self.out_channels, w_dim=self.w_dim,
                resolution=self.resolution, conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter, name="conv1",
            )(x, next(w_iter), gain=np.sqrt(0.5), **lk)
            x = y + x
        else:
            x = SynthesisLayer(
                self.in_channels, self.out_channels, w_dim=self.w_dim,
                resolution=self.resolution, up=up, conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter, name="conv0",
            )(x, next(w_iter), **lk)
            x = SynthesisLayer(
                self.out_channels, self.out_channels, w_dim=self.w_dim,
                resolution=self.resolution, conv_clamp=self.conv_clamp,
                resample_filter=self.resample_filter, name="conv1",
            )(x, next(w_iter), **lk)

        if img is not None and not self.no_up:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(
                self.out_channels, self.img_channels, w_dim=self.w_dim,
                conv_clamp=self.conv_clamp, name="torgb",
            )(x, next(w_iter))
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """networks_stylegan2.py:491-724 with all cond_mode injections."""

    w_dim: int
    img_resolution: int
    img_channels: int
    cond_mode: str = "none"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256
    architecture: str = "skip"

    @property
    def block_resolutions(self):
        return [2**i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    @property
    def channels_dict(self):
        return {
            res: min(self.channel_base // res, self.channel_max)
            for res in self.block_resolutions
        }

    @property
    def num_ws(self):
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
        return n + 1  # final torgb

    def _block_defs(self):
        fp16_resolution = max(
            2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8
        )
        defs = []
        for res in self.block_resolutions:
            in_ch = self.channels_dict[res // 2] if res > 4 else 0
            out_ch = self.channels_dict[res]
            defs.append(
                dict(
                    in_channels=in_ch,
                    out_channels=out_ch,
                    resolution=res,
                    use_fp16=(res >= fp16_resolution),
                    is_last=(res == self.img_resolution),
                )
            )
        return defs

    @nn.compact
    def __call__(self, ws, cond=None, latent_injection=None, stop_level=None,
                 return_more=False, update_emas=False, **block_kwargs):
        del update_emas  # unused (parity with reference signature)
        ws = ws.astype(jnp.float32)
        cm = set(self.cond_mode.split("."))
        chonkadd = [int(c.split("_")[-1]) for c in cm if c.startswith("reschonk_add_")]
        chonkadd = chonkadd[0] if chonkadd else 0

        # split ws per block
        block_ws = []
        w_idx = 0
        defs = self._block_defs()
        for d in defs:
            n_conv = 1 if d["in_channels"] == 0 else 2
            n_torgb = 1  # architecture 'skip': every block has torgb
            block_ws.append(ws[:, w_idx : w_idx + n_conv + n_torgb])
            w_idx += n_conv

        x = img = None
        ximgs = []
        n_levels = len(defs)
        for lvl, (d, cur_ws) in enumerate(zip(defs, block_ws)):
            res = d["resolution"]
            x, img = SynthesisBlock(
                in_channels=d["in_channels"],
                out_channels=d["out_channels"],
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=d["is_last"],
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=d["use_fp16"],
                name=f"b{res}",
            )(x, img, cur_ws, **block_kwargs)

            x, img = self._apply_cond(
                x, img, cond, cm, chonkadd, res, lvl, n_levels
            )

            ximgs.append((x, img))

            if latent_injection is not None:
                if f"da_{lvl}" in latent_injection:
                    x = x + latent_injection[f"da_{lvl}"]
                if f"db_{lvl}" in latent_injection:
                    img = img + latent_injection[f"db_{lvl}"]

        if stop_level is None:
            ret = img
        else:
            ret = ximgs[stop_level][1]
            f = setup_filter([1, 3, 3, 1])
            for i in range(stop_level + 1, n_levels):
                ret = upsample2d(ret, f)
        if return_more:
            return ret, ximgs
        return ret

    def _apply_cond(self, x, img, cond, cm, chonkadd, res, lvl, n_levels):
        """cond_mode image/feature injections (networks_stylegan2.py:550-694)."""
        if self.cond_mode == "none":
            return x, img

        if res == 8 and chonkadd > 0:
            ch = chonkadd
            chonk = cond["resnet_chonk"].astype(x.dtype)
            x = jnp.concatenate([x[:, :ch] + chonk[:, :ch], x[:, ch:]], axis=1)
            return x, img

        if self.cond_mode.startswith("ortho_front."):
            cimg = jnp.flip(cond["image_ortho_front"], axis=-2)
            if "gt_sides" in cm:
                cimg = jnp.concatenate(
                    [
                        cimg,
                        jnp.flip(
                            jnp.swapaxes(cond["image_ortho_left"], -1, -2), (-1, -2)
                        ),
                        jnp.flip(jnp.swapaxes(cond["image_ortho_right"], -1, -2), (-1,)),
                    ],
                    axis=1,
                )
            if "dorthoA" in cm:
                cimg = jnp.concatenate(
                    [
                        cimg,
                        jnp.flip(
                            jnp.swapaxes(cond["image_dorthoA_left"], -1, -2), (-1, -2)
                        ),
                        jnp.flip(
                            jnp.swapaxes(cond["image_dorthoA_right"], -1, -2), (-1,)
                        ),
                    ],
                    axis=1,
                )
            cimg = cimg * 2 - 1
            if "cond_img_norm_4" in cm:
                cimg = 4 * cimg

            if "add_4" in cm:
                toadd = resize_bilinear(cimg, x.shape[-1]).astype(x.dtype)
                reps = int((x.shape[1] / 4) // toadd.shape[1])
                toadd = jnp.tile(toadd, (1, reps, 1, 1))
                ch = toadd.shape[1]
                x = jnp.concatenate([x[:, :-ch], x[:, -ch:] + toadd], axis=1)
            if "concatfront" in cm:
                toadd = resize_bilinear(cimg, x.shape[-1]).astype(x.dtype)
                ch = toadd.shape[1]
                x = jnp.concatenate([x[:, :-ch], toadd], axis=1)
            if "add_shuffle2_4" in cm or "mult_shuffle2_4" in cm:
                if lvl < n_levels - 2:
                    toadd = resize_bilinear(cimg, x.shape[-1])
                else:
                    # pixel-shuffle: fold f x f spatial blocks into channels
                    fct = cimg.shape[-1] // x.shape[-1]
                    B, C, H, W = cimg.shape
                    h, w = H // fct, W // fct
                    toadd = cimg.reshape(B, C, h, fct, w, fct)
                    toadd = toadd.transpose(0, 3, 5, 1, 2, 4).reshape(
                        B, fct * fct * C, h, w
                    )
                toadd = toadd.astype(x.dtype)
                reps = int((x.shape[1] / 4) // toadd.shape[1])
                toadd = jnp.tile(toadd, (1, reps, 1, 1))
                ch = toadd.shape[1]
                tail = (
                    x[:, -ch:] + toadd if "add_shuffle2_4" in cm else x[:, -ch:] * toadd
                )
                x = jnp.concatenate([x[:, :-ch], tail], axis=1)
            if "inj_6b_4" in cm and lvl == n_levels - 1:
                toadd = (jnp.flip(cond["image_ortho_front"], axis=-2) * 2 - 1) * 4
                toadd = resize_bilinear(toadd, img.shape[-1]).astype(img.dtype)
                ch = toadd.shape[1]
                img = jnp.concatenate([img[:, :ch] + toadd, img[:, ch:]], axis=1)

        if "crossavg_4" in cm:
            ch = int(x.shape[1] // 8)
            horz = x[:, 0:ch]
            vert = x[:, ch : 2 * ch]
            x = jnp.concatenate(
                [
                    jnp.broadcast_to(jnp.mean(horz, axis=-1, keepdims=True), horz.shape),
                    jnp.broadcast_to(jnp.mean(vert, axis=-2, keepdims=True), vert.shape),
                    x[:, 2 * ch :],
                ],
                axis=1,
            )
        elif "crossavgt_38" in cm:
            ch = int(x.shape[1] // 8)
            horz = x[:, 0:ch]
            vert = x[:, ch : 2 * ch]
            tran = x[:, 2 * ch : 3 * ch]
            x = jnp.concatenate(
                [
                    jnp.broadcast_to(jnp.mean(horz, axis=-1, keepdims=True), horz.shape),
                    jnp.broadcast_to(jnp.mean(vert, axis=-2, keepdims=True), vert.shape),
                    jnp.swapaxes(tran, -1, -2),
                    x[:, 3 * ch :],
                ],
                axis=1,
            )
        return x, img


class Generator(nn.Module):
    """networks_stylegan2.py:728-754."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    cond_mode: str = "none"
    mapping_kwargs: dict = None  # type: ignore[assignment]
    synthesis_kwargs: dict = None  # type: ignore[assignment]

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            cond_mode=self.cond_mode,
            **(self.synthesis_kwargs or {}),
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws,
            cond_mode=self.cond_mode,
            **(self.mapping_kwargs or {}),
        )

    @property
    def num_ws(self):
        return self.synthesis.num_ws

    def __call__(self, z, c, cond=None, truncation_psi=1.0, truncation_cutoff=None,
                 update_emas=False, **synthesis_kwargs):
        ws = self.mapping(
            z, c, cond, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, update_emas=update_emas,
        )
        return self.synthesis(ws, cond, **synthesis_kwargs)


# ---------------------------------------------------------------------------
# discriminator side


class MinibatchStdLayer(nn.Module):
    """networks_stylegan2.py:847-872."""

    group_size: Optional[int]
    num_channels: int = 1

    def __call__(self, x):
        N, C, H, W = x.shape
        G = min(self.group_size, N) if self.group_size is not None else N
        F = self.num_channels
        c = C // F
        y = x.reshape(G, -1, F, c, H, W)
        y = y - jnp.mean(y, axis=0)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(2, 3, 4))
        y = y.reshape(-1, F, 1, 1)
        y = jnp.tile(y, (G, 1, H, W)).astype(x.dtype)
        return jnp.concatenate([x, y], axis=1)


class DiscriminatorBlock(nn.Module):
    """networks_stylegan2.py:758-843."""

    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    freeze_layers: int = 0
    first_layer_idx: int = 0

    @nn.compact
    def __call__(self, x, img, force_fp32=False):
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = Conv2dLayer(
                self.img_channels, self.tmp_channels, kernel_size=1,
                activation=self.activation, conv_clamp=self.conv_clamp, name="fromrgb",
            )(img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter(list(self.resample_filter)))
                if self.architecture == "skip"
                else None
            )

        if self.architecture == "resnet":
            y = Conv2dLayer(
                self.tmp_channels, self.out_channels, kernel_size=1, use_bias=False,
                down=2, resample_filter=self.resample_filter, name="skip",
            )(x, gain=np.sqrt(0.5))
            x = Conv2dLayer(
                self.tmp_channels, self.tmp_channels, kernel_size=3,
                activation=self.activation, conv_clamp=self.conv_clamp, name="conv0",
            )(x)
            x = Conv2dLayer(
                self.tmp_channels, self.out_channels, kernel_size=3,
                activation=self.activation, down=2,
                resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
                name="conv1",
            )(x, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(
                self.tmp_channels, self.tmp_channels, kernel_size=3,
                activation=self.activation, conv_clamp=self.conv_clamp, name="conv0",
            )(x)
            x = Conv2dLayer(
                self.tmp_channels, self.out_channels, kernel_size=3,
                activation=self.activation, down=2,
                resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
                name="conv1",
            )(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    """networks_stylegan2.py:876-933."""

    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img, cmap, force_fp32=False):
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + Conv2dLayer(
                self.img_channels, self.in_channels, kernel_size=1,
                activation=self.activation, name="fromrgb",
            )(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(
                group_size=self.mbstd_group_size,
                num_channels=self.mbstd_num_channels,
                name="mbstd",
            )(x)
        x = Conv2dLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels,
            kernel_size=3, activation=self.activation, conv_clamp=self.conv_clamp,
            name="conv",
        )(x)
        x = FullyConnectedLayer(
            self.in_channels * self.resolution**2, self.in_channels,
            activation=self.activation, name="fc",
        )(x.reshape(x.shape[0], -1))
        x = FullyConnectedLayer(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim, name="out"
        )(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1 / np.sqrt(self.cmap_dim))
        return x


class Discriminator(nn.Module):
    """networks_stylegan2.py:937-998."""

    c_dim: int
    img_resolution: int
    img_channels: int
    cond_mode: str = "none"
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256
    cmap_dim: Optional[int] = None
    block_kwargs: dict = None  # type: ignore[assignment]
    mapping_kwargs: dict = None  # type: ignore[assignment]
    epilogue_kwargs: dict = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, img, c, cond=None, update_emas=False, force_fp32=False):
        res_log2 = int(np.log2(self.img_resolution))
        block_resolutions = [2**i for i in range(res_log2, 2, -1)]
        channels_dict = {
            res: min(self.channel_base // res, self.channel_max)
            for res in block_resolutions + [4]
        }
        fp16_resolution = max(2 ** (res_log2 + 1 - self.num_fp16_res), 8)
        cmap_dim = self.cmap_dim
        if cmap_dim is None:
            cmap_dim = channels_dict[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        for res in block_resolutions:
            x, img = DiscriminatorBlock(
                in_channels=channels_dict[res] if res < self.img_resolution else 0,
                tmp_channels=channels_dict[res],
                out_channels=channels_dict[res // 2],
                resolution=res,
                img_channels=self.img_channels,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_resolution),
                name=f"b{res}",
                **(self.block_kwargs or {}),
            )(x, img, force_fp32=force_fp32)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(
                z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim, num_ws=None,
                w_avg_beta=None, cond_mode=self.cond_mode, name="mapping",
                **(self.mapping_kwargs or {}),
            )(None, c, cond)
        return DiscriminatorEpilogue(
            in_channels=channels_dict[4],
            cmap_dim=cmap_dim,
            resolution=4,
            img_channels=self.img_channels,
            architecture=self.architecture,
            conv_clamp=self.conv_clamp,
            name="b4",
            **(self.epilogue_kwargs or {}),
        )(x, img, cmap, force_fp32=force_fp32)
