"""TriPlaneGenerator: StyleGAN2 backbone -> triplanes -> volume render -> SR.

Role of `src/training/triplane.py` (TriPlaneGenerator, OSGDecoder, and the
paste-front compositing utilities, triplane.py:30-691). The kwargs-dict
inference protocol ``G.f(x)`` (triplane.py:313-508) is preserved as the
public model API.

TPU-first deviations:
- ``force_sigmoid`` is a constructor attribute, not mutable state
  (set_force_sigmoid), so the module stays a pure function of its params.
- Orthographic cameras (negative fov) are handled by computing both pinhole
  and ortho rays and selecting per-sample with ``jnp.where`` — no
  data-dependent python branch, so a mixed batch of perspective + ortho
  views renders in one jitted call (the reference loops per-sample,
  triplane.py:400-412).
- Per-seed latents (np.random.RandomState) are host-side; inside jit pass
  ``z``/``zs``/``ws`` arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..cameras.conventions import camera_label, get_rays_ortho
from ..cameras.rays import sample_rays
from ..ops.grid_sample import (
    grid_sample_2d,
    grid_sample_2d_points_packed_border,
    pack_bilinear_2d,
)
from ..utils.imageops import erosion, resize_nearest, sobel_magnitude
from .stylegan2 import FullyConnectedLayer, Generator, resize_bilinear
from .superresolution import SR_MODULES
from .volumetric import lattice as vlat
from .volumetric import renderer as vr


def seeds_to_z(seeds, z_dim: int) -> np.ndarray:
    """Per-seed z vectors via np.random.RandomState (triplane.py:352-355)."""
    return np.stack(
        [np.random.RandomState(s).randn(z_dim) for s in seeds]
    ).astype(np.float32)


class OSGDecoder(nn.Module):
    """Tiny per-sample MLP decoder (triplane.py:516-548).

    mean over planes -> FC(C->64) -> softplus -> FC(64->1+32);
    sigma = ch 0, rgb = sigmoid clamp of the rest.
    """

    n_features: int
    decoder_lr_mul: float = 1.0
    decoder_output_dim: int = 32
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, sampled_features, force_sigmoid: bool = False,
                 sigma_only: bool = False, packed_corners: bool = False):
        """sigma_only=True restricts net2 to its sigma row (channel 0) —
        identical sigma, rgb returned as None. Density-only consumers (ESS
        occupancy, the paste occlusion volume) decode millions of lattice
        points; materializing their 32 dropped rgb channels measured
        2x~9 ms/call of pure layout copies (xprof r5).

        packed_corners=True: ``sampled_features`` is the corner-weighted
        sample-major row block [N, M, n_planes*4*C] of
        renderer.sample_from_planes_packed_scaled (weights include the
        1/n_planes plane mean), and bilinear lerp + plane mean + net0
        collapse into ONE dot against the (4*n_planes)-tiled kernel — the
        decoder is linear up to net0's input, so this is the same affine
        map with the summation order moved into the MXU's f32 accumulator
        (bf16-level reassociation only)."""
        # decode math is at least fp32 FROM THE HIDDEN LAYER ON (f64 flows
        # through for x64 discrimination runs). bf16 features (the
        # production render gather dtype) stay bf16 through the plane mean
        # into net0 — the features were already bf16-quantized by the
        # gather, so upcasting first only doubled the [M,C] feature-block
        # writes (measured 4x~4.4 ms/call of lerp+convert loop fusions,
        # xprof r5) and forced an f32 matmul; the MXU's native
        # bf16-in/f32-out mode (accum_f32) keeps the hidden layer exact to
        # f32 accumulation.
        x = sampled_features
        bf16_in = x.dtype == jnp.bfloat16
        if packed_corners:
            N, M, Cx = x.shape
            tile = Cx // self.n_features
            x = FullyConnectedLayer(
                self.n_features, self.hidden_dim,
                lr_multiplier=self.decoder_lr_mul, name="net0",
            )(x.reshape(N * M, Cx), accum_f32=bf16_in, kernel_tile=tile)
            C = self.n_features
        else:
            if bf16_in:
                # f32-accumulated mean, result back to bf16: the converts
                # fuse into the surrounding elementwise fusion; only the
                # bf16 block is written
                x = jnp.mean(x.astype(jnp.float32), axis=1).astype(jnp.bfloat16)
            else:
                x = jnp.mean(vr._at_least_f32(x), axis=1)         # [N, M, C]
            N, M, C = x.shape
            x = x.reshape(N * M, C)
            x = FullyConnectedLayer(
                C, self.hidden_dim, lr_multiplier=self.decoder_lr_mul,
                name="net0",
            )(x, accum_f32=bf16_in)
        x = jax.nn.softplus(x)
        net2 = FullyConnectedLayer(
            self.hidden_dim,
            1 + self.decoder_output_dim,
            lr_multiplier=self.decoder_lr_mul,
            name="net2",
        )
        if sigma_only:
            sigma = net2(x, out_slice=slice(0, 1)).reshape(N, M, 1)
            return None, sigma
        x = net2(x)
        x = x.reshape(N, M, -1)
        if force_sigmoid:
            rgb = jax.nn.sigmoid(x[..., 1:])
        else:
            # MipNeRF sigmoid clamp
            rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sigma = x[..., 0:1]
        return rgb, sigma


DEFAULT_RENDERING_KWARGS = dict(
    image_resolution=512,
    disparity_space_sampling=False,
    clamp_mode="softplus",
    superresolution_module="training.superresolution.SuperresolutionHybrid8XDC",
    c_gen_conditioning_zero=True,
    c_scale=1.0,
    superresolution_noise_mode="none",
    density_reg=0.25,
    density_reg_p_dist=0.004,
    reg_type="l1",
    decoder_lr_mul=1.0,
    sr_antialias=True,
    white_back=True,
    triplane_depth=1,
    use_triplane=True,
    tanh_rgb_output=False,
    box_warp=0.7,
    ray_start=0.5,
    ray_end=1.5,
    depth_resolution=48,
    depth_resolution_importance=48,
    avg_camera_radius=1.0,
    avg_camera_pivot=(0, 0, 0),
)


class TriPlaneGenerator(nn.Module):
    """triplane.py:30-511. Construct-time config mirrors the reference."""

    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    sr_num_fp16_res: int = 0
    mapping_kwargs: Any = None
    rendering_kwargs: Any = None
    sr_kwargs: Any = None
    cond_mode: str = "none"
    triplane_width: int = 32
    sr_channels_hidden: int = 256
    backbone_resolution: int = 256
    synthesis_kwargs: Any = None
    neural_rendering_resolution: int = 64
    force_sigmoid: bool = False

    @property
    def rk(self) -> dict:
        d = dict(DEFAULT_RENDERING_KWARGS)
        d.update(self.rendering_kwargs or {})
        return d

    @property
    def triplane_depth(self) -> int:
        return self.rk.get("triplane_depth", 1)

    def setup(self):
        self.backbone = Generator(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            img_resolution=self.backbone_resolution,
            img_channels=self.triplane_width * 3 * self.triplane_depth,
            cond_mode=self.cond_mode,
            mapping_kwargs=self.mapping_kwargs or {},
            synthesis_kwargs=self.synthesis_kwargs or {},
        )
        sr_cls = SR_MODULES[self.rk["superresolution_module"]]
        self.superresolution = sr_cls(
            w_dim=self.w_dim,
            channels=32,
            channels_hidden=self.sr_channels_hidden,
            img_resolution=self.img_resolution,
            sr_num_fp16_res=self.sr_num_fp16_res,
            sr_antialias=self.rk["sr_antialias"],
            **(self.sr_kwargs or {}),
        )
        self.decoder = OSGDecoder(
            self.triplane_width,
            decoder_lr_mul=self.rk.get("decoder_lr_mul", 1),
            decoder_output_dim=32,
        )

    @property
    def num_ws(self):
        # backbone synthesis num_ws (sum of convs + final torgb)
        n = 0
        res = 4
        while res <= self.backbone_resolution:
            n += 1 if res == 4 else 2
            res *= 2
        return n + 1

    # -- mapping ----------------------------------------------------------

    def mapping(self, z, c, cond=None, truncation_psi=1.0, truncation_cutoff=None,
                update_emas=False):
        """triplane.py:88-122 (incl. c zeroing and c_scale)."""
        rk = self.rk
        if rk["c_gen_conditioning_zero"]:
            c = jnp.zeros_like(c)
        c = c * rk.get("c_scale", 0)
        return self.backbone.mapping(
            z, c, cond, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, update_emas=update_emas,
        )

    def mapping_zplus(self, zs, c, cond=None, truncation_psi=1.0,
                      truncation_cutoff=None, update_emas=False):
        """Per-slot z+ mapping (triplane.py:123-143): z_i fills w slot i."""
        bs, n, dim = zs.shape
        zs_new = zs.reshape(bs * n, dim)
        c_new = jnp.repeat(c[:, None, :], n, axis=1).reshape(bs * n, -1)
        if cond is not None and "resnet_feats" in cond:
            cond_new = dict(cond)
            cond_new["resnet_feats"] = jnp.repeat(
                cond["resnet_feats"][:, None, :], n, axis=1
            ).reshape(bs * n, -1)
        else:
            cond_new = cond
        ans = self.mapping(
            zs_new, c_new, cond_new, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, update_emas=update_emas,
        )  # [bs*n, num_ws(=n), dim]
        ans = ans.reshape(bs, n, n, dim)
        diag = jnp.arange(n)
        return ans[:, diag, diag, :]

    # -- synthesis --------------------------------------------------------

    def _planes_from_ws(self, ws, cond, update_emas=False, latent_injection=None,
                        stop_level=None, **synthesis_kwargs):
        planes = self.backbone.synthesis(
            ws, cond, update_emas=update_emas, latent_injection=latent_injection,
            stop_level=stop_level, **synthesis_kwargs,
        )
        return planes.reshape(
            planes.shape[0],
            3,
            self.triplane_width * self.triplane_depth,
            planes.shape[-2],
            planes.shape[-1],
        )

    def _decode_sigma_fn(self):
        """Sigma-only decode closure for density-only consumers (ESS
        occupancy, paste occlusion volume): identical sigma via net2's
        channel-0 row, no rgb materialization (OSGDecoder.sigma_only).
        All occupancy call paths use THIS flavor, so the same planes yield
        the same occupancy everywhere."""
        return lambda feats: self.decoder(
            feats, force_sigmoid=self.force_sigmoid, sigma_only=True
        )

    def synthesis(
        self,
        ws,
        c,
        cond=None,
        neural_rendering_resolution: Optional[int] = None,
        update_emas=False,
        latent_injection=None,
        stop_level=None,
        force_rays=None,
        triplane_crop=None,
        cull_clouds=None,
        binarize_clouds=None,
        normalize_images=True,
        render_key=None,
        ray_sharding=None,
        planes=None,
        skip_superresolution=False,
        ess_occ=None,
        rays_z_aligned=False,
        **synthesis_kwargs,
    ):
        """triplane.py:145-252. Returns the output dict.

        ray_sharding: optional jax.sharding.NamedSharding (spec over
        [batch, rays]) — partitions the volume render's ray axis across the
        mesh (parallel/mesh.py 'rays' axis; SURVEY.md §5).
        """
        rk = self.rk
        if ray_sharding is not None:
            rk = dict(rk, ray_sharding=ray_sharding)
        if rays_z_aligned:
            rk = dict(rk, rays_z_aligned=True)
        res = neural_rendering_resolution or self.neural_rendering_resolution
        N = ws.shape[0]

        if force_rays is None:
            cam2world = c[:, :16].reshape(-1, 4, 4)
            intrinsics = c[:, 16:25].reshape(-1, 3, 3)
            ray_origins, ray_directions = sample_rays(cam2world, intrinsics, res)
        else:
            ro = force_rays["ray_origins"]
            rd = force_rays["ray_directions"]
            if ro.ndim == 4:  # [N,3,r,r] -> [N,M,3]
                ro = ro.reshape(N, 3, -1).transpose(0, 2, 1)
                rd = rd.reshape(N, 3, -1).transpose(0, 2, 1)
            ray_origins, ray_directions = ro, rd

        if planes is None:
            planes = self._planes_from_ws(
                ws, cond, update_emas=update_emas,
                latent_injection=latent_injection,
                stop_level=stop_level, **synthesis_kwargs,
            )

        decode_fn = lambda feats, **kw: self.decoder(
            feats, force_sigmoid=self.force_sigmoid, **kw
        )
        # OSGDecoder is linear up to net0's input, so the renderer CAN fuse
        # lerp + plane mean + net0 into one MXU dot on the bf16 packed path
        # (rendering_kwargs['decoder_packed_corners']=True; render() gates
        # on packed bf16 planes, fp32 parity runs unaffected). Measured
        # SLOWER on-chip (r5 A/B, BENCH_PACKED_CORNERS: paste-on 21.8 vs
        # 24.2 views/s) — the (4*n_planes)-tiled kernel does 12x net0's
        # MXU work, which outweighs the saved [M,C] layout copies — so the
        # default stays the standard gather->lerp->mean->dot order.
        if rk.get("ess"):
            # empty-space-skipping occupancy depends only on the planes:
            # compute once and share across every render of these planes
            # (paste-front's auxiliary views, turntable loops)
            if ess_occ is None:
                ess_occ = vr.ess_occupancy(
                    vr.generate_plane_axes(rk.get("use_triplane", False)),
                    planes, self._decode_sigma_fn(), rk["box_warp"],
                    # OSGDecoder means over planes -> the fused pre-mean
                    # lattice path is exact (lattice.decode_lattice)
                    dict(rk, decoder_mean_linear=True),
                    triplane_crop, cull_clouds, binarize_clouds, N,
                )
            rk = dict(rk, _ess_occ=ess_occ)
        out = vr.render(
            planes, decode_fn, ray_origins, ray_directions, rk,
            key=render_key,
            triplane_crop=triplane_crop,
            cull_clouds=cull_clouds,
            binarize_clouds=binarize_clouds,
        )

        H = W = res
        feature_image = out.rgb.transpose(0, 2, 1).reshape(N, -1, H, W)
        xyz_image = out.xyz.transpose(0, 2, 1).reshape(N, 3, H, W)
        depth_image = out.depth.transpose(0, 2, 1).reshape(N, 1, H, W)
        weights_image = out.weights.transpose(0, 2, 1).reshape(N, 1, H, W)
        xyz_image = (
            0.5 * (xyz_image + 1)
            * jnp.asarray([-1.0, 1.0, -1.0])[None, :, None, None]
        )

        rgb_image = feature_image[:, :3]
        if skip_superresolution:
            # paste-front's auxiliary renders only consume image_weights;
            # SR is channel-independent of them, so skipping it is
            # output-identical for those consumers
            sr_image = None
        else:
            sr_image = self.superresolution(
                rgb_image, feature_image, ws,
                noise_mode=rk["superresolution_noise_mode"],
                **{k: v for k, v in synthesis_kwargs.items() if k != "noise_mode"},
            )

        ans = {
            "image": sr_image,
            "image_raw": rgb_image,
            "image_depth": depth_image,
            "triplane": planes,
            "image_weights": weights_image,
            "image_xyz": xyz_image,
        }
        if ess_occ is not None:
            ans["_ess_occ"] = ess_occ
        if rk.get("tanh_rgb_output", False):
            if ans["image"] is not None:
                ans["image"] = jnp.tanh(ans["image"])
            ans["image_raw"] = jnp.tanh(ans["image_raw"])
        if not normalize_images:
            if ans["image"] is not None:
                ans["image"] = 0.5 * ans["image"] + 0.5
            ans["image_raw"] = 0.5 * ans["image_raw"] + 0.5
        return ans

    def ess_occupancy_for_planes(self, planes, triplane_crop=None,
                                 cull_clouds=None, binarize_clouds=None):
        """Precompute the empty-space-skipping occupancy for given planes.

        TPU-native addition: occupancy depends only on (planes, density
        filters), so callers rendering many views of one portrait (the
        eval.generate spin loop, turntables) compute it ONCE here and pass
        it as ``x['_ess_occ']`` to every view render — output-identical to
        the per-call occupancy, it is the same function of the same
        inputs. Returns (occ [N,G,G,G], occ_outside scalar)."""
        rk = self.rk
        return vr.ess_occupancy(
            vr.generate_plane_axes(rk.get("use_triplane", False)),
            planes, self._decode_sigma_fn(), rk["box_warp"],
            dict(rk, decoder_mean_linear=True),
            triplane_crop, cull_clouds, binarize_clouds, planes.shape[0],
        )

    # -- shape sampling ----------------------------------------------------

    def sample_mixed(self, coordinates, directions, ws, cond=None,
                     update_emas=False, **synthesis_kwargs):
        """Decode (rgb, sigma) at arbitrary coords from ws (triplane.py:273-298)."""
        planes = self._planes_from_ws(ws, cond, update_emas=update_emas,
                                      **synthesis_kwargs)
        plane_axes = vr.generate_plane_axes(self.rk.get("use_triplane", False))
        decode_fn = lambda feats: self.decoder(feats, force_sigmoid=self.force_sigmoid)
        rgb, sigma = vr.run_model(
            plane_axes, planes, decode_fn, coordinates,
            self.rk["box_warp"], self.triplane_depth,
        )
        return {"rgb": rgb, "sigma": sigma, "xyz": coordinates}

    def sample_mixed_planes(self, planes, coordinates):
        """Decode from precomputed planes: the volume-extraction fast path.

        TPU-native addition: eval volume decoding (256³ grid) synthesizes
        planes once and streams coordinate chunks through this method
        (vs. the reference re-running backbone synthesis per chunk when not
        cached, eg3d_metrics3d.py:124-151).
        """
        plane_axes = vr.generate_plane_axes(self.rk.get("use_triplane", False))
        decode_fn = lambda feats: self.decoder(feats, force_sigmoid=self.force_sigmoid)
        rgb, sigma = vr.run_model(
            plane_axes, planes, decode_fn, coordinates,
            self.rk["box_warp"], self.triplane_depth,
        )
        return {"rgb": rgb, "sigma": sigma, "xyz": coordinates}

    # -- the G.f kwargs-dict protocol ---------------------------------------

    def __call__(self, x, **kwargs):
        return self.f(x, **kwargs)

    def f(
        self,
        x: Dict[str, Any],
        truncation_psi=1.0,
        truncation_cutoff=None,
        latent_injection=None,
        force_rays=None,
        stop_level=None,
        normalize_images=False,
        **synthesis_kwargs,
    ):
        """Universal inference entry (triplane.py:313-508).

        Accepts any of ws|zs|z (+ seeds host-side via seeds_to_z),
        camera_params | (elevations, azimuths[, distances, fovs]), cond dict,
        triplane_crop/cull_clouds/binarize_clouds/paste_params, force_rays.
        Returns dict: image, image_raw, image_depth, image_weights,
        image_xyz, triplane (+ image_prepaste/paste when pasting).
        """
        x = dict(x)
        rk = self.rk
        # ray-axis mesh sharding: accepted as a method kwarg (static) or an
        # x entry (only safe when x does not cross a jit boundary — a
        # NamedSharding is not a pytree-of-arrays leaf)
        ray_sharding = synthesis_kwargs.pop("ray_sharding", None)
        if ray_sharding is None:
            ray_sharding = x.pop("ray_sharding", None)

        if "latent_injection" in x:
            li = dict(latent_injection or {})
            li.update(x["latent_injection"])
            latent_injection = li

        # latents
        single_z = False
        if "zs" not in x and "ws" not in x:
            if "z" not in x:
                x["z"] = jnp.asarray(seeds_to_z(x["seeds"], self.z_dim))
            # all z+ slots share one z: plain mapping (broadcast) is
            # mathematically identical to mapping_zplus and num_ws x cheaper
            single_z = True
            x["zs"] = jnp.broadcast_to(
                x["z"][:, None, :], (x["z"].shape[0], self.num_ws, self.z_dim)
            )

        # cameras
        if "camera_params" not in x:
            if "distances" not in x:
                x["distances"] = jnp.ones_like(x["elevations"])
            if "fovs" not in x:
                x["fovs"] = 30 * jnp.ones_like(x["elevations"])
            x["camera_params"] = camera_label(
                x["elevations"], x["azimuths"], x["distances"], x["fovs"]
            )

        neural_rendering_resolution = x.get(
            "neural_rendering_resolution", self.neural_rendering_resolution
        )
        res = neural_rendering_resolution

        # rays (force by default so ortho substitution is uniform)
        force_rays = x.get("force_rays") or force_rays
        if force_rays is None:
            cam2world = x["camera_params"][:, :16].reshape(-1, 4, 4)
            intrinsics = x["camera_params"][:, 16:25].reshape(-1, 3, 3)
            ro, rd = sample_rays(cam2world, intrinsics, res)  # [N,M,3]
            N = ro.shape[0]
            ro = ro.transpose(0, 2, 1).reshape(N, 3, res, res)
            rd = rd.transpose(0, 2, 1).reshape(N, 3, res, res)
            if "elevations" in x:
                # negative-fov cameras are orthographic: compute both, select
                oro, ord_ = get_rays_ortho(
                    x["elevations"], x["azimuths"],
                    x.get("distances", jnp.ones_like(x["elevations"])),
                    rk["box_warp"], res,
                )
                is_ortho = (intrinsics[:, 0, 0] < 0)[:, None, None, None]
                ro = jnp.where(is_ortho, oro, ro)
                rd = jnp.where(is_ortho, ord_, rd)
            force_rays = {"ray_origins": ro, "ray_directions": rd}
            x["force_rays"] = force_rays

        x["conditioning_params"] = x["camera_params"]

        cond = x.get("cond")
        if "ws" not in x:
            if single_z:
                x["ws"] = self.mapping(
                    x["z"], x["conditioning_params"], cond,
                    truncation_psi=truncation_psi,
                    truncation_cutoff=truncation_cutoff,
                )
            else:
                x["ws"] = self.mapping_zplus(
                    x["zs"], x["conditioning_params"], cond,
                    truncation_psi=truncation_psi,
                    truncation_cutoff=truncation_cutoff,
                )

        _ws = x["ws"]
        if latent_injection is not None:
            if "dw" in latent_injection:
                _ws = _ws + latent_injection["dw"]
            if "dws" in latent_injection:
                _ws = _ws + latent_injection["dws"]

        normalize_images = x.get("normalize_images", normalize_images)
        synth = self.synthesis(
            _ws,
            x["camera_params"],
            cond,
            latent_injection=latent_injection,
            triplane_crop=x.get("triplane_crop"),
            cull_clouds=x.get("cull_clouds"),
            binarize_clouds=x.get("binarize_clouds"),
            ray_sharding=ray_sharding,
            force_rays=force_rays,
            stop_level=stop_level,
            normalize_images=normalize_images,
            neural_rendering_resolution=res,
            update_emas=x.get("update_emas", False),
            planes=x.get("_planes"),
            skip_superresolution=x.get("_skip_sr", False),
            ess_occ=x.get("_ess_occ"),
            rays_z_aligned=x.get("_rays_z_aligned", False),
            **synthesis_kwargs,
        )
        ret = {
            "image": synth["image"],
            "image_raw": synth["image_raw"],
            "image_depth": synth["image_depth"],
            "image_weights": synth["image_weights"],
            "triplane": synth["triplane"],
            "image_xyz": synth["image_xyz"],
            "normalize_images": normalize_images,
        }
        if "_ess_occ" in synth:
            # share the occupancy with paste-front's auxiliary renders (and
            # callers looping views over the same planes, like "triplane")
            ret["_ess_occ"] = synth["_ess_occ"]
        x.update(ret)

        if x.get("paste_params"):
            ret["image_prepaste"] = ret["image"]
            paste = self.paste_front(
                x, ret, _synthesis_kwargs=synthesis_kwargs, **x["paste_params"]
            )
            ret["paste"] = paste
            ret["image"] = paste["image"]
        return ret

    # -- paste-front compositing (triplane.py:553-691) ----------------------

    def _sample_orthofront(self, front_rgb, view_xyz, bw):
        # corner-packed border sampling: ONE row gather per output pixel
        # instead of four (the 512^2 projection is row-rate-bound like the
        # renderer's gathers); bit-equal to the unpacked border path
        vij = 1 - (view_xyz[:, [1, 0]] + bw / 2) / bw
        img = front_rgb.transpose(0, 1, 3, 2)
        N, C = img.shape[:2]
        Hg, Wg = vij.shape[-2:]
        packed = pack_bilinear_2d(img)
        out = grid_sample_2d_points_packed_border(
            packed, (vij.transpose(0, 2, 3, 1) * 2 - 1).reshape(N, -1, 2)
        )
        return out.transpose(0, 2, 1).reshape(N, C, Hg, Wg)

    def front_occlusion_volume(self, planes, triplane_crop=None,
                               cull_clouds=None, binarize_clouds=None):
        """Precompute the paste-front occlusion volume for given planes.

        TPU-native addition: the occlusion integral along +z depends only on
        (planes, density filters), so callers rendering many views of one
        portrait (eval.generate's spin loops) compute it ONCE here and pass
        it as ``x['_occ_vol']`` to every view (lattice.py design note)."""
        rk = self.rk
        return vlat.front_occlusion_volume(
            planes, self._decode_sigma_fn(), rk["box_warp"], rk,
            triplane_crop=triplane_crop, cull_clouds=cull_clouds,
            binarize_clouds=binarize_clouds,
            grid=tuple(rk.get("occ_grid", (128, 128, 256))),
            plane_reduce="mean",  # OSGDecoder means over planes
        )

    def _get_front_occlusion_grid(self, x, out, offset=0.01):
        """Grid-interpolated front occlusion (lattice.front_occlusion_volume).

        Same quantity `_get_front_occlusion`'s re-render computes in
        image_weights — total +z opacity past each surface point — from one
        per-portrait suffix-integral volume instead of a per-view
        hierarchical render (reference triplane.py:565-577). Mask agreement
        vs the render path: analytic scene + full-G.f
        (tests/test_lattice.py), flagship shape (PASTE_OCC_PARITY.json,
        scripts/paste_occ_parity.py)."""
        rk = self.rk
        vol = x.get("_occ_vol")
        if vol is None:
            vol = self.front_occlusion_volume(
                x["triplane"],
                triplane_crop=x.get("triplane_crop"),
                cull_clouds=x.get("cull_clouds"),
                binarize_clouds=x.get("binarize_clouds"),
            )
        p = (
            out["image_xyz"]
            * jnp.asarray([-1.0, 1.0, -1.0])[None, :, None, None]
        )                                               # plane-space xyz
        N, _, H, W = p.shape
        pts = p.reshape(N, 3, -1).transpose(0, 2, 1)    # [N,M,3]
        seg_len = float(rk["ray_end"]) - float(rk["ray_start"])
        occ = vlat.sample_front_occlusion(vol, pts, offset, seg_len)
        return occ.transpose(0, 2, 1).reshape(N, 1, H, W)

    def _get_front_occlusion(self, x, out, offset=0.01, synthesis_kwargs=None):
        ro = out["image_xyz"] * jnp.asarray([-1.0, 1.0, -1.0])[None, :, None, None]
        ro = ro.at[:, 2].add(-(self.rk["ray_start"] - offset))
        rd = jnp.zeros_like(ro).at[:, 2].set(1.0)
        xin = {k: v for k, v in x.items() if k not in ("paste_params", "force_rays")}
        xin["paste_params"] = None
        xin["force_rays"] = {"ray_origins": ro, "ray_directions": rd}
        # reuse the outer call's planes (ws is already in x): the reference's
        # recursive G.f re-runs synthesis against the SAME stateful noise
        # buffers, so plane reuse is output-identical and skips the backbone;
        # SR never feeds image_weights, so it is skipped too
        if "triplane" in x:
            xin["_planes"] = x["triplane"]
        xin["_skip_sr"] = True
        # rays constructed above are exactly +z: the (x,y)-plane gather
        # collapses to one row per ray (run_model_z_aligned, bit-equal)
        xin["_rays_z_aligned"] = True
        return self.f(xin, **(synthesis_kwargs or {}))["image_weights"]

    def _get_front_weights(self, x, synthesis_kwargs=None):
        bs = x["cond"]["image_ortho_front"].shape[0]
        xin = {
            k: v
            for k, v in x.items()
            if k not in ("paste_params", "camera_params", "conditioning_params",
                         "force_rays")
        }
        xin["elevations"] = jnp.zeros(bs)
        xin["azimuths"] = jnp.zeros(bs)
        xin["fovs"] = -jnp.ones(bs)
        xin.pop("camera_params", None)
        if "triplane" in x:
            xin["_planes"] = x["triplane"]
        xin["_skip_sr"] = True
        return self.f(xin, **(synthesis_kwargs or {}))["image_weights"]

    @staticmethod
    def _get_xyz_discrepancy(xyz, rays):
        a = rays["ray_origins"]
        n = rays["ray_directions"]
        p = xyz * jnp.asarray([-1.0, 1.0, -1.0])[None, :, None, None]
        perp = (p - a) - jnp.sum((p - a) * n, axis=1, keepdims=True) * n
        return jnp.linalg.norm(perp, axis=1, keepdims=True)

    def paste_front(
        self,
        x,
        out,
        mode="default",
        thresh_weight=0.95,
        thresh_edges=0.02,
        thresh_occ=0.05,
        offset_occ=0.01,
        thresh_dxyz=0.01,
        front_weight_erosion=0,
        force_image=None,
        occ_impl="grid",
        _synthesis_kwargs=None,
        **kwargs,
    ):
        """Project the conditioning front view onto the render (triplane.py:607-691)."""
        bw = self.rk["box_warp"]
        view_xyz = out["image_xyz"]
        front_rgb = x["cond"]["image_ortho_front"]
        # operate at output resolution (== cond resolution in the reference;
        # resize the conditioning image when a small config differs)
        size = out["image"].shape[-1]
        if front_rgb.shape[-1] != size:
            front_rgb = resize_bilinear(front_rgb, size)

        sg = jax.lax.stop_gradient
        wmask = (resize_bilinear(sg(out["image_weights"]), size) > thresh_weight)
        wmask = wmask.astype(jnp.float32)

        smask = sobel_magnitude(resize_bilinear(sg(out["image_xyz"]), size))
        smask = (smask < thresh_edges).astype(jnp.float32)

        # occ_impl='grid' (default): per-portrait suffix-integral volume
        # (lattice.py) instead of the reference's per-view occlusion
        # re-render; 'render' keeps the re-render path. The grid path needs
        # numeric ray_start/end (paste is only used with the fixed-interval
        # flagship config; 'auto' falls back).
        numeric_interval = isinstance(self.rk["ray_start"], (int, float))
        if occ_impl == "grid" and numeric_interval:
            occ = sg(self._get_front_occlusion_grid(x, out, offset=offset_occ))
        else:
            occ = sg(self._get_front_occlusion(
                x, out, offset=offset_occ, synthesis_kwargs=_synthesis_kwargs,
            ))
        fmask = (occ < thresh_occ).astype(jnp.float32)
        fmask = resize_bilinear(fmask, size)

        dmask = self._get_xyz_discrepancy(sg(out["image_xyz"]), x["force_rays"])
        dmask = resize_nearest(dmask, size)
        dmask = (dmask < thresh_dxyz).astype(jnp.float32)

        if front_weight_erosion >= 1:
            frontw = sg(self._get_front_weights(x, synthesis_kwargs=_synthesis_kwargs))
            fwmask = erosion(
                (frontw > 0.5).astype(jnp.float32), front_weight_erosion
            )
            fwmask = self._sample_orthofront(
                fwmask, resize_bilinear(view_xyz, size), bw
            )
            fwmask = resize_nearest(fwmask, size)
        else:
            frontw = None
            fwmask = jnp.ones_like(dmask)

        mask = wmask * smask * fmask * dmask * fwmask

        if force_image is None:
            tocopy = front_rgb if not x["normalize_images"] else front_rgb * 2 - 1
        else:
            tocopy = force_image
        paste = self._sample_orthofront(
            tocopy, resize_bilinear(view_xyz, size), bw
        )
        ans = out["image"] + (paste - out["image"]) * mask
        return {
            "image": ans,
            "paste": paste,
            "mask": mask,
            "mask_weights": wmask,
            "mask_edges": smask,
            "mask_occ": fmask,
            "mask_dxyz": dmask,
            "mask_frontweight": fwmask,
            "frontweight": frontw,
        }
