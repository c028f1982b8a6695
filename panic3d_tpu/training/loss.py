"""PAniC-3D GAN loss phases, functional.

Role of `src/training/loss_orthocondA.py` (StyleGAN2LossOrthoCondA): the
adversarial dual-discrimination softplus GAN loss with R1, the ortho-view
reconstruction phases (front/left/right/back/rand: LPIPS + L1 +
boundary-masked alpha L2 + depth L2), the ortho-visibility loss mask, and
the EG3D density regularizers.

TPU-first design: every phase is a pure function (params, batch, rng) ->
(scalar loss, stats dict), differentiated with jax.grad and executed inside
one sharded jit step (training/loop.py). The reference's .backward()
accumulation per phase becomes one grad per phase; R1's double backward is
plain grad-of-grad (no conv2d_gradfix needed).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dual_discriminator import filtered_resizing
from ..models.stylegan2 import resize_bilinear
from ..ops.grid_sample import grid_sample_2d
from ..ops.upfirdn2d import filter2d
from ..utils.imageops import dilation, erosion, resize_nearest


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Mirrors the trainer CLI lambdas (train_eclustrousC.py:152-181)."""

    r1_gamma: float = 10.0
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 200.0
    gpc_reg_prob: Optional[float] = None
    gpc_reg_fade_kimg: float = 1000.0
    neural_rendering_resolution_initial: int = 64
    neural_rendering_resolution_final: Optional[int] = None
    neural_rendering_resolution_fade_kimg: float = 0.0
    dual_discrimination: bool = True
    filter_mode: Any = "antialiased"
    style_mixing_prob: float = 0.0

    lambda_gcond_lpips: float = 10.0
    lambda_gcond_l1: float = 1.0
    lambda_gcond_alpha_l2: float = 0.0
    lambda_gcond_depth_l2: float = 0.0
    lambda_gcond_sides_lpips: float = 0.0
    lambda_gcond_sides_l1: float = 0.0
    lambda_gcond_sides_alpha_l2: float = 0.0
    lambda_gcond_sides_depth_l2: float = 0.0
    lambda_gcond_back_lpips: float = 0.0
    lambda_gcond_back_l1: float = 0.0
    lambda_gcond_back_alpha_l2: float = 0.0
    lambda_gcond_back_depth_l2: float = 0.0
    lambda_gcond_rand_lpips: float = 0.0
    lambda_gcond_rand_l1: float = 0.0
    lambda_gcond_rand_alpha_l2: float = 0.0
    lambda_gcond_rand_depth_l2: float = 0.0

    lossmask_mode_adv: str = "none"
    lossmask_mode_recon: str = "none"
    lambda_recon_lpips: float = 0.0
    lambda_recon_l1: float = 0.0
    lambda_recon_alpha_l2: float = 0.0
    lambda_recon_depth_l2: float = 0.0

    paste_params_mode: Optional[str] = None

    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004
    reg_type: str = "l1"
    box_warp: float = 0.7

    # Path-length regularization. The reference loss keeps these as options
    # (loss.py:44-48, loss_orthocondA.py:88-92) but its EG3D adaptation
    # deleted the Gpl phase itself; semantics here are the upstream
    # StyleGAN2 Gpl those hyperparameters descend from.
    pl_weight: float = 0.0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01

    @property
    def paste_params(self):
        default_pp = dict(
            mode="default", thresh_weight=0.95, thresh_edges=0.02,
            thresh_occ=0.05, offset_occ=0.01, thresh_dxyz=0.000005,
        )
        if self.paste_params_mode in ("A", "Agrad"):
            return default_pp
        return None

    def blur_sigma(self, cur_nimg):
        """Traced-safe progressive blur schedule (loss:208). ``cur_nimg`` may
        be a traced scalar; returns 0.0 (python) when blur is disabled so the
        blur kernel shape stays static."""
        if self.blur_fade_kimg <= 0 or self.blur_init_sigma == 0:
            return 0.0
        return (
            jnp.maximum(1 - cur_nimg / (self.blur_fade_kimg * 1e3), 0)
            * self.blur_init_sigma
        )

    def swapping_prob(self, cur_nimg):
        if self.gpc_reg_prob is None:
            return None
        if self.gpc_reg_fade_kimg > 0:
            a = jnp.minimum(cur_nimg / (self.gpc_reg_fade_kimg * 1e3), 1.0)
        else:
            a = 1.0
        return (1 - a) * 1 + a * self.gpc_reg_prob

    def neural_rendering_resolution(self, cur_nimg):
        """STATIC (shape-determining): cur_nimg must be a host int when a
        resolution ramp is configured (the training loop passes the host
        step counter for this; reference ramp at loss:214-218)."""
        if self.neural_rendering_resolution_final is None:
            return self.neural_rendering_resolution_initial
        # fade=0 + final set degenerates to the final resolution immediately
        # (the reference would divide by zero there)
        a = min(int(cur_nimg) / max(
            self.neural_rendering_resolution_fade_kimg * 1e3, 1e-8), 1)
        return int(np.rint(
            self.neural_rendering_resolution_initial * (1 - a)
            + self.neural_rendering_resolution_final * a
        ))


def active_recon_views(c: "LossConfig") -> tuple:
    """Ortho recon views with any active lambda (training_loop_v0.py:221-266
    lambda gating). Single source of truth for which recon phases exist —
    the trainer's phase list and the fused recon phase both derive from it."""
    views = []
    if c.lambda_gcond_lpips + c.lambda_gcond_l1 + c.lambda_gcond_alpha_l2 + c.lambda_gcond_depth_l2 > 0:
        views.append("front")
    if (c.lambda_gcond_sides_lpips + c.lambda_gcond_sides_l1
            + c.lambda_gcond_sides_alpha_l2 + c.lambda_gcond_sides_depth_l2) > 0:
        views += ["left", "right"]
    if (c.lambda_gcond_back_lpips + c.lambda_gcond_back_l1
            + c.lambda_gcond_back_alpha_l2 + c.lambda_gcond_back_depth_l2) > 0:
        views.append("back")
    return tuple(views)


def gaussian_blur_filter2d(img, blur_sigma, max_sigma: float = 0.0):
    """Progressive-blur filter: exp2(-(x/sigma)^2) taps (loss:183-187).

    ``blur_sigma`` may be a traced scalar; the tap count is static from
    ``max_sigma`` and taps beyond floor(3*sigma) are masked to zero, which
    reproduces the reference's shrinking kernel with a fixed buffer.
    """
    if isinstance(blur_sigma, (int, float)):
        blur_size = int(np.floor(blur_sigma * 3))
        if blur_size <= 0:
            return img
        f = jnp.exp2(-((jnp.arange(-blur_size, blur_size + 1) / blur_sigma) ** 2))
        return filter2d(img, f / jnp.sum(f))
    max_size = int(np.floor(max_sigma * 3))
    if max_size <= 0:
        return img
    x = jnp.arange(-max_size, max_size + 1)
    cur_size = jnp.floor(blur_sigma * 3)
    f = jnp.exp2(-((x / jnp.maximum(blur_sigma, 1e-8)) ** 2))
    f = jnp.where(jnp.abs(x) <= cur_size, f, 0.0)
    f = f / jnp.sum(f)
    # sigma faded to zero -> identity kernel
    ident = jnp.where(x == 0, 1.0, 0.0)
    f = jnp.where(cur_size >= 1, f, ident)
    return filter2d(img, f)


def mask_view_orthofront(front_xyz, front_alpha, view_xyz, view_alpha, boxwarp):
    """Ortho-visibility mask (loss_orthocondA.py:35-54).

    Projects the random-view xyz into the front-ortho frame and keeps pixels
    whose z matches the front depth (visible from the front).
    """
    bw = boxwarp
    fz = front_xyz[:, 2:3]
    vij = 1 - (view_xyz[:, [1, 0]] + bw / 2) / bw
    vz = view_xyz[:, 2:3]
    src = jnp.concatenate([(front_alpha > 0.5).astype(jnp.float32), fz], axis=1)
    # nearest-mode grid sample = bilinear on rounded coords
    grid = vij.transpose(0, 2, 3, 1) * 2 - 1
    # emulate 'nearest': quantize grid to pixel centers
    H = src.shape[-1]
    gq = (jnp.round((grid + 1) * H / 2 - 0.5) + 0.5) * 2 / H - 1
    qs = grid_sample_2d(src.transpose(0, 1, 3, 2), gq, padding_mode="zeros")
    zmask = (vz - qs[:, -1:]) < (1.5 / 255) * bw
    return qs[:, :-1] * zmask * (view_alpha > 0.5)


def _boundary_mask(gt_alpha, k: int = 2):
    """(box-filtered alpha - 0.5)*2 > 0.5: interior/exterior, not boundary."""
    win = 2 * k + 1
    box = jax.lax.reduce_window(
        gt_alpha, 0.0, jax.lax.add, (1, 1, win, win), (1, 1, 1, 1),
        [(0, 0), (0, 0), (k, k), (k, k)],
    ) / win**2
    return jnp.abs(box - 0.5) * 2 > 0.5


def recon_view_losses(out, gt_img, gt_alpha, gt_xyz, lpips_fn, depth_axis):
    """Shared recon-term math for front/side/back/rand phases
    (loss_orthocondA.py:280-308,345-374,428-455).

    depth_axis: 2 for front/back z, 0 for sides x, None for full-xyz norm.
    """
    loss_lpips = jnp.mean(lpips_fn(out["image"], gt_img))
    loss_l1 = jnp.mean(jnp.abs(out["image"] - gt_img))

    s = out["image_weights"].shape[-1]
    gt_alpha_s = resize_bilinear(gt_alpha, s)
    msk = _boundary_mask(gt_alpha_s)
    loss_alpha_l2 = jnp.mean(
        (out["image_weights"] - gt_alpha_s) ** 2 * msk.astype(jnp.float32)
    )

    gt_xyz_s = resize_bilinear(gt_xyz, s)
    mskz = jax.lax.stop_gradient(
        msk & (out["image_weights"] > 0.5) & (gt_alpha_s > 0.5)
    ).astype(jnp.float32)
    if depth_axis is None:
        d = jnp.sqrt(jnp.sum((out["image_xyz"] - gt_xyz_s) ** 2, axis=1, keepdims=True) + 1e-12)
        loss_depth_l2 = jnp.mean(d * mskz)
    else:
        loss_depth_l2 = jnp.mean(
            (out["image_xyz"][:, depth_axis : depth_axis + 1]
             - gt_xyz_s[:, depth_axis : depth_axis + 1]) ** 2 * mskz
        )
    return loss_lpips, loss_l1, loss_alpha_l2, loss_depth_l2


class OrthoCondLoss:
    """Bundles G/D apply fns + config into per-phase pure loss fns.

    G_f(params, xin, key) -> output dict (the G.f protocol)
    G_mapping(params, z, c, cond) -> ws
    G_sample_mixed(params, coords, dirs, ws, cond) -> dict
    D_apply(params, img_dict, c, cond, key) -> logits
    lpips_fn(a, b) -> [N]
    """

    def __init__(self, cfg: LossConfig, G_f, G_mapping, G_sample_mixed, D_apply,
                 lpips_fn, augment_fn=None, G_planes=None):
        self.cfg = cfg
        self.G_f = G_f
        self.G_mapping = G_mapping
        self.G_sample_mixed = G_sample_mixed
        self.D_apply = D_apply
        self.lpips_fn = lpips_fn
        # G_planes(params, ws, cond, key) -> triplanes; only needed by the
        # fused recon phase (backbone runs once, views share the planes)
        self.G_planes = G_planes
        # ADA: augment_fn(images, key, p) -> images; applied to the
        # joint [image, upsampled raw] pair inside run_D so the geometric
        # warp is consistent across both discrimination streams
        # (loss_orthocondA.py:189-195).
        self.augment_fn = augment_fn

    # -- G recon phases -----------------------------------------------------

    def g_cond_loss(self, params_G, batch, z, key, view="front"):
        """Gcond / Gside-left / Gside-right / Gside-back / Grand."""
        cfg = self.cfg
        cond = batch["cond"]
        if view == "rand":
            cam = cond["image_camera"]
            gt_img, gt_alpha, gt_xyz = (
                cond["image"], cond["image_alpha"], cond["image_xyz"],
            )
            xin = {
                "z": z, "cond": cond, "camera_params": cam,
                "paste_params": cfg.paste_params,
            }
            depth_axis = None
            lam = (cfg.lambda_gcond_rand_lpips, cfg.lambda_gcond_rand_l1,
                   cfg.lambda_gcond_rand_alpha_l2, cfg.lambda_gcond_rand_depth_l2)
        else:
            az = {"front": 0.0, "left": 90.0, "right": -90.0, "back": 180.0}[view]
            n = z.shape[0]
            cam = cond[f"image_ortho_{view}_camera"]
            gt_img = cond[f"image_ortho_{view}"]
            gt_alpha = cond[f"image_ortho_{view}_alpha"]
            gt_xyz = cond[f"image_ortho_{view}_xyz"]
            xin = {
                "z": z, "cond": cond, "camera_params": cam,
                "elevations": jnp.zeros(n),
                "azimuths": az * jnp.ones(n),
                "distances": jnp.ones(n),
                "paste_params": cfg.paste_params,
            }
            depth_axis = 0 if view in ("left", "right") else 2
            if view == "front":
                lam = (cfg.lambda_gcond_lpips, cfg.lambda_gcond_l1,
                       cfg.lambda_gcond_alpha_l2, cfg.lambda_gcond_depth_l2)
            elif view == "back":
                lam = (cfg.lambda_gcond_back_lpips, cfg.lambda_gcond_back_l1,
                       cfg.lambda_gcond_back_alpha_l2, cfg.lambda_gcond_back_depth_l2)
            else:
                lam = (cfg.lambda_gcond_sides_lpips, cfg.lambda_gcond_sides_l1,
                       cfg.lambda_gcond_sides_alpha_l2, cfg.lambda_gcond_sides_depth_l2)

        out = self.G_f(params_G, xin, key)
        l_lp, l_l1, l_a, l_d = recon_view_losses(
            out, gt_img, gt_alpha, gt_xyz, self.lpips_fn, depth_axis
        )
        loss = lam[0] * l_lp + lam[1] * l_l1 + lam[2] * l_a + lam[3] * l_d
        stats = {
            f"Loss/G/{view}/lpips": l_lp,
            f"Loss/G/{view}/l1": l_l1,
            f"Loss/G/{view}/alpha_l2": l_a,
            f"Loss/G/{view}/depth_l2": l_d,
            f"Loss/G/{view}": loss,
        }
        return loss, stats

    def fused_recon_views(self):
        """Ortho views with any active lambda — the fused phase's set."""
        return active_recon_views(self.cfg)

    def g_cond_fused_loss(self, params_G, batch, z, key):
        """All active ortho recon views in ONE pass sharing ONE backbone
        forward (TPU-efficiency option, `--fuse-recon`).

        The r3 roofline (PARITY.md) shows every recon phase is HBM-bound
        and each re-synthesizes the identical (z, cond) triplane; here the
        planes are computed once and tiled across the view axis, the
        renders+SR run as one batched G.f, and the per-view losses (same
        lambdas as the separate phases) sum into ONE Adam step — the one
        semantic deviation from the reference's per-phase stepping.
        Requires c_gen_conditioning_zero (flagship default: ws camera-free)
        and no paste compositing."""
        cfg = self.cfg
        assert cfg.paste_params is None, "fused recon incompatible with paste"
        cond = batch["cond"]
        views = self.fused_recon_views()
        V, n = len(views), z.shape[0]
        k_planes, k_f = jax.random.split(key)

        c_front = cond["image_ortho_front_camera"]
        ws = self.G_mapping(params_G, z, c_front, cond)
        planes = self.G_planes(params_G, ws, cond, k_planes)

        az = {"front": 0.0, "left": 90.0, "right": -90.0, "back": 180.0}

        def tile(x):  # [n, ...] -> [V*n, ...] (view-major, matching stacks)
            return jnp.concatenate([x] * V, axis=0)

        xin = {
            "ws": tile(ws),
            "cond": jax.tree_util.tree_map(tile, cond),
            "_planes": tile(planes),
            "camera_params": jnp.concatenate(
                [cond[f"image_ortho_{v}_camera"] for v in views], axis=0),
            "elevations": jnp.zeros(V * n),
            "azimuths": jnp.concatenate(
                [az[v] * jnp.ones(n) for v in views]),
            "distances": jnp.ones(V * n),
        }
        out = self.G_f(params_G, xin, k_f)

        lam_of = {
            "front": (cfg.lambda_gcond_lpips, cfg.lambda_gcond_l1,
                      cfg.lambda_gcond_alpha_l2, cfg.lambda_gcond_depth_l2),
            "back": (cfg.lambda_gcond_back_lpips, cfg.lambda_gcond_back_l1,
                     cfg.lambda_gcond_back_alpha_l2, cfg.lambda_gcond_back_depth_l2),
        }
        lam_sides = (cfg.lambda_gcond_sides_lpips, cfg.lambda_gcond_sides_l1,
                     cfg.lambda_gcond_sides_alpha_l2, cfg.lambda_gcond_sides_depth_l2)
        total = 0.0
        stats = {}
        for i, v in enumerate(views):
            out_v = {k: out[k][i * n:(i + 1) * n] for k in
                     ("image", "image_weights", "image_xyz")}
            l_lp, l_l1, l_a, l_d = recon_view_losses(
                out_v, cond[f"image_ortho_{v}"], cond[f"image_ortho_{v}_alpha"],
                cond[f"image_ortho_{v}_xyz"], self.lpips_fn,
                depth_axis=0 if v in ("left", "right") else 2,
            )
            lam = lam_of.get(v, lam_sides)
            lv = lam[0] * l_lp + lam[1] * l_l1 + lam[2] * l_a + lam[3] * l_d
            total = total + lv
            stats[f"Loss/G/{v}/lpips"] = l_lp
            stats[f"Loss/G/{v}/l1"] = l_l1
            stats[f"Loss/G/{v}/alpha_l2"] = l_a
            stats[f"Loss/G/{v}/depth_l2"] = l_d
            stats[f"Loss/G/{v}"] = lv
        return total, stats

    def g_cond_seq_grads(self, vars_G, batch, z, key, remat=None):
        """Per-view recon gradients from ONE shared backbone walk
        (`--fuse-recon seq`, the default fused mode).

        Resolves the optimizer-granularity deviation of g_cond_fused_loss
        (VERDICT r3 #4c): every active ortho view gets its OWN gradient —
        consumed by the loop as SEQUENTIAL per-view Adam updates, matching
        the reference's per-phase stepping — while the expensive shared
        trunk (mapping + backbone synthesis) is walked once:

        - forward: trunk(params) -> (ws, planes) via jax.vjp (one pass);
        - per view: render+SR branch forward+backward at batch n with the
          planes as an INPUT (backbone params unused -> zero grads there),
          yielding branch param grads + cotangents onto (ws, planes);
        - backbone backward: ONE jax.vmap of the trunk VJP over the V
          stacked cotangents. The VJP re-reads each activation once for
          all views together (the HBM-bound part, r3 roofline) and only
          the weight-gradient contractions scale with V — on a
          bandwidth-pinned step that is nearly the price of a single
          backward instead of V of them.

        The one remaining deviation from separate phases is that all V
        gradients are evaluated at the SAME (pre-update) params rather
        than each at its predecessor's output — the standard stale-grad
        approximation, exact to O(lr^2), equivalence-tested in
        tests/test_fuse_recon_seq.py.

        Returns [(view, grads_tree, stats)] with grads over
        vars_G['params'].
        """
        cfg = self.cfg
        assert cfg.paste_params is None, "fused recon incompatible with paste"
        cond = batch["cond"]
        views = self.fused_recon_views()
        n = z.shape[0]
        k_planes, k_f = jax.random.split(key)
        c_front = cond["image_ortho_front_camera"]
        az = {"front": 0.0, "left": 90.0, "right": -90.0, "back": 180.0}

        def trunk(p):
            vg = dict(vars_G, params=p)
            ws = self.G_mapping(vg, z, c_front, cond)
            planes = self.G_planes(vg, ws, cond, k_planes)
            return ws, planes

        def make_branch(view):
            def branch(p, ws_in, planes_in, k_v):
                vg = dict(vars_G, params=p)
                xin = {
                    "ws": ws_in,
                    "cond": cond,
                    "_planes": planes_in,
                    "camera_params": cond[f"image_ortho_{view}_camera"],
                    "elevations": jnp.zeros(n),
                    "azimuths": az[view] * jnp.ones(n),
                    "distances": jnp.ones(n),
                }
                out = self.G_f(vg, xin, k_v)
                l_lp, l_l1, l_a, l_d = recon_view_losses(
                    out, cond[f"image_ortho_{view}"],
                    cond[f"image_ortho_{view}_alpha"],
                    cond[f"image_ortho_{view}_xyz"], self.lpips_fn,
                    depth_axis=0 if view in ("left", "right") else 2,
                )
                if view == "front":
                    lam = (cfg.lambda_gcond_lpips, cfg.lambda_gcond_l1,
                           cfg.lambda_gcond_alpha_l2, cfg.lambda_gcond_depth_l2)
                elif view == "back":
                    lam = (cfg.lambda_gcond_back_lpips, cfg.lambda_gcond_back_l1,
                           cfg.lambda_gcond_back_alpha_l2,
                           cfg.lambda_gcond_back_depth_l2)
                else:
                    lam = (cfg.lambda_gcond_sides_lpips, cfg.lambda_gcond_sides_l1,
                           cfg.lambda_gcond_sides_alpha_l2,
                           cfg.lambda_gcond_sides_depth_l2)
                loss_v = (lam[0] * l_lp + lam[1] * l_l1 + lam[2] * l_a
                          + lam[3] * l_d)
                stats = {
                    f"Loss/G/{view}/lpips": l_lp,
                    f"Loss/G/{view}/l1": l_l1,
                    f"Loss/G/{view}/alpha_l2": l_a,
                    f"Loss/G/{view}/depth_l2": l_d,
                    f"Loss/G/{view}": loss_v,
                }
                return loss_v, stats

            return branch

        policy = None
        trunk_fn = trunk
        if remat:
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if remat == "dots" else None)
            trunk_fn = jax.checkpoint(trunk, policy=policy)

        (ws, planes), trunk_vjp = jax.vjp(trunk_fn, vars_G["params"])

        g_branch, c_ws, c_planes, statss = [], [], [], []
        for i, v in enumerate(views):
            branch_fn = make_branch(v)
            if remat:
                branch_fn = jax.checkpoint(branch_fn, policy=policy)
            k_v = jax.random.fold_in(k_f, i)
            (gp, gw, gpl), stats_v = jax.grad(
                branch_fn, argnums=(0, 1, 2), has_aux=True
            )(vars_G["params"], ws, planes, k_v)
            g_branch.append(gp)
            c_ws.append(gw)
            c_planes.append(gpl)
            statss.append(stats_v)

        # ONE vmapped backbone backward over the V stacked cotangents
        g_trunk = jax.vmap(lambda cw, cp: trunk_vjp((cw, cp))[0])(
            jnp.stack(c_ws), jnp.stack(c_planes)
        )
        out = []
        for i, v in enumerate(views):
            g_t = jax.tree_util.tree_map(lambda t, i=i: t[i], g_trunk)
            g_v = jax.tree_util.tree_map(jnp.add, g_branch[i], g_t)
            out.append((v, g_v, statss[i]))
        return out

    # -- adversarial helpers --------------------------------------------------

    def run_G(self, params_G, z, c, cond, key, swapping_prob,
              neural_rendering_resolution, update_emas=False):
        """loss_orthocondA.py:157-180."""
        k_swap, k_f, k_mix = jax.random.split(key, 3)
        if swapping_prob is not None:
            c_swapped = jnp.roll(c, 1, axis=0)
            take = jax.random.uniform(k_swap, (c.shape[0], 1)) < swapping_prob
            c_gen = jnp.where(take, c_swapped, c)
        else:
            c_gen = jnp.zeros_like(c)
        # ws from the (possibly swapped) conditioning; render with true cams
        ws = self.G_mapping(params_G, z, c_gen, cond)
        if self.cfg.style_mixing_prob > 0:
            # vanilla EG3D style mixing (src/training/loss.py:87-92): with
            # prob p, re-draw ws from a fresh z and splice it in after a
            # uniform cutoff in [1, num_ws). Data-dependent slice -> iota mask.
            k_cut, k_gate, k_z2 = jax.random.split(k_mix, 3)
            num_ws = ws.shape[1]
            ws2 = self.G_mapping(
                params_G, jax.random.normal(k_z2, z.shape), c_gen, cond
            )
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k_gate, ()) < self.cfg.style_mixing_prob,
                cutoff, num_ws,
            )
            mixed = jnp.arange(num_ws)[None, :, None] >= cutoff
            ws = jnp.where(mixed, ws2, ws)
        xin = {
            "ws": ws,
            "cond": cond,
            "camera_params": c,
            "normalize_images": True,
            "neural_rendering_resolution": neural_rendering_resolution,
            "update_emas": update_emas,
            "paste_params": self.cfg.paste_params,
        }
        return self.G_f(params_G, xin, k_f)

    def run_D(self, params_D, img, c, cond, key, blur_sigma=0.0, aug_p=None,
              update_emas=False):
        # blur_sigma may be traced (fading schedule); only a static 0 skips
        if not (isinstance(blur_sigma, (int, float)) and blur_sigma <= 0):
            img = dict(img)
            img["image"] = gaussian_blur_filter2d(
                img["image"], blur_sigma, max_sigma=self.cfg.blur_init_sigma
            )
        if self.augment_fn is not None and aug_p is not None:
            # joint-pair ADA (loss_orthocondA.py:189-195): upsample the raw
            # stream to full res, augment the 6-channel concat with one warp,
            # split and downsample back (antialiased, as the reference's
            # interpolate(antialias=True)).
            k_aug, key = jax.random.split(key)
            img = dict(img)
            full, raw = img["image"], img["image_raw"]
            up = resize_bilinear(raw, full.shape[-1])
            pair = self.augment_fn(
                jnp.concatenate([full, up], axis=1), k_aug, aug_p
            )
            img["image"] = pair[:, : full.shape[1]]
            img["image_raw"] = filtered_resizing(
                pair[:, full.shape[1] :], raw.shape[-1], filter_mode="antialiased"
            )
        return self.D_apply(params_D, img, c, cond, key)

    def prep_real_img(self, real_img, cur_nimg):
        """Raw-stream construction + progressive blur (loss:220-232)."""
        cfg = self.cfg
        res = cfg.neural_rendering_resolution(cur_nimg)
        raw = filtered_resizing(real_img, res, filter_mode=cfg.filter_mode)
        blur_sigma = cfg.blur_sigma(cur_nimg)
        raw_blur = gaussian_blur_filter2d(
            raw, blur_sigma, max_sigma=cfg.blur_init_sigma
        )
        return {
            "image": real_img,
            "image_raw": raw_blur,
            "image_raw_noblur": resize_bilinear(real_img, res),
        }

    def _lmask(self, batch):
        cond = batch["cond"]
        return mask_view_orthofront(
            cond["image_ortho_front_xyz"], cond["image_ortho_front_alpha"],
            cond["image_xyz"], cond["image_alpha"], self.cfg.box_warp,
        )

    # -- Gmain ---------------------------------------------------------------

    def g_main_loss(self, params_G, params_D, batch, z, c, key, cur_nimg,
                    gain=1.0, aug_p=None):
        """Adversarial G phase (+ masked recon, loss:480-576)."""
        cfg = self.cfg
        cond = batch["cond"]
        k_g, k_d = jax.random.split(key)
        swapping_prob = cfg.swapping_prob(cur_nimg)
        res = cfg.neural_rendering_resolution(cur_nimg)
        blur_sigma = cfg.blur_sigma(cur_nimg)

        gen_img = self.run_G(params_G, z, c, cond, k_g, swapping_prob, res)

        real_img = None
        stats = {}
        if cfg.lossmask_mode_adv != "none":
            real_img = self.prep_real_img(batch["image"], cur_nimg)
            lmask = self._lmask(batch)
            k = int(cfg.lossmask_mode_adv.split("_")[-1])
            lmask_adv = 1 - erosion(lmask, k)
            lmask_adv_raw = (
                resize_bilinear(lmask_adv, gen_img["image_raw"].shape[-1]) > 0.5
            ).astype(jnp.float32)
            lmask_adv_full = resize_bilinear(lmask_adv, gen_img["image"].shape[-1])
            gen_for_adv = {
                "image": real_img["image"]
                + (gen_img["image"] - real_img["image"]) * lmask_adv_full,
                "image_raw": real_img["image_raw_noblur"]
                + (gen_img["image_raw"] - real_img["image_raw_noblur"]) * lmask_adv_raw,
            }
        else:
            gen_for_adv = gen_img

        gen_logits = self.run_D(params_D, gen_for_adv, c, cond, k_d, blur_sigma,
                                aug_p=aug_p)
        loss_gmain = jax.nn.softplus(-gen_logits)
        stats["Loss/scores/fake"] = jnp.mean(gen_logits)
        stats["Loss/G/loss"] = jnp.mean(loss_gmain)

        loss_grecon = 0.0
        if cfg.lossmask_mode_recon != "none":
            if real_img is None:
                real_img = self.prep_real_img(batch["image"], cur_nimg)
            lmask = self._lmask(batch)
            k = int(cfg.lossmask_mode_recon.split("_")[-1])
            lmask_recon = dilation(lmask, k)
            lmask_recon_raw = (
                resize_bilinear(lmask_recon, gen_img["image_raw"].shape[-1]) > 0.5
            ).astype(jnp.float32)
            lmask_recon_full = resize_bilinear(lmask_recon, gen_img["image"].shape[-1])
            out = dict(gen_img)
            out["image"] = (
                real_img["image"]
                + (gen_img["image"] - real_img["image"]) * lmask_recon_full
            ) * 0.5 + 0.5
            out["image_raw"] = (
                real_img["image_raw_noblur"]
                + (gen_img["image_raw"] - real_img["image_raw_noblur"]) * lmask_recon_raw
            ) * 0.5 + 0.5

            l_lp = jnp.mean(self.lpips_fn(out["image"], cond["image"]))
            l_l1 = jnp.mean(jnp.abs(out["image"] - cond["image"]))
            s = out["image_weights"].shape[-1]
            gt_alpha = resize_bilinear(cond["image_alpha"], s)
            msk = _boundary_mask(gt_alpha)
            l_a = jnp.mean(
                (out["image_weights"] - gt_alpha) ** 2
                * msk.astype(jnp.float32) * lmask_recon_raw
            )
            gt_xyz = resize_bilinear(cond["image_xyz"], s)
            mskz = jax.lax.stop_gradient(
                msk & (out["image_weights"] > 0.5) & (gt_alpha > 0.5)
            ).astype(jnp.float32)
            d = jnp.sqrt(jnp.sum((out["image_xyz"] - gt_xyz) ** 2, axis=1,
                                 keepdims=True) + 1e-12)
            l_d = jnp.mean(d * mskz * lmask_recon_raw)
            loss_grecon = (
                cfg.lambda_recon_lpips * l_lp + cfg.lambda_recon_l1 * l_l1
                + cfg.lambda_recon_alpha_l2 * l_a + cfg.lambda_recon_depth_l2 * l_d
            )
            stats["Loss/G/loss_recon"] = loss_grecon

        return jnp.mean(loss_gmain) * gain + jnp.mean(loss_grecon), stats

    # -- Gpl: path-length regularization --------------------------------------

    def g_pl_loss(self, params_G, batch, z, c, key, cur_nimg, pl_mean,
                  gain=1.0):
        """Upstream StyleGAN2 Gpl, gated by pl_weight (the reference stores
        the pl_* knobs, loss.py:44-48, but dropped the phase; restored here
        as a reference option).

        Jacobian-vector trick: E||d(img·noise)/dws||² with unit-variance
        noise estimates the path length; penalty is the squared deviation
        from its running mean (pl_decay EMA, carried in the train state
        because jit'd losses are pure). Batch shrunk by pl_batch_shrink.
        Returns (loss, stats) with the new EMA under 'pl_mean_new'."""
        cfg = self.cfg
        bs = max(z.shape[0] // cfg.pl_batch_shrink, 1)
        z = z[:bs]
        c = c[:bs]
        cond = jax.tree_util.tree_map(lambda x: x[:bs], batch["cond"])
        k_swap, k_noise, k_f = jax.random.split(key, 3)
        swapping_prob = cfg.swapping_prob(cur_nimg)
        res = cfg.neural_rendering_resolution(cur_nimg)
        if swapping_prob is not None:
            c_swapped = jnp.roll(c, 1, axis=0)
            take = jax.random.uniform(k_swap, (c.shape[0], 1)) < swapping_prob
            c_gen = jnp.where(take, c_swapped, c)
        else:
            c_gen = jnp.zeros_like(c)
        ws = self.G_mapping(params_G, z, c_gen, cond)

        def render(ws_in):
            xin = {
                "ws": ws_in,
                "cond": cond,
                "camera_params": c,
                "normalize_images": True,
                "neural_rendering_resolution": res,
            }
            return self.G_f(params_G, xin, k_f)["image"]

        img = render(ws)
        pl_noise = jax.random.normal(k_noise, img.shape) / np.sqrt(
            img.shape[2] * img.shape[3]
        )
        # d(sum(img*noise))/dws, then L2 over w_dim, mean over layers
        pl_grads = jax.grad(lambda w: jnp.sum(render(w) * pl_noise))(ws)
        pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(pl_grads**2, axis=2), axis=1))
        new_pl_mean = pl_mean + cfg.pl_decay * (jnp.mean(pl_lengths) - pl_mean)
        pl_penalty = (pl_lengths - new_pl_mean) ** 2
        loss = jnp.mean(pl_penalty) * cfg.pl_weight * gain
        stats = {
            "Loss/pl_penalty": jnp.mean(pl_penalty),
            "Loss/G/pl": loss,
            "pl_mean_new": new_pl_mean,
        }
        return loss, stats

    # -- Greg: density regularization -----------------------------------------

    def g_reg_loss(self, params_G, batch, z, c, key, cur_nimg, gain=1.0):
        """Density TV / monotonic regularizers (loss:579-688)."""
        cfg = self.cfg
        cond = batch["cond"]
        k_swap, k_coord, k_pert, k_dir = jax.random.split(key, 4)
        swapping_prob = cfg.swapping_prob(cur_nimg)
        if swapping_prob is not None:
            c_swapped = jnp.roll(c, 1, axis=0)
            take = jax.random.uniform(k_swap, ()) < swapping_prob
            c_gen = jnp.where(take, c_swapped, c)
        else:
            c_gen = jnp.zeros_like(c)
        ws = self.G_mapping(params_G, z, c_gen, cond)

        stats = {}
        if cfg.reg_type == "l1":
            coords = jax.random.uniform(k_coord, (ws.shape[0], 1000, 3)) * 2 - 1
            pert = coords + jax.random.normal(k_pert, coords.shape) * cfg.density_reg_p_dist
            allc = jnp.concatenate([coords, pert], axis=1)
            sigma = self.G_sample_mixed(
                params_G, allc, jax.random.normal(k_dir, allc.shape), ws, cond
            )["sigma"]
            half = sigma.shape[1] // 2
            tv = jnp.mean(jnp.abs(sigma[:, :half] - sigma[:, half:])) * cfg.density_reg
            stats["Loss/G/reg"] = tv
            return tv * gain, stats

        if cfg.reg_type in ("monotonic-detach", "monotonic-fixed"):
            coords = jax.random.uniform(k_coord, (ws.shape[0], 2000, 3)) * 2 - 1
            behind = coords + jnp.asarray([0.0, 0.0, -1.0]) * (1 / 256) * cfg.box_warp
            allc = jnp.concatenate([coords, behind], axis=1)
            sigma = self.G_sample_mixed(
                params_G, allc, jax.random.normal(k_dir, allc.shape), ws, cond
            )["sigma"]
            half = sigma.shape[1] // 2
            s_init, s_pert = sigma[:, :half], sigma[:, half:]
            if cfg.reg_type == "monotonic-detach":
                s_init = jax.lax.stop_gradient(s_init)
            mono = jnp.mean(jax.nn.relu(s_init - s_pert)) * 10

            coords2 = jax.random.uniform(k_pert, (ws.shape[0], 1000, 3)) * 2 - 1
            pert2 = coords2 + jax.random.normal(k_dir, coords2.shape) * (1 / 256) * cfg.box_warp
            allc2 = jnp.concatenate([coords2, pert2], axis=1)
            sigma2 = self.G_sample_mixed(
                params_G, allc2, jax.random.normal(k_coord, allc2.shape), ws, cond
            )["sigma"]
            half2 = sigma2.shape[1] // 2
            tv = jnp.mean(jnp.abs(sigma2[:, :half2] - sigma2[:, half2:])) * cfg.density_reg
            stats["Loss/G/reg"] = mono + tv
            return (mono + tv) * gain, stats

        raise ValueError(cfg.reg_type)

    # -- D phases --------------------------------------------------------------

    def d_main_loss(self, params_D, params_G, batch, z, c, key, cur_nimg,
                    gain=1.0, aug_p=None):
        """Dgen + Dreal softplus (loss:690-718)."""
        cfg = self.cfg
        cond = batch["cond"]
        k_g, k_d1, k_d2 = jax.random.split(key, 3)
        swapping_prob = cfg.swapping_prob(cur_nimg)
        res = cfg.neural_rendering_resolution(cur_nimg)
        blur_sigma = cfg.blur_sigma(cur_nimg)

        gen_img = self.run_G(
            jax.lax.stop_gradient(params_G), z, c, cond, k_g, swapping_prob, res,
            update_emas=True,
        )
        gen_img = jax.tree_util.tree_map(jax.lax.stop_gradient, gen_img)
        gen_logits = self.run_D(params_D, gen_img, c, cond, k_d1, blur_sigma,
                                aug_p=aug_p)
        loss_dgen = jax.nn.softplus(gen_logits)

        real_img = self.prep_real_img(batch["image"], cur_nimg)
        real_tmp = {"image": real_img["image"], "image_raw": real_img["image_raw"]}
        real_logits = self.run_D(params_D, real_tmp, c, cond, k_d2, blur_sigma,
                                 aug_p=aug_p)
        loss_dreal = jax.nn.softplus(-real_logits)

        stats = {
            "Loss/scores/fake": jnp.mean(gen_logits),
            "Loss/scores/real": jnp.mean(real_logits),
            # sign stats drive the ADA p-heuristic (training_loop_v0.py:398-402)
            "Loss/signs/fake": jnp.mean(jnp.sign(gen_logits)),
            "Loss/signs/real": jnp.mean(jnp.sign(real_logits)),
            "Loss/D/loss": jnp.mean(loss_dgen + loss_dreal),
        }
        return jnp.mean(loss_dgen + loss_dreal) * gain, stats

    def d_reg_loss(self, params_D, batch, c, key, cur_nimg, gain=1.0, aug_p=None):
        """R1 penalty via grad-of-grad (loss:704-738)."""
        cfg = self.cfg
        blur_sigma = cfg.blur_sigma(cur_nimg)
        cond = batch["cond"]
        real_img = self.prep_real_img(batch["image"], cur_nimg)

        def logits_sum(image, image_raw):
            out = self.run_D(
                params_D, {"image": image, "image_raw": image_raw}, c, cond, key,
                blur_sigma, aug_p=aug_p,
            )
            return jnp.sum(out)

        g_img, g_raw = jax.grad(logits_sum, argnums=(0, 1))(
            real_img["image"], real_img["image_raw"]
        )
        if cfg.dual_discrimination:
            r1 = jnp.sum(g_img**2, axis=(1, 2, 3)) + jnp.sum(g_raw**2, axis=(1, 2, 3))
        else:
            r1 = jnp.sum(g_img**2, axis=(1, 2, 3))
        loss = jnp.mean(r1 * (cfg.r1_gamma / 2))
        return loss * gain, {"Loss/r1_penalty": jnp.mean(r1), "Loss/D/reg": loss}
