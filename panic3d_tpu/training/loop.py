"""Phase-based GAN training step + state, mesh-sharded.

Role of `src/training/training_loop_v0.py:99-539` and the phase construction
of `trainers/train_eclustrousC.py`:
- phases Gmain/Gcond/Gside-*/Grand/Greg/Dmain/Dreg, each its own Adam step
  against the shared per-module optimizer (training_loop_v0.py:221-266);
- lazy-regularization lr/beta scaling by reg_interval/(reg_interval+1)
  (training_loop_v0.py:226-229);
- grad nan_to_num (training_loop_v0.py:371);
- G_ema lerp with beta 0.5^(batch/ema_nimg) (training_loop_v0.py:381-392).

TPU-first: the whole multi-phase step is ONE jitted function over a
jax.sharding.Mesh — the reference's per-GPU process spawn, param broadcast,
and manual flattened all_reduce (SURVEY.md §2.8) are replaced by sharded jit;
XLA emits the psum over ICI. Gradient sync, EMA, and optimizer updates all
happen on-device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .loss import LossConfig, OrthoCondLoss


@flax.struct.dataclass
class GANTrainState:
    vars_G: Any
    vars_D: Any
    vars_Gema: Any
    opt_G: Any
    opt_D: Any
    cur_nimg: jnp.ndarray  # int32 scalar
    # ADA augmentation strength p (training_loop_v0.py:398-402); a traced
    # scalar so the host-side heuristic update never triggers a recompile.
    aug_p: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.float32)
    )
    # path-length running mean (upstream StyleGAN2 pl_mean buffer; the
    # reference keeps the knob, loss.py:48): jit'd losses are pure, so the
    # EMA lives in the train state.
    pl_mean: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((), jnp.float32)
    )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 4
    # micro-batch size for gradient accumulation (batch_gpu,
    # training_loop_v0.py:336-347); None = whole batch in one pass.
    batch_gpu: Optional[int] = None
    # Reference-compat accumulation: the reference SUMS each round's
    # mean-loss gradient and never divides by the number of rounds
    # (training_loop_v0.py:350-371 divides only by num_gpus), so its
    # effective step size scales with batch_size/batch_gpu. Default False =
    # average (update equals the full-batch update); True reproduces the
    # reference semantics so its LR/batch_gpu recipes transfer verbatim.
    accum_sum: bool = False
    # Freeze-D (reference --freezed, networks_stylegan2.py:788-794): the
    # first N discriminator layers take no updates. Entries are
    # (block, layer) name pairs, e.g. ("b512", "fromrgb"); gradients whose
    # path contains the pair are zeroed before the optimizer (with Adam's
    # zero-init moments a zero grad is exactly a no-op update, the
    # optimizer-level equivalent of the reference's trainable=False).
    d_frozen: Tuple = ()
    # Rematerialize phase losses in the backward pass. The r3 roofline
    # (PARITY.md) shows every G phase pinned to the HBM-bandwidth wall at
    # 6-8% MFU: recompute is nearly free there, while forward-residual
    # reads/writes are the wall. None = store residuals (XLA default);
    # 'full' = jax.checkpoint, save nothing; 'dots' = save matmul/conv
    # outputs only (dots_with_no_batch_dims_saveable policy).
    remat: Optional[str] = None
    g_lr: float = 0.0025
    d_lr: float = 0.002
    betas: Tuple[float, float] = (0.0, 0.99)
    eps: float = 1e-8
    g_reg_interval: int = 4
    d_reg_interval: int = 16
    ema_kimg: float = 1.25  # batch*10/32 (train_eclustrousC.py:392)
    ema_rampup: Optional[float] = None
    phases: Tuple[str, ...] = (
        "Gmain", "Gcond", "Gside-left", "Gside-right", "Gside-back", "Grand",
        "Greg", "Dmain", "Dreg",
    )

    @property
    def n_micro(self) -> int:
        if self.batch_gpu is None:
            return 1
        assert self.batch_size % self.batch_gpu == 0
        return self.batch_size // self.batch_gpu


def _scaled_adam(lr, betas, eps, reg_interval):
    """Lazy-reg Adam scaling (training_loop_v0.py:226-229)."""
    mb = reg_interval / (reg_interval + 1)
    return optax.adam(
        learning_rate=lr * mb, b1=betas[0] ** mb, b2=betas[1] ** mb, eps=eps,
    )


def make_optimizers(cfg: TrainConfig):
    opt_G = _scaled_adam(cfg.g_lr, cfg.betas, cfg.eps, cfg.g_reg_interval)
    opt_D = _scaled_adam(cfg.d_lr, cfg.betas, cfg.eps, cfg.d_reg_interval)
    return opt_G, opt_D


def init_state(vars_G, vars_D, cfg: TrainConfig) -> GANTrainState:
    opt_G, opt_D = make_optimizers(cfg)
    return GANTrainState(
        vars_G=vars_G,
        vars_D=vars_D,
        vars_Gema=jax.tree_util.tree_map(jnp.copy, vars_G),
        opt_G=opt_G.init(vars_G["params"]),
        opt_D=opt_D.init(vars_D["params"]),
        cur_nimg=jnp.zeros((), jnp.int32),
    )


def _nan_to_num_tree(tree):
    return jax.tree_util.tree_map(jnp.nan_to_num, tree)


def build_train_step(
    loss: OrthoCondLoss,
    train_cfg: TrainConfig,
    z_dim: int,
    active_phases: Sequence[str],
):
    """Compile one jitted multi-phase step for a given phase subset.

    The host loop picks the compiled variant per step (reg phases fire every
    g/d_reg_interval steps), mirroring phase.interval gating
    (training_loop_v0.py:350-361). `gain` = phase interval.
    """
    opt_G, opt_D = make_optimizers(train_cfg)
    cfg = loss.cfg
    n_micro = train_cfg.n_micro

    def accumulate(phase_fn, params, batch, gen_z, gen_c, key):
        """Micro-batched grad accumulation (training_loop_v0.py:336-347).

        Micro-batch i takes the strided slice [i::n_micro] of the global
        batch: under contiguous 'data'-axis sharding the stride keeps every
        slice device-local (no resharding collective). Gradients/stats are
        averaged so the accumulated update equals the full-batch update for
        per-sample-separable losses.
        """
        if train_cfg.remat:
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if train_cfg.remat == "dots" else None)
            phase_fn = jax.checkpoint(phase_fn, policy=policy)
        grad_fn = jax.value_and_grad(phase_fn, has_aux=True)
        if n_micro == 1:
            (_, stats), grads = grad_fn(params, batch, gen_z, gen_c, key)
            return _nan_to_num_tree(grads), stats
        keys = jax.random.split(key, n_micro)
        total_g, total_s = None, None
        for i in range(n_micro):
            mb = jax.tree_util.tree_map(lambda x: x[i::n_micro], batch)
            (_, s), g = grad_fn(
                params, mb, gen_z[i::n_micro], gen_c[i::n_micro], keys[i]
            )
            if total_g is None:
                total_g, total_s = g, s
            else:
                total_g = jax.tree_util.tree_map(jnp.add, total_g, g)
                total_s = {k: total_s[k] + s[k] for k in total_s}
        if not train_cfg.accum_sum:
            total_g = jax.tree_util.tree_map(lambda x: x / n_micro, total_g)
        stats = {k: v / n_micro for k, v in total_s.items()}
        return _nan_to_num_tree(total_g), stats

    def g_phase_update(state, phase_fn, key, batch, gen_z, gen_c):
        grads, stats = accumulate(
            phase_fn, state.vars_G["params"], batch, gen_z, gen_c, key
        )
        updates, new_opt = opt_G.update(grads, state.opt_G, state.vars_G["params"])
        params = optax.apply_updates(state.vars_G["params"], updates)
        return state.replace(
            vars_G=dict(state.vars_G, params=params), opt_G=new_opt
        ), stats

    def _mask_frozen_d(grads):
        if not train_cfg.d_frozen:
            return grads
        from flax import traverse_util

        frozen = {tuple(p) for p in train_cfg.d_frozen}
        flat = traverse_util.flatten_dict(grads)
        flat = {
            k: (jnp.zeros_like(v)
                if any((k[i], k[i + 1]) in frozen for i in range(len(k) - 1))
                else v)
            for k, v in flat.items()
        }
        return traverse_util.unflatten_dict(flat)

    def d_phase_update(state, phase_fn, key, batch, gen_z, gen_c):
        grads, stats = accumulate(
            phase_fn, state.vars_D["params"], batch, gen_z, gen_c, key
        )
        grads = _mask_frozen_d(grads)
        updates, new_opt = opt_D.update(grads, state.opt_D, state.vars_D["params"])
        params = optax.apply_updates(state.vars_D["params"], updates)
        return state.replace(
            vars_D=dict(state.vars_D, params=params), opt_D=new_opt
        ), stats

    def train_step(state: GANTrainState, batch, key):
        stats = {}
        cur_nimg = state.cur_nimg
        aug_p = state.aug_p
        z_key, *phase_keys = jax.random.split(key, len(active_phases) + 1)
        bs = batch["image"].shape[0]
        gen_z = jax.random.normal(z_key, (bs, z_dim))
        gen_c = batch["camera"]

        for phase, pk in zip(active_phases, phase_keys):
            if phase == "Gmain":
                def fn(p, mb, z, c, k):
                    return loss.g_main_loss(
                        dict(state.vars_G, params=p), state.vars_D, mb,
                        z, c, k, cur_nimg, aug_p=aug_p,
                    )
                state, s = g_phase_update(state, fn, pk, batch, gen_z, gen_c)
            elif phase == "Grecon-fused":
                # all active ortho recon views in one pass sharing one
                # backbone forward (--fuse-recon; see loss.g_cond_fused_loss)
                def fn(p, mb, z, c, k):
                    return loss.g_cond_fused_loss(
                        dict(state.vars_G, params=p), mb, z, k
                    )
                state, s = g_phase_update(state, fn, pk, batch, gen_z, gen_c)
            elif phase == "Grecon-seq":
                # shared-trunk per-view gradients + SEQUENTIAL per-view Adam
                # updates (the default fused mode): reference optimizer
                # granularity at ~one backbone backward's bandwidth
                # (loss.g_cond_seq_grads; vmapped trunk VJP)
                def seq_grads(params, mb, z_, k):
                    pv = loss.g_cond_seq_grads(
                        dict(state.vars_G, params=params), mb, z_, k,
                        remat=train_cfg.remat,
                    )
                    return [(v, _nan_to_num_tree(g), st) for v, g, st in pv]

                if n_micro == 1:
                    per_view = seq_grads(state.vars_G["params"], batch, gen_z, pk)
                else:
                    keys = jax.random.split(pk, n_micro)
                    per_view = None
                    for i in range(n_micro):
                        mb = jax.tree_util.tree_map(
                            lambda x: x[i::n_micro], batch
                        )
                        pv = seq_grads(
                            state.vars_G["params"], mb, gen_z[i::n_micro],
                            keys[i],
                        )
                        if per_view is None:
                            per_view = pv
                        else:
                            per_view = [
                                (v, jax.tree_util.tree_map(jnp.add, g0, g1),
                                 {k: s0[k] + s1[k] for k in s0})
                                for (v, g0, s0), (_, g1, s1)
                                in zip(per_view, pv)
                            ]
                    if not train_cfg.accum_sum:
                        per_view = [
                            (v, jax.tree_util.tree_map(
                                lambda x: x / n_micro, g), st)
                            for v, g, st in per_view
                        ]
                    per_view = [
                        (v, g, {k: s / n_micro for k, s in st.items()})
                        for v, g, st in per_view
                    ]
                s = {}
                for _, g_v, stats_v in per_view:
                    updates, new_opt = opt_G.update(
                        g_v, state.opt_G, state.vars_G["params"]
                    )
                    params = optax.apply_updates(
                        state.vars_G["params"], updates
                    )
                    state = state.replace(
                        vars_G=dict(state.vars_G, params=params),
                        opt_G=new_opt,
                    )
                    s.update(stats_v)
            elif phase in ("Gcond", "Gside-left", "Gside-right", "Gside-back",
                           "Grand"):
                view = {
                    "Gcond": "front",
                    "Gside-left": "left",
                    "Gside-right": "right",
                    "Gside-back": "back",
                    "Grand": "rand",
                }[phase]
                def fn(p, mb, z, c, k, v=view):
                    return loss.g_cond_loss(
                        dict(state.vars_G, params=p), mb, z, k, view=v
                    )
                state, s = g_phase_update(state, fn, pk, batch, gen_z, gen_c)
            elif phase == "Greg":
                def fn(p, mb, z, c, k):
                    return loss.g_reg_loss(
                        dict(state.vars_G, params=p), mb, z, c, k,
                        cur_nimg, gain=float(train_cfg.g_reg_interval),
                    )
                state, s = g_phase_update(state, fn, pk, batch, gen_z, gen_c)
            elif phase == "Gpl":
                # no micro-accumulation: the phase already shrinks the batch
                # by pl_batch_shrink, and the pl_mean EMA must advance once
                def fn(p, mb, z, c, k):
                    return loss.g_pl_loss(
                        dict(state.vars_G, params=p), mb, z, c, k,
                        cur_nimg, state.pl_mean,
                        gain=float(train_cfg.g_reg_interval),
                    )
                if train_cfg.remat:  # same policy as accumulate()
                    policy = (
                        jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                        if train_cfg.remat == "dots" else None)
                    fn = jax.checkpoint(fn, policy=policy)
                grad_fn = jax.value_and_grad(fn, has_aux=True)
                (_, s), grads = grad_fn(
                    state.vars_G["params"], batch, gen_z, gen_c, pk
                )
                updates, new_opt = opt_G.update(
                    _nan_to_num_tree(grads), state.opt_G,
                    state.vars_G["params"],
                )
                params = optax.apply_updates(state.vars_G["params"], updates)
                state = state.replace(
                    vars_G=dict(state.vars_G, params=params), opt_G=new_opt,
                    pl_mean=s.pop("pl_mean_new"),
                )
            elif phase == "Dmain":
                def fn(p, mb, z, c, k):
                    return loss.d_main_loss(
                        dict(state.vars_D, params=p), state.vars_G, mb,
                        z, c, k, cur_nimg, aug_p=aug_p,
                    )
                state, s = d_phase_update(state, fn, pk, batch, gen_z, gen_c)
            elif phase == "Dreg":
                def fn(p, mb, z, c, k):
                    return loss.d_reg_loss(
                        dict(state.vars_D, params=p), mb, c, k, cur_nimg,
                        gain=float(train_cfg.d_reg_interval), aug_p=aug_p,
                    )
                state, s = d_phase_update(state, fn, pk, batch, gen_z, gen_c)
            else:
                raise ValueError(phase)
            stats.update(s)

        # G_ema lerp (training_loop_v0.py:381-392)
        ema_nimg = train_cfg.ema_kimg * 1000
        if train_cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(
                ema_nimg, state.cur_nimg.astype(jnp.float32) * train_cfg.ema_rampup
            )
        ema_beta = 0.5 ** (train_cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
        new_ema_params = jax.tree_util.tree_map(
            lambda p, e: p + (e - p) * ema_beta,
            state.vars_G["params"],
            state.vars_Gema["params"],
        )
        vars_Gema = dict(state.vars_G)  # buffers copied directly
        vars_Gema["params"] = new_ema_params
        state = state.replace(
            vars_Gema=vars_Gema,
            cur_nimg=state.cur_nimg + train_cfg.batch_size,
        )
        return state, stats

    return train_step


def ada_update(state: GANTrainState, signs_real: float, ada_target: float,
               batch_size: int, ada_interval: int, ada_kimg: float) -> GANTrainState:
    """ADA p-heuristic (training_loop_v0.py:398-402): nudge p toward the
    target real-logit sign rate; clamp at 0. Host-driven every ada_interval
    batches; p is a traced state scalar so no recompile occurs."""
    adjust = float(np.sign(signs_real - ada_target)) * (
        batch_size * ada_interval
    ) / (ada_kimg * 1000)
    return state.replace(
        aug_p=jnp.maximum(state.aug_p + adjust, 0.0).astype(jnp.float32)
    )


def phases_for_step(step: int, cfg: TrainConfig) -> Tuple[str, ...]:
    """Which phases run at this step (interval gating)."""
    out = []
    for ph in cfg.phases:
        if ph in ("Greg", "Gpl"):
            if step % cfg.g_reg_interval == 0:
                out.append(ph)
        elif ph == "Dreg":
            if step % cfg.d_reg_interval == 0:
                out.append(ph)
        else:
            out.append(ph)
    return tuple(out)
