"""Aux-model training: the line-filler patch GAN and the danbooru tagger.

Roles:
- rmline trainer: `_train/img2img/models/rmlineganA.py:150-298` — dual-Adam
  patch pix2pix (generator loss = L1 + label-smoothed BCE on flipped labels,
  discriminator on fake+real with true labels) over 21x21 patch batches
  (`_train/img2img/datasets/rmlineE.py`).
- tagger trainer: `_train/danbooru_tagger/models/kate.py:8-142` — ResNet50
  multi-label BCE with F2 validation metric (provides the pretrained trunk
  used by the feature extractor).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.rmlinegan import RMLineDiscriminator, RMLineGenerator


def rmline_losses(gen: RMLineGenerator, dis: RMLineDiscriminator,
                  lambda_l1=1.0, lambda_adv=1.0, label_smoothing=0.8,
                  lerp_output=True, mask_input=True):
    """Pure loss fns for the patch GAN (rmlineganA.py:174-233)."""

    def _forward_g(vars_g, batch, train):
        img, mask, hull = batch["image"], batch["line_mask"], batch["face_hull"]
        x = img * (1 - mask) if mask_input else img
        stackin = jnp.concatenate([x, hull], axis=1) if gen.use_hull else x
        # training patches are pre-padded (patch_size >= out + 2*depth)
        out, updates = gen.apply(
            vars_g, stackin, train=train,
            mutable=["batch_stats"] if train else [],
        ) if train else (gen.apply(vars_g, stackin, train=False), None)
        return out, updates

    def _dis_logits(vars_d, image, mask, hull, train):
        stackin = jnp.concatenate([image, hull], axis=1) if dis.use_hull else image
        if train:
            return dis.apply(vars_d, stackin, train=True, mutable=["batch_stats"])
        return dis.apply(vars_d, stackin, train=False), None

    def g_loss(params_g, vars_g_rest, vars_d, batch):
        vars_g = {"params": params_g, **vars_g_rest}
        out, updates = _forward_g(vars_g, batch, train=True)
        pred = out
        gt = batch["target"]
        if lerp_output:
            # crop mask/target to generator output size (valid convs shrink)
            crop = (batch["image"].shape[-1] - pred.shape[-1]) // 2
            sl = slice(crop, batch["image"].shape[-1] - crop) if crop else slice(None)
            gt_c = gt[..., sl, sl]
            mask_c = batch["line_mask"][..., sl, sl]
            pred = gt_c + (pred - gt_c) * mask_c
        else:
            gt_c = gt
        loss_l1 = jnp.mean(jnp.abs(pred - gt_c), axis=(1, 2, 3))
        # adversarial: generator wants D to say 'real' (flipped labels)
        crop2 = (batch["face_hull"].shape[-1] - pred.shape[-1]) // 2
        sl2 = slice(crop2, batch["face_hull"].shape[-1] - crop2) if crop2 else slice(None)
        logits, _ = _dis_logits(
            vars_d, pred, None, batch["face_hull"][..., sl2, sl2], train=False
        )
        sm = label_smoothing
        target = jnp.ones_like(logits) * sm + sm / 2
        loss_adv = optax.sigmoid_binary_cross_entropy(logits, target)
        loss = jnp.mean(lambda_l1 * loss_l1 + lambda_adv * loss_adv)
        return loss, (updates, {"g_l1": jnp.mean(loss_l1), "g_adv": jnp.mean(loss_adv)})

    def d_loss(params_d, vars_d_rest, vars_g, batch, real_label):
        vars_d = {"params": params_d, **vars_d_rest}
        out, _ = _forward_g(vars_g, batch, train=False)
        pred = jax.lax.stop_gradient(out)
        crop = (batch["image"].shape[-1] - pred.shape[-1]) // 2
        sl = slice(crop, batch["image"].shape[-1] - crop) if crop else slice(None)
        gt_c = batch["target"][..., sl, sl]
        mask_c = batch["line_mask"][..., sl, sl]
        if lerp_output:
            pred = gt_c + (pred - gt_c) * mask_c
        image = jnp.where(real_label[:, None, None, None] > 0.5, gt_c, pred)
        logits, updates = _dis_logits(
            vars_d, image, None, batch["face_hull"][..., sl, sl], train=True
        )
        sm = label_smoothing
        target = real_label * sm + sm / 2
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))
        return loss, (updates, {"d_bce": loss})

    return g_loss, d_loss


# ---------------------------------------------------------------------------
# tagger (kate)

def tagger_loss(resnet, variables, images, labels, train_key=None):
    """Multi-label BCE over tag logits (kate.py:8-142)."""
    taps = resnet.apply(variables, images, return_taps=True)
    logits = taps["fc"]
    loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
    return loss, logits


def f_beta(logits, labels, beta: float = 2.0, thresh: float = 0.5):
    """F2 validation metric (kate.py)."""
    pred = jax.nn.sigmoid(logits) > thresh
    labels = labels > 0.5
    tp = jnp.sum(pred & labels, axis=-1)
    fp = jnp.sum(pred & ~labels, axis=-1)
    fn = jnp.sum(~pred & labels, axis=-1)
    b2 = beta * beta
    denom = (1 + b2) * tp + b2 * fn + fp
    return jnp.mean(jnp.where(denom > 0, (1 + b2) * tp / denom, 0.0))


# ---------------------------------------------------------------------------
# rmline training loop (rmlineganA.py:209-233,294-298: dual Adam, the
# Lightning alternating-optimizer step collapsed into one jitted step)

def make_rmline_train_step(gen: RMLineGenerator, dis: RMLineDiscriminator,
                           lr_gen: float = 1e-3, lr_dis: float = 1e-3,
                           **loss_kwargs):
    """-> (init_fn, step_fn). step(state, batch) runs the generator update
    then the discriminator update (optimizer_idx 0 then 1) in one jit."""
    g_loss, d_loss = rmline_losses(gen, dis, **loss_kwargs)
    opt_g = optax.adam(lr_gen)
    opt_d = optax.adam(lr_dis)

    def init(vars_g, vars_d):
        return {
            "vars_g": vars_g,
            "vars_d": vars_d,
            "opt_g": opt_g.init(vars_g["params"]),
            "opt_d": opt_d.init(vars_d["params"]),
        }

    @jax.jit
    def step(state, batch):
        batch = dict(batch)
        batch.setdefault("target", batch["image"])
        vars_g, vars_d = state["vars_g"], state["vars_d"]
        rest_g = {k: v for k, v in vars_g.items() if k != "params"}
        rest_d = {k: v for k, v in vars_d.items() if k != "params"}

        (lg, (gupd, gstats)), grads_g = jax.value_and_grad(
            g_loss, has_aux=True
        )(vars_g["params"], rest_g, vars_d, batch)
        updates_g, opt_g_state = opt_g.update(grads_g, state["opt_g"])
        params_g = optax.apply_updates(vars_g["params"], updates_g)
        vars_g = {"params": params_g, **rest_g}
        if gupd:
            vars_g.update(gupd)

        (ld, (dupd, dstats)), grads_d = jax.value_and_grad(
            d_loss, has_aux=True
        )(vars_d["params"], rest_d, vars_g, batch, batch["real_label"])
        updates_d, opt_d_state = opt_d.update(grads_d, state["opt_d"])
        params_d = optax.apply_updates(vars_d["params"], updates_d)
        vars_d = {"params": params_d, **rest_d}
        if dupd:
            vars_d.update(dupd)

        new_state = {"vars_g": vars_g, "vars_d": vars_d,
                     "opt_g": opt_g_state, "opt_d": opt_d_state}
        return new_state, {"g_loss": lg, "d_loss": ld, **gstats, **dstats}

    return init, step


def train_rmline(batches, steps: int, gen=None, dis=None, seed: int = 0,
                 log_every: int = 50, **kw):
    """Drive the patch-GAN for `steps` batches; returns (vars_g, vars_d)."""
    gen = gen or RMLineGenerator()
    dis = dis or RMLineDiscriminator()
    it = iter(batches)
    first = next(it)
    key = jax.random.PRNGKey(seed)
    img = jnp.asarray(first["image"])
    hull = jnp.asarray(first["face_hull"])
    stackin = jnp.concatenate([img, hull], axis=1) if gen.use_hull else img
    vars_g = gen.init(key, stackin, train=False)
    vars_d = dis.init(key, stackin, train=False)
    init, step = make_rmline_train_step(gen, dis, **kw)
    state = init(vars_g, vars_d)

    def to_dev(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "bn"}

    batch = to_dev(first)
    for i in range(steps):
        state, stats = step(state, batch)
        if i % log_every == 0:
            print(f"rmline step {i}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in stats.items()))
        if i + 1 < steps:
            batch = to_dev(next(it))
    return state["vars_g"], state["vars_d"]


# ---------------------------------------------------------------------------
# tagger training loop (kate.py:8-142: Adam + multi-label BCE, F2 validation)

def make_tagger_train_step(resnet, lr: float = 1e-3):
    opt = optax.adam(lr)

    def init(variables):
        return {"vars": variables, "opt": opt.init(variables["params"])}

    @jax.jit
    def step(state, images, labels):
        variables = state["vars"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            loss, logits = tagger_loss(
                resnet, {"params": params, **rest}, images, labels
            )
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = opt.update(grads, state["opt"])
        params = optax.apply_updates(variables["params"], updates)
        new_state = {"vars": {"params": params, **rest}, "opt": opt_state}
        return new_state, {"loss": loss, "f2": f_beta(logits, labels)}

    return init, step
