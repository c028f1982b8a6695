"""Patch dataset for the line-filler GAN.

Role of `_train/img2img/datasets/rmlineE.py`: pre-extracted 21px patch
pickles at `_data/lustrous/preprocessed/patches/` with keys
{bns: [(fn, loc), ...], images, line_masks, face_hulls} —
`rmlineERA_train.pkl` (render+illustration train patches) and
`rmlineEIA_test.pkl` (illustration test patches). Training samples pair an
illustration patch (real_label 0) with a randomly drawn render patch
(real_label 1) (rmlineE.py:85-104); val yields the illustration patch only
(:105-122); line masks get (1,3) dilation augmentation (:124-131).
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional

import numpy as np


def _as_f32(x):
    x = np.asarray(x)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    return x.astype(np.float32)


def _dilate_np(mask: np.ndarray, k: int) -> np.ndarray:
    """kxk max-filter over the trailing 2 dims (kornia.morphology.dilation
    with a ones kernel, rmlineE.py:128-131)."""
    if k <= 1:
        return mask
    pad = k // 2
    m = np.pad(mask, [(0, 0)] * (mask.ndim - 2) + [(pad, pad), (pad, pad)],
               constant_values=0)
    out = np.zeros_like(mask)
    H, W = mask.shape[-2:]
    for dy in range(k):
        for dx in range(k):
            np.maximum(out, m[..., dy : dy + H, dx : dx + W], out)
    return out


class RMLinePatchDataset:
    """Loads the reference patch pickles (or same-format synthetics)."""

    def __init__(self, base_dir=".", split="train", patch_size=21,
                 augment_dilate_mask=(1, 3), seed=0,
                 path: Optional[str] = None):
        dn = os.path.join(base_dir, "_data", "lustrous", "preprocessed",
                          "patches")
        if path is None:
            path = os.path.join(
                dn, "rmlineERA_train.pkl" if split == "train"
                else "rmlineEIA_test.pkl",
            )
        with open(path, "rb") as f:
            data = pickle.load(f)
        # train: illustration stream + render stream from the same pickle
        # (rmlineE.py:49-56 loads rmlineERA_train.pkl for both)
        self.data_illust = data
        self.data_render = data if split == "train" else None
        self.patch_size = patch_size
        self.augment_dilate_mask = tuple(augment_dilate_mask)
        self.split = split
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.data_illust["bns"])

    def __getitem__(self, idx, det: Optional[bool] = None):
        det = (self.split != "train") if det is None else det
        di = int(idx)
        d_i = self.data_illust
        if self.split == "train":
            d_r = self.data_render
            rlen = len(d_r["bns"])
            dr = di % rlen if det else int(self.rng.choice(rlen))
            ret = {
                "bn": str(idx),
                "image": np.stack([
                    _as_f32(d_i["images"][di]), _as_f32(d_r["images"][dr]),
                ]),
                "line_mask": np.stack([
                    _as_f32(d_i["line_masks"][di]),
                    _as_f32(d_r["line_masks"][dr]),
                ]),
                "face_hull": np.stack([
                    _as_f32(d_i["face_hulls"][di]),
                    _as_f32(d_r["face_hulls"][dr]),
                ]),
                "real_label": np.asarray([0.0, 1.0], np.float32),
            }
        else:
            ret = {
                "bn": str(idx),
                "image": np.stack([_as_f32(d_i["images"][di])]),
                "line_mask": np.stack([_as_f32(d_i["line_masks"][di])]),
                "face_hull": np.stack([_as_f32(d_i["face_hulls"][di])]),
                "real_label": np.asarray([0.0], np.float32),
            }
        if not det:
            dil = int(self.rng.choice(self.augment_dilate_mask))
            if dil > 1:
                ret["line_mask"] = _dilate_np(ret["line_mask"], dil)
        return ret

    def batches(self, batch_size: int) -> Iterator[dict]:
        """Infinite shuffled batches; samples' leading pair axis is folded
        into the batch (each train sample contributes illust+render rows)."""
        order = np.arange(len(self))
        while True:
            self.rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                samples = [self[int(j)] for j in order[i : i + batch_size]]
                out = {}
                for k in samples[0]:
                    if k == "bn":
                        out[k] = [s[k] for s in samples]
                    else:
                        out[k] = np.concatenate([s[k] for s in samples])
                yield out
