"""Patch dataset for the line-filler GAN.

Role of `_train/img2img/datasets/rmlineE.py`: pre-extracted 21px patch
pickles (`rmlineERA_{train,val}.pkl`) with line-mask dilation augmentation
(rmlineE.py:17,43-56). Each sample yields (fake, real) pairs for the dual
-optimizer step: image (masked input source), target, line_mask, face_hull,
real_label.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator

import numpy as np

from ..utils.imageops import dilation


def _as_f32(x):
    x = np.asarray(x)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    return x.astype(np.float32)


class RMLinePatchDataset:
    def __init__(self, base_dir=".", split="train", patch_size=21,
                 dilate_max=3, seed=0):
        fn = os.path.join(
            base_dir, "_data", "lustrous", "preprocessed",
            f"rmlineERA_{split}.pkl",
        )
        with open(fn, "rb") as f:
            self.data = pickle.load(f)
        self.patch_size = patch_size
        self.dilate_max = dilate_max
        self.split = split
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.data["image"]) if isinstance(self.data, dict) else len(self.data)

    def __getitem__(self, idx):
        if isinstance(self.data, dict):
            rec = {k: v[idx] for k, v in self.data.items()}
        else:
            rec = self.data[idx]
        image = _as_f32(rec["image"])
        target = _as_f32(rec.get("target", rec["image"]))
        mask = _as_f32(rec["line_mask"])
        hull = _as_f32(rec.get("face_hull", np.zeros_like(mask)))

        # mask-dilation augmentation (train only)
        if self.split == "train" and self.dilate_max > 1:
            import jax.numpy as jnp

            d = int(self.rng.randint(1, self.dilate_max + 1))
            if d > 1:
                mask = np.asarray(
                    dilation(jnp.asarray(mask)[None], d)[0]
                )
        return {
            "image": image,
            "target": target,
            "line_mask": mask,
            "face_hull": hull,
            "real_label": np.float32(rec.get("real_label", 0.0)),
        }

    def batches(self, batch_size: int) -> Iterator[dict]:
        order = np.arange(len(self))
        while True:
            self.rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idxs = order[i : i + batch_size]
                samples = [self[int(j)] for j in idxs]
                yield {
                    k: np.stack([s[k] for s in samples]) for k in samples[0]
                }
