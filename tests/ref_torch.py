"""Load the torch reference TriPlaneGenerator on CPU as a parity oracle.

The reference (`/root/reference/_train/eg3dc/src/training/triplane.py`) is
imported as-is; its CUDA ops fall back to their pure-torch ref impls off-GPU
(`ops/bias_act.py:86-88`, `ops/upfirdn2d.py:162-164`). Third-party deps not
present in this venv (kornia, addict, igl, the `_util` star-import helpers)
are stubbed with the minimal surface the generator path touches:
`uutil.Dict`, `uutil.contextlib`, `utorch.einops`, and the
torch/np/scipy/Dict/os names star-imported by
`_databacks/lustrous_renders_v1.py` (camera convention math, used by G.f).
"""

from __future__ import annotations

import contextlib
import os
import sys
import types

REF = "/root/reference"
SRC = os.path.join(REF, "_train", "eg3dc", "src")


class AttrDict(dict):
    """Minimal addict.Dict: attribute access over a plain dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


def load_reference_triplane():
    """-> the reference `training.triplane` module (cached after first load)."""
    if "training.triplane" in sys.modules:
        import training.triplane as t  # type: ignore

        return t

    import numpy as np
    import scipy.spatial.transform  # noqa: F401  (needed by camera math)
    import scipy
    import torch
    import einops

    def stub(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    u = stub("_util")
    u.util_v1 = stub(
        "_util.util_v1",
        Dict=AttrDict,
        np=np,
        torch=torch,
        scipy=scipy,
        os=os,
        contextlib=contextlib,
    )
    u.pytorch_v1 = stub("_util.pytorch_v1", einops=einops, torch=torch)
    u.twodee_v1 = stub("_util.twodee_v1")
    u.threedee_v0 = stub("_util.threedee_v0")
    u.video_v1 = stub("_util.video_v1")
    # kornia is only touched inside paste_front helpers; a bare module
    # satisfies the import. (sobel/erosion parity is tested against our own
    # oracles in test_ops.py.)
    stub("kornia", filters=types.SimpleNamespace(), morphology=types.SimpleNamespace())

    for p in (REF, SRC):
        if p not in sys.path:
            sys.path.insert(0, p)

    import training.triplane as t  # type: ignore

    return t


@contextlib.contextmanager
def deterministic_reference(G):
    """Pin the reference renderer to the quadrature our key=None path uses.

    The reference perturbs stratified depths with `torch.rand_like`
    (renderer.py:314-324) and draws importance samples with `torch.rand`
    (renderer.py:371) even at eval. Our renderer with key=None uses midpoint
    jitter (0.5) and det-linspace importance draws; this context makes the
    reference do the same: rand_like -> 0.5 and sample_pdf(det=True).
    """
    import torch

    orig_rand_like = torch.rand_like
    orig_sample_pdf = G.renderer.sample_pdf

    def half_like(t, **kw):
        return torch.full_like(t, 0.5)

    def det_sample_pdf(bins, weights, n_importance, det=False, eps=1e-5):
        return orig_sample_pdf(bins, weights, n_importance, det=True, eps=eps)

    torch.rand_like = half_like
    G.renderer.sample_pdf = det_sample_pdf
    try:
        yield
    finally:
        torch.rand_like = orig_rand_like
        G.renderer.sample_pdf = orig_sample_pdf
