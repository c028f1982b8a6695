"""Checkpointing: native save/load + reference-pickle converter.

Roles:
- Native format: flax msgpack state + JSON model config in a directory —
  the capability of the reference's source-embedding pickles
  (`src/torch_utils/persistence.py:37-134`, snapshots at
  training_loop_v0.py:470-485) without executing embedded code: the config
  (constructor kwargs) rides alongside the weights so a checkpoint is
  self-describing.
- Converter: extracts the state_dict + init kwargs from a reference
  `network-snapshot-*.pkl` WITHOUT running its embedded source (the
  `_reconstruct_persistent_obj` pickle hook is shimmed to a plain
  namespace, cf. legacy.load_network_pkl / eg3dc_v0.py:41-52), then renames
  torch module paths to this framework's flax tree.
"""

from __future__ import annotations

import io
import json
import os
import pickle
import types
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# native format

def save_checkpoint(path: str, variables, config: Optional[dict] = None):
    import flax.serialization

    os.makedirs(path, exist_ok=True)
    # tmp + os.replace: a crash mid-write (saves run on a background thread)
    # must never leave a truncated-but-nonempty state.msgpack that
    # find_resume would accept.
    final = os.path.join(path, "state.msgpack")
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    os.replace(tmp, final)
    if config is not None:
        cfg_final = os.path.join(path, "config.json")
        with open(cfg_final + ".tmp", "w") as f:
            json.dump(config, f, indent=1, default=str)
        os.replace(cfg_final + ".tmp", cfg_final)


def load_checkpoint(path: str, target=None):
    import flax.serialization

    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    cfg_path = os.path.join(path, "config.json")
    config = None
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    if target is not None:
        return flax.serialization.from_bytes(target, data), config
    return flax.serialization.msgpack_restore(data), config


# ---------------------------------------------------------------------------
# reference pickle extraction (no code execution)

class _PersistentStub:
    """Carrier for a persisted torch module's raw state."""

    def __init__(self, meta):
        self.meta = meta

    @property
    def state(self):
        return self.meta["state"]


def _stub_reconstruct(meta):
    return _PersistentStub(meta)


class _RefUnpickler(pickle.Unpickler):
    """Unpickles reference snapshots with persistence + torch shimmed out."""

    def find_class(self, module, name):
        if name == "_reconstruct_persistent_obj":
            return _stub_reconstruct
        if module.startswith("torch"):
            import torch  # cpu torch is available in this environment

            return super().find_class(module, name)
        if module == "dnnlib" or module.startswith("dnnlib."):
            return dict if name == "EasyDict" else super().find_class("builtins", "dict")
        return super().find_class(module, name)


def extract_generator_variables(state):
    """Bare G variables from any checkpoint layout.

    Trainer snapshots hold the full GANTrainState (vars_G/vars_Gema/opt_*);
    converted/exported checkpoints hold bare variables. Inference loaders
    (api/generate/viewer_server/calc_metrics) want G_ema when present —
    mirroring the reference's `G_ema` pickle key (training_loop_v0.py:480)."""
    if isinstance(state, dict) and "vars_Gema" in state:
        return state["vars_Gema"]
    return state


def load_train_state(path: str, template):
    """Restore a GANTrainState, tolerating fields the snapshot predates.

    flax.from_bytes raises on ANY missing dataclass field, so a new state
    field (e.g. r3's pl_mean) would break auto-resume of older snapshots.
    Missing top-level fields keep the template's (freshly initialized)
    value; extra snapshot keys are an error (they signal incompatibility).
    """
    import flax.serialization

    raw, config = load_checkpoint(path)
    tmpl_sd = flax.serialization.to_state_dict(template)
    unknown = set(raw) - set(tmpl_sd)
    if unknown:
        raise ValueError(f"snapshot has unknown state fields: {sorted(unknown)}")
    for k, v in tmpl_sd.items():
        raw.setdefault(k, v)
    return flax.serialization.from_state_dict(template, raw), config


def load_reference_pickle(path: str) -> dict:
    with open(path, "rb") as f:
        return _RefUnpickler(f).load()


def _walk_torch_module_state(stub, prefix="", out=None):
    """Flatten a _PersistentStub tree (mirrors nn.Module state layout:
    _parameters/_buffers/_modules) into {dotted_name: np.ndarray}.

    Nodes can be stubs (persistent classes), plain dicts, or real torch
    nn.Module instances — the reference only decorates top-level network
    classes, so undecorated submodules (e.g. ImportanceRenderer) unpickle
    as live torch modules whose state lives in __dict__."""
    out = {} if out is None else out
    if isinstance(stub, _PersistentStub):
        state = stub.state
    elif isinstance(stub, dict):
        state = stub
    else:
        state = getattr(stub, "__dict__", {})
    params = state.get("_parameters", {}) or {}
    buffers = state.get("_buffers", {}) or {}
    modules = state.get("_modules", {}) or {}
    for k, v in {**params, **buffers}.items():
        if v is None:
            continue
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[prefix + k] = arr
    for k, v in modules.items():
        if v is None:
            continue
        _walk_torch_module_state(v, prefix + k + ".", out)
    return out


def extract_reference_generator(path: str, key: str = "G_ema"):
    """-> (state_dict {torch_name: array}, init_args, init_kwargs, extras).

    The real persistence Decorator stores the ctor arguments as
    `_init_args`/`_init_kwargs` instance attributes (persistence.py:141-143;
    `init_args` is only a property over them), and meta['state'] is the
    module's __getstate__ dict, so the underscore names are what actually
    appear in a reference snapshot."""
    data = load_reference_pickle(path)
    stub = data[key]
    st = stub.state if isinstance(stub, _PersistentStub) else stub.__dict__
    state_dict = _walk_torch_module_state(stub)
    init_args = tuple(st.get("_init_args", st.get("init_args", ())))
    init_kwargs = dict(st.get("_init_kwargs", st.get("init_kwargs", {})))
    extras = {
        k: st[k]
        for k in ("neural_rendering_resolution", "rendering_kwargs")
        if k in st
    }
    return state_dict, init_args, init_kwargs, extras


# reference TriPlaneGenerator named ctor params (triplane.py:30-46); anything
# else in init_kwargs fell into **synthesis_kwargs there and does here too.
_GEN_NAMED_KWARGS = (
    "z_dim", "c_dim", "w_dim", "img_resolution", "img_channels",
    "sr_num_fp16_res", "mapping_kwargs", "rendering_kwargs", "cond_mode",
    "triplane_width", "sr_channels_hidden", "backbone_resolution",
)


def generator_config_from_init_kwargs(init_kwargs: dict,
                                      extras: Optional[dict] = None) -> dict:
    """Reference init_kwargs -> our flax TriPlaneGenerator ctor kwargs.

    Mirrors the reference's own rebuild
    `TriPlaneGenerator(*G.init_args, **G.init_kwargs)` + the attribute
    carry-over of neural_rendering_resolution/rendering_kwargs
    (eg3dc_v0.py:46-52). init_args are always empty in reference snapshots
    (the trainer constructs by keyword, training_loop_v0.py:160-166)."""
    kw = dict(init_kwargs)
    out: Dict[str, Any] = {}
    for k in _GEN_NAMED_KWARGS:
        if k in kw:
            v = kw.pop(k)
            out[k] = dict(v) if isinstance(v, dict) else v
    sr_kwargs = kw.pop("sr_kwargs", {})
    assert not sr_kwargs, f"unsupported sr_kwargs in snapshot: {sr_kwargs}"
    if kw:
        out["synthesis_kwargs"] = kw
    for k in ("neural_rendering_resolution", "rendering_kwargs"):
        if extras and k in extras:
            v = extras[k]
            out[k] = dict(v) if isinstance(v, dict) else v
    return out


# ---------------------------------------------------------------------------
# name mapping torch <-> flax

def flax_path_from_torch(name: str) -> Optional[Tuple[str, ...]]:
    """Map a reference TriPlaneGenerator state_dict name to our tree path.

    Returns (collection, *path) or None for names without an equivalent
    (resample_filter buffers are recomputed constants here).
    """
    parts = name.split(".")
    if parts[-1] == "resample_filter":
        return None
    collection = "params"
    if parts[-1] in ("noise_const", "w_avg"):
        collection = "buffers"
    # decoder.net.{0,2}.x -> decoder/net{0,2}/x
    if len(parts) >= 3 and parts[0] == "decoder" and parts[1] == "net":
        return (collection, "decoder", f"net{parts[2]}", parts[3])
    return (collection, *parts)


def convert_generator_state(state_dict: Dict[str, np.ndarray], flax_template):
    """Rename + verify against an initialized flax variables tree.

    flax_template: the target `variables` (from module.init) used for shape
    checking. Returns a new variables tree with converted weights.
    """
    import jax.numpy as jnp

    def set_path(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def get_path(tree, path):
        node = tree
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    out = {k: {} for k in flax_template}
    converted, missing = [], []
    for name, arr in state_dict.items():
        path = flax_path_from_torch(name)
        if path is None:
            continue
        tpl = get_path(flax_template, path)
        if tpl is None:
            missing.append(name)
            continue
        assert tuple(tpl.shape) == tuple(arr.shape), (
            f"{name}: {arr.shape} vs template {tpl.shape}"
        )
        set_path(out, path, jnp.asarray(arr, dtype=tpl.dtype))
        converted.append(name)

    # anything not covered falls back to the template value
    def fill(dst, src, prefix=()):
        for k, v in src.items():
            if isinstance(v, dict):
                fill(dst.setdefault(k, {}), v, prefix + (k,))
            elif k not in dst:
                dst[k] = v

    fill(out, flax_template)
    return out, converted, missing
