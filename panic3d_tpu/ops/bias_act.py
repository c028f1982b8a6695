"""Fused bias + activation + gain + clamp.

Role of the reference CUDA op `src/torch_utils/ops/bias_act.{cpp,cu,py}`
(semantics from `_bias_act_ref`, bias_act.py:93-122). On TPU this is a plain
jnp expression: XLA fuses the whole chain into the surrounding matmul/conv
epilogue, and autodiff provides first/second-order gradients for free (the
reference needed hand-written grad kernels).
"""

from __future__ import annotations

from typing import NamedTuple, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ActivationSpec(NamedTuple):
    func: Callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jnp.maximum(x, 0.0), 0.0, float(np.sqrt(2))),
    "lrelu": ActivationSpec(
        lambda x, alpha: jnp.where(x >= 0, x, x * alpha), 0.2, float(np.sqrt(2))
    ),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, float(np.sqrt(2))),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add per-channel bias along ``dim``, apply ``act``, scale, clamp.

    Defaults (alpha/gain) follow the reference activation table
    (bias_act.py:23-33); ``clamp=None`` disables clamping.
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        assert b.ndim == 1 and 0 <= dim < x.ndim
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.func(x, jnp.asarray(alpha, dtype=x.dtype))
    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
