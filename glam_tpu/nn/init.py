"""Weight initializers matching torch semantics for numerical parity.

The reference initializes TripletMessage weights with torch
``kaiming_uniform_`` (default a=0: bound = sqrt(6 / fan_in), reference
layer.py:29-34) and Linear/GRU layers with torch defaults
(``kaiming_uniform_(a=sqrt(5))`` == U(-1/sqrt(fan_in), 1/sqrt(fan_in))).

Flax kernels are [in, out] (torch stores [out, in]); fan_in is axis 0 of
the flax kernel for a Linear, i.e. the same number either way.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kaiming_uniform(fan_in_axis: int = 0):
    """torch.nn.init.kaiming_uniform_ with a=0 (gain sqrt(2))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[fan_in_axis]
        bound = (6.0 / fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel():
    """torch Linear default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (shape[0] ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias(fan_in: int):
    """torch Linear default bias init (depends on the weight's fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def rnn_uniform(hidden_size: int):
    """torch RNN/GRU/LSTM init: U(-1/sqrt(H), 1/sqrt(H)) for all params."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (hidden_size ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float):
    """torch xavier_uniform_ with explicit gain (reference model.py:17-20)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
