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
    """torch.nn.init.kaiming_uniform_ with a=0: bound sqrt(6/fan_in).

    NOTE on torch fan semantics: for a 2D tensor torch takes
    fan_in = size(1) — the reference's TripletMessage Parameters are
    (in, out)-shaped, so torch's "fan_in" is actually the OUT dim there;
    pick ``fan_in_axis`` to reproduce the reference bound exactly."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[fan_in_axis]
        bound = (6.0 / fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_fan(fan_in: int):
    """kaiming_uniform_ with an explicit fan (e.g. torch's 3D fan_in =
    size(1) * prod(size()[2:]))."""

    def init(key, shape, dtype=jnp.float32):
        bound = (6.0 / fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def glorot_uniform_pyg(fan_sum: int):
    """PyG's glorot: U(+-sqrt(6/(size(-2)+size(-1)))), with the summed
    fan passed explicitly (shapes here may be flattened vs PyG's)."""

    def init(key, shape, dtype=jnp.float32):
        bound = (6.0 / fan_sum) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def pyg_uniform(size: int):
    """PyG's uniform(size, tensor): U(+-1/sqrt(size))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (size ** 0.5)
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
