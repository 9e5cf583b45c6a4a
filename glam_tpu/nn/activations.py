"""Activation registry with torch-parity semantics.

Resolves the reference's string-valued activation configs ('RReLU',
'CELU', '_None', ...) without ``exec`` (the reference uses
``exec('self.act={}()'.format(act))`` at layer.py:230,249 — SURVEY.md
flags this for replacement by a registry).

RReLU parity note (SURVEY.md §7.3): torch RReLU samples a uniform
negative slope per element in training and uses the mean slope
(lower+upper)/2 in eval; eval mode is deterministic and is what parity
tests compare against.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

RRELU_LOWER = 1.0 / 8.0
RRELU_UPPER = 1.0 / 3.0


def _rrelu(x, *, deterministic: bool, rng: Optional[jax.Array]):
    if deterministic or rng is None:
        return jnp.where(x >= 0, x, x * ((RRELU_LOWER + RRELU_UPPER) / 2.0))
    slope = jax.random.uniform(rng, x.shape, x.dtype, RRELU_LOWER, RRELU_UPPER)
    return jnp.where(x >= 0, x, x * slope)


def celu(x, alpha: float = 1.0):
    # branch-safe: expm1 is only ever evaluated on x <= 0.  The naive
    # where(x >= 0, x, expm1(x)) evaluates expm1 on BOTH branches, and
    # its backward multiplies the (zeroed) false-branch cotangent by
    # exp(x) — inf for x > ~88.7 in f32, so 0 * inf = NaN poisons the
    # whole gradient.  torch's native CELU kernel is branchwise and
    # never hits this; parity requires we don't either.
    return (jnp.maximum(x, 0.0)
            + alpha * jnp.expm1(jnp.minimum(x, 0.0) / alpha))


_ACTS = {
    "_None": lambda x, **_: x,
    "ReLU": lambda x, **_: jax.nn.relu(x),
    "LeakyReLU": lambda x, **_: jnp.where(x >= 0, x, 0.01 * x),
    "CELU": lambda x, **_: celu(x),
    "RReLU": _rrelu,
    "Sigmoid": lambda x, **_: jax.nn.sigmoid(x),
    "PReLU": lambda x, **_: jnp.where(x >= 0, x, 0.25 * x),  # torch init slope
}


def get_activation(name: str) -> Callable:
    """Return act(x, deterministic=..., rng=...) for a config string."""
    key = name.strip().replace("()", "")
    if key not in _ACTS:
        raise KeyError(f"unknown activation {name!r}; have {sorted(_ACTS)}")
    fn = _ACTS[key]

    def apply(x, deterministic: bool = True, rng=None):
        if key == "RReLU":
            return fn(x, deterministic=deterministic, rng=rng)
        return fn(x)

    return apply


def is_stochastic(name: str) -> bool:
    return name.strip().replace("()", "") == "RReLU"
