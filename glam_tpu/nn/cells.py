"""Shared functional RNN cells — ONE definition site for the GRU/LSTM
math used by both the flax layer library (nn/blocks.py GRUCell,
nn/readouts.py Set2Set) and the functional sharded giant-graph tower
(parallel/sharded_model.py), so torch-parity semantics cannot drift
between the twins (the parity tests in tests/test_layers.py and
tests/test_sharded_model.py both exercise these exact functions).

Parity targets:
  gru_cell  torch GRU (seq len 1): gate order (r, z, n), both bias
            vectors (reference layer.py:247,262 uses torch.nn.GRU).
  lstm_cell torch LSTM cell: gate order (i, f, g, o), both bias
            vectors (PyG Set2Set's torch.nn.LSTM, layer.py:197-220).

Params are plain dicts {"w_ih", "w_hh", "b_ih", "b_hh"} with kernels
laid out input-major ([in, k*H]) so x @ w_ih matches the transposed
torch weight.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def gru_cell(p: Dict, x, h):
    """torch-parity GRU cell: r/z/n gates, n uses r * (h-side affine)."""
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell(p: Dict, inp, h, c):
    """torch-parity LSTM cell -> (h', c'): i/f/g/o gate order."""
    z = inp @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i, f, o = (jax.nn.sigmoid(v) for v in (i, f, o))
    c2 = f * c + i * jnp.tanh(g)
    return o * jnp.tanh(c2), c2
