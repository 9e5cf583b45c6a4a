"""Graph readout (pooling) layers (flax.linen).

Parity targets (reference layer.py:197-220, model.py:41):
  GlobalPool5   concat[mean_pool, add_pool, sort_pool(k=3)] -> 5C
  GlobalLAPool  PyG GlobalAttention(gate=Linear(C,1), nn=Linear(C,2C)) -> 2C
  Set2Set       PyG Set2Set(processing_steps=3) -> 2C (LSTM readout)

Shapes: x [N, C] flat padded nodes -> out [G, k*C].  All use the
padding-graph convention; sort-pool additionally needs ``node_pos`` and a
static per-graph node cap (``max_nodes``) to build its dense view.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import (segment_count, segment_softmax, segment_sum,
                           segment_topk_by_channel)
from .cells import lstm_cell
from .init import rnn_uniform, torch_linear_bias, torch_linear_kernel


class GlobalPool5(nn.Module):
    """[mean, sum, top-3-by-last-channel] concat readout -> 5C."""
    channels: int
    max_nodes: int = 128
    k: int = 3

    @nn.compact
    def __call__(self, x, node_graph, node_pos, n_node):
        G = n_node.shape[0]
        total = segment_sum(x, node_graph, G)
        cnt = jnp.maximum(n_node.astype(x.dtype), 1.0)[:, None]
        mean = total / cnt
        topk = segment_topk_by_channel(x, node_graph, node_pos, G,
                                       self.max_nodes, self.k)
        return jnp.concatenate([mean, total, topk], axis=-1)


class GlobalLAPool(nn.Module):
    """Gated attention pool: softmax(gate(x)) weighted sum of nn(x) -> 2C."""
    channels: int
    max_nodes: int = 128

    @nn.compact
    def __call__(self, x, node_graph, node_pos, n_node):
        G = n_node.shape[0]
        gate = nn.Dense(1, kernel_init=torch_linear_kernel(),
                        bias_init=torch_linear_bias(self.channels),
                        name="gate_nn")(x)[:, 0]
        val = nn.Dense(2 * self.channels, kernel_init=torch_linear_kernel(),
                       bias_init=torch_linear_bias(self.channels),
                       name="nn")(x)
        alpha = segment_softmax(gate, node_graph, G)
        return segment_sum(alpha[:, None] * val, node_graph, G)


class Set2Set(nn.Module):
    """PyG Set2Set with processing_steps=3: LSTM(2C -> C) attention readout.

    q_star_0 = 0; for t in 1..T:
      q, (h,c) = LSTM(q_star, (h,c));  e_i = <x_i, q_{graph(i)}>
      a = segment_softmax(e);  r_g = Σ a_i x_i;  q_star = [q, r]
    Output q_star [G, 2C].  torch LSTM gate order (i, f, g, o), both
    biases, weights U(-1/sqrt(C), 1/sqrt(C)).
    """
    channels: int
    max_nodes: int = 128
    processing_steps: int = 3

    @nn.compact
    def __call__(self, x, node_graph, node_pos, n_node):
        C = self.channels
        G = n_node.shape[0]
        init = rnn_uniform(C)
        lstm_params = {
            "w_ih": self.param("lstm_w_ih", init, (2 * C, 4 * C)),
            "w_hh": self.param("lstm_w_hh", init, (C, 4 * C)),
            "b_ih": self.param("lstm_b_ih", init, (4 * C,)),
            "b_hh": self.param("lstm_b_hh", init, (4 * C,)),
        }
        q_star = jnp.zeros((G, 2 * C), x.dtype)
        h = jnp.zeros((G, C), x.dtype)
        c = jnp.zeros((G, C), x.dtype)
        for _ in range(self.processing_steps):
            q, c = lstm_cell(lstm_params, q_star, h, c)
            h = q
            e = jnp.sum(x * q[node_graph], axis=-1)          # [N]
            a = segment_softmax(e, node_graph, G)
            r = segment_sum(a[:, None] * x, node_graph, G)   # [G, C]
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


READOUTS = {
    "GlobalPool5": (GlobalPool5, 5),
    "GlobalLAPool": (GlobalLAPool, 2),
    "Set2Set": (Set2Set, 2),
}


def get_readout(name: str, channels: int, max_nodes: int,
                module_name: str = "readout"):
    key = name.strip()
    if key not in READOUTS:
        raise KeyError(f"unknown readout {name!r}; have {sorted(READOUTS)}")
    cls, mult = READOUTS[key]
    return cls(channels=channels, max_nodes=max_nodes,
               name=module_name), mult
