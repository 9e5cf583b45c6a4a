"""Composite blocks: LinearBlock and MessageBlock (flax.linen).

Parity targets:
  LinearBlock  (reference layer.py:223-237): norm -> dropout -> Linear ->
               activation, with norm/dropout/act given as config strings.
  MessageBlock (reference layer.py:240-267): norm -> dropout -> conv ->
               celu -> GRU(state threaded across message steps) ->
               optional residual -> activation.  GRU disabled for
               _GCNConv/_GATConv (layer.py:248).

The reference instantiates these sub-modules with ``exec`` on config
strings; here a small parser resolves 'Dropout(0.2)' / '_None()' etc.
into explicit modules (SURVEY.md: replace exec with registries).
"""
from __future__ import annotations

import re
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import get_activation
from .cells import gru_cell
from .convs import NO_GRU_CONVS, get_conv
from .init import rnn_uniform, torch_linear_bias, torch_linear_kernel
from .norms import get_norm

_DROPOUT_RE = re.compile(r"^Dropout\(\s*(?:p\s*=\s*)?([0-9.]+)\s*\)$")


def parse_dropout(spec: str) -> float:
    """'_None()' -> 0.0, 'Dropout(0.2)' -> 0.2."""
    s = spec.strip()
    if s in ("_None()", "_None", "", "None"):
        return 0.0
    m = _DROPOUT_RE.match(s)
    if not m:
        raise ValueError(f"cannot parse dropout spec {spec!r}")
    return float(m.group(1))


class LinearBlock(nn.Module):
    in_dim: int
    out_dim: int
    norm: str = "_None"
    dropout: str = "_None()"
    act: str = "ReLU()"

    @nn.compact
    def __call__(self, x, *, node_graph=None, node_pos=None, n_node=None,
                 node_mask=None, deterministic: bool = True):
        rate = parse_dropout(self.dropout)
        x = get_norm(self.norm, self.in_dim)(
            x, node_graph=node_graph, node_mask=node_mask, n_node=n_node,
            use_running_average=deterministic)
        if rate > 0.0:
            x = nn.Dropout(rate=rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out_dim, kernel_init=torch_linear_kernel(),
                     bias_init=torch_linear_bias(self.in_dim),
                     name="linear")(x)
        act = get_activation(self.act)
        rng = (self.make_rng("dropout")
               if (not deterministic and self.act.startswith("RReLU"))
               else None)
        return act(x, deterministic=deterministic, rng=rng)


class GRUCell(nn.Module):
    """torch GRU (seq len 1) cell: gate order (r, z, n), both biases."""
    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, h):
        H = self.hidden
        init = rnn_uniform(H)
        params = {
            "w_ih": self.param("w_ih", init, (self.in_dim, 3 * H)),
            "w_hh": self.param("w_hh", init, (H, 3 * H)),
            "b_ih": self.param("b_ih", init, (3 * H,)),
            "b_hh": self.param("b_hh", init, (3 * H,)),
        }
        return gru_cell(params, x, h)


class MessageBlock(nn.Module):
    """``norm_axis``/``bn_stats_weight`` join _BatchNorm statistics
    across a named vmap axis (see norms.BatchNorm.axis_name) — used by
    the batched sharded pair forward for dense packed-batch parity."""
    in_dim: int
    out_dim: int
    edge_dim: int
    norm: str = "_None"
    dropout: str = "Dropout(0.2)"
    conv: str = "_NNConv"
    act: str = "ReLU()"
    res: bool = True
    norm_axis: Optional[str] = None

    @property
    def has_gru(self) -> bool:
        return self.conv.strip() not in NO_GRU_CONVS

    @nn.compact
    def __call__(self, x, edge_attr, senders, receivers, h=None, *,
                 node_graph=None, n_node=None, node_mask=None, ell=None,
                 pack=None, deterministic: bool = True,
                 bn_stats_weight=None):
        rate = parse_dropout(self.dropout)
        identity = x
        if h is None:
            h = x
        y = get_norm(self.norm, self.in_dim, axis_name=self.norm_axis)(
            x, node_graph=node_graph, node_mask=node_mask, n_node=n_node,
            use_running_average=deterministic,
            stats_weight=bn_stats_weight)
        if rate > 0.0:
            y = nn.Dropout(rate=rate, deterministic=deterministic)(y)
        conv_mod = get_conv(self.conv, self.in_dim, self.out_dim,
                            self.edge_dim)
        if self.conv.strip() == "_TripletMessage":
            y = conv_mod(y, edge_attr, senders, receivers, ell=ell,
                         pack=pack)
        else:
            y = conv_mod(y, edge_attr, senders, receivers, ell=ell)
        if self.has_gru:
            y = get_activation("CELU")(y)
            y = GRUCell(in_dim=self.in_dim, hidden=self.out_dim,
                        name="gru")(y, h)
            h = y
        if self.res:
            y = y + identity
        act = get_activation(self.act)
        rng = (self.make_rng("dropout")
               if (not deterministic and self.act.startswith("RReLU"))
               else None)
        y = act(y, deterministic=deterministic, rng=rng)
        return y, h
