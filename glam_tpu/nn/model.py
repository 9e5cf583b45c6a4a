"""Model architectures (flax.linen).

Unifies the reference's three near-identical model families
(SURVEY.md §7.1):
  Architecture      single molecular graph (src_1gp/model.py:23-65)
  PairArchitecture  two towers with separate weights + per-step
                    cross-graph fusion — covers both the homo-pair DDI
                    model (src_2gi_ddi/model.py:9-61) and the hetero-pair
                    DTI model (src_2gi_dti_scr/model.py:14-68); the DDI
                    case is simply tower2 == another molecule.

Config strings use the reference's exact names so AutoML search-space
configs carry over verbatim (e.g. mol_block='_TripletMessage',
mol_readout='GlobalPool5', graph_norm='_PairNorm', pre_act='RReLU').
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..data.graph import GraphBatch
from .blocks import LinearBlock, MessageBlock
from .fusion import dot_and_global_pool
from .readouts import READOUTS, get_readout


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference run.py:20-38 defaults)."""
    mol_in_dim: int = 15
    mol_edge_in_dim: int = 4
    pro_in_dim: int = 49
    pro_edge_in_dim: int = 8
    hid_dim_alpha: int = 4
    e_dim: int = 1024
    out_dim: int = 1
    mol_block: str = "_NNConv"
    pro_block: str = "_GCNConv"
    message_steps: int = 3
    mol_readout: str = "GlobalPool5"
    pro_readout: str = "GlobalPool5"
    pre_norm: str = "_None"
    graph_norm: str = "_None"
    flat_norm: str = "_None"
    end_norm: str = "_None"
    pre_do: str = "_None()"
    graph_do: str = "Dropout(0.2)"
    flat_do: str = "_None()"
    end_do: str = "Dropout(0.2)"
    pre_act: str = "RReLU"
    graph_act: str = "RReLU"
    flat_act: str = "RReLU"
    end_act: str = "RReLU"
    graph_res: bool = True
    # static per-graph node cap for dense ops (sort-pool / fusion)
    max_nodes: int = 132
    pro_max_nodes: int = 1024

    @property
    def hid_dim(self) -> int:
        return self.mol_in_dim * self.hid_dim_alpha


class _Tower(nn.Module):
    """pre-linear -> message_steps x weight-tied MessageBlock (GRU state
    threaded) -> readout -> flat LinearBlock.

    ``norm_axis``/``bn_stats_weight`` (batched sharded pair path only)
    join the MessageBlock's _BatchNorm statistics across a named vmap
    axis — dense packed-batch parity; see norms.BatchNorm.axis_name."""
    in_dim: int
    edge_dim: int
    hid_dim: int
    flat_out: int
    block: str
    readout: str
    message_steps: int
    cfg: ModelConfig
    max_nodes: int
    norm_axis: Optional[str] = None

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True,
                 return_nodes: bool = False, bn_stats_weight=None):
        c = self.cfg
        common = dict(node_graph=g.node_graph, n_node=g.n_node,
                      node_mask=g.node_mask, deterministic=deterministic)
        x = LinearBlock(self.in_dim, self.hid_dim, norm=c.pre_norm,
                        dropout=c.pre_do, act=c.pre_act, name="lin0")(
                            g.nodes, **common)
        conv = MessageBlock(self.hid_dim, self.hid_dim, self.edge_dim,
                            norm=c.graph_norm, dropout=c.graph_do,
                            conv=self.block, act=c.graph_act,
                            res=c.graph_res, norm_axis=self.norm_axis,
                            name="conv")
        ell = ((g.ell_nbr, g.ell_edge, g.ell_mask)
               if g.ell_nbr is not None else None)
        pack = ((g.pack_perm, g.pack_local, g.pack_snd, g.pack_start,
                 g.pack_mask) if g.pack_perm is not None else None)
        h = None
        xs = []
        for _ in range(self.message_steps):
            x, h = conv(x, g.edges, g.senders, g.receivers, h,
                        node_graph=g.node_graph, n_node=g.n_node,
                        node_mask=g.node_mask, ell=ell, pack=pack,
                        deterministic=deterministic,
                        bn_stats_weight=bn_stats_weight)
            xs.append(x)
        readout, mult = get_readout(self.readout, self.hid_dim,
                                    self.max_nodes)
        out = readout(x, g.node_graph, g.node_pos, g.n_node)
        out = LinearBlock(mult * self.hid_dim, self.flat_out,
                          norm=c.flat_norm, dropout=c.flat_do,
                          act=c.flat_act, name="flat")(
                              out, deterministic=deterministic)
        if return_nodes:
            return out, xs
        return out


class Architecture(nn.Module):
    """Single-graph model (reference src_1gp/model.py:23-65)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True,
                 return_nodes: bool = False):
        c = self.cfg
        res = _Tower(in_dim=c.mol_in_dim, edge_dim=c.mol_edge_in_dim,
                     hid_dim=c.hid_dim, flat_out=c.e_dim, block=c.mol_block,
                     readout=c.mol_readout, message_steps=c.message_steps,
                     cfg=c, max_nodes=c.max_nodes, name="mol")(
                         g, deterministic, return_nodes=return_nodes)
        out = res[0] if return_nodes else res
        out = LinearBlock(c.e_dim, c.out_dim, norm=c.end_norm, dropout=c.end_do,
                          act="_None", name="lin_out1")(
                              out, deterministic=deterministic)
        if return_nodes:
            return out, res[1]
        return out


class PairArchitecture(nn.Module):
    """Two-tower pair model with per-step cross-graph fusion.

    hetero=True uses pro_* dims/config for tower2 (DTI); hetero=False is
    the DDI twin-molecule model (both towers mol-configured, separate
    weights, reference src_2gi_ddi/model.py:22-37)."""
    cfg: ModelConfig
    hetero: bool = False

    @nn.compact
    def __call__(self, g1: GraphBatch, g2: GraphBatch,
                 deterministic: bool = True):
        c = self.cfg
        hid = c.hid_dim
        t1 = _Tower(in_dim=c.mol_in_dim, edge_dim=c.mol_edge_in_dim,
                    hid_dim=hid, flat_out=hid, block=c.mol_block,
                    readout=c.mol_readout, message_steps=c.message_steps,
                    cfg=c, max_nodes=c.max_nodes, name="mol1")
        in2 = c.pro_in_dim if self.hetero else c.mol_in_dim
        e2 = c.pro_edge_in_dim if self.hetero else c.mol_edge_in_dim
        blk2 = c.pro_block if self.hetero else c.mol_block
        ro2 = c.pro_readout if self.hetero else c.mol_readout
        mx2 = c.pro_max_nodes if self.hetero else c.max_nodes
        t2 = _Tower(in_dim=in2, edge_dim=e2, hid_dim=hid, flat_out=hid,
                    block=blk2, readout=ro2, message_steps=c.message_steps,
                    cfg=c, max_nodes=mx2, name="mol2")
        out1, xs1 = t1(g1, deterministic, return_nodes=True)
        out2, xs2 = t2(g2, deterministic, return_nodes=True)
        G = g1.num_graphs
        fusion = [
            dot_and_global_pool(
                x1, x2, g1.node_graph, g1.node_pos, g1.n_node,
                g2.node_graph, g2.node_pos, g2.n_node, G, c.max_nodes, mx2,
                stats5=False)
            for x1, x2 in zip(xs1, xs2)
        ]
        feats = jnp.concatenate([out1, out2] + fusion, axis=-1)
        out = LinearBlock(hid * 2 + 2 * c.message_steps, c.e_dim,
                          norm=c.end_norm, dropout=c.end_do, act=c.end_act,
                          name="lin_out0")(feats, deterministic=deterministic)
        out = LinearBlock(c.e_dim, c.out_dim, norm=c.end_norm,
                          dropout=c.end_do, act="_None", name="lin_out1")(
                              out, deterministic=deterministic)
        return out


_NON_MODEL_ARGS = frozenset([
    "dataset_root", "dataset", "split", "seed", "gpu", "note", "batch_size",
    "epochs", "loss", "optim", "k", "lr", "lr_reduce_rate",
    "lr_reduce_patience", "early_stop_patience", "verbose_patience",
    "split_seed", "test", "n_init_configs", "n_low_fidelity_seed",
    "n_top_blend", "n_high_fidelity_seed",
])


def model_config_from_args(args: dict, **overrides) -> ModelConfig:
    """Build a ModelConfig from a flat config dict, ignoring trainer-level
    keys (parity with reference model_args(), model.py:7-15)."""
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    kwargs = {}
    for k, v in args.items():
        if k in _NON_MODEL_ARGS or k not in fields:
            continue
        if k == "graph_res":
            v = bool(v)
        kwargs[k] = v
    kwargs.update(overrides)
    return ModelConfig(**kwargs)
