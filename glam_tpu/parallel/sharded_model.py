"""Full-model inference over ONE giant graph sharded across a mesh.

Takes the parameters of a trained single-device :class:`Architecture`
(mol_block='_TripletMessage', readout='GlobalLAPool', norms '_None',
deterministic activations) and runs the complete forward — pre-linear,
``message_steps`` weight-tied TripletMessage+GRU steps, gated-attention
readout, flat + output heads — with the graph's nodes partitioned over a
mesh axis:

  * each message step all_gathers the projected node features over ICI
    (halo exchange) and aggregates receiver-locally;
  * the GRU state update, residual and activation are node-local;
  * the GlobalLAPool softmax runs across shards with pmax/psum;
  * the head runs replicated on the pooled vector.

This is the scale-out path for graphs too large for one chip (giant
protein contact graphs): train single-device, serve sharded.  Numerical
equivalence with the single-device model is tested on the virtual CPU
mesh (tests/test_sharded_model.py).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .graph_partition import split_large_graph


def _celu(x):
    return jnp.where(x >= 0, x, jnp.expm1(x))


def _gru(p: Dict, x, h):
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def extract_params(arch_params: Dict) -> Dict:
    """Pull the arrays needed for the sharded forward out of a trained
    Architecture param tree (numpy-ified)."""
    mol = arch_params["mol"]
    conv = mol["conv"]["TripletMessage_0"]
    return jax.tree_util.tree_map(jnp.asarray, {
        "lin0": {"kernel": mol["lin0"]["linear"]["kernel"],
                 "bias": mol["lin0"]["linear"]["bias"]},
        "conv": {k: conv[k] for k in
                 ("weight_node", "weight_edge", "weight_triplet_att",
                  "weight_scale", "bias")},
        "gru": {k: mol["conv"]["gru"][k]
                for k in ("w_ih", "w_hh", "b_ih", "b_hh")},
        "gate": {"kernel": mol["readout"]["gate_nn"]["kernel"],
                 "bias": mol["readout"]["gate_nn"]["bias"]},
        "val": {"kernel": mol["readout"]["nn"]["kernel"],
                "bias": mol["readout"]["nn"]["bias"]},
        # note: readouts are named modules ("readout") as of this
        # version; older checkpoints used auto names like GlobalLAPool_0
        "flat": {"kernel": mol["flat"]["linear"]["kernel"],
                 "bias": mol["flat"]["linear"]["bias"]},
        "out": {"kernel": arch_params["lin_out1"]["linear"]["kernel"],
                "bias": arch_params["lin_out1"]["linear"]["bias"]},
    })


def make_sharded_forward(mesh, message_steps: int, heads: int = 3,
                         axis: str = "graph"):
    """Build the jitted sharded forward.

    Returns fn(params, node_shards [D,Nl,F], edge_shards [D,El,Fe],
    senders_global [D,El], receivers_local [D,El], edge_mask [D,El],
    node_mask [D,Nl]) -> scalar prediction [out_dim]."""

    def triplet_step(p, x_local, x_prev_h, edges_l, snd_g, rcv_l, emask,
                     nmask):
        C = x_local.shape[-1]
        H = heads
        xp = x_local @ p["conv"]["weight_node"]          # [Nl, H*C]
        ep = edges_l @ p["conv"]["weight_edge"]          # [El, H*C]
        watt = p["conv"]["weight_triplet_att"]           # [H, 3C]
        xh = xp.reshape(-1, H, C)
        eh = ep.reshape(-1, H, C)
        a_i = jnp.einsum("nhc,hc->nh", xh, watt[:, :C])
        a_j = jnp.einsum("nhc,hc->nh", xh, watt[:, 2 * C:])
        a_e = jnp.einsum("ehc,hc->eh", eh, watt[:, C:2 * C])
        # halo exchange: global tables of projected features + a_j
        xh_all = jax.lax.all_gather(xh, axis).reshape(-1, H, C)
        a_j_all = jax.lax.all_gather(a_j, axis).reshape(-1, H)
        logits = a_i[rcv_l] + a_e + a_j_all[snd_g]       # [El, H]
        logits = jnp.where(logits >= 0, logits, 0.2 * logits)
        logits = jnp.where(emask[:, None], logits, -jnp.inf)
        Nl = x_local.shape[0]
        seg_max = jax.ops.segment_max(logits, rcv_l, num_segments=Nl)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(emask[:, None], jnp.exp(logits - seg_max[rcv_l]),
                       0.0)
        denom = jax.ops.segment_sum(ex, rcv_l, num_segments=Nl)
        alpha = ex / (denom[rcv_l] + 1e-16)
        msg = alpha[:, :, None] * eh * xh_all[snd_g]     # [El, H, C]
        aggr = jax.ops.segment_sum(msg.reshape(-1, H * C), rcv_l,
                                   num_segments=Nl)
        y = aggr @ p["conv"]["weight_scale"] + p["conv"]["bias"]
        # celu -> GRU -> residual -> act (MessageBlock, graph_act=CELU)
        y = _celu(y)
        y = _gru(p["gru"], y, x_prev_h)
        h_new = y
        y = y + x_local
        y = _celu(y)
        return y * nmask[:, None], h_new

    def forward_local(params, nodes_l, edges_l, snd_g, rcv_l, emask,
                      nmask):
        nodes_l = nodes_l[0]
        edges_l = edges_l[0]
        snd_g = snd_g[0]
        rcv_l = rcv_l[0]
        emask = emask[0]
        nmask = nmask[0]
        x = nodes_l @ params["lin0"]["kernel"] + params["lin0"]["bias"]
        x = _celu(x)                                     # pre_act=CELU
        x = x * nmask[:, None]
        h = x
        for _ in range(message_steps):
            x, h = triplet_step(params, x, h, edges_l, snd_g, rcv_l,
                                emask, nmask)
        # GlobalLAPool across shards: softmax(gate) . val
        gate = (x @ params["gate"]["kernel"]
                + params["gate"]["bias"])[:, 0]          # [Nl]
        gate = jnp.where(nmask, gate, -jnp.inf)
        gmax = jax.lax.pmax(jnp.max(gate), axis)
        ex = jnp.where(nmask, jnp.exp(gate - gmax), 0.0)
        denom = jax.lax.psum(jnp.sum(ex), axis) + 1e-16
        val = x @ params["val"]["kernel"] + params["val"]["bias"]
        pooled = jax.lax.psum(jnp.sum(ex[:, None] * val, axis=0),
                              axis) / denom              # [2C]
        out = pooled @ params["flat"]["kernel"] + params["flat"]["bias"]
        out = _celu(out)                                 # flat_act=CELU
        out = out @ params["out"]["kernel"] + params["out"]["bias"]
        return out[None]

    sharded = jax.shard_map(
        forward_local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(axis))
    return jax.jit(lambda p, *a: sharded(p, *a)[0])


def shard_inputs(nodes: np.ndarray, edges: np.ndarray,
                 senders: np.ndarray, receivers: np.ndarray,
                 n_parts: int):
    """Host-side partitioning incl. a real-node mask per shard."""
    nsh, esh, sg, rl, emask = split_large_graph(nodes, edges, senders,
                                                receivers, n_parts)
    N = nodes.shape[0]
    Nl = nsh.shape[1]
    nmask = np.zeros((n_parts, Nl), bool)
    for d in range(n_parts):
        lo = d * Nl
        nmask[d, :max(0, min(Nl, N - lo))] = True
    return nsh, esh, sg, rl, emask, nmask
