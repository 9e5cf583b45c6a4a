"""Edge-partitioned graph parallelism: scale in the *edges* dimension.

The reference has nothing distributed (SURVEY.md §2.c); BASELINE.json's
north star asks for edge-partitioned graphs across a TPU slice with
boundary-node ("halo") feature exchange over ICI overlapped with local
aggregation — the graph analog of context parallelism.

Design (v1, all-gather halo):
  * nodes are partitioned into D contiguous shards along graph
    boundaries (graphs never straddle shards, so per-graph norms /
    readouts stay local);
  * each shard owns the edges whose RECEIVER is local; senders are
    global indices into the all-gathered node table;
  * one step = all_gather(local node features over the mesh axis)  ->
    dense local ELL aggregation against the gathered table.  XLA
    schedules the all-gather on ICI and overlaps it with the local
    projection matmuls.

A fancier all-to-all boundary-only exchange drops the bandwidth from
O(N) to O(boundary); for molecular batches the all-gather is already
small (N*C*4 bytes), so v1 favors simplicity and XLA overlap.

Host-side: :func:`partition_graphs` assigns graphs to shards balancing
edge counts (LPT greedy), then builds one padded GraphBatch per shard
with *global* sender ids.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import GraphArrays, GraphBatch, pad_graphs
from .data_parallel import stack_batches


def partition_graphs(graphs: Sequence[GraphArrays], n_parts: int,
                     num_tasks: int = 1) -> GraphBatch:
    """Partition a list of graphs into ``n_parts`` balanced shards.

    Returns a stacked GraphBatch whose arrays have a leading shard axis
    [D, ...].  Senders/receivers are LOCAL to each shard (contiguous
    partitioning keeps all edges intra-shard — the halo exchange becomes
    necessary only for the cross-shard *model* dimension, handled by the
    sharded step below for partitioned single large graphs)."""
    # LPT greedy: biggest graphs first onto the lightest shard
    order = np.argsort([-g.senders.shape[0] for g in graphs])
    shards: List[List[GraphArrays]] = [[] for _ in range(n_parts)]
    load = np.zeros(n_parts, np.int64)
    for i in order:
        s = int(np.argmin(load))
        shards[s].append(graphs[i])
        load[s] += graphs[i].senders.shape[0] + 1
    g_budget = max(len(s) for s in shards)
    n_budget = max(sum(g.nodes.shape[0] for g in s) for s in shards) + 8
    e_budget = max(max(sum(g.senders.shape[0] for g in s)
                       for s in shards), 1)
    n_budget = -(-n_budget // 8) * 8
    e_budget = -(-e_budget // 8) * 8
    batches = [pad_graphs(s, g_budget, n_budget, e_budget, num_tasks,
                          ell_k=None) for s in shards]
    return stack_batches(batches)


def split_large_graph(nodes: np.ndarray, edges: np.ndarray,
                      senders: np.ndarray, receivers: np.ndarray,
                      n_parts: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]:
    """Split ONE large graph into node shards + receiver-partitioned
    edge shards with GLOBAL sender ids (for the halo-exchange step).

    Returns (node_shards [D, Nl, F], edge_shards [D, El, Fe],
    senders_global [D, El], receivers_local [D, El], edge_mask [D, El]).
    Padding edges point at local node 0 with mask False."""
    N = nodes.shape[0]
    Nl = -(-N // n_parts)
    Nl = -(-Nl // 8) * 8
    node_shards = np.zeros((n_parts, Nl, nodes.shape[1]), np.float32)
    for d in range(n_parts):
        chunk = nodes[d * Nl:(d + 1) * Nl]
        node_shards[d, :chunk.shape[0]] = chunk
    owner = receivers // Nl
    counts = np.bincount(owner, minlength=n_parts)
    El = -(-int(counts.max()) // 8) * 8 if len(senders) else 8
    e_sh = np.zeros((n_parts, El, edges.shape[1]), np.float32)
    s_g = np.zeros((n_parts, El), np.int32)
    r_l = np.zeros((n_parts, El), np.int32)
    mask = np.zeros((n_parts, El), bool)
    fill = np.zeros(n_parts, np.int64)
    for e in range(len(senders)):
        d = int(owner[e])
        k = fill[d]
        e_sh[d, k] = edges[e]
        s_g[d, k] = senders[e]
        r_l[d, k] = receivers[e] - d * Nl
        mask[d, k] = True
        fill[d] += 1
    return node_shards, e_sh, s_g, r_l, mask


def make_halo_message_step(mesh, axis: str = "graph"):
    """Sharded triplet-style aggregation over a partitioned large graph.

    Returns step(params, node_shards, edge_shards, senders_global,
    receivers_local, edge_mask) -> new local node features, where params
    is a dict with 'weight_node' [C, C] and 'weight_att' [3C] (a
    single-head triplet attention, demonstrating the halo pattern; the
    full conv family reuses the same exchange)."""
    from jax.sharding import PartitionSpec as P

    def local_step(params, nodes_l, edges_l, snd_g, rcv_l, emask):
        nodes_l = nodes_l[0]      # strip local shard axis
        edges_l = edges_l[0]
        snd_g = snd_g[0]
        rcv_l = rcv_l[0]
        emask = emask[0]
        C = nodes_l.shape[-1]
        xp_l = nodes_l @ params["weight_node"]       # local projection
        # halo exchange: gather every shard's projected features over ICI
        xp_all = jax.lax.all_gather(xp_l, axis)      # [D, Nl, C]
        xp_all = xp_all.reshape(-1, C)               # global node table
        w = params["weight_att"]
        a_i = xp_l @ w[:C]
        a_j = xp_all @ w[2 * C:]
        a_e = edges_l @ params["weight_edge"]
        logits = a_i[rcv_l] + a_e + a_j[snd_g]
        logits = jnp.where(emask, logits, -jnp.inf)
        # segment softmax over local receivers
        Nl = nodes_l.shape[0]
        seg_max = jax.ops.segment_max(logits, rcv_l, num_segments=Nl)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(emask, jnp.exp(logits - seg_max[rcv_l]), 0.0)
        denom = jax.ops.segment_sum(ex, rcv_l, num_segments=Nl)
        alpha = ex / (denom[rcv_l] + 1e-16)
        msg = alpha[:, None] * xp_all[snd_g]
        out = jax.ops.segment_sum(msg, rcv_l, num_segments=Nl)
        return out[None]  # restore shard axis

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    return jax.jit(sharded)


def init_halo_params(rng, channels: int, edge_channels: int):
    k1, k2, k3 = jax.random.split(rng, 3)
    bound = (6.0 / channels) ** 0.5
    return {
        "weight_node": jax.random.uniform(k1, (channels, channels),
                                          jnp.float32, -bound, bound),
        "weight_att": jax.random.uniform(k2, (3 * channels,), jnp.float32,
                                         -bound, bound),
        "weight_edge": jax.random.uniform(k3, (edge_channels,),
                                          jnp.float32, -bound, bound),
    }


def reference_halo_step(params, nodes, edges, senders, receivers,
                        edge_mask=None):
    """Single-device oracle for make_halo_message_step."""
    C = nodes.shape[-1]
    xp = nodes @ params["weight_node"]
    w = params["weight_att"]
    a_i = xp @ w[:C]
    a_j = xp @ w[2 * C:]
    a_e = edges @ params["weight_edge"]
    logits = a_i[receivers] + a_e + a_j[senders]
    if edge_mask is not None:
        logits = jnp.where(edge_mask, logits, -jnp.inf)
    N = nodes.shape[0]
    seg_max = jax.ops.segment_max(logits, receivers, num_segments=N)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(logits - seg_max[receivers])
    if edge_mask is not None:
        ex = jnp.where(edge_mask, ex, 0.0)
    denom = jax.ops.segment_sum(ex, receivers, num_segments=N)
    alpha = ex / (denom[receivers] + 1e-16)
    return jax.ops.segment_sum(alpha[:, None] * xp[senders], receivers,
                               num_segments=N)
