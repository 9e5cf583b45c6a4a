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
from typing import List, Optional, Sequence, Tuple

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
                      n_parts: int, node_budget: int = 0,
                      edge_budget: int = 0
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]:
    """Split ONE large graph into node shards + receiver-partitioned
    edge shards with GLOBAL sender ids (for the halo-exchange step).

    Returns (node_shards [D, Nl, F], edge_shards [D, El, Fe],
    senders_global [D, El], receivers_local [D, El], edge_mask [D, El]).
    Padding edges point at local node 0 with mask False.

    ``node_budget`` / ``edge_budget`` set FLOORS on the global node
    count and the per-shard edge slot count, so graphs of different
    sizes can share ONE padded shape (and therefore one compiled
    executable).  Padding node slots carry zeros and are masked by the
    consumer's node mask (shard_inputs nmask uses the TRUE node count)."""
    N = nodes.shape[0]
    Np = max(N, int(node_budget))
    Nl = -(-Np // n_parts)
    Nl = -(-Nl // 8) * 8
    node_shards = np.zeros((n_parts, Nl, nodes.shape[1]), np.float32)
    for d in range(n_parts):
        chunk = nodes[d * Nl:(d + 1) * Nl]
        node_shards[d, :chunk.shape[0]] = chunk
    owner = receivers // Nl
    counts = np.bincount(owner, minlength=n_parts)
    El = -(-int(counts.max()) // 8) * 8 if len(senders) else 8
    El = max(El, -(-int(edge_budget) // 8) * 8 if edge_budget else 8)
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


def build_halo_exchange(senders_global: np.ndarray, edge_mask: np.ndarray,
                        n_local: int, halo_budget: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Host-side plan for the boundary-only (v2) halo exchange.

    Given receiver-partitioned edges with GLOBAL sender ids
    (``split_large_graph`` output: senders_global [D, El],
    edge_mask [D, El]; shard d owns global nodes
    [d*n_local, (d+1)*n_local)), computes, for every ordered shard pair
    (src s -> dst d), the set of s-local nodes d's edges reference.

    Returns
      send_idx  [D, D, H]  for source shard s: send_idx[s, d] are the
                           s-LOCAL node ids to ship to shard d
      send_mask [D, D, H]  True for real halo slots
      senders_local [D, El] edge senders remapped into shard-d's
                           concatenated table [local (n_local) ;
                           halo from shard 0 (H) ; ... ; shard D-1 (H)]
      H                    halo budget per shard pair (max boundary
                           size, rounded up to 8)

    Bandwidth per step becomes O(D*H*C) instead of the v1 all-gather's
    O(D*n_local*C); for graphs partitioned along locality (contact maps,
    molecular batches) H << n_local."""
    D, El = senders_global.shape
    need: List[List[List[int]]] = [[[] for _ in range(D)]
                                   for _ in range(D)]  # [src][dst]
    pos: List[dict] = [dict() for _ in range(D)]  # dst -> {global: slot}
    for d in range(D):
        for e in range(El):
            if not edge_mask[d, e]:
                continue
            g = int(senders_global[d, e])
            s = g // n_local
            if s == d:
                continue
            if g not in pos[d]:
                pos[d][g] = len(need[s][d])
                need[s][d].append(g - s * n_local)
    H = max((len(lst) for row in need for lst in row), default=0)
    H = max(-(-H // 8) * 8, 8)
    if halo_budget:  # shared-shape floor (see split_large_graph)
        H = max(H, -(-int(halo_budget) // 8) * 8)
    send_idx = np.zeros((D, D, H), np.int32)
    send_mask = np.zeros((D, D, H), bool)
    for s in range(D):
        for d in range(D):
            lst = need[s][d]
            send_idx[s, d, :len(lst)] = lst
            send_mask[s, d, :len(lst)] = True
    senders_local = np.zeros((D, El), np.int32)
    for d in range(D):
        for e in range(El):
            if not edge_mask[d, e]:
                continue
            g = int(senders_global[d, e])
            s = g // n_local
            if s == d:
                senders_local[d, e] = g - d * n_local
            else:
                senders_local[d, e] = n_local + s * H + pos[d][g]
    return send_idx, send_mask, senders_local, H


def build_halo_exchange_ring(senders_global: np.ndarray,
                             edge_mask: np.ndarray, n_local: int,
                             budget_floors: Optional[tuple] = None
                             ) -> Tuple[tuple, tuple, np.ndarray]:
    """Ring-compacted (v3) halo plan: one ``ppermute`` per ring distance
    with a PER-DISTANCE budget, instead of the v2 ``all_to_all``'s single
    global budget.

    The v2 exchange ships D*H rows per shard per step where H is the max
    boundary over ALL ordered shard pairs.  For contiguously partitioned
    banded graphs (contact maps) nearly all halo traffic is between
    ADJACENT shards, so distant pairs inflate to the same H they never
    fill — the analytic model measured ~6x padding at L=900 / 8 shards.
    Here every ring distance k (shard s -> (s+k) % D) gets its own
    budget H_k = max over s of that pair's boundary (rounded up to 8; 0
    skips the permute entirely), cutting ICI bytes from O(D*H*C) to
    O(sum_k H_k * C).

    Returns
      send_idxs  tuple of [D, H_k] int32, k = 1..D-1 — for source shard
                 s, ``send_idxs[k-1][s]`` are the s-LOCAL node ids to
                 ship to shard (s+k) % D
      budgets    tuple of H_k
      senders_local [D, El] — edge senders remapped into shard d's
                 concatenated table [local (n_local) ; dist-1 halo
                 (H_1, from shard (d-1)%D) ; dist-2 halo (H_2) ; ...]
    """
    D, El = senders_global.shape
    need: List[List[List[int]]] = [[[] for _ in range(D)]
                                   for _ in range(D)]  # [src][dst]
    pos: List[dict] = [dict() for _ in range(D)]  # dst -> {global: slot}
    for d in range(D):
        for e in range(El):
            if not edge_mask[d, e]:
                continue
            g = int(senders_global[d, e])
            s = g // n_local
            if s == d:
                continue
            if g not in pos[d]:
                pos[d][g] = len(need[s][d])
                need[s][d].append(g - s * n_local)
    budgets = []
    for k in range(1, D):
        h = max(len(need[s][(s + k) % D]) for s in range(D))
        b = -(-h // 8) * 8 if h else 0
        if budget_floors is not None:  # shared-shape floor per distance
            b = max(b, int(budget_floors[k - 1]))
        budgets.append(b)
    send_idxs = []
    for k in range(1, D):
        idx = np.zeros((D, budgets[k - 1]), np.int32)
        for s in range(D):
            lst = need[s][(s + k) % D]
            idx[s, :len(lst)] = lst
        send_idxs.append(idx)
    # table offset of the distance-k section
    offs = np.concatenate([[0], np.cumsum(budgets)]) + n_local
    senders_local = np.zeros((D, El), np.int32)
    for d in range(D):
        for e in range(El):
            if not edge_mask[d, e]:
                continue
            g = int(senders_global[d, e])
            s = g // n_local
            if s == d:
                senders_local[d, e] = g - d * n_local
            else:
                k = (d - s) % D
                senders_local[d, e] = offs[k - 1] + pos[d][g]
    return tuple(send_idxs), tuple(budgets), senders_local


def make_halo_message_step_v2(mesh, axis: str = "graph"):
    """Boundary-only halo exchange (v2): each shard gathers just the
    projected features its neighbors need (host-planned send_idx) and
    swaps them with one ``all_to_all`` over ICI; aggregation then runs
    against the small [n_local + D*H] table instead of the v1 gathered
    global table.  Same math as :func:`make_halo_message_step` —
    oracle-parity tested against :func:`reference_halo_step`."""
    from jax.sharding import PartitionSpec as P

    def local_step(params, nodes_l, edges_l, snd_l, rcv_l, emask,
                   send_idx):
        nodes_l = nodes_l[0]
        edges_l = edges_l[0]
        snd_l = snd_l[0]
        rcv_l = rcv_l[0]
        emask = emask[0]
        send_idx = send_idx[0]                       # [D, H]
        C = nodes_l.shape[-1]
        xp_l = nodes_l @ params["weight_node"]       # local projection
        send = xp_l[send_idx]                        # [D, H, C] halo out
        # one all-to-all on ICI: shard s's send[d] lands on shard d as
        # halo[s] — O(D*H*C) bytes vs the v1 all-gather's O(D*Nl*C)
        halo = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=False)       # [D, H, C]
        table = jnp.concatenate([xp_l, halo.reshape(-1, C)], axis=0)
        w = params["weight_att"]
        a_i = xp_l @ w[:C]
        a_j = table @ w[2 * C:]
        a_e = edges_l @ params["weight_edge"]
        logits = a_i[rcv_l] + a_e + a_j[snd_l]
        logits = jnp.where(emask, logits, -jnp.inf)
        Nl = nodes_l.shape[0]
        seg_max = jax.ops.segment_max(logits, rcv_l, num_segments=Nl)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(emask, jnp.exp(logits - seg_max[rcv_l]), 0.0)
        denom = jax.ops.segment_sum(ex, rcv_l, num_segments=Nl)
        alpha = ex / (denom[rcv_l] + 1e-16)
        msg = alpha[:, None] * table[snd_l]
        out = jax.ops.segment_sum(msg, rcv_l, num_segments=Nl)
        return out[None]

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
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
