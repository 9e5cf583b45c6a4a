"""Static-shape batched graph container for TPU.

Design (TPU-first, unlike the reference's ragged PyG ``Batch``):

Variable-size molecular graphs are packed into a single fixed-shape
``GraphBatch`` whose array shapes are determined by the bucket
``(num_graphs, num_nodes, num_edges)`` — so XLA traces/compiles once per
bucket and every op inside ``jit`` sees static shapes.

Padding convention (jraph-style "padding graph"):
  * One extra graph slot (the last one) owns *all* padding nodes and edges.
  * Padded edges connect padding nodes to padding nodes.
  * Consequently, segment reductions over ``node_graph`` / ``receivers`` in
    the hot path need **no masking** — padded contributions land in the
    padding graph / padding node slots and are discarded by ``graph_mask``
    at loss/metric time.  Masks are still carried for the few ops that need
    exact statistics over real elements (BatchNorm, PairNorm, metrics).

Reference parity: this replaces ``torch_geometric.data.Batch`` collation
used throughout the reference (e.g. /root/reference/src_1gp/dataset.py:140,
trainer.py:37-41) with a padded, bucketed equivalent.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class GraphBatch(NamedTuple):
    """A batch of graphs padded to static shapes.

    Shapes (all static under jit): N = padded node count, E = padded edge
    count, G = padded graph count (last slot = padding graph), Fn/Fe = node
    and edge feature widths, T = number of targets.
    """

    nodes: jnp.ndarray        # [N, Fn] float32 node features
    edges: jnp.ndarray        # [E, Fe] float32 edge features
    senders: jnp.ndarray      # [E] int32 source node index of each edge
    receivers: jnp.ndarray    # [E] int32 destination node index of each edge
    node_graph: jnp.ndarray   # [N] int32 graph id of each node
    node_pos: jnp.ndarray     # [N] int32 position of node within its graph
    n_node: jnp.ndarray       # [G] int32 node count per graph (incl. pad graph)
    node_mask: jnp.ndarray    # [N] bool True for real nodes
    edge_mask: jnp.ndarray    # [E] bool True for real edges
    graph_mask: jnp.ndarray   # [G] bool True for real graphs
    y: jnp.ndarray            # [G, T] float32 labels (NaN -> -1 for clf tasks)
    # ELLPACK neighbor layout (TPU fast path): per-node padded incoming
    # neighbor lists.  Molecular graphs have max degree ~4, so attention
    # softmax + aggregation become dense masked reductions over the K
    # axis — no segment scatters in the hot path.  None => segment path.
    ell_nbr: Optional[jnp.ndarray] = None    # [N, K] int32 source node idx
    ell_edge: Optional[jnp.ndarray] = None   # [N, K] int32 edge idx
    ell_mask: Optional[jnp.ndarray] = None   # [N, K] bool real-edge slots
    # Pallas block-packing (ops/pallas/triplet_fused.py): receiver-sorted
    # edge blocks with joint sender+receiver node windows for the fully
    # fused attention kernel.  None => XLA path.
    pack_perm: Optional[jnp.ndarray] = None   # [Ep] int32 edge permutation
    pack_local: Optional[jnp.ndarray] = None  # [Ep] int32 local receiver
    pack_start: Optional[jnp.ndarray] = None  # [nblk] int32 window starts
    pack_mask: Optional[jnp.ndarray] = None   # [Ep] bool real-edge slots
    pack_snd: Optional[jnp.ndarray] = None    # [Ep] int32 local sender

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.n_node.shape[0]


class GraphArrays(NamedTuple):
    """A single un-padded graph as host numpy arrays (featurizer output)."""

    nodes: np.ndarray        # [n, Fn] float32
    edges: np.ndarray        # [e, Fe] float32
    senders: np.ndarray      # [e] int32
    receivers: np.ndarray    # [e] int32
    y: np.ndarray            # [T] float32
    smi: str = ""


def build_ell(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
              k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the ELLPACK incoming-neighbor layout from an edge list.

    Returns (nbr [N,K] sender idx, edge [N,K] edge idx, mask [N,K]).
    Unused slots point at the last (padding) node / edge 0 with mask
    False.  Raises if any node's in-degree exceeds ``k``."""
    nbr = np.full((num_nodes, k), num_nodes - 1, np.int32)
    eid = np.zeros((num_nodes, k), np.int32)
    mask = np.zeros((num_nodes, k), bool)
    fill = np.zeros((num_nodes,), np.int32)
    for e in range(len(senders)):
        r = receivers[e]
        slot = fill[r]
        if slot >= k:
            raise ValueError(
                f"node {r} in-degree exceeds ELL width k={k}")
        nbr[r, slot] = senders[e]
        eid[r, slot] = e
        mask[r, slot] = True
        fill[r] = slot + 1
    return nbr, eid, mask


def max_in_degree(graphs: Sequence["GraphArrays"]) -> int:
    """Max incoming degree over a graph list (for picking ELL width)."""
    best = 1
    for g in graphs:
        if g.senders.shape[0]:
            best = max(best, int(np.bincount(g.receivers).max()))
    return best


def pad_graphs(
    graphs: Sequence[GraphArrays],
    num_graphs: int,
    num_nodes: int,
    num_edges: int,
    num_tasks: Optional[int] = None,
    ell_k: Optional[int] = None,
    pallas_pack: bool = False,
    pack_num_blocks: Optional[int] = None,
    node_dim: Optional[int] = None,
    edge_dim: Optional[int] = None,
) -> GraphBatch:
    """Pack ``graphs`` into one static-shape :class:`GraphBatch`.

    ``num_graphs`` counts only *real* graph slots; one extra padding-graph
    slot is appended, so the result has ``G = num_graphs + 1`` graphs.
    Raises if the batch does not fit the requested budget.  An empty
    ``graphs`` list yields an all-padding batch (graph_mask all False) —
    used by the data-parallel loader for trailing device slots; it
    requires ``node_dim``/``edge_dim``/``num_tasks``.
    """
    g_real = len(graphs)
    if g_real > num_graphs:
        raise ValueError(f"{g_real} graphs > budget {num_graphs}")
    tot_n = sum(g.nodes.shape[0] for g in graphs)
    tot_e = sum(g.senders.shape[0] for g in graphs)
    if tot_n > num_nodes or tot_e > num_edges:
        raise ValueError(
            f"batch needs ({tot_n} nodes, {tot_e} edges) > budget "
            f"({num_nodes}, {num_edges})")
    if not graphs and (node_dim is None or num_tasks is None):
        raise ValueError("empty batch needs node_dim/num_tasks")
    fn = graphs[0].nodes.shape[1] if graphs else node_dim
    fe = (graphs[0].edges.shape[1] if graphs[0].edges.ndim == 2 else 0) \
        if graphs else (edge_dim or 0)
    nt = num_tasks if num_tasks is not None else graphs[0].y.shape[-1]
    G = num_graphs + 1

    from ..chem import native as _native
    # Packer backend by MEASUREMENT (2026-08-20, demo corpus, one
    # process): the vectorized numpy loop beats the ctypes C++ packer at
    # every batch size (bs 16/64/256/512 -> 0.84/0.78/0.55/0.52x native
    # vs python; marshalling overhead dominates and numpy's copies are
    # already memcpy).  Python is therefore the default hot path; set
    # GLAM_NATIVE_PACK=1 to opt into the C++ packer (kept byte-exact
    # tested, tests/test_native.py).
    packed = (_native.pack_batch_native(graphs, num_nodes, num_edges, G,
                                        fn, fe)
              if graphs and _native.pack_enabled() else None)
    if packed is not None:
        # C++ path (native/csrc/glam_native.cpp glam_pack_batch),
        # byte-exact vs the Python loop below (tests/test_native.py)
        (nodes, edges, senders, receivers, node_graph, node_pos,
         node_mask, edge_mask) = packed
        n_off = int(sum(g.nodes.shape[0] for g in graphs))
        e_off = int(sum(g.senders.shape[0] for g in graphs))
    else:
        nodes = np.zeros((num_nodes, fn), np.float32)
        edges = np.zeros((num_edges, fe), np.float32)
        senders = np.full((num_edges,), num_nodes - 1, np.int32)
        receivers = np.full((num_edges,), num_nodes - 1, np.int32)
        node_graph = np.full((num_nodes,), G - 1, np.int32)
        node_pos = np.zeros((num_nodes,), np.int32)
        n_off = 0
        e_off = 0
        for gi, g in enumerate(graphs):
            n, e = g.nodes.shape[0], g.senders.shape[0]
            nodes[n_off:n_off + n] = g.nodes
            if e:
                edges[e_off:e_off + e] = g.edges
                senders[e_off:e_off + e] = g.senders + n_off
                receivers[e_off:e_off + e] = g.receivers + n_off
            node_graph[n_off:n_off + n] = gi
            node_pos[n_off:n_off + n] = np.arange(n, dtype=np.int32)
            n_off += n
            e_off += e
        # padding nodes belong to the padding graph; positions restart
        node_pos[n_off:] = np.arange(num_nodes - n_off, dtype=np.int32)
        node_mask = np.zeros((num_nodes,), bool)
        node_mask[:n_off] = True
        edge_mask = np.zeros((num_edges,), bool)
        edge_mask[:e_off] = True

    n_node = np.zeros((G,), np.int32)
    y = np.full((G, nt), -1.0, np.float32)
    for gi, g in enumerate(graphs):
        n_node[gi] = g.nodes.shape[0]
        y[gi] = np.asarray(g.y, np.float32).reshape(-1)[:nt]
    n_node[G - 1] = num_nodes - n_off
    graph_mask = np.zeros((G,), bool)
    graph_mask[:g_real] = True

    pk = (None,) * 5
    if pallas_pack:
        from ..ops.pallas.triplet_fused import blocks_budget, pack_blocks2
        # pack REAL edges only: the padding-node edge run can exceed the
        # kernel's per-receiver block capacity, and padded messages only
        # ever land in the padding node anyway.  The block count is
        # padded to a static budget (measured by the loader, or the
        # analytic worst case) so every batch of one loader compiles to
        # one shape; all-masked pad blocks are skipped in-kernel.
        if pack_num_blocks is None:
            pack_num_blocks = blocks_budget(num_edges, num_nodes)
        p2 = pack_blocks2(senders[:e_off], receivers[:e_off], num_nodes,
                          num_blocks=pack_num_blocks)
        pk = (jnp.asarray(p2.perm), jnp.asarray(p2.local_rcv),
              jnp.asarray(p2.win_start), jnp.asarray(p2.edge_mask),
              jnp.asarray(p2.local_snd))

    ell_nbr = ell_edge = ell_mask = None
    if ell_k is not None:
        # only real edges participate; padded edges (sender=receiver=last
        # padding node) are excluded so the padding node's list stays empty
        e_real = e_off
        nbr, eid, emask = build_ell(senders[:e_real], receivers[:e_real],
                                    num_nodes, ell_k)
        ell_nbr, ell_edge, ell_mask = (jnp.asarray(nbr), jnp.asarray(eid),
                                       jnp.asarray(emask))

    return GraphBatch(
        nodes=jnp.asarray(nodes), edges=jnp.asarray(edges),
        senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
        node_graph=jnp.asarray(node_graph), node_pos=jnp.asarray(node_pos),
        n_node=jnp.asarray(n_node), node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask), graph_mask=jnp.asarray(graph_mask),
        y=jnp.asarray(y), ell_nbr=ell_nbr, ell_edge=ell_edge,
        ell_mask=ell_mask, pack_perm=pk[0], pack_local=pk[1],
        pack_start=pk[2], pack_mask=pk[3], pack_snd=pk[4])
