"""Host-side batch assembly: graphs -> fixed-shape GraphBatch stream.

TPU-first replacement of the reference's per-batch PyG collation
(torch_geometric DataLoader, reference trainer.py:37-41): we pre-compute
one static (num_nodes, num_edges) budget per (dataset, batch_size) so
every training step reuses a single compiled executable, and pad the
final partial batch with empty graphs.

Budget policy: nodes/edges budgets are the maximum over the epoch's
batches, rounded up to a multiple of 8 (f32 sublane) — bounded memory
waste, zero recompilation.
"""
from __future__ import annotations

import math
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .graph import GraphArrays, GraphBatch, max_in_degree, pad_graphs


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run ``iterator`` in a background thread with a bounded queue so
    host-side batch assembly overlaps device compute (the reference's
    torch DataLoader worker equivalent)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as exc:  # surface errors in the consumer
            q.put((sentinel, exc))
            return
        q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, tuple) and len(item) == 2 and \
                item[0] is sentinel:
            raise item[1]
        yield item


def _round_up(x: int, m: int = 8) -> int:
    return int(math.ceil(max(x, 1) / m) * m)


def max_graph_nodes(graphs: Sequence[GraphArrays]) -> int:
    return max((g.nodes.shape[0] for g in graphs), default=1)


def _measure_pack_budget(graphs: Sequence[GraphArrays], batch_size: int,
                         node_budget: int, margin: float = 1.3,
                         slack: int = 4) -> int:
    """Static Pallas block budget for a loader: pre-pack the epoch-0
    batches and take the measured max with a safety margin (shuffled
    epochs repartition the same graphs, so the per-batch block count
    barely moves).  Capped by the loose analytic worst case.  A batch
    that still overflows raises a clear ValueError from pack_blocks2 —
    rerun without --pallas."""
    from ..ops.pallas.triplet_fused import blocks_budget, pack_blocks2
    worst = 1
    for i in range(0, len(graphs), batch_size):
        chunk = graphs[i:i + batch_size]
        snd, rcv, off = [], [], 0
        for g in chunk:
            snd.append(g.senders + off)
            rcv.append(g.receivers + off)
            off += g.nodes.shape[0]
        if not snd:
            continue
        p = pack_blocks2(np.concatenate(snd), np.concatenate(rcv),
                         node_budget)
        worst = max(worst, len(p.win_start))
    edge_budget = max((sum(sorted((g.senders.shape[0] for g in graphs),
                                  reverse=True)[:batch_size])), 1)
    return min(int(worst * margin) + slack,
               blocks_budget(edge_budget, node_budget))


_PACK_ERR_MARKS = ("blocks > budget", "exceeds window", "> e_block")


def _pad_with_pack_recovery(loader, chunk, num_graphs, node_budget,
                            edge_budget, num_tasks, ell_k,
                            which: str = ""):
    """pad_graphs with Pallas pack-overflow recovery.

    A reshuffled epoch can (rarely) compose a batch whose block packing
    exceeds the measured budget; instead of killing the run mid-epoch
    from the prefetch thread, grow the budget (one recompile) or, when
    the packing is structurally impossible (single-receiver span/edge-run
    overflow), permanently fall back to the XLA segment path for this
    loader.  The trainer's scan-flush handles the mixed batch shapes."""
    pack_attr = f"pack_num_blocks{which}"
    use_attr = f"pallas_pack{which}"
    use = getattr(loader, use_attr)
    try:
        return pad_graphs(chunk, num_graphs, node_budget, edge_budget,
                          num_tasks, ell_k=ell_k, pallas_pack=use,
                          pack_num_blocks=getattr(loader, pack_attr))
    except ValueError as exc:
        if not use or not any(m in str(exc) for m in _PACK_ERR_MARKS):
            raise
    # measure the true block need of this batch
    from ..ops.pallas.triplet_fused import pack_blocks2
    snd, rcv, off = [], [], 0
    for g in chunk:
        snd.append(g.senders + off)
        rcv.append(g.receivers + off)
        off += g.nodes.shape[0]
    try:
        p = pack_blocks2(np.concatenate(snd), np.concatenate(rcv),
                         node_budget)
        grown = int(len(p.win_start) * 1.3) + 4
        print(f"[GraphLoader] pack budget overflow: growing "
              f"{getattr(loader, pack_attr)} -> {grown} (recompiles once)")
        setattr(loader, pack_attr, grown)
    except ValueError as exc:
        print(f"[GraphLoader] unpackable batch ({exc}); falling back to "
              "the XLA segment path for this loader")
        setattr(loader, use_attr, False)
    return pad_graphs(chunk, num_graphs, node_budget, edge_budget,
                      num_tasks, ell_k=ell_k,
                      pallas_pack=getattr(loader, use_attr),
                      pack_num_blocks=getattr(loader, pack_attr))


class GraphLoader:
    """Iterates fixed-shape GraphBatches over a list of featurized graphs.

    shuffle=True reshuffles each epoch with a per-epoch seed (epoch is
    tracked internally; call ``set_epoch`` to override)."""

    def __init__(self, graphs: Sequence[GraphArrays], batch_size: int,
                 num_tasks: int, shuffle: bool = False, seed: int = 0,
                 node_budget: Optional[int] = None,
                 edge_budget: Optional[int] = None,
                 ell_k: Optional[int] = None,
                 pallas_pack: bool = False,
                 n_devices: int = 1):
        self.graphs = list(graphs)
        self.num_tasks = num_tasks
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        # data parallelism: each global batch is split into n_devices
        # contiguous per-device sub-batches, padded independently and
        # stacked along a new leading device axis (consumed by the DP
        # shard_map step).  Trailing slots may be all-padding batches.
        self.n_devices = max(int(n_devices), 1)
        if self.n_devices > 1:
            if batch_size % self.n_devices:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"n_devices {self.n_devices}")
            self.global_batch = batch_size
            batch_size = batch_size // self.n_devices
        else:
            self.global_batch = batch_size
        self.batch_size = batch_size
        self.node_dim = (int(self.graphs[0].nodes.shape[1])
                         if self.graphs else 0)
        self.edge_dim = (int(self.graphs[0].edges.shape[1])
                         if self.graphs and self.graphs[0].edges.ndim == 2
                         else 0)
        if ell_k == "auto":
            # ELL width = max in-degree, rounded up to a multiple of 4.
            # NOTE: measured on TPU v5e, the ELL path's [N, K] gathers
            # lower poorly (50x slower than the segment path), so ELL is
            # opt-in — the receiver-sorted segment path is the default.
            ell_k = _round_up(max_in_degree(self.graphs), 4) \
                if self.graphs else None
        self.ell_k = ell_k
        self.pallas_pack = pallas_pack
        if node_budget is None:
            # worst-case budget: batch_size largest graphs (covers any
            # shuffle order)
            ns = sorted((g.nodes.shape[0] for g in self.graphs), reverse=True)
            node_budget = _round_up(sum(ns[:batch_size]) + 1)
        if edge_budget is None:
            es = sorted((g.senders.shape[0] for g in self.graphs),
                        reverse=True)
            edge_budget = _round_up(max(sum(es[:batch_size]), 1))
        self.node_budget = node_budget
        self.edge_budget = edge_budget
        self.pack_num_blocks = None
        if pallas_pack:
            try:
                self.pack_num_blocks = _measure_pack_budget(
                    self.graphs, batch_size, self.node_budget)
            except ValueError as exc:
                # dataset structurally unpackable (giant graph span /
                # in-degree): 'auto' falls back to the XLA segment path
                print(f"[GraphLoader] Pallas pack unavailable ({exc}); "
                      "using the XLA segment path")
                self.pallas_pack = False

    def __len__(self) -> int:
        return math.ceil(len(self.graphs) / self.global_batch)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _pad_chunk(self, chunk) -> GraphBatch:
        if not chunk:  # trailing all-padding device slot (DP only)
            return pad_graphs([], self.batch_size, self.node_budget,
                              self.edge_budget, self.num_tasks,
                              node_dim=self.node_dim,
                              edge_dim=self.edge_dim)
        return _pad_with_pack_recovery(self, chunk, self.batch_size,
                                       self.node_budget, self.edge_budget,
                                       self.num_tasks, self.ell_k)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        bs, D = self.batch_size, self.n_devices
        for i in range(0, len(order), self.global_batch):
            glob = [self.graphs[j] for j in order[i:i + self.global_batch]]
            if D == 1:
                yield self._pad_chunk(glob)
                continue
            subs = [self._pad_chunk(glob[k * bs:(k + 1) * bs])
                    for k in range(D)]
            import jax
            yield jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *subs)


class PairGraphLoader:
    """Locked-step loader over aligned (g1, g2, y) pair samples.

    Mirrors the reference's ``extract_batch_data`` re-collation
    (src_2gi_ddi/dataset.py:170-176) but with static shapes; labels ride
    on g1.y, g2 carries a copy."""

    def __init__(self, pairs: Sequence[Tuple[GraphArrays, GraphArrays]],
                 batch_size: int, num_tasks: int, shuffle: bool = False,
                 seed: int = 0, pallas_pack1: bool = False,
                 pallas_pack2: bool = False, n_devices: int = 1,
                 budget1: Optional[Tuple[int, int]] = None,
                 budget2: Optional[Tuple[int, int]] = None):
        self.pairs = list(pairs)
        self.n_devices = max(int(n_devices), 1)
        if self.n_devices > 1:
            if batch_size % self.n_devices:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"n_devices {self.n_devices}")
            self.global_batch = batch_size
            batch_size = batch_size // self.n_devices
        else:
            self.global_batch = batch_size
        self.batch_size = batch_size
        self.num_tasks = num_tasks
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.pallas_pack1 = pallas_pack1
        self.pallas_pack2 = pallas_pack2
        self.pack_num_blocks1 = self.pack_num_blocks2 = None
        g1s = [p[0] for p in self.pairs]
        g2s = [p[1] for p in self.pairs]

        def budget(gs):
            ns = sorted((g.nodes.shape[0] for g in gs), reverse=True)
            es = sorted((g.senders.shape[0] for g in gs), reverse=True)
            return (_round_up(sum(ns[:batch_size]) + 1),
                    _round_up(max(sum(es[:batch_size]), 1)))

        # caller-provided (node, edge) budget floors: serving pins these
        # across predict calls so every call reuses ONE compiled
        # executable; elementwise max with the computed worst case keeps
        # padding sufficient for the pairs actually given
        def merge(computed, given):
            if given is None:
                return computed
            return (max(computed[0], int(given[0])),
                    max(computed[1], int(given[1])))

        self.budget1 = merge(budget(g1s), budget1)
        self.budget2 = merge(budget(g2s), budget2)
        self.ell_k1 = None
        self.ell_k2 = None
        for which, gs, budget in (("1", g1s, self.budget1),
                                  ("2", g2s, self.budget2)):
            if not getattr(self, f"pallas_pack{which}"):
                continue
            try:
                setattr(self, f"pack_num_blocks{which}",
                        _measure_pack_budget(gs, batch_size, budget[0]))
            except ValueError as exc:
                print(f"[PairGraphLoader] Pallas pack unavailable for "
                      f"tower {which} ({exc}); using the XLA path")
                setattr(self, f"pallas_pack{which}", False)

    def __len__(self) -> int:
        return math.ceil(len(self.pairs) / self.global_batch)

    def set_epoch(self, epoch: int) -> None:
        """Align the shuffle-replay contract with GraphLoader so resumed
        pair runs continue with the right epoch's batch order."""
        self.epoch = epoch

    def _pad_chunk(self, chunk) -> Tuple[GraphBatch, GraphBatch]:
        def side(graphs, budget, ell_k, which, dims):
            if not graphs:
                return pad_graphs([], self.batch_size, *budget,
                                  self.num_tasks, node_dim=dims[0],
                                  edge_dim=dims[1])
            return _pad_with_pack_recovery(self, graphs, self.batch_size,
                                           *budget, self.num_tasks, ell_k,
                                           which=which)

        d1 = ((self.pairs[0][0].nodes.shape[1],
               self.pairs[0][0].edges.shape[1]) if self.pairs else (0, 0))
        d2 = ((self.pairs[0][1].nodes.shape[1],
               self.pairs[0][1].edges.shape[1]) if self.pairs else (0, 0))
        b1 = side([p[0] for p in chunk], self.budget1, self.ell_k1, "1", d1)
        b2 = side([p[1] for p in chunk], self.budget2, self.ell_k2, "2", d2)
        return b1, b2

    def __iter__(self) -> Iterator[Tuple[GraphBatch, GraphBatch]]:
        order = np.arange(len(self.pairs))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        bs, D = self.batch_size, self.n_devices
        for i in range(0, len(order), self.global_batch):
            glob = [self.pairs[j] for j in order[i:i + self.global_batch]]
            if D == 1:
                yield self._pad_chunk(glob)
                continue
            subs = [self._pad_chunk(glob[k * bs:(k + 1) * bs])
                    for k in range(D)]
            import jax
            yield jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *subs)
