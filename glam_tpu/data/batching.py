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


class GraphLoader:
    """Iterates fixed-shape GraphBatches over a list of featurized graphs.

    shuffle=True reshuffles each epoch with a per-epoch seed (epoch is
    tracked internally; call ``set_epoch`` to override)."""

    def __init__(self, graphs: Sequence[GraphArrays], batch_size: int,
                 num_tasks: int, shuffle: bool = False, seed: int = 0,
                 node_budget: Optional[int] = None,
                 edge_budget: Optional[int] = None,
                 ell_k: Optional[int] = None,
                 pallas_pack: bool = False):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.num_tasks = num_tasks
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
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

    def __len__(self) -> int:
        return math.ceil(len(self.graphs) / self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        for i in range(0, len(order), self.batch_size):
            chunk = [self.graphs[j] for j in order[i:i + self.batch_size]]
            yield pad_graphs(chunk, self.batch_size, self.node_budget,
                             self.edge_budget, self.num_tasks,
                             ell_k=self.ell_k,
                             pallas_pack=self.pallas_pack)


class PairGraphLoader:
    """Locked-step loader over aligned (g1, g2, y) pair samples.

    Mirrors the reference's ``extract_batch_data`` re-collation
    (src_2gi_ddi/dataset.py:170-176) but with static shapes; labels ride
    on g1.y, g2 carries a copy."""

    def __init__(self, pairs: Sequence[Tuple[GraphArrays, GraphArrays]],
                 batch_size: int, num_tasks: int, shuffle: bool = False,
                 seed: int = 0):
        self.pairs = list(pairs)
        self.batch_size = batch_size
        self.num_tasks = num_tasks
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        g1s = [p[0] for p in self.pairs]
        g2s = [p[1] for p in self.pairs]

        def budget(gs):
            ns = sorted((g.nodes.shape[0] for g in gs), reverse=True)
            es = sorted((g.senders.shape[0] for g in gs), reverse=True)
            return (_round_up(sum(ns[:batch_size]) + 1),
                    _round_up(max(sum(es[:batch_size]), 1)))

        self.budget1 = budget(g1s)
        self.budget2 = budget(g2s)
        self.ell_k1 = None
        self.ell_k2 = None

    def __len__(self) -> int:
        return math.ceil(len(self.pairs) / self.batch_size)

    def __iter__(self) -> Iterator[Tuple[GraphBatch, GraphBatch]]:
        order = np.arange(len(self.pairs))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        for i in range(0, len(order), self.batch_size):
            chunk = [self.pairs[j] for j in order[i:i + self.batch_size]]
            b1 = pad_graphs([p[0] for p in chunk], self.batch_size,
                            *self.budget1, self.num_tasks,
                            ell_k=self.ell_k1)
            b2 = pad_graphs([p[1] for p in chunk], self.batch_size,
                            *self.budget2, self.num_tasks,
                            ell_k=self.ell_k2)
            yield b1, b2
