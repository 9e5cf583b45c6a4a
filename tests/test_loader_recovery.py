"""Loader robustness: Pallas pack-budget overflow recovery + pair-loader
shuffle replay (round-2 advisor findings)."""
import numpy as np
import pytest

from glam_tpu.data.batching import GraphLoader, PairGraphLoader
from glam_tpu.data.graph import GraphArrays

from conftest import graphs_from_smiles, SMILES_SET


def _star_graph(n_leaves: int) -> GraphArrays:
    """High-in-degree hub graph: many senders into node 0 (stresses the
    pack block budget: each receiver run must fit one block)."""
    snd = np.arange(1, n_leaves + 1, dtype=np.int32)
    rcv = np.zeros(n_leaves, np.int32)
    # bidirectional like molecular graphs
    senders = np.concatenate([snd, rcv]).astype(np.int32)
    receivers = np.concatenate([rcv, snd]).astype(np.int32)
    n = n_leaves + 1
    return GraphArrays(nodes=np.random.RandomState(n).rand(n, 15)
                       .astype(np.float32),
                       edges=np.ones((2 * n_leaves, 4), np.float32),
                       senders=senders, receivers=receivers,
                       y=np.ones(1, np.float32), smi="star")


class TestPackRecovery:
    def test_budget_overflow_grows_and_yields(self):
        # 24 molecules -> several node windows -> needs >1 block
        graphs = graphs_from_smiles(SMILES_SET * 4)
        loader = GraphLoader(graphs, 24, 1, pallas_pack=True)
        assert loader.pack_num_blocks > 1
        # sabotage the measured budget to force a mid-iteration overflow
        loader.pack_num_blocks = 1
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0].pack_perm is not None  # still on the Pallas path
        assert loader.pack_num_blocks > 1        # budget grew

    def test_unpackable_batch_falls_back_to_xla(self):
        # in-degree 200 > e_block: structurally unpackable -> XLA path
        graphs = [_star_graph(200)] + graphs_from_smiles(["CCO"])
        loader = GraphLoader(graphs, 2, 1, pallas_pack=False)
        loader.pallas_pack = True  # skip the constructor's measuring pass
        loader.pack_num_blocks = 8
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0].pack_perm is None
        assert not loader.pallas_pack  # permanently off for this loader

    def test_trainer_flush_handles_mixed_groups(self):
        from glam_tpu.train.trainer import Trainer
        graphs = graphs_from_smiles(SMILES_SET)
        a = next(iter(GraphLoader(graphs, 6, 1)))
        b = next(iter(GraphLoader(graphs, 6, 1, node_budget=96,
                                  edge_budget=160)))
        assert Trainer._stackable([(a,), (a,)])
        assert not Trainer._stackable([(a,), (b,)])


class TestPairLoaderEpoch:
    def test_set_epoch_replays_shuffle(self):
        graphs = graphs_from_smiles(SMILES_SET,
                                    ys=list(range(len(SMILES_SET))))
        pairs = [(g, g) for g in graphs]
        lo = PairGraphLoader(pairs, 2, 1, shuffle=True, seed=7)
        first = [np.asarray(b1.y) for b1, _ in lo]   # epoch 0
        second = [np.asarray(b1.y) for b1, _ in lo]  # epoch 1
        lo2 = PairGraphLoader(pairs, 2, 1, shuffle=True, seed=7)
        lo2.set_epoch(1)
        replay = [np.asarray(b1.y) for b1, _ in lo2]
        assert all((x == y).all() for x, y in zip(second, replay))
        assert any((x != y).any() for x, y in zip(first, second))
