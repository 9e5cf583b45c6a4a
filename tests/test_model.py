"""Model-level tests: combos, padding invariance, determinism, pair model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.data.batching import GraphLoader, PairGraphLoader
from glam_tpu.nn.model import (Architecture, ModelConfig, PairArchitecture,
                               model_config_from_args)


def _cfg(**kw):
    base = dict(max_nodes=32, e_dim=64)
    base.update(kw)
    return ModelConfig(**base)


class TestArchitecture:
    @pytest.mark.parametrize("block", ["_NNConv", "_TripletMessage",
                                       "_TripletMessageLight", "_GCNConv",
                                       "_GATConv"])
    def test_blocks_finite(self, sample_batch, block):
        model = Architecture(_cfg(mol_block=block))
        v = model.init(jax.random.PRNGKey(0), sample_batch, True)
        out = np.asarray(model.apply(v, sample_batch, True))
        assert out.shape == (sample_batch.num_graphs, 1)
        assert np.isfinite(out[np.asarray(sample_batch.graph_mask)]).all()

    @pytest.mark.parametrize("readout", ["GlobalPool5", "GlobalLAPool",
                                         "Set2Set"])
    def test_readouts_finite(self, sample_batch, readout):
        model = Architecture(_cfg(mol_readout=readout))
        v = model.init(jax.random.PRNGKey(0), sample_batch, True)
        out = np.asarray(model.apply(v, sample_batch, True))
        assert np.isfinite(out[np.asarray(sample_batch.graph_mask)]).all()

    def test_padding_invariance(self, sample_graphs):
        """Extra padding must not change real-graph outputs (the central
        static-shape design property)."""
        model = Architecture(_cfg(graph_norm="_PairNorm"))
        small = next(iter(GraphLoader(sample_graphs, 6, 1,
                                      node_budget=96, edge_budget=128)))
        big = next(iter(GraphLoader(sample_graphs, 6, 1,
                                    node_budget=256, edge_budget=512)))
        v = model.init(jax.random.PRNGKey(0), small, True)
        a = np.asarray(model.apply(v, small, True))
        b = np.asarray(model.apply(v, big, True))
        np.testing.assert_allclose(a[:6], b[:6], rtol=1e-4, atol=1e-5)

    def test_batch_count_invariance(self, sample_graphs):
        """A graph's output must not depend on its batch companions."""
        model = Architecture(_cfg())
        full = next(iter(GraphLoader(sample_graphs, 6, 1,
                                     node_budget=128, edge_budget=128)))
        solo = next(iter(GraphLoader(sample_graphs[:1], 6, 1,
                                     node_budget=128, edge_budget=128)))
        v = model.init(jax.random.PRNGKey(0), full, True)
        a = np.asarray(model.apply(v, full, True))
        b = np.asarray(model.apply(v, solo, True))
        np.testing.assert_allclose(a[0], b[0], rtol=1e-4, atol=1e-5)

    def test_eval_deterministic_train_stochastic(self, sample_batch):
        model = Architecture(_cfg(flat_do="Dropout(0.5)"))
        v = model.init(jax.random.PRNGKey(0), sample_batch, True)
        a = np.asarray(model.apply(v, sample_batch, True))
        b = np.asarray(model.apply(v, sample_batch, True))
        np.testing.assert_array_equal(a, b)
        t1 = np.asarray(model.apply(v, sample_batch, False,
                                    rngs={"dropout": jax.random.PRNGKey(1)}))
        t2 = np.asarray(model.apply(v, sample_batch, False,
                                    rngs={"dropout": jax.random.PRNGKey(2)}))
        assert np.abs(t1 - t2).max() > 1e-6

    def test_gradients_flow(self, sample_batch):
        model = Architecture(_cfg(mol_block="_TripletMessage"))
        v = model.init(jax.random.PRNGKey(0), sample_batch, True)

        def loss(params):
            out = model.apply({"params": params}, sample_batch, True)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0


class TestPairArchitecture:
    def test_homo_pair(self, sample_graphs):
        pairs = [(g, h) for g, h in zip(sample_graphs[:3],
                                        sample_graphs[3:6])]
        loader = PairGraphLoader(pairs, 3, 1)
        b1, b2 = next(iter(loader))
        model = PairArchitecture(_cfg(), hetero=False)
        v = model.init(jax.random.PRNGKey(0), b1, b2, True)
        out = np.asarray(model.apply(v, b1, b2, True))
        assert out.shape == (b1.num_graphs, 1)
        assert np.isfinite(out[np.asarray(b1.graph_mask)]).all()

    def test_towers_have_separate_weights(self, sample_graphs):
        pairs = [(sample_graphs[0], sample_graphs[1])]
        b1, b2 = next(iter(PairGraphLoader(pairs, 1, 1)))
        model = PairArchitecture(_cfg(), hetero=False)
        v = model.init(jax.random.PRNGKey(0), b1, b2, True)
        p = v["params"]
        assert "mol1" in p and "mol2" in p
        k1 = np.asarray(p["mol1"]["lin0"]["linear"]["kernel"])
        k2 = np.asarray(p["mol2"]["lin0"]["linear"]["kernel"])
        assert np.abs(k1 - k2).max() > 1e-6


class TestConfig:
    def test_model_config_from_args(self):
        args = {"dataset": "esol", "lr": 0.001, "mol_block": "_GCNConv",
                "hid_dim_alpha": 2, "graph_res": 0, "batch_size": 32}
        cfg = model_config_from_args(args, out_dim=3)
        assert cfg.mol_block == "_GCNConv"
        assert cfg.hid_dim_alpha == 2
        assert cfg.graph_res is False
        assert cfg.out_dim == 3
        assert cfg.hid_dim == 30
