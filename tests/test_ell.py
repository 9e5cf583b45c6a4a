"""ELL fast path must match the segment-op reference path exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.data.batching import GraphLoader
from glam_tpu.data.graph import build_ell, max_in_degree
from glam_tpu.nn.convs import (GATConv, GCNConv, NNConv, TripletMessage,
                               TripletMessageLight)
from glam_tpu.nn.model import Architecture, ModelConfig


@pytest.fixture
def graph_with_ell():
    rng = np.random.RandomState(7)
    N, E, C, Fe = 9, 16, 6, 4
    x = rng.randn(N, C).astype(np.float32)
    e = rng.randn(E, Fe).astype(np.float32)
    snd = rng.randint(0, N - 1, E).astype(np.int32)
    rcv = rng.randint(0, N - 1, E).astype(np.int32)
    k = int(np.bincount(rcv, minlength=N).max())
    nbr, eid, mask = build_ell(snd, rcv, N, k + 2)
    return (x, e, snd, rcv,
            (jnp.asarray(nbr), jnp.asarray(eid), jnp.asarray(mask)))


CONVS = [
    lambda C, Fe: TripletMessage(channels=C, edge_channels=Fe),
    lambda C, Fe: TripletMessageLight(channels=C, edge_channels=Fe),
    lambda C, Fe: NNConv(in_channels=C, out_channels=C, edge_channels=Fe),
    lambda C, Fe: GCNConv(in_channels=C, out_channels=C),
    lambda C, Fe: GATConv(in_channels=C, out_channels=C),
]


@pytest.mark.parametrize("mk", CONVS)
def test_ell_matches_segment(graph_with_ell, mk):
    x, e, snd, rcv, ell = graph_with_ell
    layer = mk(x.shape[1], e.shape[1])
    args = (jnp.asarray(x), jnp.asarray(e), jnp.asarray(snd),
            jnp.asarray(rcv))
    v = layer.init(jax.random.PRNGKey(0), *args)
    seg_out = np.asarray(layer.apply(v, *args))
    ell_out = np.asarray(layer.apply(v, *args, ell=ell))
    np.testing.assert_allclose(ell_out, seg_out, rtol=2e-4, atol=1e-5)


def test_build_ell_overflow_raises():
    snd = np.zeros(5, np.int32)
    rcv = np.zeros(5, np.int32)  # node 0 in-degree 5
    with pytest.raises(ValueError):
        build_ell(snd, rcv, 3, 4)


def test_loader_builds_ell(sample_graphs):
    loader = GraphLoader(sample_graphs, 6, 1, ell_k="auto")
    assert loader.ell_k is not None and loader.ell_k % 4 == 0
    b = next(iter(loader))
    assert b.ell_nbr is not None
    assert b.ell_nbr.shape == (b.num_nodes, loader.ell_k)
    # every real edge appears exactly once in the ELL table
    assert int(b.ell_mask.sum()) == int(b.edge_mask.sum())


def test_model_ell_vs_segment(sample_graphs):
    """Full model: output with ELL enabled == output without."""
    cfg = ModelConfig(max_nodes=32, e_dim=64, mol_block="_TripletMessage")
    model = Architecture(cfg)
    with_ell = next(iter(GraphLoader(sample_graphs, 6, 1, ell_k="auto")))
    without = with_ell._replace(ell_nbr=None, ell_edge=None, ell_mask=None)
    v = model.init(jax.random.PRNGKey(0), with_ell, True)
    a = np.asarray(model.apply(v, with_ell, True))
    b = np.asarray(model.apply(v, without, True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
