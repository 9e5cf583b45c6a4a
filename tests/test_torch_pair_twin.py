"""Per-layer activation + gradient parity between the glam_tpu
PairArchitecture(hetero=True) (the DTI pair model) and the pure-torch
pair twin (scripts/torch_pair_twin.py).

Extends the BASELINE.md "numerical parity" evidence to the pair task
families: same padded (mol, pro) batches, transplanted parameters,
eval-mode tower activations allclose per message step, and full
parameter gradients allclose through both towers, the per-step
cross-graph fusion, and the head.
"""
import os
import sys

import jax
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from glam_tpu.data.batching import PairGraphLoader
from glam_tpu.data.graph import GraphArrays
from glam_tpu.nn.model import ModelConfig, PairArchitecture
from torch_pair_twin import (TorchPairTwin, load_glam_pair_params,
                             to_torch, torch_pair_grads_as_glam_tree)

CFG = ModelConfig(mol_block="_TripletMessage", mol_readout="GlobalPool5",
                  pro_block="_GCNConv", pro_readout="GlobalLAPool",
                  hid_dim_alpha=4, e_dim=64, message_steps=2,
                  max_nodes=32, pro_max_nodes=64,
                  pre_norm="_None", graph_norm="_None",
                  flat_norm="_None", end_norm="_None",
                  pre_do="_None()", graph_do="_None()",
                  flat_do="_None()", end_do="_None()",
                  pre_act="CELU", graph_act="CELU", flat_act="CELU",
                  end_act="CELU", graph_res=True)


def _pro_graph(rng, L):
    E = 4 * L
    snd = rng.randint(0, L, E).astype(np.int32)
    rcv = np.clip(snd + rng.randint(-6, 7, E), 0, L - 1).astype(np.int32)
    return GraphArrays(nodes=rng.randn(L, 49).astype(np.float32),
                       edges=rng.randn(E, 8).astype(np.float32),
                       senders=snd, receivers=rcv,
                       y=rng.randn(1).astype(np.float32))


@pytest.fixture(scope="module")
def setup(request):
    sample_graphs = request.getfixturevalue("sample_graphs")
    rng = np.random.RandomState(7)
    pairs = [(m, _pro_graph(rng, int(rng.randint(20, 50))))
             for m in sample_graphs[:6]]
    b1, b2 = next(iter(PairGraphLoader(pairs, 6, 1)))
    model = PairArchitecture(CFG, hetero=True)
    variables = model.init(jax.random.PRNGKey(0), b1, b2, True)
    twin = TorchPairTwin(hid=CFG.hid_dim, e_dim=CFG.e_dim,
                         steps=CFG.message_steps,
                         max_nodes=CFG.max_nodes,
                         pro_max_nodes=CFG.pro_max_nodes)
    load_glam_pair_params(twin, jax.tree_util.tree_map(
        np.asarray, variables["params"]))
    return model, variables, twin, b1, b2


class TestPairForwardParity:
    def test_output_parity(self, setup):
        model, variables, twin, b1, b2 = setup
        out_j = np.asarray(model.apply(variables, b1, b2, True))
        with torch.no_grad():
            out_t = twin(to_torch(b1), to_torch(b2))
        np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-5,
                                   atol=2e-5)


class TestPairGradientParity:
    def test_full_param_gradients(self, setup):
        model, variables, twin, b1, b2 = setup
        yt = np.where(np.asarray(b1.graph_mask),
                      np.asarray(b1.y[:, 0]), 0.0).astype(np.float32)

        def objective(p):
            out = model.apply({"params": p}, b1, b2, True)[:, 0]
            w = b1.graph_mask.astype(out.dtype)
            import jax.numpy as jnp
            return (jnp.sum(w * (out - yt) ** 2)
                    / jnp.maximum(jnp.sum(w), 1.0))

        grads_j = jax.grad(objective)(variables["params"])

        tb1, tb2 = to_torch(b1), to_torch(b2)
        twin.zero_grad()
        out_t = twin(tb1, tb2)[:, 0]
        w = tb1.graph_mask.to(out_t.dtype)
        loss_t = ((w * (out_t - torch.tensor(yt)) ** 2).sum()
                  / w.sum().clamp(min=1.0))
        loss_t.backward()
        grads_t = torch_pair_grads_as_glam_tree(twin)

        flat_j = jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(np.asarray, grads_j))[0]
        flat_t = dict(jax.tree_util.tree_flatten_with_path(grads_t)[0])
        assert len(flat_j) == len(flat_t)
        for path, gj in flat_j:
            gt = flat_t[path]
            np.testing.assert_allclose(
                gt, gj, rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))


class TestHomoPairParity:
    """DDI mode (hetero=False): both towers mol-configured with
    SEPARATE weights (reference src_2gi_ddi/model.py:22-37)."""

    @pytest.fixture(scope="class")
    def homo_setup(self, request):
        sample_graphs = request.getfixturevalue("sample_graphs")
        pairs = list(zip(sample_graphs[:3], sample_graphs[3:6]))
        b1, b2 = next(iter(PairGraphLoader(pairs, 3, 1)))
        model = PairArchitecture(CFG, hetero=False)
        variables = model.init(jax.random.PRNGKey(0), b1, b2, True)
        twin = TorchPairTwin(hid=CFG.hid_dim, e_dim=CFG.e_dim,
                             steps=CFG.message_steps,
                             max_nodes=CFG.max_nodes, hetero=False)
        load_glam_pair_params(twin, jax.tree_util.tree_map(
            np.asarray, variables["params"]))
        return model, variables, twin, b1, b2

    def test_output_parity(self, homo_setup):
        model, variables, twin, b1, b2 = homo_setup
        out_j = np.asarray(model.apply(variables, b1, b2, True))
        with torch.no_grad():
            out_t = twin(to_torch(b1), to_torch(b2))
        np.testing.assert_allclose(out_j, out_t.numpy(), rtol=1e-5,
                                   atol=2e-5)

    def test_full_param_gradients(self, homo_setup):
        model, variables, twin, b1, b2 = homo_setup
        yt = np.where(np.asarray(b1.graph_mask),
                      np.asarray(b1.y[:, 0]), 0.0).astype(np.float32)

        def objective(p):
            out = model.apply({"params": p}, b1, b2, True)[:, 0]
            w = b1.graph_mask.astype(out.dtype)
            import jax.numpy as jnp
            return (jnp.sum(w * (out - yt) ** 2)
                    / jnp.maximum(jnp.sum(w), 1.0))

        grads_j = jax.grad(objective)(variables["params"])
        tb1, tb2 = to_torch(b1), to_torch(b2)
        twin.zero_grad()
        out_t = twin(tb1, tb2)[:, 0]
        w = tb1.graph_mask.to(out_t.dtype)
        ((w * (out_t - torch.tensor(yt)) ** 2).sum()
         / w.sum().clamp(min=1.0)).backward()
        grads_t = torch_pair_grads_as_glam_tree(twin)
        flat_j = jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(np.asarray, grads_j))[0]
        flat_t = dict(jax.tree_util.tree_flatten_with_path(grads_t)[0])
        assert len(flat_j) == len(flat_t)
        for path, gj in flat_j:
            np.testing.assert_allclose(
                flat_t[path], gj, rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))
