"""Per-layer activation + gradient parity between the glam_tpu flagship
Architecture and the pure-torch twin (scripts/torch_twin.py).

This is the BASELINE.md "numerical parity" row made executable against
an independent torch implementation (torch.nn.GRUCell, torch autograd,
torch.topk): the same padded batch, the same transplanted parameters,
eval-mode activations allclose per message step, and full parameter
gradients allclose.  Trained-metric parity across seeds is measured by
scripts/train_torch_twin.py (results recorded in STATUS.md).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from glam_tpu.nn.model import Architecture, ModelConfig
from glam_tpu.train.trainer import make_loss_fn
from torch_twin import (TorchFlagship, load_glam_params, to_torch,
                        torch_grads_as_glam_tree, torch_loss)

CFG = ModelConfig(mol_block="_TripletMessage", mol_readout="GlobalPool5",
                  hid_dim_alpha=4, e_dim=64, message_steps=3,
                  max_nodes=32, graph_do="_None()", end_do="_None()",
                  pre_act="CELU", graph_act="CELU", flat_act="CELU")


@pytest.fixture(scope="module")
def setup(request):
    sample_graphs = request.getfixturevalue("sample_graphs")
    from glam_tpu.data.batching import GraphLoader
    batch = next(iter(GraphLoader(sample_graphs, batch_size=6,
                                  num_tasks=1)))
    model = Architecture(CFG)
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    twin = TorchFlagship(hid=CFG.hid_dim, e_dim=CFG.e_dim,
                         steps=CFG.message_steps, max_nodes=CFG.max_nodes)
    load_glam_params(twin, jax.tree_util.tree_map(np.asarray,
                                                  variables["params"]))
    return model, variables, twin, batch


class TestForwardParity:
    def test_per_step_activations_and_output(self, setup):
        model, variables, twin, batch = setup
        out_j, xs_j = model.apply(variables, batch, True,
                                  return_nodes=True)
        tb = to_torch(batch)
        with torch.no_grad():
            out_t, xs_t = twin(tb, return_acts=True)
        assert len(xs_j) == len(xs_t) == CFG.message_steps
        for step, (a, b) in enumerate(zip(xs_j, xs_t)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), rtol=1e-5, atol=2e-5,
                err_msg=f"node embeddings, message step {step}")
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   rtol=1e-5, atol=2e-5)

    def test_loss_value_parity(self, setup):
        model, variables, twin, batch = setup
        out_j = model.apply(variables, batch, True)
        tb = to_torch(batch)
        with torch.no_grad():
            out_t = twin(tb)
        for task, loss_name in [("regression", "mse"),
                                ("binary_nan_bce", "bcel")]:
            lj = float(make_loss_fn(task, loss_name, 1)(
                out_j, batch.y, batch.graph_mask))
            lt = float(torch_loss(task, out_t, tb.y, tb.graph_mask))
            np.testing.assert_allclose(lt, lj, rtol=1e-5,
                                       err_msg=task)


class TestGradientParity:
    def test_full_param_gradients(self, setup):
        model, variables, twin, batch = setup
        loss_fn = make_loss_fn("regression", "mse", 1)

        def objective(p):
            out = model.apply({"params": p}, batch, True)
            return loss_fn(out, batch.y, batch.graph_mask)

        grads_j = jax.grad(objective)(variables["params"])

        tb = to_torch(batch)
        twin.zero_grad()
        torch_loss("regression", twin(tb), tb.y, tb.graph_mask).backward()
        grads_t = torch_grads_as_glam_tree(twin)

        flat_j = jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(np.asarray, grads_j))[0]
        flat_t = jax.tree_util.tree_flatten_with_path(grads_t)[0]
        assert len(flat_j) == len(flat_t)
        for (path, gj), (path_t, gt) in zip(flat_j, flat_t):
            assert jax.tree_util.keystr(path) == \
                jax.tree_util.keystr(path_t)
            np.testing.assert_allclose(
                gt, gj, rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))
