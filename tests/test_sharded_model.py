"""Giant-graph sharded inference must match the single-device model
bit-for-bit (same trained parameters, 4-way node sharding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.data.graph import GraphArrays
from glam_tpu.data.batching import GraphLoader
from glam_tpu.nn.model import Architecture, ModelConfig
from glam_tpu.parallel.data_parallel import make_mesh
from glam_tpu.parallel.sharded_model import (extract_params,
                                             make_sharded_forward,
                                             shard_inputs)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


def test_sharded_matches_single_device():
    rng = np.random.RandomState(0)
    N, E = 120, 360
    nodes = rng.randn(N, 15).astype(np.float32)
    edges = rng.randn(E, 4).astype(np.float32)
    senders = rng.randint(0, N, E).astype(np.int32)
    receivers = rng.randint(0, N, E).astype(np.int32)

    cfg = ModelConfig(mol_block="_TripletMessage",
                      mol_readout="GlobalLAPool", message_steps=3,
                      e_dim=64, max_nodes=N + 8,
                      pre_norm="_None", graph_norm="_None",
                      flat_norm="_None", end_norm="_None",
                      pre_do="_None()", graph_do="_None()",
                      flat_do="_None()", end_do="_None()",
                      pre_act="CELU", graph_act="CELU", flat_act="CELU")
    model = Architecture(cfg)
    g = GraphArrays(nodes=nodes, edges=edges, senders=senders,
                    receivers=receivers, y=np.zeros(1, np.float32))
    batch = next(iter(GraphLoader([g], 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    want = np.asarray(model.apply(variables, batch, True))[0]

    D = 4
    mesh = make_mesh(jax.devices()[:D], ("graph",))
    fwd = make_sharded_forward(mesh, message_steps=3)
    params = extract_params(variables["params"])
    shards = shard_inputs(nodes, edges, senders, receivers, D)
    got = np.asarray(fwd(params, *[jnp.asarray(a) for a in shards]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
