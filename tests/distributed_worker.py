"""One process of the 2-process jax.distributed CPU test.

Spawned (twice) by tests/test_distributed_multiprocess.py with
GLAM_COORDINATOR / GLAM_NUM_PROCESSES / GLAM_PROCESS_ID set.  Exercises
the exact code that runs first on a real multi-host slice
(parallel/distributed.py initialize_distributed -> global_mesh ->
per-host sharded loaders -> the production DP train step), which
SURVEY.md §4(d) requires to be covered by multi-process-on-CPU
simulation.  Writes results (psum value, DP loss, post-step params) to
the npz path in argv[1]; the parent asserts grad parity against a
single-process oracle.
"""
import os
import sys

# 2 local CPU devices per process -> 4 global devices over 2 processes.
# Must REPLACE any inherited XLA_FLAGS (pytest's conftest exports an
# 8-device value) before the backend is created.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
jax.config.update("jax_cpu_collectives_implementation", "gloo")

# share the suite's persistent XLA cache (tests/conftest.py): worker
# compiles are the slow part of the 2-process tests; warm reruns load
# the cached executables instead (GLAM_TEST_XLA_CACHE=off opts out).
_cache = os.environ.get("GLAM_TEST_XLA_CACHE",
                        os.path.expanduser("~/.cache/glam_tpu/xla-tests"))
if _cache.lower() not in ("off", "0", "none", ""):
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glam_tpu.data.batching import GraphLoader
    from glam_tpu.nn.model import Architecture, ModelConfig
    from glam_tpu.parallel.data_parallel import make_dp_train_step
    from glam_tpu.parallel.distributed import (global_mesh,
                                               initialize_distributed,
                                               process_shard)
    from glam_tpu.train.losses import get_loss  # noqa: F401 (import check)
    from glam_tpu.train.optim import make_optimizer
    from glam_tpu.train.trainer import TrainState, make_loss_fn
    from tests.conftest import SMILES_SET, graphs_from_smiles

    initialize_distributed()  # GLAM_* env vars
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2
    pid = jax.process_index()

    mesh = global_mesh(("data",))

    # (a) cross-process psum over the global mesh
    local = np.arange(2, dtype=np.float32) + 10.0 * pid  # p0 [0,1] p1 [10,11]
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (4,))
    total = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(x, "data"), mesh=mesh,
        in_specs=P("data"), out_specs=P()))(garr)
    psum_val = float(np.asarray(total)[0])
    assert psum_val == 22.0, psum_val  # 0+1+10+11

    # (b) one production DP train step with per-host sharded loaders
    graphs = graphs_from_smiles(SMILES_SET[:4])
    loader = GraphLoader(graphs, 1, 1, node_budget=40, edge_budget=64)
    per_dev = list(loader)[:4]
    # each host loads only its share (process_shard: round-robin by
    # process index -> global device order [b0, b2, b1, b3])
    mine = process_shard(per_dev)
    assert len(mine) == 2
    local_stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *mine)
    stacked = jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1)))),
            leaf, (4,) + leaf.shape[1:]),
        local_stacked)

    model = Architecture(ModelConfig(max_nodes=32, e_dim=32,
                                     graph_do="_None()", flat_do="_None()",
                                     end_do="_None()", pre_act="CELU",
                                     graph_act="CELU", flat_act="CELU"))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, mine[0], True)
    rep = NamedSharding(mesh, P())
    params = jax.device_put(v["params"], rep)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer("SGD", 1e-3),
                              batch_stats={})
    loss_fn = make_loss_fn("regression", "mse", 1)
    step = make_dp_train_step(model, loss_fn, mesh)
    state2, loss = step(state, stacked, jax.device_put(
        jax.random.PRNGKey(2), rep))
    loss = float(np.asarray(loss))
    assert np.isfinite(loss), loss

    if pid == 0:
        leaves = jax.tree_util.tree_leaves(state2.params)
        np.savez(out_path, psum=psum_val, loss=loss,
                 **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves)})
    # all processes exit cleanly (coordinator waits for workers)
    jax.distributed.shutdown()
    print(f"worker {pid}: ok psum={psum_val} loss={loss:.6f}")


if __name__ == "__main__":
    main()
