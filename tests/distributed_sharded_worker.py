"""One process of the 2-process SHARDED-TOWER jax.distributed CPU test.

Spawned (twice) by tests/test_distributed_multiprocess.py.  Runs the
flagship multi-chip capability — ``make_sharded_forward`` /
``make_sharded_train_step`` with BOTH halo plans (v2 all_to_all and v3
per-distance ring ppermutes) — across a REAL process boundary for the
first time: a 4-device global mesh over 2 gloo-connected processes,
with each process contributing its 2 local node shards via
``jax.make_array_from_process_local_data``.  VERDICT round-3 weak #1 /
item 2: before this test, the halo exchange had only ever executed on
single-process virtual meshes.

Writes the a2a forward, ring forward, and post-train-step params to the
npz path in argv[1]; the parent asserts parity vs the single-process
mesh (itself pinned to the single-device Architecture by
tests/test_sharded_model.py).
"""
import os
import sys

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

D = 4


def build_problem():
    """Deterministic giant graph + params; identical on every process
    (and in the parent's single-process oracle)."""
    from glam_tpu.data.batching import GraphLoader
    from glam_tpu.data.graph import GraphArrays
    from glam_tpu.nn.model import Architecture, ModelConfig
    from glam_tpu.parallel.sharded_model import extract_params

    rng = np.random.RandomState(0)
    N, E = 96, 288
    nodes = rng.randn(N, 15).astype(np.float32)
    edges = rng.randn(E, 4).astype(np.float32)
    senders = rng.randint(0, N, E).astype(np.int32)
    receivers = rng.randint(0, N, E).astype(np.int32)
    cfg = ModelConfig(mol_block="_TripletMessage",
                      mol_readout="GlobalLAPool", message_steps=2,
                      e_dim=32, max_nodes=N + 8,
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
    params = extract_params(variables["params"], "_TripletMessage",
                            "GlobalLAPool")
    return (nodes, edges, senders, receivers), params


def shard_both_plans(graph):
    from glam_tpu.parallel.sharded_model import shard_inputs
    a2a = shard_inputs(*graph, D, halo="a2a")
    ring = shard_inputs(*graph, D, halo="ring")
    return a2a, ring


def main() -> None:
    out_path = sys.argv[1]
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glam_tpu.parallel.distributed import (global_mesh,
                                               initialize_distributed)
    from glam_tpu.parallel.sharded_model import (make_sharded_forward,
                                                 make_sharded_train_step)

    initialize_distributed()
    assert jax.process_count() == 2
    pid = jax.process_index()
    mesh = global_mesh(("graph",))

    graph, params = build_problem()
    a2a, ring = shard_both_plans(graph)

    def to_global(arr):
        """[D, ...] host array -> global array sharded on axis 0, this
        process contributing its 2 local shards."""
        arr = np.asarray(arr)
        spec = P("graph", *([None] * (arr.ndim - 1)))
        local = arr[2 * pid:2 * pid + 2]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local, arr.shape)

    def globalize(inputs):
        return tuple(
            tuple(to_global(x) for x in a) if isinstance(a, tuple)
            else to_global(a) for a in inputs)

    rep = NamedSharding(mesh, P())
    gparams = jax.device_put(params, rep)

    fwd = make_sharded_forward(mesh, message_steps=2,
                               conv="_TripletMessage",
                               readout="GlobalLAPool")
    out_a2a = np.asarray(fwd(gparams, *globalize(a2a)))
    out_ring = np.asarray(fwd(gparams, *globalize(ring)))
    # the two exchange plans are mathematically the same halo — they
    # must agree ACROSS the process boundary too
    np.testing.assert_allclose(out_ring, out_a2a, rtol=1e-5, atol=1e-6)

    step = make_sharded_train_step(mesh, message_steps=2, lr=1e-2,
                                   conv="_TripletMessage",
                                   readout="GlobalLAPool")
    y = jax.device_put(np.asarray([0.3], np.float32), rep)
    p1, l1 = step(gparams, globalize(a2a), y)
    p2, l2 = step(p1, globalize(a2a), y)
    l1, l2 = float(np.asarray(l1)), float(np.asarray(l2))
    assert np.isfinite(l1) and l2 < l1, (l1, l2)

    pr, lr_ = step(gparams, globalize(ring), y)

    if pid == 0:
        leaves = jax.tree_util.tree_leaves(p1)
        ring_leaves = jax.tree_util.tree_leaves(pr)
        np.savez(out_path, out_a2a=out_a2a, out_ring=out_ring,
                 loss1=l1, loss2=l2, loss_ring=float(np.asarray(lr_)),
                 **{f"p{i}": np.asarray(x)
                    for i, x in enumerate(leaves)},
                 **{f"r{i}": np.asarray(x)
                    for i, x in enumerate(ring_leaves)})
    jax.distributed.shutdown()
    print(f"worker {pid}: ok a2a={out_a2a} ring={out_ring} "
          f"loss {l1:.5f}->{l2:.5f}")


if __name__ == "__main__":
    main()
