"""One process of the 2-process BATCHED SHARDED-PAIR jax.distributed
CPU test (VERDICT round-4 weak #3).

Spawned (twice) by tests/test_distributed_multiprocess.py.  Runs the
round-4/5 sharded-pair features across a REAL process boundary for the
first time: the batched (``pair_batch`` B=2) vmapped-collective pair
forward with ``graph_norm='_BatchNorm'`` — cross-pair JOINT batch
statistics psum'd over ("pair", "graph") — through a full
value_and_grad, plus the bn_mode='running' batched EVAL forward, all
over a 4-device global mesh spanning 2 gloo-connected processes (each
contributing 2 node shards of every pair's protein).

Writes train predictions, gradient leaves, BN stats and eval
predictions to the npz in argv[1]; the parent asserts parity vs the
single-process mesh (itself pinned to the dense PairArchitecture by
tests/test_sharded_model.py:TestBatchNormPairBatched).
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

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

D = 4
B = 2


def build_problem():
    """Deterministic B=2 (mol, pro) pairs + params/stats; identical on
    every process and in the parent's single-process oracle."""
    from glam_tpu.data.batching import GraphLoader
    from glam_tpu.data.graph import GraphArrays
    from glam_tpu.nn.model import ModelConfig, PairArchitecture
    from glam_tpu.parallel.sharded_model import extract_pair_params

    rng = np.random.RandomState(7)
    # kept SMALL: gloo's hard 30s rendezvous deadline must absorb the
    # two workers' compile-time skew on this 2-core host
    Nm, Em, L, Ep = 16, 36, 48, 144
    mols, pros, g1s = [], [], []
    for b in range(B):
        mols.append((rng.randn(Nm, 15).astype(np.float32),
                     rng.randn(Em, 4).astype(np.float32),
                     rng.randint(0, Nm, Em).astype(np.int32),
                     rng.randint(0, Nm, Em).astype(np.int32)))
        pros.append((rng.randn(L, 49).astype(np.float32),
                     rng.randn(Ep, 8).astype(np.float32),
                     rng.randint(0, L, Ep).astype(np.int32),
                     rng.randint(0, L, Ep).astype(np.int32)))
    cfg = ModelConfig(mol_block="_TripletMessage", pro_block="_GCNConv",
                      mol_readout="GlobalPool5",
                      pro_readout="GlobalLAPool", message_steps=2,
                      hid_dim_alpha=2,
                      e_dim=16, max_nodes=24, pro_max_nodes=L + 8,
                      pre_norm="_None", graph_norm="_BatchNorm",
                      flat_norm="_None", end_norm="_None",
                      pre_do="_None()", graph_do="_None()",
                      flat_do="_None()", end_do="_None()",
                      pre_act="CELU", graph_act="CELU", flat_act="CELU",
                      end_act="CELU")
    model = PairArchitecture(cfg, hetero=True)
    for m in mols:
        g1s.append(next(iter(GraphLoader([GraphArrays(
            nodes=m[0], edges=m[1], senders=m[2], receivers=m[3],
            y=np.zeros(1, np.float32))], 1, 1))))
    g2 = next(iter(GraphLoader([GraphArrays(
        nodes=pros[0][0], edges=pros[0][1], senders=pros[0][2],
        receivers=pros[0][3], y=np.zeros(1, np.float32))], 1, 1)))
    variables = model.init(jax.random.PRNGKey(0), g1s[0], g2, True)
    params = extract_pair_params(variables["params"], "_GCNConv",
                                 "GlobalLAPool",
                                 graph_norm="_BatchNorm")
    stacked_mols = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *g1s)
    return (cfg, params, variables["batch_stats"], stacked_mols, pros)


def shard_pros(pros):
    """Shared-budget sharding of the B proteins, stacked to [B, D, ...]
    (the trainer's corpus planning, same as tests/test_sharded_model.py
    _stack_pro_inputs)."""
    from glam_tpu.parallel.graph_partition import (build_halo_exchange,
                                                   split_large_graph)
    from glam_tpu.parallel.sharded_model import shard_inputs
    nb = max(p[0].shape[0] for p in pros)
    eb, hb = 0, 0
    for p in pros:
        nsh, esh, sg, rl, em = split_large_graph(*p, D, node_budget=nb)
        eb = max(eb, esh.shape[1])
        _, _, _, H = build_halo_exchange(sg, em, nsh.shape[1])
        hb = max(hb, H)
    per = [tuple(
        tuple(np.asarray(x) for x in a) if isinstance(a, tuple)
        else np.asarray(a)
        for a in shard_inputs(*p, D, node_budget=nb, edge_budget=eb,
                              halo_budget=hb)) for p in pros]
    return tuple(jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *per))


def make_noise(cfg, pro_inputs):
    from glam_tpu.parallel.sharded_model import make_stochastic_inputs
    n_global = pro_inputs[0].shape[1] * pro_inputs[0].shape[2]  # D * Nl
    drops, slopes = [], []
    for b in range(B):
        d, s = make_stochastic_inputs(
            jax.random.fold_in(jax.random.PRNGKey(3), b), n_global,
            cfg.hid_dim, cfg.message_steps, D, rate=0.0)
        drops.append(np.asarray(d))
        slopes.append(np.asarray(s))
    return np.stack(drops), np.stack(slopes)


def _barrier(name: str, timeout_ms: int = 300_000) -> None:
    """Cross-process barrier via the jax.distributed coordination
    service (no-op single-process).  Unlike gloo collectives this
    barrier's timeout is configurable, so it absorbs arbitrary
    compile-time skew between the workers."""
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def run_case(mesh, cfg, params, bn0, stacked_mols, pro_inputs, drop,
             slope, globalize_pro, put_rep, mol_rngs):
    """Train fwd+grad and running-eval on the given mesh; returns
    numpy results (mesh-independent values).  ``mol_rngs`` must be a
    HOST (numpy) array: after jax.distributed initialization,
    locally-created jax arrays cannot be rematerialized to numpy, so
    every input is generated before init and shipped in as numpy."""
    from glam_tpu.parallel.sharded_model import make_sharded_pair_forward
    fwd_t = make_sharded_pair_forward(mesh, cfg, stochastic=True,
                                      track_bn_stats=True, n_pairs=B)
    bn_w = np.ones((B,), np.float32)
    y = np.asarray([0.2, -0.4], np.float32)

    gp = put_rep(params)
    gmols = put_rep(stacked_mols)
    gbn = put_rep(bn0["mol1"])
    gw = put_rep(bn_w)
    grngs = put_rep(mol_rngs)
    gy = put_rep(y)
    inputs = globalize_pro(pro_inputs + (drop, slope))

    def loss_fn(p, gmols, gbn, gw, grngs, gy, *inputs):
        pred, new_bn, (pm, pv) = fwd_t(
            p, gmols, gbn, gw, grngs, *inputs)
        return jnp.mean((pred[:, 0] - gy) ** 2), (pred, new_bn,
                                                  pm, pv)

    # AOT-compile BEFORE executing any collective, then sync both
    # workers through the COORDINATION-SERVICE barrier (configurable
    # timeout) — gloo's context init has a hard 30s deadline that
    # cannot absorb cross-worker compile skew on this 2-core host
    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    step_c = step.lower(gp, gmols, gbn, gw, grngs, gy,
                        *inputs).compile()
    _barrier("pair_step_compiled")
    (loss, (pred, new_bn, pm, pv)), grads = step_c(
        gp, gmols, gbn, gw, grngs, gy, *inputs)

    # running-average EVAL with the EMA'd stats
    from glam_tpu.parallel.sharded_model import extract_pair_params  # noqa
    mean = np.asarray(bn0["mol2"]["conv"]["BatchNorm_0"]["mean"])
    var = np.asarray(bn0["mol2"]["conv"]["BatchNorm_0"]["var"])
    pm0 = np.asarray(pm)[0]
    pv0 = np.asarray(pv)[0]
    for s in range(pm0.shape[0]):
        mean = 0.9 * mean + 0.1 * pm0[s]
        var = 0.9 * var + 0.1 * pv0[s]
    # keep numpy (NOT jnp): locally-created jax arrays cannot be fed
    # through put_rep after distributed init
    eval_params = {**params, "pro": {**params["pro"],
                                     "norm_ra": {"mean": mean,
                                                 "var": var}}}
    mol_bn_new = jax.tree_util.tree_map(lambda x: np.asarray(x)[0],
                                        new_bn)
    fwd_e = make_sharded_pair_forward(mesh, cfg, bn_mode="running",
                                      n_pairs=B)
    ev_args = (put_rep(eval_params), gmols, put_rep(mol_bn_new)) + \
        globalize_pro(pro_inputs)
    ev_c = fwd_e.lower(*ev_args).compile()
    _barrier("pair_eval_compiled")
    pred_e = ev_c(*ev_args)
    return (float(loss), np.asarray(pred),
            [np.asarray(x) for x in jax.tree_util.tree_leaves(grads)],
            np.asarray(pm), np.asarray(pv), np.asarray(pred_e))


def main() -> None:
    out_path = sys.argv[1]
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glam_tpu.parallel.distributed import (global_mesh,
                                               initialize_distributed)

    initialize_distributed()
    assert jax.process_count() == 2
    pid = jax.process_index()
    mesh = global_mesh(("graph",))

    # build the problem COMMITTED to the local device: uncommitted jax
    # computations in multiprocess mode land on the global device set
    # and can never be materialized back to numpy (the make_noise /
    # put_rep np.asarray calls would raise "spans non-addressable
    # devices")
    with jax.default_device(jax.local_devices()[0]):
        cfg, params, bn0, stacked_mols, pros = build_problem()
        pro_inputs = shard_pros(pros)
        drop, slope = make_noise(cfg, pro_inputs)
        mol_rngs = np.asarray(jax.random.split(jax.random.PRNGKey(9),
                                               B))
        params = jax.tree_util.tree_map(np.asarray, params)
        bn0 = jax.tree_util.tree_map(np.asarray, bn0)
        stacked_mols = jax.tree_util.tree_map(np.asarray, stacked_mols)

    def to_global(arr):
        """[B, D, ...] host array -> global array sharded on axis 1."""
        arr = np.asarray(arr)
        spec = P(None, "graph", *([None] * (arr.ndim - 2)))
        local = arr[:, 2 * pid:2 * pid + 2]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local, arr.shape)

    def globalize_pro(inputs):
        return tuple(
            tuple(to_global(x) for x in a) if isinstance(a, tuple)
            else to_global(a) for a in inputs)

    rep = NamedSharding(mesh, P())

    def put_rep(tree):
        """Replicated global arrays WITHOUT the device_put multihost
        rendezvous (its assert_equal allgather deadline-times-out when
        the two workers reach it >30s apart on this 2-core host):
        every process contributes the full (identical) array."""
        def one(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(rep, x,
                                                          x.shape)
        return jax.tree_util.tree_map(one, tree)

    loss, pred, grads, pm, pv, pred_e = run_case(
        mesh, cfg, params, bn0, stacked_mols, pro_inputs, drop, slope,
        globalize_pro, put_rep, mol_rngs)

    if pid == 0:
        np.savez(out_path, loss=loss, pred=pred, pm=pm, pv=pv,
                 pred_e=np.asarray(pred_e),
                 **{f"g{i}": g for i, g in enumerate(grads)})
    jax.distributed.shutdown()
    print(f"worker {pid}: ok loss={loss:.6f} pred={pred[:, 0]}")


if __name__ == "__main__":
    main()
