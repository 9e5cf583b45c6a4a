"""Distributed tests on the 8-virtual-device CPU mesh: data parallelism
and edge-partitioned (halo-exchange) graph parallelism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.data.batching import GraphLoader
from glam_tpu.nn.model import Architecture, ModelConfig
from glam_tpu.parallel.data_parallel import (make_dp_eval_step,
                                             make_dp_train_step, make_mesh,
                                             stack_batches)
from glam_tpu.parallel.graph_partition import (init_halo_params,
                                               make_halo_message_step,
                                               partition_graphs,
                                               reference_halo_step,
                                               split_large_graph)
from glam_tpu.train.losses import get_loss
from glam_tpu.train.optim import make_optimizer
from glam_tpu.train.trainer import TrainState, make_loss_fn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device CPU mesh")


def _make_state(model, batch):
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, True)
    tx = make_optimizer("Adam", 1e-3)
    return TrainState.create(apply_fn=model.apply, params=v["params"],
                             tx=tx, batch_stats=v.get("batch_stats", {}))


class TestDataParallel:
    def test_dp_matches_single_device(self, sample_graphs):
        """pmean(grads over 4 shards of 1 batch-slice each) must equal
        grads of the equivalent single-device batch mean-of-losses."""
        D = 4
        model = Architecture(ModelConfig(max_nodes=32, e_dim=32,
                                         graph_do="_None()",
                                         flat_do="_None()",
                                         end_do="_None()",
                                         pre_act="CELU", graph_act="CELU",
                                         flat_act="CELU"))
        mesh = make_mesh(jax.devices()[:D], ("data",))
        loader = GraphLoader(sample_graphs[:4], 1, 1, node_budget=40,
                             edge_budget=64)
        per_dev = list(loader)[:D]
        stacked = stack_batches(per_dev)
        state = _make_state(model, per_dev[0])
        loss_fn = make_loss_fn("regression", "mse", 1)
        # manual average of per-shard losses (before the step donates
        # the state's buffers)
        manual = np.mean([
            float(loss_fn(model.apply({"params": state.params}, b, True),
                          b.y, b.graph_mask)) for b in per_dev])
        step = make_dp_train_step(model, loss_fn, mesh)
        state2, loss = step(state, stacked, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        # train loss uses deterministic=False but all dropouts are _None
        # and acts are CELU, so values must agree
        np.testing.assert_allclose(float(loss), manual, rtol=1e-5)

    def test_dp_gradients_match_single_device(self, sample_graphs):
        """True GRADIENT parity (not just loss): one SGD step through the
        DP path must equal one step on the mean-of-shard-losses objective
        computed single-device.  Guards the shard_map capture-transpose
        semantics (grads w.r.t. replicated params come back auto-psummed;
        an explicit pmean on top would be D x too large)."""
        D = 4
        model = Architecture(ModelConfig(max_nodes=32, e_dim=32,
                                         graph_do="_None()",
                                         flat_do="_None()",
                                         end_do="_None()",
                                         pre_act="CELU", graph_act="CELU",
                                         flat_act="CELU"))
        mesh = make_mesh(jax.devices()[:D], ("data",))
        loader = GraphLoader(sample_graphs[:4], 1, 1, node_budget=40,
                             edge_budget=64)
        per_dev = list(loader)[:D]
        stacked = stack_batches(per_dev)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, per_dev[0],
                       True)
        loss_fn = make_loss_fn("regression", "mse", 1)

        def objective(p):
            losses = [loss_fn(model.apply({"params": p}, b, True),
                              b.y, b.graph_mask) for b in per_dev]
            return jnp.mean(jnp.stack(losses))

        ref_grads = jax.grad(objective)(v["params"])
        # snapshot before the step donates the state's buffers
        p0_leaves = [np.array(x) for x in
                     jax.tree_util.tree_leaves(v["params"])]

        tx = make_optimizer("SGD", 1e-3)
        state = TrainState.create(apply_fn=model.apply,
                                  params=v["params"], tx=tx,
                                  batch_stats=v.get("batch_stats", {}))
        step = make_dp_train_step(model, loss_fn, mesh)
        state2, _ = step(state, stacked, jax.random.PRNGKey(2))
        for g, p0, p1 in zip(jax.tree_util.tree_leaves(ref_grads),
                             p0_leaves,
                             jax.tree_util.tree_leaves(state2.params)):
            step_grad = (p0 - np.asarray(p1)) / 1e-3
            # atol floor: recovering grads from an lr-scaled f32 param
            # delta quantizes at ulp(param)/lr ~ 2e-5
            np.testing.assert_allclose(step_grad, np.asarray(g),
                                       rtol=1e-4, atol=5e-5)

    def test_dp_eval(self, sample_graphs):
        D = 2
        model = Architecture(ModelConfig(max_nodes=32, e_dim=32))
        mesh = make_mesh(jax.devices()[:D], ("data",))
        loader = GraphLoader(sample_graphs[:4], 2, 1, node_budget=64,
                             edge_budget=96)
        per_dev = list(loader)[:D]
        stacked = stack_batches(per_dev)
        state = _make_state(model, per_dev[0])
        loss_fn = make_loss_fn("regression", "mse", 1)
        estep = make_dp_eval_step(model, loss_fn, mesh)
        out, loss = estep(state.params, state.batch_stats, stacked)
        assert out.shape[0] == D
        single = model.apply({"params": state.params}, per_dev[0], True)
        np.testing.assert_allclose(np.asarray(out)[0],
                                   np.asarray(single), rtol=1e-5,
                                   atol=1e-6)


class TestGraphPartition:
    def test_partition_balance(self, sample_graphs):
        stacked = partition_graphs(sample_graphs, 3)
        assert stacked.nodes.shape[0] == 3
        total_real = int(np.asarray(stacked.node_mask).sum())
        assert total_real == sum(g.nodes.shape[0] for g in sample_graphs)

    def test_halo_step_matches_reference(self):
        """Sharded halo-exchange aggregation == single-device oracle."""
        D = 4
        rng = np.random.RandomState(0)
        N, E, C = 64, 160, 8
        nodes = rng.randn(N, C).astype(np.float32)
        edges = rng.randn(E).astype(np.float32)[:, None] * 0 + 1.0
        edges = rng.randn(E, 1).astype(np.float32)
        senders = rng.randint(0, N, E).astype(np.int32)
        receivers = rng.randint(0, N, E).astype(np.int32)
        params = init_halo_params(jax.random.PRNGKey(3), C, 1)

        want = np.asarray(reference_halo_step(
            params, jnp.asarray(nodes), jnp.asarray(edges),
            jnp.asarray(senders), jnp.asarray(receivers)))

        nsh, esh, sg, rl, mask = split_large_graph(nodes, edges, senders,
                                                   receivers, D)
        mesh = make_mesh(jax.devices()[:D], ("graph",))
        step = make_halo_message_step(mesh)
        got = np.asarray(step(params, jnp.asarray(nsh), jnp.asarray(esh),
                              jnp.asarray(sg), jnp.asarray(rl),
                              jnp.asarray(mask)))
        Nl = nsh.shape[1]
        got_flat = got.reshape(-1, C)[:N]
        np.testing.assert_allclose(got_flat, want, rtol=1e-4, atol=1e-5)

    def test_halo_v2_boundary_all_to_all_matches_reference(self):
        """v2 boundary-only all-to-all exchange == single-device oracle,
        and its halo budget actually beats the v1 all-gather volume on a
        locality-partitioned graph."""
        from glam_tpu.parallel.graph_partition import (
            build_halo_exchange, make_halo_message_step_v2)

        D = 4
        rng = np.random.RandomState(1)
        N, C = 64, 8
        nodes = rng.randn(N, C).astype(np.float32)
        # locality-heavy topology: most edges short-range (same shard),
        # a few long-range (cross-shard boundary)
        senders, receivers = [], []
        for i in range(N):
            for d in (-2, -1, 1, 2):
                j = i + d
                if 0 <= j < N:
                    senders.append(j)
                    receivers.append(i)
        for _ in range(24):
            senders.append(rng.randint(0, N))
            receivers.append(rng.randint(0, N))
        senders = np.asarray(senders, np.int32)
        receivers = np.asarray(receivers, np.int32)
        edges = rng.randn(len(senders), 1).astype(np.float32)
        params = init_halo_params(jax.random.PRNGKey(3), C, 1)

        want = np.asarray(reference_halo_step(
            params, jnp.asarray(nodes), jnp.asarray(edges),
            jnp.asarray(senders), jnp.asarray(receivers)))

        nsh, esh, sg, rl, mask = split_large_graph(nodes, edges, senders,
                                                   receivers, D)
        Nl = nsh.shape[1]
        send_idx, send_mask, snd_l, H = build_halo_exchange(sg, mask, Nl)
        assert H < Nl, "halo budget should beat the full-table gather"

        mesh = make_mesh(jax.devices()[:D], ("graph",))
        step = make_halo_message_step_v2(mesh)
        got = np.asarray(step(params, jnp.asarray(nsh), jnp.asarray(esh),
                              jnp.asarray(snd_l), jnp.asarray(rl),
                              jnp.asarray(mask), jnp.asarray(send_idx)))
        got_flat = got.reshape(-1, C)[:N]
        np.testing.assert_allclose(got_flat, want, rtol=1e-4, atol=1e-5)


class TestDistributedUtils:
    def test_global_mesh_and_host_groups(self):
        from glam_tpu.parallel.distributed import global_mesh, host_groups
        mesh = global_mesh(("data",))
        assert mesh.shape["data"] == len(jax.devices())
        groups = host_groups(4)
        assert len(groups) == 4
        assert sum(len(g) for g in groups) == len(jax.devices())

    def test_process_shard(self):
        from glam_tpu.parallel.distributed import process_shard
        items = list(range(10))
        s0 = process_shard(items, process_index=0, process_count=2)
        s1 = process_shard(items, process_index=1, process_count=2)
        assert sorted(s0 + s1) == items
        assert not set(s0) & set(s1)


class TestScalingHarness:
    def test_measure_two_devices(self):
        from glam_tpu.parallel.bench_scaling import measure
        r = measure(2, graphs_per_device=8, n_iter=2)
        assert r["devices"] == 2
        assert r["edges_per_sec"] > 0
