"""Layer-parity tests: flax layers vs naive numpy references of the
documented math (SURVEY.md §2 formulas), plus torch oracles for GRU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.data.batching import GraphLoader
from glam_tpu.nn.blocks import GRUCell, parse_dropout
from glam_tpu.nn.convs import (GATConv, GCNConv, NNConv, TripletMessage,
                               TripletMessageLight)
from glam_tpu.nn.fusion import dot_and_global_pool
from glam_tpu.nn.norms import BatchNorm, GraphLayerNorm, GraphSizeNorm, PairNorm
from glam_tpu.nn.readouts import GlobalLAPool, GlobalPool5, Set2Set


def leaky(x, s=0.2):
    return np.where(x >= 0, x, s * x)


def np_segment_softmax_1d(a, seg, n):
    out = np.zeros_like(a)
    for s in range(n):
        m = seg == s
        if not m.any():
            continue
        v = a[m]
        e = np.exp(v - v.max(axis=0, keepdims=True))
        out[m] = e / (e.sum(axis=0, keepdims=True) + 1e-16)
    return out


@pytest.fixture
def small_graph():
    rng = np.random.RandomState(42)
    N, E, C, Fe = 7, 12, 6, 4
    x = rng.randn(N, C).astype(np.float32)
    e = rng.randn(E, Fe).astype(np.float32)
    snd = rng.randint(0, N, E).astype(np.int32)
    rcv = rng.randint(0, N, E).astype(np.int32)
    return x, e, snd, rcv


class TestTripletMessage:
    def test_vs_naive(self, small_graph):
        x, e, snd, rcv = small_graph
        N, C = x.shape
        H = 3
        layer = TripletMessage(channels=C, edge_channels=e.shape[1], heads=H)
        v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(e),
                       jnp.asarray(snd), jnp.asarray(rcv))
        got = np.asarray(layer.apply(v, jnp.asarray(x), jnp.asarray(e),
                                     jnp.asarray(snd), jnp.asarray(rcv)))
        p = jax.tree_util.tree_map(np.asarray, v["params"])
        # naive reference: concat-triplet attention per edge
        xp = x @ p["weight_node"]        # [N, H*C]
        ep = e @ p["weight_edge"]        # [E, H*C]
        watt = p["weight_triplet_att"]   # [H, 3C]
        xh = xp.reshape(N, H, C)
        eh = ep.reshape(-1, H, C)
        tri = np.concatenate([xh[rcv], eh, xh[snd]], axis=-1)  # [E, H, 3C]
        alpha = leaky((tri * watt[None]).sum(-1))
        alpha = np_segment_softmax_1d(alpha, rcv, N)
        msg = alpha[:, :, None] * eh * xh[snd]
        aggr = np.zeros((N, H, C), np.float32)
        for i, r in enumerate(rcv):
            aggr[r] += msg[i]
        want = aggr.reshape(N, H * C) @ p["weight_scale"] + p["bias"]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_isolated_node_gets_bias(self, small_graph):
        x, e, snd, rcv = small_graph
        # node 6 isolated: re-point all edges away from it
        snd = np.where(snd == 6, 0, snd)
        rcv = np.where(rcv == 6, 1, rcv)
        layer = TripletMessage(channels=x.shape[1], edge_channels=e.shape[1])
        v = layer.init(jax.random.PRNGKey(1), *map(jnp.asarray,
                                                   (x, e, snd, rcv)))
        out = np.asarray(layer.apply(v, *map(jnp.asarray, (x, e, snd, rcv))))
        np.testing.assert_allclose(out[6], np.asarray(v["params"]["bias"]),
                                   atol=1e-6)


class TestTripletMessageLight:
    def test_vs_naive(self, small_graph):
        x, e, snd, rcv = small_graph
        N, C = x.shape
        layer = TripletMessageLight(channels=C, edge_channels=e.shape[1])
        v = layer.init(jax.random.PRNGKey(0), *map(jnp.asarray,
                                                   (x, e, snd, rcv)))
        got = np.asarray(layer.apply(v, *map(jnp.asarray, (x, e, snd, rcv))))
        p = jax.tree_util.tree_map(np.asarray, v["params"])
        xp = x @ p["weight_node"]
        tri = np.concatenate([xp[rcv], e, xp[snd]], axis=-1)
        alpha = leaky((tri * p["weight_triplet_att"][None]).sum(-1))
        alpha = np_segment_softmax_1d(alpha, rcv, N)
        aggr = np.zeros_like(xp)
        for i, r in enumerate(rcv):
            aggr[r] += alpha[i] * xp[snd[i]]
        np.testing.assert_allclose(got, aggr + p["bias"], rtol=2e-4,
                                   atol=1e-5)


class TestNNConv:
    def test_vs_naive(self, small_graph):
        x, e, snd, rcv = small_graph
        N, C = x.shape
        layer = NNConv(in_channels=C, out_channels=C, edge_channels=e.shape[1])
        v = layer.init(jax.random.PRNGKey(0), *map(jnp.asarray,
                                                   (x, e, snd, rcv)))
        got = np.asarray(layer.apply(v, *map(jnp.asarray, (x, e, snd, rcv))))
        p = jax.tree_util.tree_map(np.asarray, v["params"])
        h = np.maximum(e @ p["edge_mlp_0"]["kernel"]
                       + p["edge_mlp_0"]["bias"], 0)
        w = (h @ p["edge_mlp_1"]["kernel"]
             + p["edge_mlp_1"]["bias"]).reshape(-1, C, C)
        msg = np.einsum("ec,eco->eo", x[snd], w)
        aggr = np.zeros((N, C), np.float32)
        cnt = np.zeros(N)
        for i, r in enumerate(rcv):
            aggr[r] += msg[i]
            cnt[r] += 1
        aggr /= np.maximum(cnt, 1)[:, None]
        want = aggr + x @ p["root"] + p["bias"]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


class TestGCN:
    def test_vs_naive(self, small_graph):
        x, e, snd, rcv = small_graph
        N, C = x.shape
        layer = GCNConv(in_channels=C, out_channels=C)
        v = layer.init(jax.random.PRNGKey(0), *map(jnp.asarray,
                                                   (x, e, snd, rcv)))
        got = np.asarray(layer.apply(v, *map(jnp.asarray, (x, e, snd, rcv))))
        p = jax.tree_util.tree_map(np.asarray, v["params"])
        xp = x @ p["weight"]
        deg = np.ones(N)  # self loops
        for r in rcv:
            deg[r] += 1
        dinv = 1 / np.sqrt(deg)
        out = np.zeros_like(xp)
        for i in range(len(snd)):
            out[rcv[i]] += dinv[snd[i]] * dinv[rcv[i]] * xp[snd[i]]
        out += (dinv * dinv)[:, None] * xp
        np.testing.assert_allclose(got, out + p["bias"], rtol=2e-4,
                                   atol=1e-5)


class TestGRUCellVsTorch:
    def test_parity(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        N, C = 5, 8
        x = rng.randn(N, C).astype(np.float32)
        h = rng.randn(N, C).astype(np.float32)
        cell = GRUCell(in_dim=C, hidden=C)
        v = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))
        p = jax.tree_util.tree_map(np.asarray, v["params"])
        got = np.asarray(cell.apply(v, jnp.asarray(x), jnp.asarray(h)))

        tg = torch.nn.GRU(C, C)
        with torch.no_grad():
            tg.weight_ih_l0.copy_(torch.tensor(p["w_ih"].T))
            tg.weight_hh_l0.copy_(torch.tensor(p["w_hh"].T))
            tg.bias_ih_l0.copy_(torch.tensor(p["b_ih"]))
            tg.bias_hh_l0.copy_(torch.tensor(p["b_hh"]))
            out, hn = tg(torch.tensor(x).unsqueeze(0),
                         torch.tensor(h).unsqueeze(0))
        np.testing.assert_allclose(got, out.squeeze(0).numpy(), rtol=1e-5,
                                   atol=1e-5)


class TestNorms:
    def setup_method(self):
        rng = np.random.RandomState(3)
        self.x = rng.randn(10, 4).astype(np.float32)
        self.g = np.array([0] * 4 + [1] * 6, np.int32)
        self.nn_ = np.array([4, 6], np.int32)

    def _apply(self, mod, **kw):
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(self.x), **kw)
        return v, np.asarray(mod.apply(v, jnp.asarray(self.x), **kw))

    def test_pairnorm(self):
        mod = PairNorm()
        kw = dict(node_graph=jnp.asarray(self.g), n_node=jnp.asarray(self.nn_))
        _, got = self._apply(mod, **kw)
        for s, cnt in [(0, 4), (1, 6)]:
            seg = self.x[self.g == s]
            xc = seg - seg.mean(0)
            want = xc / np.sqrt(1e-5 + (xc ** 2).sum(-1).mean())
            np.testing.assert_allclose(got[self.g == s], want, rtol=1e-4)

    def test_graph_layernorm(self):
        mod = GraphLayerNorm(features=4)
        kw = dict(node_graph=jnp.asarray(self.g), n_node=jnp.asarray(self.nn_))
        _, got = self._apply(mod, **kw)
        for s in [0, 1]:
            seg = self.x[self.g == s]
            mean = seg.mean()
            xc = seg - mean
            var = (xc ** 2).mean()
            want = xc / np.sqrt(var + 1e-5)
            np.testing.assert_allclose(got[self.g == s], want, rtol=1e-4)

    def test_graphsize_norm(self):
        mod = GraphSizeNorm()
        kw = dict(node_graph=jnp.asarray(self.g), n_node=jnp.asarray(self.nn_))
        _, got = self._apply(mod, **kw)
        want = self.x / np.sqrt(np.array([4] * 4 + [6] * 6))[:, None]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_batchnorm_train_eval(self):
        mod = BatchNorm(features=4)
        mask = np.ones(10, bool)
        mask[7:] = False
        kw = dict(node_mask=jnp.asarray(mask), use_running_average=False)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(self.x), **kw)
        out, mut = mod.apply(v, jnp.asarray(self.x), mutable=["batch_stats"],
                             **kw)
        got = np.asarray(out)
        seg = self.x[mask]
        mean, var = seg.mean(0), seg.var(0)
        want = (self.x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # running stats: (1-m)*init + m*batch (unbiased var)
        n = mask.sum()
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                                   0.1 * mean, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            0.9 * 1.0 + 0.1 * var * n / (n - 1), rtol=1e-4)


class TestReadouts:
    def test_globalpool5(self):
        rng = np.random.RandomState(0)
        x = rng.randn(6, 3).astype(np.float32)
        g = np.array([0, 0, 0, 0, 1, 1], np.int32)
        pos = np.array([0, 1, 2, 3, 0, 1], np.int32)
        nn_ = np.array([4, 2], np.int32)
        mod = GlobalPool5(channels=3, max_nodes=8)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(g),
                     jnp.asarray(pos), jnp.asarray(nn_))
        got = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(g),
                                   jnp.asarray(pos), jnp.asarray(nn_)))
        assert got.shape == (2, 15)
        np.testing.assert_allclose(got[0, :3], x[:4].mean(0), rtol=1e-5)
        np.testing.assert_allclose(got[0, 3:6], x[:4].sum(0), rtol=1e-5)
        # sortpool: graph1 has 2 nodes -> third row zero
        order = np.argsort(-x[4:6, -1])
        np.testing.assert_allclose(got[1, 6:12],
                                   x[4:6][order].reshape(-1), rtol=1e-5)
        assert (got[1, 12:] == 0).all()

    def test_lapool_softmax_weights(self):
        rng = np.random.RandomState(1)
        x = rng.randn(5, 3).astype(np.float32)
        g = np.array([0, 0, 0, 1, 1], np.int32)
        pos = np.array([0, 1, 2, 0, 1], np.int32)
        nn_ = np.array([3, 2], np.int32)
        mod = GlobalLAPool(channels=3)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(g),
                     jnp.asarray(pos), jnp.asarray(nn_))
        got = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(g),
                                   jnp.asarray(pos), jnp.asarray(nn_)))
        p = jax.tree_util.tree_map(np.asarray, v["params"])
        gate = x @ p["gate_nn"]["kernel"] + p["gate_nn"]["bias"]
        val = x @ p["nn"]["kernel"] + p["nn"]["bias"]
        want = np.zeros((2, 6), np.float32)
        for s in [0, 1]:
            m = g == s
            a = np.exp(gate[m, 0] - gate[m, 0].max())
            a = a / (a.sum() + 1e-16)
            want[s] = (a[:, None] * val[m]).sum(0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_set2set_shape_and_determinism(self):
        rng = np.random.RandomState(2)
        x = rng.randn(6, 4).astype(np.float32)
        g = np.array([0, 0, 0, 1, 1, 1], np.int32)
        pos = np.array([0, 1, 2, 0, 1, 2], np.int32)
        nn_ = np.array([3, 3], np.int32)
        mod = Set2Set(channels=4)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(g),
                     jnp.asarray(pos), jnp.asarray(nn_))
        a = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(g),
                                 jnp.asarray(pos), jnp.asarray(nn_)))
        b = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(g),
                                 jnp.asarray(pos), jnp.asarray(nn_)))
        assert a.shape == (2, 8)
        np.testing.assert_array_equal(a, b)


class TestFusion:
    def test_vs_naive(self):
        rng = np.random.RandomState(5)
        xm = rng.randn(7, 4).astype(np.float32)
        xp = rng.randn(9, 4).astype(np.float32)
        mg = np.array([0, 0, 0, 1, 1, 1, 1], np.int32)
        mp_ = np.array([0, 1, 2, 0, 1, 2, 3], np.int32)
        pg = np.array([0, 0, 0, 0, 1, 1, 1, 1, 1], np.int32)
        pp = np.array([0, 1, 2, 3, 0, 1, 2, 3, 4], np.int32)
        mcnt = np.array([3, 4], np.int32)
        pcnt = np.array([4, 5], np.int32)
        for stats5 in [False, True]:
            got = np.asarray(dot_and_global_pool(
                jnp.asarray(xm), jnp.asarray(xp), jnp.asarray(mg),
                jnp.asarray(mp_), jnp.asarray(mcnt), jnp.asarray(pg),
                jnp.asarray(pp), jnp.asarray(pcnt), 2, 8, 8, stats5))
            for s in [0, 1]:
                item = xm[mg == s] @ xp[pg == s].T
                flat = np.sort(item.reshape(-1))
                want = [item.max(), item.mean()]
                if stats5:
                    med = flat[(len(flat) - 1) // 2]  # torch lower median
                    want += [med, item.min(), item.std(ddof=1)]
                np.testing.assert_allclose(got[s], want, rtol=1e-4,
                                           atol=1e-5)


class TestMisc:
    def test_parse_dropout(self):
        assert parse_dropout("_None()") == 0.0
        assert parse_dropout("Dropout(0.2)") == 0.2
        assert parse_dropout("Dropout(p=0.5)") == 0.5
        with pytest.raises(ValueError):
            parse_dropout("Bogus(1)")
