"""Extra parity tests for SURVEY.md §7.3 'hard parts': Set2Set vs a
torch LSTM oracle, RReLU train-mode statistics, BatchNorm under padding,
single-graph batches (the reference's skip-batch-of-1 guard is
unnecessary here)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.nn.activations import (RRELU_LOWER, RRELU_UPPER,
                                     get_activation)
from glam_tpu.nn.norms import BatchNorm
from glam_tpu.nn.readouts import Set2Set


class TestSet2SetVsTorch:
    def test_lstm_oracle(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        C, N = 6, 7
        x = rng.randn(N, C).astype(np.float32)
        g = np.array([0] * 4 + [1] * 3, np.int32)
        pos = np.array([0, 1, 2, 3, 0, 1, 2], np.int32)
        nn_ = np.array([4, 3], np.int32)
        mod = Set2Set(channels=C, max_nodes=8)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(g),
                     jnp.asarray(pos), jnp.asarray(nn_))
        got = np.asarray(mod.apply(v, jnp.asarray(x), jnp.asarray(g),
                                   jnp.asarray(pos), jnp.asarray(nn_)))
        p = jax.tree_util.tree_map(np.asarray, v["params"])

        # torch oracle: replicate PyG Set2Set with torch.nn.LSTM
        lstm = torch.nn.LSTM(2 * C, C)
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(torch.tensor(p["lstm_w_ih"].T))
            lstm.weight_hh_l0.copy_(torch.tensor(p["lstm_w_hh"].T))
            lstm.bias_ih_l0.copy_(torch.tensor(p["lstm_b_ih"]))
            lstm.bias_hh_l0.copy_(torch.tensor(p["lstm_b_hh"]))
            xt = torch.tensor(x)
            batch = torch.tensor(g.astype(np.int64))
            h = (torch.zeros(1, 2, C), torch.zeros(1, 2, C))
            q_star = torch.zeros(2, 2 * C)
            for _ in range(3):
                q, h = lstm(q_star.unsqueeze(0), h)
                q = q.squeeze(0)
                e = (xt * q[batch]).sum(-1)
                a = torch.zeros_like(e)
                for s in range(2):
                    m = batch == s
                    a[m] = torch.softmax(e[m], 0)
                r = torch.zeros(2, C)
                r.index_add_(0, batch, a.unsqueeze(-1) * xt)
                q_star = torch.cat([q, r], -1)
        np.testing.assert_allclose(got, q_star.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestRangerVsReferenceMath:
    """Numpy oracle of the reference Ranger update (ranger.py:31-207):
    gradient centralization -> RAdam with torch eps placement
    (m/(sqrt(v)+eps), bias corrections folded into the step size,
    momentum-only below the N_sma threshold) -> lookahead sync every k
    steps (slow += 0.5*(fast-slow); fast = slow)."""

    B1, B2, EPS, LR, K, ALPHA, THR = 0.95, 0.999, 1e-5, 0.01, 6, 0.5, 5.0

    def _oracle_step(self, p, g, m, v, slow, t):
        # gradient centralization on ndim>1 params: flax kernels are
        # [in..., out]; centralize over all axes except the last (the
        # torch [out, in...] dims-1.. mean on the transposed layout)
        if g.ndim > 1:
            g = g - g.mean(axis=tuple(range(g.ndim - 1)), keepdims=True)
        m = self.B1 * m + (1 - self.B1) * g
        v = self.B2 * v + (1 - self.B2) * g * g
        b2t = self.B2 ** t
        n_max = 2 / (1 - self.B2) - 1
        n_sma = n_max - 2 * t * b2t / (1 - b2t)
        if n_sma > self.THR:
            step_size = np.sqrt((1 - b2t) * (n_sma - 4) / (n_max - 4)
                                * (n_sma - 2) / n_sma
                                * n_max / (n_max - 2)) / (1 - self.B1 ** t)
            upd = m / (np.sqrt(v) + self.EPS)
        else:
            step_size = 1.0 / (1 - self.B1 ** t)
            upd = m
        p = p - self.LR * step_size * upd
        if t % self.K == 0:
            slow = slow + self.ALPHA * (p - slow)
            p = slow.copy()
        return p, m, v, slow

    def test_13_steps_match(self):
        import optax
        from glam_tpu.train.optim import make_optimizer
        rng = np.random.RandomState(7)
        params = {"w": rng.randn(4, 3).astype(np.float32),
                  "b": rng.randn(3).astype(np.float32)}
        grads_seq = [
            {"w": rng.randn(4, 3).astype(np.float32),
             "b": rng.randn(3).astype(np.float32)} for _ in range(13)]

        tx = make_optimizer("Ranger", self.LR, k=self.K)
        state = tx.init({k: jnp.asarray(x) for k, x in params.items()})
        p_jax = {k: jnp.asarray(x) for k, x in params.items()}
        p_ref = {k: x.copy() for k, x in params.items()}
        m = {k: np.zeros_like(x) for k, x in params.items()}
        v = {k: np.zeros_like(x) for k, x in params.items()}
        slow = {k: x.copy() for k, x in params.items()}

        for t, g in enumerate(grads_seq, start=1):
            upd, state = tx.update(
                {k: jnp.asarray(x) for k, x in g.items()}, state, p_jax)
            p_jax = optax.apply_updates(p_jax, upd)
            for k in params:
                p_ref[k], m[k], v[k], slow[k] = self._oracle_step(
                    p_ref[k], g[k], m[k], v[k], slow[k], t)
            for k in params:
                # oracle runs in f64 numpy, ours in f32 jax -> tiny drift
                np.testing.assert_allclose(
                    np.asarray(p_jax[k]), p_ref[k], rtol=1e-4, atol=1e-5,
                    err_msg=f"step {t} param {k}")

    def test_crosses_rectification_threshold(self):
        # with b2=0.999 the N_sma threshold is crossed within 13 steps:
        # both the momentum-only and the rectified branch were exercised
        n_max = 2 / (1 - self.B2) - 1
        crossed = [
            (n_max - 2 * t * self.B2 ** t / (1 - self.B2 ** t)) > self.THR
            for t in range(1, 14)]
        assert not crossed[0] and crossed[-1]


class TestGATMultiHead:
    def test_heads3_vs_naive(self):
        """Multi-head GATConv vs a per-head numpy oracle (PyG 1.7
        semantics: self-loops appended, per-destination softmax,
        concatenated head outputs + bias)."""
        from glam_tpu.nn.convs import GATConv
        rng = np.random.RandomState(3)
        N, E, C, H, F = 6, 10, 4, 3, 5
        x = rng.randn(N, F).astype(np.float32)
        snd = rng.randint(0, N, E).astype(np.int32)
        rcv = rng.randint(0, N, E).astype(np.int32)
        mod = GATConv(in_channels=F, out_channels=C, heads=H)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), None,
                             jnp.asarray(snd), jnp.asarray(rcv))
        got = np.asarray(mod.apply(variables, jnp.asarray(x), None,
                                   jnp.asarray(snd), jnp.asarray(rcv)))
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        xp = (x @ p["weight"]).reshape(N, H, C)
        a_src = np.einsum("nhc,hc->nh", xp, p["att_src"])
        a_dst = np.einsum("nhc,hc->nh", xp, p["att_dst"])
        loops = np.arange(N)
        s_all = np.concatenate([snd, loops])
        r_all = np.concatenate([rcv, loops])
        out = np.zeros((N, H, C), np.float32)
        for h in range(H):
            logits = a_src[s_all, h] + a_dst[r_all, h]
            logits = np.where(logits >= 0, logits, 0.2 * logits)
            for n in range(N):
                m_ = r_all == n
                if not m_.any():
                    continue
                z = logits[m_]
                e = np.exp(z - z.max())
                alpha = e / (e.sum() + 1e-16)
                out[n, h] = (alpha[:, None] * xp[s_all[m_], h]).sum(0)
        expected = out.reshape(N, H * C) + p["bias"]
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


class TestRReLU:
    def test_eval_mode_slope(self):
        act = get_activation("RReLU")
        x = jnp.asarray([-2.0, -1.0, 1.0])
        out = np.asarray(act(x, deterministic=True))
        slope = (RRELU_LOWER + RRELU_UPPER) / 2
        np.testing.assert_allclose(out, [-2 * slope, -slope, 1.0],
                                   rtol=1e-6)

    def test_train_mode_statistics(self):
        act = get_activation("RReLU")
        x = -jnp.ones(20000)
        out = np.asarray(act(x, deterministic=False,
                             rng=jax.random.PRNGKey(0)))
        slopes = -out
        assert slopes.min() >= RRELU_LOWER - 1e-6
        assert slopes.max() <= RRELU_UPPER + 1e-6
        assert abs(slopes.mean() - (RRELU_LOWER + RRELU_UPPER) / 2) < 0.01


class TestBatchNormPadding:
    def test_padding_does_not_pollute_stats(self):
        rng = np.random.RandomState(0)
        x = rng.randn(10, 4).astype(np.float32)
        mask = np.zeros(10, bool)
        mask[:6] = True
        x[6:] = 1e6  # garbage in padding rows must not leak into stats
        mod = BatchNorm(features=4)
        kw = dict(node_mask=jnp.asarray(mask), use_running_average=False)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), **kw)
        out, mut = mod.apply(v, jnp.asarray(x), mutable=["batch_stats"],
                             **kw)
        stats_mean = np.asarray(mut["batch_stats"]["mean"])
        assert np.abs(stats_mean).max() < 1.0  # only real rows counted

    def test_single_graph_batch_trains(self, sample_graphs, tmp_path):
        """The reference skips batches of size <=1 to avoid BatchNorm
        crashes (trainer.py:171-173); padded batches have no such
        failure mode — a 1-graph batch must train fine with BatchNorm."""
        from glam_tpu.data.batching import GraphLoader
        from glam_tpu.nn.model import Architecture, ModelConfig
        from glam_tpu.train.optim import make_optimizer
        from glam_tpu.train.trainer import TrainState, make_loss_fn
        cfg = ModelConfig(max_nodes=32, e_dim=16, pre_norm="_BatchNorm")
        model = Architecture(cfg)
        batch = next(iter(GraphLoader(sample_graphs[:1], 1, 1)))
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, batch, True)
        out, mut = model.apply(v, batch, False,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
        assert np.isfinite(np.asarray(out)[0]).all()
