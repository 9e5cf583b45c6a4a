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
