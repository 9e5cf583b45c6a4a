"""Kernel-level tests: segment ops vs dense numpy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.ops.segment import (scatter_nodes_to_dense, segment_max,
                                  segment_mean, segment_softmax, segment_sum,
                                  segment_topk_by_channel)


def np_segment_softmax(logits, seg, n):
    out = np.zeros_like(logits)
    for s in range(n):
        m = seg == s
        if m.sum() == 0:
            continue
        v = logits[m]
        e = np.exp(v - v.max(axis=0, keepdims=True))
        out[m] = e / (e.sum(axis=0, keepdims=True) + 1e-16)
    return out


class TestSegmentOps:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.seg = rng.randint(0, 5, size=40).astype(np.int32)
        self.x = rng.randn(40, 7).astype(np.float32)

    def test_sum_mean(self):
        got = np.asarray(segment_sum(jnp.asarray(self.x),
                                     jnp.asarray(self.seg), 6))
        want = np.zeros((6, 7), np.float32)
        for i, s in enumerate(self.seg):
            want[s] += self.x[i]
        np.testing.assert_allclose(got, want, rtol=1e-5)
        gotm = np.asarray(segment_mean(jnp.asarray(self.x),
                                       jnp.asarray(self.seg), 6))
        cnt = np.bincount(self.seg, minlength=6).clip(1)
        np.testing.assert_allclose(gotm, want / cnt[:, None], rtol=1e-5)
        # empty segment -> zero mean
        assert (gotm[5] == 0).all()

    def test_softmax_parity(self):
        logits = self.x[:, :3]
        got = np.asarray(segment_softmax(jnp.asarray(logits),
                                         jnp.asarray(self.seg), 6))
        want = np_segment_softmax(logits, self.seg, 6)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_softmax_sums_to_one(self):
        a = np.asarray(segment_softmax(jnp.asarray(self.x[:, 0]),
                                       jnp.asarray(self.seg), 6))
        sums = np.zeros(6)
        for i, s in enumerate(self.seg):
            sums[s] += a[i]
        np.testing.assert_allclose(sums[:5], 1.0, rtol=1e-5)

    def test_softmax_extreme_values(self):
        logits = jnp.asarray([1e4, 1e4 + 1, -1e4], jnp.float32)
        seg = jnp.asarray([0, 0, 1], jnp.int32)
        got = np.asarray(segment_softmax(logits, seg, 2))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got[2], 1.0, rtol=1e-5)

    def test_scatter_dense(self):
        g = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
        p = jnp.asarray([0, 1, 0, 0, 1, 2], jnp.int32)
        x = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        d = np.asarray(scatter_nodes_to_dense(x, g, p, 3, 4))
        assert d.shape == (3, 4, 2)
        np.testing.assert_allclose(d[0, 0], [0, 1])
        np.testing.assert_allclose(d[2, 2], [10, 11])
        assert (d[1, 1:] == 0).all()

    def test_topk_by_last_channel(self):
        # graph 0: 4 nodes, graph 1: 2 nodes (k=3 -> zero pad)
        g = jnp.asarray([0, 0, 0, 0, 1, 1], jnp.int32)
        p = jnp.asarray([0, 1, 2, 3, 0, 1], jnp.int32)
        x = jnp.asarray([[1, 5.0], [2, 9.0], [3, 7.0], [4, 1.0],
                         [5, 2.0], [6, 3.0]], jnp.float32)
        out = np.asarray(segment_topk_by_channel(x, g, p, 2, 8, 3))
        assert out.shape == (2, 6)
        # graph 0 sorted by last channel desc: rows [2,9],[3,7],[1,5]
        np.testing.assert_allclose(out[0], [2, 9, 3, 7, 1, 5])
        # graph 1: [6,3],[5,2],zeros
        np.testing.assert_allclose(out[1], [6, 3, 5, 2, 0, 0])
