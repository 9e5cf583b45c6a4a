"""Pallas fused segment-softmax+SpMM kernel vs the XLA oracle.

Runs in interpreter mode on CPU (compiled-on-TPU covered by bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.ops.pallas.segment_mxu import (E_BLOCK, W_BLOCK,
                                             fused_segment_softmax_spmm,
                                             pack_blocks,
                                             segment_softmax_spmm_reference)


class TestPackBlocks:
    def test_basic_invariants(self):
        rng = np.random.RandomState(0)
        receivers = rng.randint(0, 200, 1000).astype(np.int32)
        perm, local, starts, mask = pack_blocks(receivers, 200)
        assert perm.shape[0] % E_BLOCK == 0
        # every real edge appears exactly once
        real = perm[mask]
        assert sorted(real.tolist()) == sorted(range(1000))
        # local receiver consistent with window start
        nblk = len(starts)
        for b in range(nblk):
            sl = slice(b * E_BLOCK, (b + 1) * E_BLOCK)
            m = mask[sl]
            if not m.any():
                continue
            glob = receivers[perm[sl][m]]
            loc = local[sl][m]
            np.testing.assert_array_equal(glob - starts[b], loc)
            assert loc.max() < W_BLOCK
        # no receiver straddles blocks
        owner = {}
        for b in range(nblk):
            sl = slice(b * E_BLOCK, (b + 1) * E_BLOCK)
            for r in set(receivers[perm[sl][mask[sl]]].tolist()):
                assert owner.setdefault(r, b) == b

    def test_dense_receiver(self):
        # one receiver with many edges must stay in one block
        receivers = np.asarray([5] * 100 + [6] * 100, np.int32)
        perm, local, starts, mask = pack_blocks(receivers, 10)
        assert mask.sum() == 200

    def test_overflow_raises(self):
        receivers = np.zeros(E_BLOCK + 1, np.int32)
        with pytest.raises(ValueError):
            pack_blocks(receivers, 4)


class TestFusedKernel:
    @pytest.mark.parametrize("heads,channels", [(1, 8), (3, 16)])
    def test_matches_oracle(self, heads, channels):
        rng = np.random.RandomState(1)
        N, E = 300, 900
        receivers = rng.randint(0, N, E).astype(np.int32)
        logits = rng.randn(E, heads).astype(np.float32)
        values = rng.randn(E, heads * channels).astype(np.float32)
        perm, local, starts, mask = pack_blocks(receivers, N)
        got = np.asarray(fused_segment_softmax_spmm(
            jnp.asarray(logits), jnp.asarray(values), jnp.asarray(perm),
            jnp.asarray(local), jnp.asarray(starts), jnp.asarray(mask),
            N, heads, channels, interpret=True))
        want = np.asarray(segment_softmax_spmm_reference(
            jnp.asarray(logits), jnp.asarray(values),
            jnp.asarray(receivers), N))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_empty_receivers_zero(self):
        # nodes with no incoming edges must aggregate to exactly zero
        N = 50
        receivers = np.asarray([0, 0, 1], np.int32)
        logits = np.asarray([[1.0], [2.0], [3.0]], np.float32)
        values = np.ones((3, 8), np.float32)
        perm, local, starts, mask = pack_blocks(receivers, N)
        out = np.asarray(fused_segment_softmax_spmm(
            jnp.asarray(logits), jnp.asarray(values), jnp.asarray(perm),
            jnp.asarray(local), jnp.asarray(starts), jnp.asarray(mask),
            N, 1, 8, interpret=True))
        assert (out[2:] == 0).all()
        np.testing.assert_allclose(out[1], 1.0, rtol=1e-6)


class TestConvIntegration:
    def test_triplet_pack_path_matches_segment(self, sample_graphs):
        """Full TripletMessage model via the Pallas pack path == XLA."""
        from glam_tpu.data.batching import GraphLoader
        from glam_tpu.nn.model import Architecture, ModelConfig
        cfg = ModelConfig(max_nodes=32, e_dim=64,
                          mol_block="_TripletMessage")
        model = Architecture(cfg)
        packed = next(iter(GraphLoader(sample_graphs, 6, 1,
                                       pallas_pack=True)))
        plain = packed._replace(pack_perm=None, pack_local=None,
                                pack_start=None, pack_mask=None,
                                pack_snd=None)
        v = model.init(jax.random.PRNGKey(0), plain, True)
        a = np.asarray(model.apply(v, plain, True))
        b = np.asarray(model.apply(v, packed, True))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


class TestPackWithPadding:
    def test_loose_budget_many_padded_edges(self, sample_graphs):
        """Regression: pallas_pack must ignore padded edges — a loose
        edge budget leaves far more than E_BLOCK padding edges all
        pointing at the padding node."""
        from glam_tpu.data.batching import GraphLoader
        from glam_tpu.nn.model import Architecture, ModelConfig
        loader = GraphLoader(sample_graphs, 6, 1, edge_budget=1024,
                             node_budget=256, pallas_pack=True)
        batch = next(iter(loader))  # must not raise
        assert int(batch.pack_mask.sum()) == int(batch.edge_mask.sum())
        cfg = ModelConfig(max_nodes=64, e_dim=32,
                          mol_block="_TripletMessage")
        model = Architecture(cfg)
        plain = batch._replace(pack_perm=None, pack_local=None,
                               pack_start=None, pack_mask=None,
                               pack_snd=None)
        v = model.init(jax.random.PRNGKey(0), plain, True)
        a = np.asarray(model.apply(v, plain, True))
        b = np.asarray(model.apply(v, batch, True))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


class TestLogitSpike:
    def test_padded_slot_overflow_does_not_nan(self):
        """Regression: a huge logit on edge 0 (duplicated into padded
        block slots) must not overflow exp and NaN the whole block."""
        N = 16
        receivers = np.asarray([0, 0, 1], np.int32)
        logits = np.asarray([[120.0], [2.0], [3.0]], np.float32)
        values = np.ones((3, 8), np.float32)
        perm, local, starts, mask = pack_blocks(receivers, N)
        out = np.asarray(fused_segment_softmax_spmm(
            jnp.asarray(logits), jnp.asarray(values), jnp.asarray(perm),
            jnp.asarray(local), jnp.asarray(starts), jnp.asarray(mask),
            N, 1, 8, interpret=True))
        assert np.isfinite(out).all()
        want = np.asarray(segment_softmax_spmm_reference(
            jnp.asarray(logits), jnp.asarray(values),
            jnp.asarray(receivers), N))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
