"""v2 fully-fused TripletMessage attention kernel vs the XLA oracle.

Covers the host-side block packing, the forward kernel, and the custom
VJP (backward kernel), in interpreter mode on CPU.  Compiled-on-chip
parity is exercised by scripts/bench_kernels.py on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glam_tpu.ops.pallas.triplet_fused import (
    E_BLOCK2, W_WIN, fused_triplet_attention, pack_blocks2,
    triplet_attention_reference)


def _random_batch(rng, n_graphs=20, max_n=30, isolated_tail=16):
    """Contiguously laid-out batch of small random graphs (the
    data/graph.py convention the window packing relies on)."""
    off, snd, rcv = 0, [], []
    for _ in range(n_graphs):
        n = rng.randint(4, max_n)
        e = rng.randint(3, 4 * n)
        snd.extend((rng.randint(0, n, e) + off).tolist())
        rcv.extend((rng.randint(0, n, e) + off).tolist())
        off += n
    return (np.asarray(snd, np.int32), np.asarray(rcv, np.int32),
            off + isolated_tail)


def _params(rng, N, E, H, C, Fe):
    w_e = rng.randn(H, C).astype(np.float32)
    wemat = np.zeros((H * C, H), np.float32)
    for h in range(H):
        wemat[h * C:(h + 1) * C, h] = w_e[h]
    return dict(
        xp=jnp.asarray(rng.randn(N, H * C).astype(np.float32)),
        a_i=jnp.asarray(rng.randn(N, H).astype(np.float32)),
        a_j=jnp.asarray(rng.randn(N, H).astype(np.float32)),
        edge_attr=jnp.asarray(rng.randn(E, 4).astype(np.float32)),
        we=jnp.asarray((rng.randn(4, H * C) * 0.3).astype(np.float32)),
        wemat=jnp.asarray(wemat))


class TestPackBlocks2:
    def test_invariants(self):
        rng = np.random.RandomState(0)
        snd, rcv, N = _random_batch(rng)
        pk = pack_blocks2(snd, rcv, N)
        E = len(snd)
        assert pk.perm.shape[0] % E_BLOCK2 == 0
        real = pk.perm[pk.edge_mask]
        assert sorted(real.tolist()) == sorted(range(E))
        nblk = len(pk.win_start)
        owner = {}
        for b in range(nblk):
            sl = slice(b * E_BLOCK2, (b + 1) * E_BLOCK2)
            m = pk.edge_mask[sl]
            if not m.any():
                continue
            ids = pk.perm[sl][m]
            start = pk.win_start[b]
            assert start % 8 == 0
            # locals consistent and inside the window for BOTH endpoints
            np.testing.assert_array_equal(rcv[ids] - start,
                                          pk.local_rcv[sl][m])
            np.testing.assert_array_equal(snd[ids] - start,
                                          pk.local_snd[sl][m])
            assert pk.local_rcv[sl][m].max() < W_WIN
            assert pk.local_snd[sl][m].max() < W_WIN
            assert pk.local_rcv[sl][m].min() >= 0
            assert pk.local_snd[sl][m].min() >= 0
            # no receiver straddles blocks (softmax correctness)
            for r in set(rcv[ids].tolist()):
                assert owner.setdefault(r, b) == b

    def test_window_overflow_raises(self):
        # one edge spanning more nodes than the window must be rejected
        snd = np.asarray([0], np.int32)
        rcv = np.asarray([W_WIN + 8], np.int32)
        with pytest.raises(ValueError):
            pack_blocks2(snd, rcv, W_WIN + 16)

    def test_run_overflow_raises(self):
        snd = np.zeros(E_BLOCK2 + 1, np.int32)
        rcv = np.ones(E_BLOCK2 + 1, np.int32)
        with pytest.raises(ValueError):
            pack_blocks2(snd, rcv, 16)


class TestForward:
    @pytest.mark.parametrize("heads,channels", [(1, 8), (3, 16)])
    def test_matches_oracle(self, heads, channels):
        rng = np.random.RandomState(1)
        snd, rcv, N = _random_batch(rng)
        E = len(snd)
        p = _params(rng, N, E, heads, channels, 4)
        pk = pack_blocks2(snd, rcv, N)
        packed = [jnp.asarray(v) for v in
                  (pk.perm, pk.local_rcv, pk.local_snd, pk.win_start,
                   pk.edge_mask)]
        got = np.asarray(fused_triplet_attention(
            heads, channels, 0.2, True, *p.values(), jnp.asarray(snd), jnp.asarray(rcv), *packed))
        want = np.asarray(triplet_attention_reference(
            *p.values(), jnp.asarray(snd), jnp.asarray(rcv), heads,
            channels))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # isolated tail nodes aggregate to exactly zero
        assert (got[-8:] == 0).all()


class TestBackward:
    def test_grads_match_oracle(self):
        rng = np.random.RandomState(2)
        snd, rcv, N = _random_batch(rng, n_graphs=12)
        E = len(snd)
        H, C = 3, 16
        p = _params(rng, N, E, H, C, 4)
        pk = pack_blocks2(snd, rcv, N)
        packed = [jnp.asarray(v) for v in
                  (pk.perm, pk.local_rcv, pk.local_snd, pk.win_start,
                   pk.edge_mask)]
        cot = jnp.sin(jnp.arange(N * H * C).reshape(N, H * C) * 0.01)
        names = list(p.keys())

        def loss_fused(*a):
            return jnp.sum(fused_triplet_attention(
                H, C, 0.2, True, *a, jnp.asarray(snd), jnp.asarray(rcv), *packed) * cot)

        def loss_ref(*a):
            return jnp.sum(triplet_attention_reference(
                *a, jnp.asarray(snd), jnp.asarray(rcv), H, C) * cot)

        g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*p.values())
        g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*p.values())
        for name, a, b in zip(names, g1, g2):
            scale = max(float(jnp.abs(b).max()), 1.0)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4,
                atol=2e-5 * scale, err_msg=f"grad mismatch for {name}")


class TestModelGradParity:
    def test_training_step_grads_match_segment_path(self, sample_graphs):
        """jax.grad through the full Architecture: pack path == XLA."""
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

        def loss(params, batch):
            out = model.apply({"params": params}, batch, True)
            return jnp.sum(out ** 2)

        g_plain = jax.grad(loss)(v["params"], plain)
        g_pack = jax.grad(loss)(v["params"], packed)
        flat_a = jax.tree_util.tree_leaves_with_path(g_plain)
        flat_b = jax.tree_util.tree_leaves(g_pack)
        for (path, a), b in zip(flat_a, flat_b):
            scale = max(float(jnp.abs(a).max()), 1.0)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-4,
                atol=5e-5 * scale,
                err_msg=f"param grad mismatch at {path}")


class TestPairPallas:
    def test_ddi_train_slice_with_pallas(self, tmp_path):
        """DDI twin-tower training end-to-end on the fused pack path."""
        import pandas as pd
        from glam_tpu.data.pair_datasets import DDIDataset
        from glam_tpu.train.pair_trainer import make_ddi_trainer
        root = tmp_path / "ddi"
        (root / "raw").mkdir(parents=True)
        rng = np.random.RandomState(0)
        smis = ["CCO", "CCC", "c1ccccc1", "CCN", "CCOC", "CC(C)C",
                "CCS", "c1ccncc1"]
        rows = []
        for _ in range(40):
            s1, s2 = rng.choice(smis, 2, replace=False)
            rows.append({"Drug1_SMILES": s1, "Drug2_SMILES": s2,
                         "label": int(rng.rand() > 0.5)})
        pd.DataFrame(rows).to_csv(root / "raw" / "drugbank_caster.csv",
                                  index=False)
        ds = DDIDataset(str(root))
        args = {"dataset": "drugbank_caster", "epochs": 1,
                "batch_size": 16, "e_dim": 32, "hid_dim_alpha": 2,
                "message_steps": 1, "seed": 1, "loss": "bcel",
                "mol_block": "_TripletMessage", "pallas": 1}
        tr = make_ddi_trainer(args, ds, work_dir=str(tmp_path))
        assert tr.train_loader.pallas_pack1 and tr.train_loader.pallas_pack2
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert "auc" in test_result
