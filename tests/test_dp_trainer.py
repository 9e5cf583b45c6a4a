"""Trainer-integrated data parallelism (round-2 VERDICT item 2).

Runs on the 8-virtual-device CPU mesh (conftest).  The DP step combines
per-shard weighted-mean losses/grads with a weighted psum, so training
with --n_devices N must match single-device training on the same global
batches exactly (up to float reduction order)."""
import numpy as np
import pytest

from conftest import SMILES_SET, graphs_from_smiles

DET_ARGS = {
    # deterministic config: no dropout, no RReLU sampling, no BatchNorm
    "dataset": "dp_demo", "epochs": 2, "batch_size": 8, "e_dim": 32,
    "hid_dim_alpha": 2, "message_steps": 2, "mol_block": "_TripletMessage",
    "mol_readout": "GlobalPool5", "seed": 3, "loss": "mse",
    "pre_act": "CELU", "graph_act": "CELU", "flat_act": "CELU",
    "pre_do": "_None()", "graph_do": "_None()", "flat_do": "_None()",
    "end_do": "_None()", "graph_norm": "_PairNorm", "scan_steps": 2,
    "task": "regression", "num_tasks": 1, "optim": "Adam", "lr": 1e-3,
}


def _graphs(n=24, seed=0):
    rng = np.random.RandomState(seed)
    smis = [SMILES_SET[i % len(SMILES_SET)] for i in range(n)]
    return graphs_from_smiles(smis, ys=rng.randn(n))


def _train(n_devices: int, tmp_path, epochs=2):
    import jax
    from glam_tpu.nn.model import Architecture, model_config_from_args
    from glam_tpu.train.trainer import Trainer

    graphs = _graphs()
    args = dict(DET_ARGS, n_devices=n_devices, epochs=epochs)
    cfg = model_config_from_args(args, mol_in_dim=15, mol_edge_in_dim=4,
                                 out_dim=1, max_nodes=32)
    model = Architecture(cfg)
    tr = Trainer(args, model, graphs[:16], graphs[16:20], graphs[20:],
                 print_log=False, work_dir=str(tmp_path / f"d{n_devices}"))
    tr.train()
    return tr


class TestDPLoader:
    def test_stacked_shapes(self):
        from glam_tpu.data.batching import GraphLoader
        graphs = _graphs(10)
        lo = GraphLoader(graphs, 8, 1, n_devices=4)
        batches = list(lo)
        assert len(batches) == 2
        b = batches[0]
        assert b.nodes.ndim == 3 and b.nodes.shape[0] == 4
        assert b.y.shape[0] == 4
        # trailing global batch: 2 graphs land on device 0 (per-device
        # bs=2); devices 1-3 are all-padding slots
        last = batches[1]
        gm = np.asarray(last.graph_mask)   # [D, G]
        assert gm[0].sum() == 2 and gm[1:].sum() == 0

    def test_indivisible_batch_raises(self):
        from glam_tpu.data.batching import GraphLoader
        with pytest.raises(ValueError):
            GraphLoader(_graphs(8), 6, 1, n_devices=4)


class TestDPParity:
    def test_one_step_params_match_single_device(self, tmp_path):
        """One optimizer step: DP weighted-psum grads == global-batch
        grads (tight tolerance; only float reduction order differs)."""
        import jax
        from glam_tpu.data.batching import GraphLoader
        from glam_tpu.nn.model import Architecture, model_config_from_args
        from glam_tpu.train.trainer import Trainer

        graphs = _graphs(8)
        params = {}
        for nd in (1, 4):
            # SGD: the update is linear in the gradient, so the only
            # difference left is psum reduction order (Adam's
            # g/(sqrt(v)+eps) is ill-conditioned at step 1)
            args = dict(DET_ARGS, n_devices=nd, batch_size=8,
                        scan_steps=1, optim="SGD")
            cfg = model_config_from_args(args, mol_in_dim=15,
                                         mol_edge_in_dim=4, out_dim=1,
                                         max_nodes=32)
            tr = Trainer(args, Architecture(cfg), graphs, graphs[:4],
                         print_log=False,
                         work_dir=str(tmp_path / f"s{nd}"))
            batch = next(iter(tr.train_loader))
            tr.state, _ = tr._train_step(tr.state,
                                         tr._as_parts(batch),
                                         jax.random.PRNGKey(9))
            params[nd] = jax.tree_util.tree_leaves(tr.state.params)
        for a, b in zip(params[1], params[4]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_loss_and_params_match_single_device(self, tmp_path):
        import jax
        t1 = _train(1, tmp_path)
        t4 = _train(4, tmp_path)
        v1 = t1.records["val_losses"]
        v4 = t4.records["val_losses"]
        np.testing.assert_allclose(v1, v4, rtol=2e-4, atol=1e-6)
        p1 = jax.tree_util.tree_leaves(t1.state.params)
        p4 = jax.tree_util.tree_leaves(t4.state.params)
        for a, b in zip(p1, p4):
            # 16 Adam steps amplify psum reduction-order noise; the
            # one-step test above pins the tight bound
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)

    def test_dp_eval_matches_single(self, tmp_path):
        t4 = _train(4, tmp_path, epochs=1)
        loss, result = t4.valid_iterations(mode="test")
        assert np.isfinite(loss)
        assert np.isfinite(result["rmse"])


class TestDPPair:
    def test_ddi_dp_trains(self, tmp_path):
        from glam_tpu.data.batching import PairGraphLoader
        from glam_tpu.nn.model import (PairArchitecture,
                                       model_config_from_args)
        from glam_tpu.train.pair_trainer import PairTrainer
        graphs = _graphs(16)
        pairs = [(graphs[i], graphs[(i + 1) % 16]) for i in range(16)]
        for g, _ in pairs:
            g.y[...] = float(g.y[0] > 0)
        args = dict(DET_ARGS, dataset="dp_ddi", n_devices=2, epochs=1,
                    task="pair_binary_bce", loss="bcel")
        cfg = model_config_from_args(args, mol_in_dim=15, mol_edge_in_dim=4,
                                     out_dim=1, max_nodes=32)
        model = PairArchitecture(cfg, hetero=False)
        tr = PairTrainer(args, model, pairs[:12], pairs[12:],
                         print_log=False, work_dir=str(tmp_path))
        loss = tr.train_iterations(__import__("jax").random.PRNGKey(0))
        assert np.isfinite(loss)
        # DP eval through the pair metric head (merges the device axis)
        val_loss, result = tr.valid_iterations()
        assert np.isfinite(val_loss) and "acc" in result
