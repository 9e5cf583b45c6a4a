"""Serving API tests: checkpoint load + SMILES prediction + ensemble."""
import jax
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from glam_tpu.data.datasets import auto_dataset
    from glam_tpu.train.trainer import make_trainer
    base = tmp_path_factory.mktemp("serve")
    src = pd.read_csv("datasets/demo/raw/demo.csv").head(64)
    root = base / "demo"
    (root / "raw").mkdir(parents=True)
    src.to_csv(root / "raw" / "demo.csv", index=False)
    args = {"dataset": "demo", "dataset_root": str(root), "loss": "bcel",
            "epochs": 1, "batch_size": 16, "e_dim": 32,
            "hid_dim_alpha": 2, "message_steps": 1, "seed": 1}
    args, ds, kind = auto_dataset(args)
    tr = make_trainer(args, ds, kind, work_dir=str(base))
    tr.train_and_test()
    return base, tr


class TestPredictor:
    def test_predict_matches_trainer(self, trained_run):
        from glam_tpu.serve import Predictor
        base, tr = trained_run
        pred = Predictor.from_checkpoint(tr.log_save_dir)
        smis = ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O"]
        out = pred.predict_smiles(smis)
        assert out.shape == (3, 1)
        assert np.isfinite(out).all()
        scores = pred.predict_scores(smis)
        assert ((scores >= 0) & (scores <= 1)).all()
        # parity with the trainer's own forward on the same molecule
        tr.load_best_ckpt()
        from glam_tpu.data.batching import GraphLoader
        from glam_tpu.chem.featurize import smiles_to_arrays
        from glam_tpu.data.graph import GraphArrays
        x, s, r, e = smiles_to_arrays("CCO")
        g = GraphArrays(nodes=x, edges=e, senders=s, receivers=r,
                        y=np.zeros(1, np.float32))
        b = next(iter(GraphLoader([g], 32, 1)))
        direct = np.asarray(tr.model.apply(
            {"params": tr.state.params}, b, True))[0]
        np.testing.assert_allclose(out[0], direct, rtol=1e-4, atol=1e-5)

    def test_invalid_smiles_nan(self, trained_run):
        from glam_tpu.serve import Predictor
        base, tr = trained_run
        pred = Predictor.from_checkpoint(tr.log_save_dir)
        out = pred.predict_smiles(["CCO", "NOT_A_SMILES((("])
        assert np.isfinite(out[0]).all()
        assert np.isnan(out[1]).all()

    def test_ensemble(self, trained_run):
        from glam_tpu.serve import EnsemblePredictor, Predictor
        base, tr = trained_run
        p = Predictor.from_checkpoint(tr.log_save_dir)
        ens = EnsemblePredictor([p, p])
        smis = ["CCO", "c1ccccc1"]
        np.testing.assert_allclose(ens.predict_scores(smis),
                                   p.predict_scores(smis), rtol=1e-6)


@pytest.fixture(scope="module")
def ddi_ckpt_run(tmp_path_factory):
    """One plain DDI checkpoint shared by the (read-only) pair-serving
    tests; the corrupt-payload test trains its own (it mutates the
    checkpoint file)."""
    import glam_tpu.run as r
    base = tmp_path_factory.mktemp("ddi_serve")
    trainer = r.main(["--dataset", "drugbank_caster",
                      "--dataset_root", "datasets/ddi_demo",
                      "--epochs", "1", "--batch_size", "32",
                      "--e_dim", "16", "--hid_dim_alpha", "2",
                      "--message_steps", "1",
                      "--work_dir", str(base)])
    return trainer


class TestPairPredictor:
    def test_dti_from_sharded_checkpoint(self, tmp_path):
        """PairPredictor serves a --pro_shards-trained DTI checkpoint:
        scores from (SMILES, sequence) pairs match the trainer's own
        eval forward."""
        import glam_tpu.run as r
        if len(jax.devices()) < 4:
            pytest.skip("needs multi-device mesh")
        trainer = r.main(["--dataset", "bindingdb_c",
                          "--dataset_root", "datasets/dti_demo",
                          "--epochs", "1", "--e_dim", "16",
                          "--hid_dim_alpha", "2", "--message_steps", "1",
                          "--pro_shards", "4",
                          "--work_dir", str(tmp_path)])
        from glam_tpu.data.pair_datasets import BindingDBDataset
        from glam_tpu.serve import PairPredictor
        ds = BindingDBDataset("datasets/dti_demo")
        pred = PairPredictor.from_checkpoint(
            trainer.log_save_dir, contact_maps=ds.contact_maps)
        mol, pro = ds.test[0]
        scores = pred.predict_scores([(mol.smi, pro.smi),
                                      ("not a smiles", pro.smi)])
        assert np.isfinite(scores[0]) and 0.0 <= scores[0] <= 1.0
        assert np.isnan(scores[1])
        # parity vs the trainer's own eval on the same pair
        mol_b, pro_in, _ = trainer._sample(ds.test[0])
        logits = np.asarray(trainer._infer(trainer.params, mol_b,
                                           pro_in, 0.0)[0])
        ex = np.exp(logits - logits.max())
        want = (ex / ex.sum())[1]
        np.testing.assert_allclose(scores[0], want, rtol=1e-4,
                                   atol=1e-4)

    def test_ddi_pairs(self, ddi_ckpt_run):
        """DDI (homo) checkpoint serves (SMILES, SMILES) pairs."""
        trainer = ddi_ckpt_run
        from glam_tpu.serve import PairPredictor
        pred = PairPredictor.from_checkpoint(trainer.log_save_dir)
        assert not pred.hetero
        s = pred.predict_scores([("CCO", "c1ccncc1"), ("CCN", "CCO")])
        assert np.isfinite(s).all() and ((0 <= s) & (s <= 1)).all()

    def test_dti_batchnorm_checkpoint_uses_running_stats(self, tmp_path):
        """A BatchNorm pair checkpoint must serve with its TRAINED
        running averages — ignoring batch_stats would silently score
        with init statistics (round-4 fix)."""
        import glam_tpu.run as r
        if len(jax.devices()) < 4:
            pytest.skip("needs multi-device mesh")
        trainer = r.main(["--dataset", "bindingdb_c",
                          "--dataset_root", "datasets/dti_demo",
                          "--epochs", "1", "--e_dim", "16",
                          "--hid_dim_alpha", "2", "--message_steps", "1",
                          "--pro_shards", "4",
                          "--graph_norm", "_BatchNorm",
                          "--work_dir", str(tmp_path)])
        from glam_tpu.data.pair_datasets import BindingDBDataset
        from glam_tpu.serve import PairPredictor
        ds = BindingDBDataset("datasets/dti_demo")
        pred = PairPredictor.from_checkpoint(
            trainer.log_save_dir, contact_maps=ds.contact_maps)
        # the loaded stats are the trained ones, not init zeros/ones
        ra = pred.batch_stats["mol2"]["conv"]["BatchNorm_0"]
        assert float(np.abs(np.asarray(ra["mean"])).sum()) > 0
        mol, pro = ds.test[0]
        scores = pred.predict_scores([(mol.smi, pro.smi)])
        # parity vs the trainer's own (running-average) eval
        mol_b, pro_in, _ = trainer._sample(ds.test[0])
        logits = np.asarray(trainer._infer(trainer.params, mol_b,
                                           pro_in, 0.0)[0])
        ex = np.exp(logits - logits.max())
        want = (ex / ex.sum())[1]
        np.testing.assert_allclose(scores[0], want, rtol=1e-4,
                                   atol=1e-4)

    def test_corrupt_batch_stats_payload_raises(self, tmp_path):
        """A NON-empty batch_stats payload that fails to restore must
        raise, not silently drop the trained running averages (ADVICE
        round-4): falling back to init stats only for genuinely
        pre-BN (empty) payloads."""
        import glam_tpu.run as r
        from flax import serialization
        from glam_tpu.serve import PairPredictor
        trainer = r.main(["--dataset", "drugbank_caster",
                          "--dataset_root", "datasets/ddi_demo",
                          "--epochs", "1", "--batch_size", "32",
                          "--e_dim", "16", "--hid_dim_alpha", "2",
                          "--message_steps", "1",
                          "--graph_norm", "_BatchNorm",
                          "--work_dir", str(tmp_path)])
        ckpt = trainer.log_save_dir / "best_save.ckpt"
        payload = serialization.msgpack_restore(ckpt.read_bytes())
        # corrupt: shape-mismatched (wrong-features) batch_stats tree
        bad = {"mol1": {"conv": {"BatchNorm_0": {
            "mean": np.zeros(3, np.float32),
            "var": np.ones(3, np.float32)}}}}
        payload["batch_stats"] = serialization.to_bytes(bad)
        ckpt.write_bytes(serialization.msgpack_serialize(payload))
        with pytest.raises(ValueError, match="batch_stats"):
            PairPredictor.from_checkpoint(trainer.log_save_dir)
        # an EMPTY payload (pre-BN checkpoint layout) still loads
        payload["batch_stats"] = serialization.to_bytes({})
        ckpt.write_bytes(serialization.msgpack_serialize(payload))
        pred = PairPredictor.from_checkpoint(trainer.log_save_dir)
        assert pred.batch_stats == {}

    def test_batched_predictions_equal_single_pair(self, ddi_ckpt_run):
        """Packed batched inference rows == one-pair-at-a-time
        predictions (VERDICT round-4 item 8), with sticky budgets
        keeping one executable across calls."""
        from glam_tpu.serve import PairPredictor
        trainer = ddi_ckpt_run
        pairs = [("CCO", "c1ccncc1"), ("CCN", "CCO"),
                 ("not_a_smiles", "CCO"), ("c1ccccc1", "CC(=O)O"),
                 ("CCOC", "c1ccncc1")]
        batched = PairPredictor.from_checkpoint(trainer.log_save_dir,
                                                batch_size=4)
        single = PairPredictor.from_checkpoint(trainer.log_save_dir,
                                               batch_size=1)
        got = batched.predict_pairs(pairs)
        assert np.isnan(got[2]).all()
        for i, p in enumerate(pairs):
            want = single.predict_pairs([p])[0]
            if i == 2:
                assert np.isnan(want).all()
            else:
                np.testing.assert_allclose(got[i], want, rtol=1e-5,
                                           atol=1e-6)
        # sticky budgets: a second call with smaller inputs keeps the
        # same (floor) shapes -> no recompile of the batched forward
        b1 = (batched._budget1, batched._budget2)
        batched.predict_pairs(pairs[:2])
        assert (batched._budget1, batched._budget2) == b1
