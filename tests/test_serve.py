"""Serving API tests: checkpoint load + SMILES prediction + ensemble."""
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
