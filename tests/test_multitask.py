"""Multi-task NaN-masked classification (tox21-style) e2e slice."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tox_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("toxsyn")
    (root / "raw").mkdir()
    rng = np.random.RandomState(0)
    smis = ["CCO", "CCC", "c1ccccc1", "CCN", "CCOC", "CC(C)C", "CCS",
            "c1ccncc1", "CCCl", "CCBr", "CC=O", "CC(=O)C"] * 5
    tasks = ["NR-AR", "NR-AR-LBD", "NR-AhR", "NR-Aromatase", "NR-ER",
             "NR-ER-LBD", "NR-PPAR-gamma", "SR-ARE", "SR-ATAD5", "SR-HSE",
             "SR-MMP", "SR-p53"]
    data = {"smiles": smis}
    for t in tasks:
        col = rng.rand(len(smis))
        labels = (col > 0.5).astype(float)
        labels[rng.rand(len(smis)) < 0.3] = np.nan  # NaN holes
        data[t] = labels
    pd.DataFrame(data).to_csv(root / "raw" / "tox21.csv", index=False)
    return root


class TestMultitask:
    def test_dataset_nan_fill(self, tox_root):
        from glam_tpu.data.datasets import MolDataset
        ds = MolDataset(str(tox_root), dataset="tox21")
        assert ds.num_tasks == 12
        ys = np.stack([g.y for g in ds.graphs])
        assert ((ys == -1) | (ys == 0) | (ys == 1)).all()
        assert (ys == -1).any()  # NaNs became -1

    def test_bce_training(self, tox_root, tmp_path):
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        args = {"dataset": "tox21", "dataset_root": str(tox_root),
                "loss": "bcel", "epochs": 1, "batch_size": 16,
                "e_dim": 32, "hid_dim_alpha": 2, "message_steps": 1,
                "seed": 1}
        args, ds, kind = auto_dataset(args)
        assert kind == "binary_nan_bce" and args["out_dim"] == 12
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert 0.0 <= test_result["auc"] <= 1.0

    def test_ce_training(self, tox_root, tmp_path):
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        args = {"dataset": "tox21", "dataset_root": str(tox_root),
                "loss": "mtce", "epochs": 1, "batch_size": 16,
                "e_dim": 32, "hid_dim_alpha": 2, "message_steps": 1,
                "seed": 1}
        args, ds, kind = auto_dataset(args)
        assert kind == "binary_nan" and args["out_dim"] == 24
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
