"""PASP perturbation dataset + transforms tests (subset of the bundled
physprop_perturb.csv)."""
import numpy as np
import pandas as pd
import pytest

from glam_tpu.data.transforms import complete_graph


@pytest.fixture(scope="module")
def physprop_root(tmp_path_factory):
    src = pd.read_csv("/root/reference/physprop_perturb.csv")
    # keep a small slice with train rows and perturbed test rows
    train = src[src.Label == "train"].head(40)
    val = src[src.Label == "val"].head(10)
    test = src[(src.Label == "test") & src.SMILES_1.notna()
               & src.SMILES_2.notna() & src.SMILES_3.notna()].head(10)
    df = pd.concat([train, val, test])
    root = tmp_path_factory.mktemp("physprop")
    (root / "raw").mkdir()
    df.to_csv(root / "raw" / "physprop_perturb.csv", index=False)
    return root


class TestPerturbationDataset:
    def test_label_split(self, physprop_root):
        from glam_tpu.data.perturb import PerturbationDataset
        ds = PerturbationDataset(str(physprop_root))
        assert len(ds.val) <= 10 and len(ds.test) <= 10
        assert len(ds.train) >= 30
        assert ds.num_tasks == 1

    def test_perturb_test_pairs(self, physprop_root):
        from glam_tpu.data.perturb import perturb_test
        M, M_prime, Q, Q_prime = perturb_test(str(physprop_root),
                                              level=1)
        assert len(M) == len(M_prime) == len(Q) == len(Q_prime)
        assert len(M) > 0
        assert np.isfinite(Q).all()

    def test_auto_dataset_routes_perturbation(self, physprop_root):
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.data.perturb import PerturbationDataset
        args = {"dataset": "physprop_perturb",
                "dataset_root": str(physprop_root), "loss": "mse"}
        args, ds, kind = auto_dataset(args)
        assert isinstance(ds, PerturbationDataset)
        assert kind == "regression"

    def test_trainer_pasp(self, physprop_root, tmp_path):
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        args = {"dataset": "physprop_perturb",
                "dataset_root": str(physprop_root), "loss": "mse",
                "epochs": 1, "batch_size": 16, "e_dim": 32,
                "hid_dim_alpha": 2, "message_steps": 1, "seed": 1,
                "mol_block": "_GCNConv"}
        args, ds, kind = auto_dataset(args)
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        tr.train()
        deltas = tr.pasp()
        assert set(deltas) == {1, 2, 3}
        assert all(np.isfinite(v) for v in deltas.values())


class TestCompleteTransform:
    def test_dense_edges(self, sample_graphs):
        g = sample_graphs[0]  # CCO: 3 atoms, 4 directed edges
        c = complete_graph(g)
        assert c.senders.shape[0] == 3 * 2  # all pairs minus self loops
        # original edges keep their attributes
        orig = {(int(s), int(r)): g.edges[i]
                for i, (s, r) in enumerate(zip(g.senders, g.receivers))}
        for i, (s, r) in enumerate(zip(c.senders, c.receivers)):
            if (int(s), int(r)) in orig:
                np.testing.assert_array_equal(c.edges[i],
                                              orig[(int(s), int(r))])
            else:
                assert (c.edges[i] == 0).all()
