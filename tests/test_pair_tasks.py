"""Pair-task tests: DDI/DTI datasets, protein featurizer, pair trainers."""
import numpy as np
import pytest

from glam_tpu.chem.proteins import (NUM_PRO_EDGE_FEATURES,
                                    NUM_PRO_NODE_FEATURES, load_contactmap,
                                    protein_to_arrays, residue_features)


class TestProteinFeaturizer:
    def test_residue_features(self):
        f = residue_features("A")
        assert len(f) == NUM_PRO_NODE_FEATURES
        assert f[0] == 1.0 and sum(f[:20]) == 1.0
        assert f[20] == 1.0  # A aliphatic
        assert f[25] == pytest.approx(71.08)  # weight

    def test_protein_graph(self):
        L = 5
        cm = np.zeros((L, L), np.float32)
        cm[0, 3] = cm[3, 0] = 0.8
        nodes, snd, rcv, attr = protein_to_arrays("ACDEF", cm)
        assert nodes.shape == (5, NUM_PRO_NODE_FEATURES)
        # backbone 2*(L-1) edges + 2 contact edges
        assert snd.shape[0] == 2 * 4 + 2
        assert attr.shape[1] == NUM_PRO_EDGE_FEATURES
        # backbone attr
        np.testing.assert_allclose(attr[0], [1, 1, 0, 0, 0, 0, 0, 1])
        # contact attr: p=0.8 -> buckets l4 only ([0.5,0.9) overlap rule)
        contact = attr[-1]
        assert contact[1] == pytest.approx(0.8)
        assert contact[2] == pytest.approx(0.2)
        np.testing.assert_allclose(contact[3:], [0, 0, 0, 1, 0])

    def test_contact_map_parser(self, tmp_path):
        p = tmp_path / "x.contactmap.txt"
        p.write_text("PFRMAT RR\nTARGET T1\nSEQ ACDEF\nMODEL 1\n"
                     "1 4 0.85\n2 5 0.05\nEND\n")
        cm, seq, infos = load_contactmap(p, thre=0.1)
        assert seq == "ACDEF"
        assert cm.shape == (5, 5)
        assert cm[0, 3] == pytest.approx(0.85)
        assert cm[3, 0] == pytest.approx(0.85)
        assert cm[1, 4] == 0.0  # below threshold


@pytest.fixture(scope="module")
def ddi_root(tmp_path_factory):
    import pandas as pd
    root = tmp_path_factory.mktemp("ddi")
    (root / "raw").mkdir()
    rng = np.random.RandomState(0)
    smis = ["CCO", "CCC", "c1ccccc1", "CCN", "CCOC", "CC(C)C", "CCS",
            "c1ccncc1"]
    rows = []
    for i in range(40):
        s1, s2 = rng.choice(smis, 2, replace=False)
        rows.append({"Drug1_SMILES": s1, "Drug2_SMILES": s2,
                     "label": int(rng.rand() > 0.5)})
    pd.DataFrame(rows).to_csv(root / "raw" / "drugbank_caster.csv",
                              index=False)
    return root


class TestDDI:
    def test_dataset(self, ddi_root):
        from glam_tpu.data.pair_datasets import DDIDataset
        ds = DDIDataset(str(ddi_root))
        assert len(ds.train) + len(ds.val) + len(ds.test) == 40
        assert len(ds.mol_store) <= 8  # dedup
        assert ds.num_node_features == 15

    def test_train_slice(self, ddi_root, tmp_path):
        from glam_tpu.data.pair_datasets import DDIDataset
        from glam_tpu.train.pair_trainer import make_ddi_trainer
        ds = DDIDataset(str(ddi_root))
        args = {"dataset": "drugbank_caster", "epochs": 1,
                "batch_size": 16, "e_dim": 32, "hid_dim_alpha": 2,
                "message_steps": 1, "seed": 1, "loss": "bcel"}
        tr = make_ddi_trainer(args, ds, work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert "auc" in test_result


@pytest.fixture(scope="module")
def dti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dti")
    d = root / "raw" / "bindingdb_c"
    d.mkdir(parents=True)
    rng = np.random.RandomState(1)
    seqs = ["ACDEFGHIKL", "MNPQRSTVWY"]
    maps = {}
    for s in seqs:
        L = len(s)
        cm = np.zeros((L, L), np.float32)
        cm[0, 4] = cm[4, 0] = 0.7
        maps[s] = cm
    np.savez(d / "protein_maps.npz",
             sequences=np.asarray(seqs),
             **{f"map_{i}": maps[s] for i, s in enumerate(seqs)})
    smis = ["CCO", "CCC", "c1ccccc1", "CCN"]
    for name, n in [("train", 20), ("dev", 6), ("test", 6)]:
        lines = []
        for _ in range(n):
            lines.append(f"{rng.choice(smis)} {rng.choice(seqs)} "
                         f"{int(rng.rand() > 0.5)}")
        (d / f"{name}.txt").write_text("\n".join(lines))
    return root


class TestDTI:
    def test_dataset(self, dti_root):
        from glam_tpu.data.pair_datasets import BindingDBDataset
        ds = BindingDBDataset(str(dti_root))
        assert len(ds.train) == 20 and len(ds.val) == 6
        assert ds.pro_num_node_features == 49
        assert ds.pro_num_edge_features == 8

    def test_train_slice(self, dti_root, tmp_path):
        from glam_tpu.data.pair_datasets import BindingDBDataset
        from glam_tpu.train.pair_trainer import make_dti_trainer
        ds = BindingDBDataset(str(dti_root))
        args = {"dataset": "bindingdb_c", "epochs": 1, "batch_size": 8,
                "e_dim": 32, "hid_dim_alpha": 2, "message_steps": 1,
                "seed": 1, "loss": "ce", "pro_block": "_GCNConv"}
        tr = make_dti_trainer(args, ds, task="pair_binary",
                              work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert "auc" in test_result

    def test_missing_contact_map_skipped(self, dti_root):
        from glam_tpu.data.pair_datasets import BindingDBDataset
        d = dti_root / "raw" / "bindingdb_c"
        txt = (d / "train.txt").read_text()
        (d / "train.txt").write_text(
            txt + "\nCCO UNKNOWNSEQX 1")
        ds = BindingDBDataset(str(dti_root))
        assert ds.skipped_proteins >= 1
        assert len(ds.train) == 20


@pytest.fixture(scope="module")
def litpcba_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("litpcba")
    base = root / "raw" / "lit_pcba" / "ALDH1"
    base.mkdir(parents=True)
    rng = np.random.RandomState(3)
    actives = ["CCO", "CCN", "CCS", "CC=O", "CO", "CN", "CCCO", "CCCN",
               "OCCO", "NCCN", "OCCN", "SCCS"]
    inactives = ["CCC", "CCCC", "c1ccccc1", "CC(C)C", "CCOC", "CCCl"] * 4
    base.joinpath("actives.smi").write_text(
        "\n".join(f"{s} A{i}" for i, s in enumerate(actives)))
    base.joinpath("inactives.smi").write_text(
        "\n".join(f"{s} I{i}" for i, s in enumerate(inactives)))
    base.joinpath("ALDH1.seq").write_text("ACDEFGHIKLMNPQRSTVWY")
    return root


class TestLITPCBA:
    def test_dataset(self, litpcba_root):
        from glam_tpu.data.pair_datasets import LITPCBADataset
        ds = LITPCBADataset(str(litpcba_root), target="ALDH1")
        n = len(ds.train) + len(ds.val)
        assert n == 36
        assert ds.test == ds.val            # V-set doubles as test
        assert ds.class_weights.shape == (2,)
        assert ds.class_weights[1] > ds.class_weights[0]  # actives rarer
        assert ds.pro_num_node_features == 49

    def test_screening_training(self, litpcba_root, tmp_path):
        from glam_tpu.data.pair_datasets import LITPCBADataset
        from glam_tpu.train.pair_trainer import make_dti_trainer
        ds = LITPCBADataset(str(litpcba_root), target="ALDH1")
        args = {"dataset": "lit_aldh1", "epochs": 1, "batch_size": 8,
                "e_dim": 32, "hid_dim_alpha": 2, "message_steps": 1,
                "seed": 1, "loss": "wce", "pro_block": "_GCNConv"}
        tr = make_dti_trainer(args, ds, task="pair_screening",
                              work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert "bedroc" in test_result and "ef_005" in test_result


class TestDDIMulticlass:
    def test_multiclass_training(self, tmp_path):
        import pandas as pd
        from glam_tpu.data.pair_datasets import DDIDataset
        from glam_tpu.train.pair_trainer import make_ddi_trainer
        root = tmp_path / "ddimc"
        (root / "raw").mkdir(parents=True)
        rng = np.random.RandomState(5)
        smis = ["CCO", "CCC", "c1ccccc1", "CCN", "CCOC", "CC(C)C"]
        rows = [{"Drug1_SMILES": rng.choice(smis),
                 "Drug2_SMILES": rng.choice(smis),
                 "label": int(rng.randint(0, 5))} for _ in range(60)]
        pd.DataFrame(rows).to_csv(root / "raw" / "drugbank_caster.csv",
                                  index=False)
        ds = DDIDataset(str(root))
        assert ds.num_classes == 5
        args = {"dataset": "drugbank_caster", "epochs": 1,
                "batch_size": 16, "e_dim": 32, "hid_dim_alpha": 2,
                "message_steps": 1, "seed": 1, "loss": "ce"}
        tr = make_ddi_trainer(args, ds, work_dir=str(tmp_path))
        assert tr.task == "pair_multiclass"
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert "f1" in test_result
