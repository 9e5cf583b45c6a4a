"""Pair-task system-level reachability (round-2): run-CLI routing, pair
search spaces, canonical molecule identity, and pair ensembling."""
import ast
import numpy as np
import pandas as pd
import pytest

from glam_tpu.chem.scaffold import molecule_key


class TestMoleculeKey:
    def test_spellings_collapse(self):
        assert molecule_key("CCO") == molecule_key("OCC")
        assert molecule_key("c1ccccc1") == molecule_key("C1=CC=CC=C1")
        assert molecule_key("C(C)O") == molecule_key("CCO")

    def test_distinct_molecules_distinct(self):
        keys = {molecule_key(s) for s in
                ["CCO", "CCC", "CCN", "c1ccccc1", "c1ccncc1", "CC(C)C",
                 "[13CH4]", "C", "[CH3-]", "CC"]}
        assert len(keys) == 10

    def test_unparseable_empty(self):
        assert molecule_key("not_a_smiles((((") == ""

    def test_kekule_aromatic_spellings_collapse(self):
        """Implicit-H counts are spelling-invariant: the Kekulé and
        aromatic forms of one heteroaromatic map to one store key (the
        reference dedups via RDKit canonical SMILES,
        src_2gi_ddi/dataset.py:118-124)."""
        pairs = [("c1ccsc1", "C1=CC=CS1"),        # thiophene
                 ("c1ccoc1", "C1=CC=CO1"),        # furan
                 ("c1cc[nH]c1", "C1=CC=CN1"),     # pyrrole (N-H!)
                 ("c1ccncc1", "C1=CC=NC=C1"),     # pyridine
                 ("c1cnc[nH]1", "C1=NC=CN1"),     # imidazole
                 ("Cc1ccccc1", "CC1=CC=CC=C1")]   # toluene
        for a, b in pairs:
            assert molecule_key(a) == molecule_key(b), (a, b)
        # and the heteroaromatics stay mutually distinct
        assert len({molecule_key(s) for s, _ in pairs}) == len(pairs)

    def test_aromatic_chalcogen_no_implicit_h(self):
        """Two-connected aromatic O/S donate a lone pair, not an H
        (RDKit semantics): thiophene S has 0 implicit hydrogens."""
        from glam_tpu.chem.smiles import parse_smiles
        s_atom = [a for a in parse_smiles("c1ccsc1").atoms
                  if a.symbol == "S"][0]
        assert s_atom.num_h == 0


@pytest.fixture(scope="module")
def ddi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ddi_cli")
    (root / "raw").mkdir()
    rng = np.random.RandomState(0)
    # include alternative spellings of the same molecules: the canonical
    # store must collapse them
    smis = ["CCO", "OCC", "CCC", "c1ccccc1", "C1=CC=CC=C1", "CCN",
            "CCOC", "CC(C)C"]
    rows = []
    for i in range(40):
        s1, s2 = rng.choice(smis, 2, replace=False)
        rows.append({"Drug1_SMILES": s1, "Drug2_SMILES": s2,
                     "label": int(rng.rand() > 0.5)})
    pd.DataFrame(rows).to_csv(root / "raw" / "drugbank_caster.csv",
                              index=False)
    return root


class TestCanonicalStore:
    def test_dedup_across_spellings(self, ddi_root):
        from glam_tpu.data.pair_datasets import DDIDataset
        ds = DDIDataset(str(ddi_root))
        # 8 raw spellings, 6 distinct molecules
        assert len(ds.mol_store) == 6


class TestAutoDatasetRouting:
    def test_ddi(self, ddi_root):
        from glam_tpu.data.datasets import auto_dataset
        args = {"dataset": "drugbank_caster",
                "dataset_root": str(ddi_root), "loss": "mse"}
        args, ds, kind = auto_dataset(args)
        assert kind == "pair_ddi"
        assert args["loss"] == "bcel"
        assert hasattr(ds, "mol_store")

    def test_unknown_still_raises(self):
        from glam_tpu.data.datasets import auto_dataset
        with pytest.raises(ValueError):
            auto_dataset({"dataset": "nope", "dataset_root": "."})


class TestPairSearchSpace:
    def test_ddi_space(self):
        import random
        from glam_tpu.automl.search_space import sample_config
        r = random.Random(0)
        cfg, cid = sample_config("drugbank_caster", "/data", rng=r)
        assert cfg["loss"] == "bcel" and cfg["epochs"] == 20
        assert "end_act" in cfg and "pro_block" not in cfg
        assert len(cid) == 5

    def test_dti_space(self):
        import random
        from glam_tpu.automl.search_space import sample_config
        r = random.Random(0)
        seen_blocks, seen_losses = set(), set()
        for _ in range(40):
            cfg, _ = sample_config("bindingdb_c", "/data", rng=r)
            assert cfg["mol_block"] in ("_TripletMessage", "_NNConv")
            assert cfg["pro_block"] in ("_NNConv", "_GCNConv", "_GATConv")
            assert cfg["pro_readout"] in ("GlobalLAPool", "Set2Set",
                                          "GlobalPool5")
            assert cfg["hid_dim_alpha"] in (1, 2, 6)
            seen_blocks.add(cfg["pro_block"])
            seen_losses.add(cfg["loss"])
            # bindingdb tweak on the Ranger branch (reference quirk)
            if cfg["optim"] == "Ranger":
                assert cfg["loss"] in ("ce", "focal")
            else:
                assert cfg["loss"] in ("wce", "focal")
        assert len(seen_blocks) == 3

    def test_screening_space_keeps_wce(self):
        import random
        from glam_tpu.automl.search_space import sample_config
        r = random.Random(1)
        for _ in range(20):
            cfg, _ = sample_config("ALDH1", "/data", rng=r)
            assert cfg["loss"] in ("wce", "focal")

    def test_config2cmd_carries_pair_flags(self):
        from glam_tpu.automl.search_space import config2cmd
        argv = config2cmd({"dataset": "bindingdb_c", "pro_block":
                           "_GCNConv", "pro_readout": "Set2Set",
                           "end_act": "CELU", "task": "pair_binary"})
        s = " ".join(argv)
        assert "--pro_block _GCNConv" in s
        assert "--pro_readout Set2Set" in s
        assert "--end_act CELU" in s
        assert "--task" not in s  # trainer-internal keys dropped


class TestPairRunCLI:
    def test_ddi_end_to_end_and_blend(self, ddi_root, tmp_path):
        """One command trains a DDI trial; two runs blend (mean-score)."""
        from glam_tpu.run import main
        from glam_tpu.automl.summary import select_top_runs

        base = ["--dataset", "drugbank_caster", "--dataset_root",
                str(ddi_root), "--epochs", "1", "--batch_size", "16",
                "--e_dim", "32", "--hid_dim_alpha", "2",
                "--message_steps", "1", "--work_dir", str(tmp_path)]
        t1 = main(base + ["--seed", "1", "--note", "cfgA"])
        t2 = main(base + ["--seed", "2", "--note", "cfgA"])
        assert t1.task == "pair_binary_bce"
        logs_dir = tmp_path / "log_drugbank_caster"
        assert (logs_dir / t1.run_id / "best_save.ckpt").exists()

        sel = select_top_runs(logs_dir, "drugbank_caster", 2)
        assert len(sel) == 2

        from glam_tpu.automl.ensemble import blend_and_inference
        result = blend_and_inference(list(sel["id"]), list(sel["config"]),
                                     tmp_path)
        assert "auc" in result and np.isfinite(result["auc"])


@pytest.fixture(scope="module")
def dti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dti_cli")
    d = root / "raw" / "bindingdb_c"
    d.mkdir(parents=True)
    rng = np.random.RandomState(1)
    seqs = ["ACDEFGHIKL", "MNPQRSTVWY"]
    maps = {s: np.zeros((len(s), len(s)), np.float32) for s in seqs}
    np.savez(d / "protein_maps.npz", sequences=np.asarray(seqs),
             **{f"map_{i}": maps[s] for i, s in enumerate(seqs)})
    smis = ["CCO", "CCC", "c1ccccc1", "CCN"]
    for name, n in [("train", 16), ("dev", 6), ("test", 6)]:
        lines = [f"{rng.choice(smis)} {rng.choice(seqs)} "
                 f"{int(rng.rand() > 0.5)}" for _ in range(n)]
        (d / f"{name}.txt").write_text("\n".join(lines))
    return root


class TestDTIRunCLI:
    def test_bindingdb_end_to_end(self, dti_root, tmp_path):
        from glam_tpu.run import main
        t = main(["--dataset", "bindingdb_c", "--dataset_root",
                  str(dti_root), "--epochs", "1", "--batch_size", "8",
                  "--e_dim", "32", "--hid_dim_alpha", "2",
                  "--message_steps", "1", "--pro_block", "_GCNConv",
                  "--pro_readout", "GlobalLAPool",
                  "--work_dir", str(tmp_path)])
        assert t.task == "pair_binary"
        assert t.args["loss"] == "ce"  # mse default remapped
        assert t.model.cfg.pro_readout == "GlobalLAPool"
        log = (tmp_path / "log_bindingdb_c" / t.run_id / "log.txt")
        last = log.read_text().strip().splitlines()[-1]
        assert last.count("|") == 2  # parseable final triple


@pytest.fixture(scope="module")
def litpcba_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("litpcba_cli")
    base = root / "raw" / "lit_pcba" / "ALDH1"
    base.mkdir(parents=True)
    rng = np.random.RandomState(2)
    smis = ["CCO", "CCC", "c1ccccc1", "CCN", "CCOC", "CC(C)C"]
    (base / "actives.smi").write_text("\n".join(
        f"{rng.choice(smis)} a{i}" for i in range(16)))
    (base / "inactives.smi").write_text("\n".join(
        f"{rng.choice(smis)} i{i}" for i in range(24)))
    (base / "ALDH1.seq").write_text("ACDEFGHIKLMNPQRSTVWY")
    return root


class TestScreeningRunCLI:
    def test_litpcba_end_to_end(self, litpcba_root, tmp_path):
        from glam_tpu.run import main
        t = main(["--dataset", "ALDH1", "--dataset_root",
                  str(litpcba_root), "--epochs", "1", "--batch_size",
                  "8", "--e_dim", "16", "--hid_dim_alpha", "2",
                  "--message_steps", "1", "--work_dir", str(tmp_path)])
        assert t.task == "pair_screening"
        assert t.args["loss"] == "wce"  # default remap for screening
        assert t.class_weights is not None
        log = tmp_path / "log_ALDH1" / t.run_id / "log.txt"
        last = log.read_text().strip().splitlines()[-1]
        assert "bedroc" in last and "ef" in last  # screening metrics


class TestDDISolverE2E:
    def test_search_refine_blend(self, ddi_root, tmp_path):
        """The complete pair-task AutoML loop — random search
        (subprocess trials), log parsing/ranking, high-fidelity rerun,
        mean-score blending — through glam_tpu.automl.solver.GLAM
        ('AutoML over molecular interactions', GLAM's title claim)."""
        import os
        from glam_tpu.automl.solver import GLAM
        env = dict(os.environ, GLAM_TPU_TRIAL_SLOTS="2")
        s = GLAM(dataset="drugbank_caster", dataset_root=str(ddi_root),
                 n_init_configs=2, n_low_fidelity_seed=1, n_top_blend=2,
                 n_high_fidelity_seed=1, seed=11,
                 work_dir=str(tmp_path), low_fidelity_epochs=1,
                 high_fidelity_epochs=1, platform="cpu", env=env)
        s.low_fidelity_training()
        # refine only the top config: one subprocess trial exercises the
        # whole high-fidelity path; blending still selects 2 checkpoints
        # from the pooled (low+high fidelity) runs
        s.high_fidelity_training(top_n=1)
        result = s.blend_and_inference()
        assert result is not None and "auc" in result
        assert np.isfinite(result["auc"])
        # artifacts: solver log + per-run logs with the parseable line
        assert (tmp_path / "log_drugbank_caster"
                / "solver_log.txt").exists()
        assert (tmp_path / "log_drugbank_caster"
                / "inf_ckpt_selected.csv").exists()


class TestVoteBlend:
    def test_dti_vote_and_mean_score(self):
        from glam_tpu.automl.ensemble import _blend_outputs
        y = np.array([1, 0, 1, 0, 1])
        outs = [
            (y, np.array([1, 0, 1, 1, 1]), np.array([.9, .2, .8, .6, .7])),
            (y, np.array([1, 0, 0, 1, 1]), np.array([.8, .1, .4, .7, .9])),
            (y, np.array([1, 0, 1, 0, 1]), np.array([.7, .3, .9, .2, .6])),
        ]
        res = _blend_outputs("pair_binary", "bindingdb_c", outs)
        # vote: [1,0,1,1,1]; mean scores drive auc
        assert res["acc"] == pytest.approx(0.8)
        assert np.isfinite(res["auc"])

    def test_screening_blend_has_bedroc(self):
        from glam_tpu.automl.ensemble import _blend_outputs
        rng = np.random.RandomState(0)
        y = (rng.rand(60) > 0.8).astype(int)
        outs = [(y, (rng.rand(60) > 0.5).astype(int), rng.rand(60))
                for _ in range(3)]
        res = _blend_outputs("pair_screening", "ALDH1", outs)
        assert "bedroc" in res and "ef_0.01" in res or "bedroc" in res

    def test_multiclass_blend(self):
        from glam_tpu.automl.ensemble import blend_multi_class
        y = np.array([0, 1, 2, 1])
        p1 = np.eye(3)[[0, 1, 2, 0]] * 0.9 + 0.03
        p2 = np.eye(3)[[0, 1, 2, 1]] * 0.9 + 0.03
        p3 = np.eye(3)[[0, 1, 2, 1]] * 0.9 + 0.03
        res = blend_multi_class([(y, p.argmax(-1), p)
                                 for p in (p1, p2, p3)])
        assert res["acc"] == pytest.approx(1.0)
