"""AutoML layer tests: sampler, summary parsing, scheduler, viz."""
import subprocess
from pathlib import Path

import numpy as np
import pytest


class TestSearchSpace:
    def test_sample_deterministic(self):
        import random
        from glam_tpu.automl.search_space import sample_config
        c1, id1 = sample_config("demo", "./d", rng=random.Random(5))
        c2, id2 = sample_config("demo", "./d", rng=random.Random(5))
        assert c1 == c2 and id1 == id2
        assert len(id1) == 5

    def test_space_coverage(self):
        import random
        from glam_tpu.automl.search_space import MOL_BLOCKS, sample_config
        r = random.Random(0)
        seen_blocks = set()
        for _ in range(200):
            c, _ = sample_config("demo", "./d", rng=r)
            seen_blocks.add(c["mol_block"])
            assert c["loss"] == "bcel"  # classification dataset
            if c["optim"] != "Ranger":
                assert "k" not in c
        assert seen_blocks == set(MOL_BLOCKS)

    def test_regression_losses(self):
        import random
        from glam_tpu.automl.search_space import sample_config
        r = random.Random(0)
        losses = {sample_config("esol", "./d", rng=r)[0]["loss"]
                  for _ in range(100)}
        assert losses <= {"mse", "mae", "huber"}

    def test_config2cmd_roundtrip(self):
        import random
        from glam_tpu.automl.search_space import config2cmd, sample_config
        from glam_tpu.run import build_parser
        c, _ = sample_config("demo", "./d", rng=random.Random(1))
        c["note"] = "abc12"
        argv = config2cmd(c)[2:]  # strip "-m glam_tpu.run"
        parsed = build_parser().parse_args(argv)
        assert parsed.dataset == "demo"
        assert parsed.mol_block == c["mol_block"]
        assert parsed.lr == c["lr"]


class TestSummary:
    def test_read_and_rank(self, tmp_path):
        from glam_tpu.automl.summary import (read_logs, select_top_runs,
                                             summarize_logs)
        logs_dir = tmp_path / "log_demo"
        for i, auc in enumerate([0.7, 0.9, 0.8]):
            d = logs_dir / f"run{i}_seed_1"
            d.mkdir(parents=True)
            cfg = {"dataset": "demo", "note": f"c{i}", "epochs": 30,
                   "seed": 1, "batch_size": 32, "mol_block": "_NNConv",
                   "optim": "Adam", "lr": 0.001}
            (d / "log.txt").write_text(
                "Training start...\n"
                f"{cfg}\n"
                f"{{'testloss': 0.5, 'valloss': 0.4}}|"
                f"{{'auc': {auc}}}|{{'valauc': {auc}}}\n")
        # plus one unfinished run that must be skipped
        bad = logs_dir / "crashed_seed_2"
        bad.mkdir()
        (bad / "log.txt").write_text("Training start...\nEpoch:0 ...\n")
        logs = read_logs(logs_dir)
        assert len(logs) == 3
        sel = select_top_runs(logs_dir, "demo", 2)
        assert list(sel["valauc"]) == [0.9, 0.8]
        summary = summarize_logs(logs, "demo", logs_dir)
        assert (logs_dir / "logs_summary.csv").exists()
        assert summary.iloc[0]["valauc_mean"] == 0.9

    def test_inf_results_skipped(self, tmp_path):
        from glam_tpu.automl.summary import read_logs
        d = tmp_path / "log_demo" / "r_seed_1"
        d.mkdir(parents=True)
        (d / "log.txt").write_text(
            "{'dataset': 'demo'}\n"
            "{'testloss': inf, 'valloss': 0.4}|{'auc': 0.9}|"
            "{'valauc': 0.9}\n")
        assert read_logs(tmp_path / "log_demo") == []


class TestCompilationCache:
    def test_enable_and_disable(self, tmp_path, monkeypatch):
        import jax
        from glam_tpu.utils.cache import enable_compilation_cache

        assert enable_compilation_cache("off") is None
        monkeypatch.setenv("GLAM_TPU_COMPILE_CACHE", "off")
        assert enable_compilation_cache() is None
        monkeypatch.delenv("GLAM_TPU_COMPILE_CACHE")

        d = tmp_path / "xla_cache"
        got = enable_compilation_cache(str(d))
        assert got == str(d) and d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)


class TestScheduler:
    def test_slots(self):
        from glam_tpu.automl.scheduler import DeviceManager
        dm = DeviceManager(num_slots=2, poll_interval=0.05)

        class P:
            def __init__(self):
                self.n = 2

            def poll(self):
                self.n -= 1
                return None if self.n > 0 else 0

        procs = [P(), P()]
        dm.wait_free_slot(procs)  # returns once one P reports done
        assert dm.running(procs) < 2

    def test_device_pinning_slots(self):
        """Each trial gets a DISTINCT device slot; a slot frees when its
        process exits (reference per-GPU pinning, utils.py:219-225)."""
        from glam_tpu.automl.scheduler import DeviceManager
        dm = DeviceManager(num_slots=2, poll_interval=0.01)

        class P:
            def __init__(self):
                self.done = False

            def poll(self):
                return 0 if self.done else None

        slot_procs = {}
        s0 = dm.wait_free_device(slot_procs)
        slot_procs[s0] = P()
        s1 = dm.wait_free_device(slot_procs)
        slot_procs[s1] = P()
        assert {s0, s1} == {0, 1}
        slot_procs[s0].done = True
        s2 = dm.wait_free_device(slot_procs)
        assert s2 == s0


class TestViz:
    def test_layout_and_draw(self, tmp_path):
        from glam_tpu.viz.attention import (draw_molecule,
                                            node_weights_from_embeddings,
                                            spring_layout)
        from glam_tpu.chem.smiles import parse_smiles
        mol = parse_smiles("CC(=O)Oc1ccccc1C(=O)O")
        pos = spring_layout(mol)
        assert pos.shape == (13, 2)
        # bonded atoms closer on average than non-bonded
        import numpy as np
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        bonded = [(b.a, b.b) for b in mol.bonds]
        bd = np.mean([d[a, b] for a, b in bonded])
        assert bd < d[np.triu_indices(13, 1)].mean()
        w = node_weights_from_embeddings(
            np.random.RandomState(0).randn(13, 8))
        assert w.min() >= 0 and w.max() <= 1
        out = tmp_path / "m.png"
        draw_molecule("CC(=O)Oc1ccccc1C(=O)O", w, path=str(out))
        assert out.exists() and out.stat().st_size > 1000


class TestVisualizerE2E:
    def test_visualize_from_trained(self, tmp_path):
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        from glam_tpu.viz.attention import Visualizer
        src = pd.read_csv("datasets/demo/raw/demo.csv").head(32)
        root = tmp_path / "demo"
        (root / "raw").mkdir(parents=True)
        src.to_csv(root / "raw" / "demo.csv", index=False)
        args = {"dataset": "demo", "dataset_root": str(root),
                "loss": "bcel", "epochs": 1, "batch_size": 16,
                "e_dim": 16, "hid_dim_alpha": 2, "message_steps": 1,
                "seed": 1}
        args, ds, kind = auto_dataset(args)
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        tr.train()
        paths = Visualizer(tr).visualize(["CCO", "c1ccccc1"],
                                         str(tmp_path / "viz"))
        assert len(paths) == 2
        import os
        assert all(os.path.getsize(p) > 1000 for p in paths)

    def test_attention_modes(self, tmp_path):
        """lapool/set2set attention modes (reference
        visualize_gp.py:83-104) produce per-atom softmax weights."""
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        from glam_tpu.viz.attention import Visualizer
        src = pd.read_csv("datasets/demo/raw/demo.csv").head(24)
        for readout, mode in [("GlobalLAPool", "lapool_attention"),
                              ("Set2Set", "set2set_attention")]:
            root = tmp_path / f"demo_{mode}"
            (root / "raw").mkdir(parents=True)
            src.to_csv(root / "raw" / "demo.csv", index=False)
            args = {"dataset": "demo", "dataset_root": str(root),
                    "loss": "bcel", "epochs": 1, "batch_size": 12,
                    "e_dim": 16, "hid_dim_alpha": 2, "message_steps": 1,
                    "mol_readout": readout, "seed": 1}
            args, ds, kind = auto_dataset(args)
            tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
            tr.train()
            viz = Visualizer(tr, vis_content=mode)
            emb = np.random.RandomState(0).randn(7, tr.model.cfg.hid_dim)
            w = viz._weights(emb.astype(np.float32))
            assert w.shape == (7,)
            assert w.min() >= 0 and abs(w.sum() - 1.0) < 1e-5
            paths = viz.visualize(["CCO"], str(tmp_path / f"v_{mode}"))
            assert len(paths) == 1

    def test_triplet_attention_mode(self, tmp_path):
        """Per-head TripletMessage attention (beyond the reference's
        three modes): weights are per-atom x per-head in [0,1] and
        visualize() emits one PNG per head."""
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        from glam_tpu.viz.attention import Visualizer
        src = pd.read_csv("datasets/demo/raw/demo.csv").head(24)
        root = tmp_path / "demo_triplet"
        (root / "raw").mkdir(parents=True)
        src.to_csv(root / "raw" / "demo.csv", index=False)
        args = {"dataset": "demo", "dataset_root": str(root),
                "loss": "bcel", "epochs": 1, "batch_size": 12,
                "e_dim": 16, "hid_dim_alpha": 2, "message_steps": 1,
                "mol_block": "_TripletMessage", "seed": 1}
        args, ds, kind = auto_dataset(args)
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        tr.train()
        viz = Visualizer(tr, vis_content="triplet_attention")
        paths = viz.visualize(["CCO"], str(tmp_path / "v_triplet"))
        assert len(paths) == 3  # one per head
        import os
        assert all(os.path.getsize(p) > 1000 for p in paths)

    def test_triplet_attention_weights_softmax(self):
        """The replayed attention is a proper segment softmax: alpha
        sums to 1 over each receiver's incoming edges, per head."""
        from glam_tpu.viz.attention import triplet_attention_weights
        rng = np.random.RandomState(0)
        N, E, C, H = 6, 14, 8, 3
        conv = {"weight_node": rng.randn(C, H * C).astype(np.float32),
                "weight_edge": rng.randn(4, H * C).astype(np.float32),
                "weight_triplet_att":
                    rng.randn(H, 3 * C).astype(np.float32)}
        emb = rng.randn(N, C).astype(np.float32)
        e = rng.randn(E, 4).astype(np.float32)
        snd = rng.randint(0, N, E)
        rcv = rng.randint(0, N, E)
        w = triplet_attention_weights(conv, emb, e, snd, rcv)
        assert w.shape == (N, H)
        assert w.min() >= 0.0 and w.max() <= 1.0 + 1e-6
        # per-head min-max normalization reaches both endpoints
        np.testing.assert_allclose(w.min(axis=0), 0.0, atol=1e-6)
        np.testing.assert_allclose(w.max(axis=0), 1.0, atol=1e-5)

    def test_mode_validation(self):
        from glam_tpu.viz.attention import Visualizer

        class FakeTrainer:
            args = {"mol_readout": "GlobalPool5", "mol_block": "_NNConv"}

        import pytest as _pytest
        with _pytest.raises(ValueError):
            Visualizer(FakeTrainer(), vis_content="lapool_attention")
        with _pytest.raises(ValueError):
            Visualizer(FakeTrainer(), vis_content="triplet_attention")
        with _pytest.raises(ValueError):
            Visualizer(FakeTrainer(), vis_content="nope")


class TestConfig2CmdNone:
    def test_none_values_dropped(self):
        from glam_tpu.automl.search_space import config2cmd
        argv = config2cmd({"dataset": "demo", "platform": None,
                           "lr": 0.001})
        assert "--platform" not in argv
        assert "None" not in argv
        assert "--lr" in argv


class TestHighFidelityRelaunch:
    def test_logged_none_platform_not_forwarded(self, tmp_path):
        """Regression: a finished run log whose config contains
        'platform': None must not relaunch with '--platform None'."""
        from glam_tpu.automl.solver import GLAM
        logs_dir = tmp_path / "log_demo"
        d = logs_dir / "aaaa_seed_1"
        d.mkdir(parents=True)
        cfg = {"dataset": "demo", "dataset_root": "./datasets/demo",
               "note": "aaaa", "epochs": 8, "seed": 1, "lr": 0.001,
               "batch_size": 32, "mol_block": "_NNConv",
               "optim": "Adam", "platform": None, "work_dir": "x"}
        (d / "log.txt").write_text(
            f"{cfg}\n"
            "{'testloss': 0.5, 'valloss': 0.4}|{'auc': 0.9}|"
            "{'valauc': 0.9}\n")
        solver = GLAM(dataset="demo", dataset_root="./datasets/demo",
                      n_init_configs=0, n_top_blend=1,
                      n_high_fidelity_seed=1, work_dir=str(tmp_path),
                      high_fidelity_epochs=1, platform="cpu")
        launched = []

        class FakeProc:
            def wait(self):
                return 0

            def poll(self):
                return 0

        def fake_launch(config):
            from glam_tpu.automl.search_space import config2cmd
            argv = config2cmd(config)
            if solver.platform:
                argv += ["--platform", solver.platform]
            launched.append(argv)
            return FakeProc()

        solver._launch = fake_launch
        solver.high_fidelity_training()
        assert launched, "no high-fidelity trials launched"
        for argv in launched:
            s = " ".join(argv)
            assert "--platform None" not in s
            assert "--platform cpu" in s
            assert "--epochs 1" in s  # high_fidelity_epochs applied


class TestOngoingInfo:
    def test_tails_unfinished_only(self, tmp_path, capsys):
        from glam_tpu.automl.summary import print_ongoing_info
        logs = tmp_path / "log_demo"
        done = logs / "done_seed_1"
        done.mkdir(parents=True)
        (done / "log.txt").write_text("cfg\n{'a': 1}|{'b': 2}|{'c': 3}\n")
        running = logs / "running_seed_2"
        running.mkdir()
        (running / "log.txt").write_text("Training start...\nEpoch:3 ...\n")
        out = print_ongoing_info(logs)
        assert any("running_seed_2" in l for l in out)
        assert not any("done_seed_1" in l for l in out)


class TestSeedGrouping:
    def test_summary_groups_seeds_of_one_config(self, tmp_path):
        """Regression: ranking must average over seeds of the same
        config note, not treat each seed-run as its own group."""
        from glam_tpu.automl.summary import read_logs, summarize_logs
        logs_dir = tmp_path / "log_demo"
        # config A: seeds with auc .6/.8 (mean .7); config B: .75
        runs = [("A", 1, 0.6), ("A", 2, 0.8), ("B", 1, 0.75)]
        for note, seed, auc in runs:
            d = logs_dir / f"{note}{seed}_seed_{seed}"
            d.mkdir(parents=True)
            cfg = {"dataset": "demo", "note": note, "seed": seed,
                   "epochs": 8, "batch_size": 32, "lr": 0.001,
                   "mol_block": "_NNConv", "optim": "Adam"}
            (d / "log.txt").write_text(
                f"{cfg}\n"
                f"{{'testloss': 0.5, 'valloss': 0.4}}|"
                f"{{'auc': {auc}}}|{{'valauc': {auc}}}\n")
        summary = summarize_logs(read_logs(logs_dir), "demo")
        assert len(summary) == 2               # two configs, not three
        assert summary.iloc[0]["note"] == "B"  # .75 > mean(.6,.8)=.7
        assert abs(summary[summary.note == "A"].iloc[0]["valauc_mean"]
                   - 0.7) < 1e-9
        assert "config" in summary.columns     # relaunch needs it


class TestVizCLI:
    def test_cli_from_checkpoint(self, tmp_path):
        """python -m glam_tpu.viz.attention --ckpt <run_dir>: render
        PNGs from a checkpoint WITHOUT the training dataset (the
        reference's visualize_gp.py workflow)."""
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        from glam_tpu.viz.attention import main as viz_main
        src = pd.read_csv("datasets/demo/raw/demo.csv").head(24)
        root = tmp_path / "demo"
        (root / "raw").mkdir(parents=True)
        src.to_csv(root / "raw" / "demo.csv", index=False)
        args = {"dataset": "demo", "dataset_root": str(root),
                "loss": "bcel", "epochs": 1, "batch_size": 12,
                "e_dim": 16, "hid_dim_alpha": 2, "message_steps": 1,
                "seed": 1}
        args, ds, kind = auto_dataset(args)
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        tr.train()
        out = tmp_path / "viz_cli"
        viz_main(["--ckpt", str(tr.log_save_dir), "--smiles", "CCO",
                  "--mode", "hidden_node", "--out_dir", str(out),
                  "--platform", ""])  # backend already pinned to cpu
        pngs = list(out.glob("*.png"))
        assert len(pngs) == 1 and pngs[0].stat().st_size > 1000
