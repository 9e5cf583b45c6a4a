"""Training-engine tests: losses, optimizer, scheduler, e2e demo slice."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glam_tpu.train.losses import get_loss
from glam_tpu.train.metrics import (binary_metrics,
                                    binary_metrics_multi_target_nan,
                                    blend_regression, concordance_index,
                                    regression_metrics)
from glam_tpu.train.optim import (ReduceLROnPlateau, get_learning_rate,
                                  gradient_centralization, lookahead,
                                  make_optimizer, set_learning_rate)


class TestLossesVsTorch:
    def _torch(self):
        return pytest.importorskip("torch")

    @pytest.mark.parametrize("name,tname", [
        ("mse", "MSELoss"), ("mae", "L1Loss"), ("huber", "SmoothL1Loss"),
    ])
    def test_elementwise(self, name, tname):
        torch = self._torch()
        rng = np.random.RandomState(0)
        p = rng.randn(20).astype(np.float32)
        t = rng.randn(20).astype(np.float32)
        got = float(get_loss(name)(jnp.asarray(p), jnp.asarray(t)))
        want = float(getattr(torch.nn, tname)()(torch.tensor(p),
                                                torch.tensor(t)))
        assert abs(got - want) < 1e-5

    def test_bcel(self):
        torch = self._torch()
        rng = np.random.RandomState(1)
        logits = rng.randn(20).astype(np.float32)
        t = (rng.rand(20) > 0.5).astype(np.float32)
        got = float(get_loss("bcel")(jnp.asarray(logits), jnp.asarray(t)))
        want = float(torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                                  torch.tensor(t)))
        assert abs(got - want) < 1e-5

    def test_ce(self):
        torch = self._torch()
        rng = np.random.RandomState(2)
        logits = rng.randn(10, 3).astype(np.float32)
        t = rng.randint(0, 3, 10)
        got = float(get_loss("ce")(jnp.asarray(logits), jnp.asarray(t)))
        want = float(torch.nn.CrossEntropyLoss()(
            torch.tensor(logits), torch.tensor(t)))
        assert abs(got - want) < 1e-5

    def test_focal(self):
        rng = np.random.RandomState(3)
        logits = rng.randn(10, 2).astype(np.float32)
        t = rng.randint(0, 2, 10)
        got = float(get_loss("focal")(jnp.asarray(logits), jnp.asarray(t)))
        assert np.isfinite(got) and got > 0

    def test_weighted_masking(self):
        p = jnp.asarray([1.0, 2.0, 100.0])
        t = jnp.asarray([1.0, 2.0, 0.0])
        w = jnp.asarray([1.0, 1.0, 0.0])
        assert float(get_loss("mse")(p, t, weight=w)) == 0.0


class TestOptim:
    def test_gradient_centralization(self):
        tx = gradient_centralization()
        g = {"w": jnp.ones((4, 3)), "b": jnp.ones((3,))}
        s = tx.init(g)
        u, _ = tx.update(g, s)
        np.testing.assert_allclose(np.asarray(u["w"]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(u["b"]), 1.0)

    def test_lookahead_sync(self):
        tx = lookahead(k=2, alpha=0.5)
        params = {"w": jnp.zeros(3)}
        s = tx.init(params)
        # step 1: no sync
        u, s = tx.update({"w": jnp.ones(3)}, s, params)
        np.testing.assert_allclose(np.asarray(u["w"]), 1.0)
        params = {"w": params["w"] + u["w"]}
        # step 2: sync; fast would be 2.0, slow=0 -> slow'=1.0, upd=1-1=0
        u, s = tx.update({"w": jnp.ones(3)}, s, params)
        params = {"w": params["w"] + u["w"]}
        np.testing.assert_allclose(np.asarray(params["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(s.slow["w"]), 1.0)

    @pytest.mark.parametrize("name", ["Adam", "SGD", "Ranger"])
    def test_optimizers_step(self, name):
        tx = make_optimizer(name, 1e-2, k=2)
        params = {"w": jnp.ones((4, 3)), "b": jnp.zeros(3)}
        s = tx.init(params)
        rng = np.random.RandomState(0)
        g = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32),
             "b": jnp.full((3,), 0.1)}
        u, s = tx.update(g, s, params)
        p2 = optax.apply_updates(params, u)
        assert float(jnp.abs(p2["w"] - params["w"]).max()) > 0
        # mutable lr
        assert abs(get_learning_rate(s) - 1e-2) < 1e-9
        s = set_learning_rate(s, 5e-3)
        assert abs(get_learning_rate(s) - 5e-3) < 1e-9

    def test_reduce_lr_on_plateau(self):
        sch = ReduceLROnPlateau(factor=0.5, patience=1, min_lr=1e-6)
        lr = 1.0
        lr = sch.step(1.0, lr)   # best
        lr = sch.step(1.0, lr)   # bad 1
        assert lr == 1.0
        lr = sch.step(1.0, lr)   # bad 2 > patience -> reduce
        assert lr == 0.5


class TestMetrics:
    def test_concordance_index_reference_parity(self):
        rng = np.random.RandomState(0)
        y = rng.randn(50)
        f = y + 0.5 * rng.randn(50)

        def ref_ci(y, f):  # the reference O(n^2) loop (metrics.py:57-78)
            ind = np.argsort(y)
            y, f = y[ind], f[ind]
            i = len(y) - 1
            j = i - 1
            z = S = 0.0
            while i > 0:
                while j >= 0:
                    if y[i] > y[j]:
                        z += 1
                        u = f[i] - f[j]
                        if u > 0:
                            S += 1
                        elif u == 0:
                            S += 0.5
                    j -= 1
                i -= 1
                j = i - 1
            return S / z

        assert abs(concordance_index(y, f) - ref_ci(y, f)) < 1e-12

    def test_multitask_nan_masking(self):
        y = np.array([[1, -1], [0, 1], [1, 0], [0, -1]])
        s = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3], [0.1, 0.6]])
        d = binary_metrics_multi_target_nan(y, s)
        assert 0 <= d["auc"] <= 1

    def test_blend_regression(self):
        y = np.array([1.0, 2.0, 3.0])
        out = [(y, y + 0.2), (y, y - 0.2)]
        d = blend_regression(out)
        assert d["rmse"] < 0.21  # blending averages the errors away
        pred = blend_regression(out, return_pred=True)
        np.testing.assert_allclose(pred, y, atol=1e-6)


class TestEndToEnd:
    def test_demo_slice(self, tmp_path):
        """Train 2 epochs on a 64-molecule demo subset; checks the full
        loop: loaders, jitted step, early-stop bookkeeping, checkpoint
        save/load, parseable final line (reference demo.py parity)."""
        import pandas as pd
        from glam_tpu.data.datasets import MolDataset, auto_dataset
        from glam_tpu.train.trainer import make_trainer

        src = pd.read_csv("datasets/demo/raw/demo.csv").head(64)
        root = tmp_path / "demo"
        (root / "raw").mkdir(parents=True)
        src.to_csv(root / "raw" / "demo.csv", index=False)
        args = {"dataset": "demo", "dataset_root": str(root), "loss": "bcel",
                "epochs": 2, "batch_size": 16, "e_dim": 32,
                "hid_dim_alpha": 2, "message_steps": 2, "lr": 1e-3,
                "optim": "Ranger", "k": 2, "seed": 1}
        args, ds, kind = auto_dataset(args)
        assert kind == "binary_nan_bce"
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        loss_info, test_result, val_new = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        assert "auc" in test_result
        # final line parseable with literal_eval (ensemble-layer contract)
        import ast
        lines = (tr.log_save_dir / "log.txt").read_text().strip().split("\n")
        parts = lines[-1].split("|")
        assert len(parts) == 3
        li = ast.literal_eval(parts[0])
        assert "testloss" in li
        # checkpoint reload keeps outputs identical
        out1 = tr.valid_iterations(mode="valid")
        tr.load_best_ckpt()
        out2 = tr.valid_iterations(mode="valid")
        assert abs(out1[0] - out2[0]) < 1e-9

    def test_regression_slice(self, tmp_path):
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer

        rng = np.random.RandomState(0)
        smis = ["CCO", "CCC", "CCCC", "CCCCC", "c1ccccc1", "Cc1ccccc1",
                "CCN", "CCOC", "CC(C)C", "CC(C)O", "CCS", "CCCl"] * 4
        df = pd.DataFrame({"smiles": smis,
                           "expt": rng.randn(len(smis))})
        root = tmp_path / "freesolv"
        (root / "raw").mkdir(parents=True)
        df.to_csv(root / "raw" / "freesolv.csv", index=False)
        args = {"dataset": "freesolv", "dataset_root": str(root),
                "loss": "mse", "epochs": 1, "batch_size": 16, "e_dim": 32,
                "hid_dim_alpha": 2, "message_steps": 1, "seed": 1,
                "mol_block": "_GCNConv"}
        args, ds, kind = auto_dataset(args)
        assert kind == "regression"
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()
        assert "rmse" in test_result

    def test_bfloat16_compute(self, tmp_path):
        """Mixed precision (--dtype bfloat16): master params stay f32,
        forward/backward runs in bf16.  Training must stay stable and
        eval outputs must track the f32 run within bf16 tolerance."""
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer

        src = pd.read_csv("datasets/demo/raw/demo.csv").head(64)
        root = tmp_path / "demo"
        (root / "raw").mkdir(parents=True)
        src.to_csv(root / "raw" / "demo.csv", index=False)
        base = {"dataset": "demo", "dataset_root": str(root),
                "loss": "bcel", "epochs": 2, "batch_size": 16,
                "e_dim": 32, "hid_dim_alpha": 2, "message_steps": 2,
                "lr": 1e-3, "seed": 1, "scan_steps": 2}

        args, ds, kind = auto_dataset(dict(base, dtype="bfloat16"))
        tr16 = make_trainer(args, ds, kind, work_dir=str(tmp_path / "bf"))
        # master params stay f32
        for p in jax.tree_util.tree_leaves(tr16.state.params):
            assert p.dtype == jnp.float32
        li16, _, _ = tr16.train_and_test()
        assert np.isfinite(li16["valloss"])

        args, ds, kind = auto_dataset(dict(base))
        tr32 = make_trainer(args, ds, kind, work_dir=str(tmp_path / "f32"))
        # same init: eval outputs of the untrained models must agree to
        # bf16 rounding
        out16, _, _ = tr16._gather("valid")
        tr16.state = tr16.state.replace(params=tr32.state.params)
        out16_init, _, _ = tr16._gather("valid")
        out32_init, _, _ = tr32._gather("valid")
        np.testing.assert_allclose(out16_init, out32_init,
                                   rtol=0.05, atol=0.05)

    def test_resume_matches_straight_run(self, tmp_path):
        """Mid-training resume (beyond the reference, which restarts
        from epoch 0): 2 epochs + resume for 2 more must produce the
        SAME params as 4 straight epochs — optimizer state (incl.
        Ranger lookahead slow weights + injected lr), scheduler state,
        step counter and shuffle order all survive the round trip."""
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer

        rng = np.random.RandomState(0)
        smis = ["CCO", "CCC", "CCCC", "CCCCC", "c1ccccc1", "Cc1ccccc1",
                "CCN", "CCOC", "CC(C)C", "CC(C)O", "CCS", "CCCl"] * 4
        df = pd.DataFrame({"smiles": smis, "expt": rng.randn(len(smis))})
        root = tmp_path / "freesolv"
        (root / "raw").mkdir(parents=True)
        df.to_csv(root / "raw" / "freesolv.csv", index=False)
        base = {"dataset": "freesolv", "dataset_root": str(root),
                "loss": "mse", "batch_size": 16, "e_dim": 32,
                "hid_dim_alpha": 2, "message_steps": 1, "seed": 1,
                "mol_block": "_GCNConv", "optim": "Ranger", "k": 2,
                "scan_steps": 1}

        # straight-through 4 epochs
        args, ds, kind = auto_dataset(dict(base, epochs=4))
        tr_ref = make_trainer(args, ds, kind, work_dir=str(tmp_path / "a"))
        tr_ref.train()

        # 2 epochs, then resume for 2 more
        args, ds, kind = auto_dataset(dict(base, epochs=2))
        tr1 = make_trainer(args, ds, kind, work_dir=str(tmp_path / "b"))
        tr1.train()
        run_dir = tr1.log_save_dir
        assert (run_dir / "last_save.ckpt").exists()

        args, ds, kind = auto_dataset(dict(base, epochs=4))
        tr2 = make_trainer(args, ds, kind, work_dir=str(tmp_path / "b"))
        start = tr2.resume(run_dir)
        assert start == 2
        assert tr2.log_save_dir == run_dir
        tr2.train()

        ref_leaves = jax.tree_util.tree_leaves(tr_ref.state.params)
        res_leaves = jax.tree_util.tree_leaves(tr2.state.params)
        for a, b in zip(ref_leaves, res_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=0)
        assert int(tr2.state.step) == int(tr_ref.state.step)

    def test_resume_rejects_mismatched_config(self, tmp_path):
        import pandas as pd
        import pytest
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer

        smis = ["CCO", "CCC", "CCCC", "CCCCC"] * 4
        df = pd.DataFrame({"smiles": smis,
                           "expt": np.arange(len(smis), dtype=float)})
        root = tmp_path / "freesolv"
        (root / "raw").mkdir(parents=True)
        df.to_csv(root / "raw" / "freesolv.csv", index=False)
        base = {"dataset": "freesolv", "dataset_root": str(root),
                "loss": "mse", "batch_size": 8, "e_dim": 32,
                "hid_dim_alpha": 2, "message_steps": 1, "seed": 1,
                "mol_block": "_GCNConv", "epochs": 1}
        args, ds, kind = auto_dataset(dict(base))
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        tr.train()
        args, ds, kind = auto_dataset(dict(base, batch_size=4))
        tr2 = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        with pytest.raises(ValueError, match="batch_size"):
            tr2.resume(tr.log_save_dir)


class TestTrainerUtilities:
    def test_gen_test_batch_and_write_datasets(self, tmp_path):
        import pandas as pd
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
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
        p = tr.gen_test_batch(str(tmp_path / "other" / "test_batch.npz"))
        z = np.load(p)
        assert "nodes" in z and z["nodes"].ndim == 2
        tr.write_datasets(str(tmp_path / "splits"))
        df = pd.read_csv(tmp_path / "splits" / "train.csv")
        assert {"smiles", "label"} <= set(df.columns)
        assert len(df) == len(ds.train)


def test_train_stats_logging(tmp_path, monkeypatch):
    """GLAM_TRAIN_STATS=1 logs the per-epoch achieved edges/s and
    prefetch stall fraction (the product-path observability hook)."""
    monkeypatch.setenv("GLAM_TRAIN_STATS", "1")
    import glam_tpu.run as r
    trainer = r.main(["--dataset", "demo",
                      "--dataset_root", "datasets/demo",
                      "--loss", "bcel", "--epochs", "1",
                      "--batch_size", "64", "--e_dim", "16",
                      "--work_dir", str(tmp_path)])
    log = (trainer.log_save_dir / "log.txt").read_text()
    assert "train stats:" in log
    assert "prefetch stall" in log


class TestScreeningFormulas:
    """Direct numerical pins for the screening formulas (the e2e CLI
    tests exercise them only through the pipeline)."""

    def test_bedroc_truchon_bayly_oracle(self):
        # independent evaluation of Truchon & Bayly eq. 36 (RIE form)
        import numpy as np
        from glam_tpu.train.metrics import bedroc_score
        rng = np.random.RandomState(0)
        y = (rng.rand(400) < 0.1).astype(int)
        s = rng.rand(400) + 0.5 * y
        alpha, N, n = 20.0, 400, int(y.sum())
        order = np.argsort(-s)
        ranks = np.flatnonzero(y[order] == 1) + 1.0
        rie = (np.exp(-alpha * ranks / N).mean() * N
               * (np.exp(alpha / N) - 1.0) / (1.0 - np.exp(-alpha)))
        Ra = n / N
        want = (rie * Ra * np.sinh(alpha / 2)
                / (np.cosh(alpha / 2) - np.cosh(alpha / 2 - alpha * Ra))
                + 1.0 / (1.0 - np.exp(alpha * (1.0 - Ra))))
        assert abs(bedroc_score(y, s) - want) < 1e-10

    def test_bedroc_bounds(self):
        import numpy as np
        from glam_tpu.train.metrics import bedroc_score
        y = np.r_[np.ones(10), np.zeros(190)]
        s = -np.arange(200, dtype=float)  # perfect ranking
        assert bedroc_score(y, s) > 0.999
        assert bedroc_score(y, -s) < 0.01  # worst ranking

    def test_enrichment_factor(self):
        import numpy as np
        from glam_tpu.train.metrics import enrichment_factor_single
        y = np.r_[np.ones(5), np.zeros(95)]
        s = -np.arange(100, dtype=float)  # all actives in the top 5
        # EF@5%: top-5 window holds all 5 actives -> 5/5 / 0.05 = 20
        assert enrichment_factor_single(y, s, 0.05) == 20.0
        # EF@20%: window of 20 still holds 5/5 -> 1/0.2 = 5
        assert enrichment_factor_single(y, s, 0.20) == 5.0
        # -1 labels are excluded from ranking and totals
        y2 = np.r_[y, -np.ones(20)]
        s2 = np.r_[s, np.full(20, 99.0)]
        assert enrichment_factor_single(y2, s2, 0.05) == 20.0
