"""Validated compile (--probe_compile): reject lottery-slow executables.

The tunneled remote-compile service hands out executables with ~30x
run-to-run quality variance; a slow one that lands in the persistent
cache would be reloaded by every rerun of that config.  The probe times
the compiled train dispatch before training and, below the floor,
evicts the new persistent-cache entries and recompiles.
"""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def demo_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("probe_demo")
    (root / "raw").mkdir()
    src = pd.read_csv("datasets/demo/raw/demo.csv").head(48)
    src.to_csv(root / "raw" / "demo.csv", index=False)
    return root


def _make_trainer(root, tmp_path, floor):
    from glam_tpu.data.datasets import auto_dataset
    from glam_tpu.train.trainer import make_trainer
    args = {"dataset": "demo", "dataset_root": str(root), "loss": "bcel",
            "epochs": 1, "batch_size": 16, "e_dim": 16,
            "hid_dim_alpha": 1, "message_steps": 1, "lr": 1e-3,
            "seed": 1, "scan_steps": 2, "probe_compile": floor}
    args, ds, kind = auto_dataset(args)
    return make_trainer(args, ds, kind, work_dir=str(tmp_path))


class TestCacheEviction:
    def test_snapshot_and_evict(self, tmp_path):
        import jax
        from glam_tpu.utils.cache import (evict_new_cache_entries,
                                          snapshot_cache_entries)
        old = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", str(tmp_path))
            (tmp_path / "pre_existing-cache").write_bytes(b"keep")
            snap = snapshot_cache_entries()
            assert snap is not None
            (tmp_path / "new_entry-cache").write_bytes(b"slow exe")
            (tmp_path / "new_entry2-cache").write_bytes(b"slow exe")
            assert evict_new_cache_entries(snap) == 2
            assert (tmp_path / "pre_existing-cache").exists()
            assert not (tmp_path / "new_entry-cache").exists()
            # idempotent
            assert evict_new_cache_entries(snap) == 0
        finally:
            jax.config.update("jax_compilation_cache_dir", old)

    def test_no_cache_configured(self):
        import jax
        from glam_tpu.utils.cache import (evict_new_cache_entries,
                                          snapshot_cache_entries)
        old = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", "")
            assert snapshot_cache_entries() is None
            assert evict_new_cache_entries(None) == 0
        finally:
            jax.config.update("jax_compilation_cache_dir", old)


class TestProbeCompile:
    def test_probe_passes_and_training_unaffected(self, demo_root,
                                                  tmp_path):
        """A trivially low floor: probe accepts the first executable and
        training runs to completion with finite losses."""
        tr = _make_trainer(demo_root, tmp_path, floor=1.0)
        loss_info, test_result, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        log = (tr.log_save_dir / "log.txt").read_text()
        assert "compile probe ok" in log

    def test_probe_exhausts_attempts_but_training_continues(self, demo_root,
                                                            tmp_path):
        """An unreachable floor: the probe retries 3x, then keeps the
        last executable and trains (the final attempt does NOT evict —
        that would force an unvalidated 4th compile)."""
        tr = _make_trainer(demo_root, tmp_path, floor=1e30)
        loss_info, _, _ = tr.train_and_test()
        assert np.isfinite(loss_info["valloss"])
        log = (tr.log_save_dir / "log.txt").read_text()
        assert log.count("compile probe SLOW") == 2
        assert "floor not reached" in log

    def test_probe_preserves_state_and_shuffle(self, demo_root, tmp_path):
        """The probe's disposable-state steps and its loader peek must
        not change training: same final val loss as a probe-free run."""
        tr1 = _make_trainer(demo_root, tmp_path / "a", floor=0.0)
        li1, _, _ = tr1.train_and_test()
        tr2 = _make_trainer(demo_root, tmp_path / "b", floor=1.0)
        li2, _, _ = tr2.train_and_test()
        assert li1["valloss"] == pytest.approx(li2["valloss"], abs=1e-7)


class TestDivergenceHandling:
    def test_diverged_run_exits_cleanly(self, demo_root, tmp_path):
        """A diverging config (lr=1e8) must stop early with a logged
        'diverged' line and complete train_and_test WITHOUT feeding NaN
        scores into sklearn (the reference crashes with
        'Input contains NaN' there; the solver must see a skipped
        trial, not a traceback)."""
        from glam_tpu.data.datasets import auto_dataset
        from glam_tpu.train.trainer import make_trainer
        args = {"dataset": "demo", "dataset_root": str(demo_root),
                "loss": "bcel", "epochs": 3, "batch_size": 16,
                "e_dim": 16, "hid_dim_alpha": 1, "message_steps": 1,
                "lr": 1e8, "seed": 1, "scan_steps": 2}
        args, ds, kind = auto_dataset(args)
        tr = make_trainer(args, ds, kind, work_dir=str(tmp_path))
        loss_info, test_result, _ = tr.train_and_test()  # must not raise
        log = (tr.log_save_dir / "log.txt").read_text()
        assert "diverged" in log
        assert "stopping training early" in log
        assert test_result.get("diverged") == 1.0 or \
            np.isfinite(loss_info["testloss"])
