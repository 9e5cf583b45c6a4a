"""AutoML solver: random search + low/high-fidelity scheduling + blending.

Parity with reference glam.py GLAM + trainer.py GLAMHelper, redesigned
for TPU topology:
  * trials run as subprocesses of the run CLI (one trial per device
    group), scheduled by :class:`glam_tpu.automl.scheduler.DeviceManager`
    instead of the nvidia-smi polling GPUManager (utils.py:190-246);
  * results are read from the per-run log files (the reference's
    filesystem IPC contract, kept deliberately so crashed trials are
    tolerated by omission);
  * ``auto_blend`` = high-fidelity reruns of the top configs, then
    mean-score / mean-pred ensembling over the top checkpoints
    (trainer.py:349-437).
"""
from __future__ import annotations

import ast
import random
import subprocess
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

from ..data.datasets import DATASET_NAMES
from .scheduler import DeviceManager
from .search_space import config2cmd, config_id, sample_config
from .summary import auto_summarize_logs, read_logs, select_top_runs


class GLAM:
    """Random-search solver (reference glam.py:13-120)."""

    SEEDS = [12, 123, 1234, 16, 32, 50, 64, 100, 128, 200]

    def __init__(self, dataset: str, dataset_root: str,
                 n_init_configs: int = 200, n_low_fidelity_seed: int = 3,
                 n_top_blend: int = 3, n_high_fidelity_seed: int = 5,
                 seed: int = 1234, split_seed: int = 1234,
                 work_dir: str = ".", env: Optional[Dict] = None,
                 high_fidelity_epochs: int = 2000,
                 low_fidelity_epochs: Optional[int] = None,
                 platform: Optional[str] = None,
                 probe_compile: float = 0.0, pro_shards: int = 1,
                 halo: str = "a2a", pair_batch: int = 1):
        self.dataset = dataset
        self.dataset_root = dataset_root
        self.n_init_configs = n_init_configs
        self.n_low_fidelity_seed = n_low_fidelity_seed
        self.n_top_blend = n_top_blend
        self.n_high_fidelity_seed = n_high_fidelity_seed
        self.seed = seed
        self.split_seed = split_seed
        self.high_fidelity_epochs = high_fidelity_epochs
        self.low_fidelity_epochs = low_fidelity_epochs
        self.platform = platform
        self.probe_compile = float(probe_compile or 0.0)
        self.pro_shards = int(pro_shards or 1)
        self.halo = str(halo or "a2a")
        if self.halo not in ("a2a", "ring", "auto"):
            # fail here, not in every trial subprocess
            raise ValueError(f"halo must be 'a2a', 'ring' or 'auto', "
                             f"got {self.halo!r}")
        if self.halo != "a2a" and self.pro_shards <= 1:
            # --halo only reaches trials on the sharded path; dropping
            # it silently would contradict the eager validation above
            raise ValueError(
                f"halo={self.halo!r} requires pro_shards > 1 (the halo "
                "exchange only exists on the sharded protein path)")
        self.pair_batch = int(pair_batch or 1)
        if self.pair_batch > 1 and self.pro_shards <= 1:
            raise ValueError(
                f"pair_batch={self.pair_batch} requires pro_shards > 1 "
                "(dense trials batch via the searched batch_size)")
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()  # blend/PASP compile in this process
        if platform:
            # the blend/PASP phases run models in THIS process too
            try:
                import jax
                jax.config.update("jax_platforms", platform)
            except Exception:
                pass
        self.work_dir = Path(work_dir)
        self.env = env
        self.dm = DeviceManager()
        self.rng = random.Random(seed)
        self.start = time.time()
        self.logs_dir = self.work_dir / f"log_{dataset}"
        self.logs_dir.mkdir(parents=True, exist_ok=True)
        self.searched: List[str] = []
        self.slot_procs: Dict[int, subprocess.Popen] = {}
        self.log(f"Solver for {dataset} start @ {time.asctime()}")
        self.log(f"{self.dm.num_slots} trial slots available")

    def _launch_on_free_device(self, config: Dict, procs: List) -> None:
        """Pin the trial to a free device slot (reference --gpu pinning,
        utils.py:219-225) and launch it."""
        slot = self.dm.wait_free_device(self.slot_procs)
        config = dict(config)
        config["gpu"] = slot
        p = self._launch(config)
        self.slot_procs[slot] = p
        procs.append(p)

    # ------------------------------------------------------------------
    def _launch(self, config: Dict) -> subprocess.Popen:
        argv = [sys.executable] + config2cmd(config) + [
            "--work_dir", str(self.work_dir)]
        if self.platform:
            argv += ["--platform", self.platform]
        if self.probe_compile > 0:
            # validated compile per trial: reject lottery-slow
            # executables before they poison the shared persistent cache
            argv += ["--probe_compile", str(self.probe_compile)]
        if self.pro_shards > 1:
            argv += ["--pro_shards", str(self.pro_shards)]
            if self.halo != "a2a":
                argv += ["--halo", self.halo]
            if self.pair_batch > 1:
                argv += ["--pair_batch", str(self.pair_batch)]
        return subprocess.Popen(argv, env=self.env)

    def _config_ok(self, config: Dict) -> bool:
        if self.pro_shards > 1:
            from ..train.sharded_pair_trainer import sharded_config_ok
            return sharded_config_ok(config)
        return True

    def low_fidelity_training(self):
        procs = []
        for i in range(self.n_init_configs):
            config, cid = sample_config(self.dataset, self.dataset_root,
                                        self.seed, self.split_seed, self.rng)
            while cid in self.searched or not self._config_ok(config):
                config, cid = sample_config(self.dataset, self.dataset_root,
                                            self.seed, self.split_seed,
                                            self.rng)
            self.searched.append(cid)
            config["note"] = cid
            if self.low_fidelity_epochs is not None:
                config["epochs"] = self.low_fidelity_epochs
            self.log(f"Configuration {i}: id={cid} config={config}")
            for j in range(self.n_low_fidelity_seed):
                config["seed"] = self.SEEDS[j]
                self._launch_on_free_device(config, procs)
        self._wait_all(procs)
        self.log("Search complete !", with_time=True)

    def _wait_all(self, procs):
        failures = 0
        for p in procs:
            if p.wait() != 0:
                failures += 1
        if failures:
            # crashed trials are tolerated (reference contract: they
            # simply never write their final log line) but we do record
            # them, unlike the reference
            self.log(f"warning: {failures}/{len(procs)} trials exited "
                     "non-zero")

    def high_fidelity_training(self, top_n: Optional[int] = None,
                               n_seed: Optional[int] = None):
        top_n = top_n or self.n_top_blend
        n_seed = n_seed or self.n_high_fidelity_seed
        self.log("Run configurations for more epochs...")
        summary = auto_summarize_logs(self.dataset, self.work_dir)
        if summary.empty:
            self.log("No finished runs found; nothing to refine")
            return
        seeds = [1, 12, 123, 1234, 2, 4, 6, 8]
        procs = []
        for i in range(min(top_n, len(summary))):
            config = ast.literal_eval(summary.iloc[i]["config"])
            config["epochs"] = self.high_fidelity_epochs
            config["note"] = "more_epochs_run"
            self.log(f"Configuration {i + 1}: {config}")
            for seed in seeds[:n_seed]:
                config["seed"] = seed
                self._launch_on_free_device(config, procs)
        self._wait_all(procs)
        self.log("Run Complete!", with_time=True)

    # ------------------------------------------------------------------
    def blend_and_inference(self, custom_test=None):
        from .ensemble import blend_and_inference
        sel = select_top_runs(self.logs_dir, self.dataset, self.n_top_blend)
        if sel.empty:
            self.log("No checkpoints to blend")
            return None
        self.log(f"{len(sel)} checkpoints selected "
                 f"(details: {self.logs_dir}/inf_ckpt_selected.csv)")
        result = blend_and_inference(
            ids=list(sel["id"]), configs=list(sel["config"]),
            work_dir=self.work_dir, custom_test=custom_test, log=self.log)
        self.log(f"blend results: {result}")
        return result

    def auto_blend(self):
        self.log("Run more epochs estimation...")
        self.high_fidelity_training()
        self.log("Run solution for original test set...")
        result = self.blend_and_inference()
        if self.dataset in ["physprop_perturb"]:
            self.pasp()
        return result

    def pasp(self):
        from .ensemble import pasp_ensemble
        pasp_ensemble(self, log=self.log)

    # ------------------------------------------------------------------
    def log(self, msg=None, with_time=False):
        msg = str(msg)
        if with_time:
            el = time.time() - self.start
            msg += " time elapsed {:.2f} hrs ({:.1f} mins)".format(
                el / 3600.0, el / 60.0)
        with open(self.logs_dir / "solver_log.txt", "a+") as f:
            f.write(msg + "\n")
        print(msg)
