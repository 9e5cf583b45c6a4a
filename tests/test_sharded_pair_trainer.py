"""Production sharded DTI training (run.py --pro_shards N): the protein
tower is node-partitioned over the mesh inside the TRAINER, checkpoints
come out in the PairArchitecture layout, and the final log line keeps
the AutoML contract."""
import json

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


def _run(tmp_path, extra=()):
    import glam_tpu.run as r
    return r.main(["--dataset", "bindingdb_c",
                   "--dataset_root", "datasets/dti_demo",
                   "--epochs", "1", "--e_dim", "16",
                   "--hid_dim_alpha", "2", "--message_steps", "1",
                   "--pro_shards", "4",
                   "--work_dir", str(tmp_path)] + list(extra))


class TestShardedDTICLI:
    def test_e2e_train_and_ckpt_roundtrip(self, tmp_path):
        trainer = _run(tmp_path)
        # final-line contract artifacts (automl/summary.py:read_logs:
        # literal_eval config at [-2], {loss}|{test}|{val} at [-1])
        import ast
        lines = (trainer.log_save_dir / "log.txt").read_text()\
            .strip().splitlines()
        assert "|" in lines[-1]
        cfg = ast.literal_eval(lines[-2])
        assert cfg["dataset"] == "bindingdb_c"
        parts = [ast.literal_eval(p) for p in lines[-1].split("|")]
        assert "valauc" in parts[2]
        res = json.loads(
            (trainer.log_save_dir / "result.json").read_text())
        assert np.isfinite(res["loss"]["testloss"])
        # checkpoint restores into the PairArchitecture layout and
        # reproduces the sharded eval forward
        from flax import serialization
        with open(trainer.log_save_dir / "best_save.ckpt", "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        args = json.loads(payload["args"])
        assert args["model_cfg"]["end_norm"] == "_None"
        merged = serialization.from_bytes(trainer._flax_params,
                                          payload["params"])
        pair = trainer.splits["test"][0]
        mol_b, pro_in, y = trainer._sample(pair)
        from glam_tpu.data.batching import GraphLoader
        pro_b = next(iter(GraphLoader([pair[1]], 1, 1)))
        single = np.asarray(trainer.model.apply(
            {"params": merged}, mol_b, pro_b, True))[0]
        sharded = np.asarray(trainer._infer(
            trainer.params, mol_b, pro_in, 0.0)[0])
        np.testing.assert_allclose(sharded, single, rtol=1e-4,
                                   atol=1e-4)

    def test_pro_shards_rejects_non_dti(self, tmp_path):
        import glam_tpu.run as r
        with pytest.raises(ValueError, match="DTI"):
            r.main(["--dataset", "demo",
                    "--dataset_root", "datasets/demo",
                    "--loss", "bcel",
                    "--epochs", "1", "--pro_shards", "4",
                    "--work_dir", str(tmp_path)])


def test_solver_forwards_pro_shards(monkeypatch, tmp_path):
    """The AutoML solver passes --pro_shards to every trial command."""
    from glam_tpu.automl.solver import GLAM
    solver = GLAM(dataset="bindingdb_c",
                  dataset_root="datasets/dti_demo",
                  work_dir=str(tmp_path), pro_shards=4, halo="auto")
    captured = {}

    class _P:
        def poll(self):
            return 0

    def fake_popen(argv, env=None):
        captured["argv"] = argv
        return _P()

    import subprocess
    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    solver._launch({"dataset": "bindingdb_c",
                    "dataset_root": "datasets/dti_demo",
                    "epochs": 1, "seed": 1})
    assert "--pro_shards" in captured["argv"]
    i = captured["argv"].index("--pro_shards")
    assert captured["argv"][i + 1] == "4"
    j = captured["argv"].index("--halo")
    assert captured["argv"][j + 1] == "auto"


def test_resume_continues_bit_identically(tmp_path):
    """Train 3 epochs straight vs 1 epoch -> resume -> 2 more: same
    final params (deterministic config so streams replay exactly)."""
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    ds = BindingDBDataset("datasets/dti_demo")
    ds.train, ds.val, ds.test = ds.train[:24], ds.val[:8], ds.test[:8]
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-3,
            "seed": 3, "e_dim": 16, "hid_dim_alpha": 2,
            "message_steps": 1, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5",
            "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
            "end_act": "CELU", "graph_do": "_None()"}
    a = ShardedPairTrainer({**base, "epochs": 3},
                           ds, task="pair_binary",
                           work_dir=str(tmp_path / "straight"))
    a.train()
    b1 = ShardedPairTrainer({**base, "epochs": 1},
                            ds, task="pair_binary",
                            work_dir=str(tmp_path / "resumed"))
    b1.train()
    b2 = ShardedPairTrainer({**base, "epochs": 3},
                            ds, task="pair_binary",
                            work_dir=str(tmp_path / "resumed2"))
    b2.resume(b1.log_save_dir)
    b2.train()
    fa = jax.tree_util.tree_leaves(a.params)
    fb = jax.tree_util.tree_leaves(b2.params)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_ring_halo_trainer_matches_a2a(tmp_path):
    """halo='ring' in the sharded DTI trainer: same deterministic
    config trains to the SAME parameters as halo='a2a' (the plans are
    mathematically equivalent exchanges)."""
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    ds = BindingDBDataset("datasets/dti_demo")
    ds.train, ds.val, ds.test = ds.train[:16], ds.val[:8], ds.test[:8]
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-3,
            "seed": 5, "e_dim": 16, "hid_dim_alpha": 2,
            "message_steps": 1, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5", "epochs": 2,
            "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
            "end_act": "CELU", "graph_do": "_None()"}
    outs = {}
    for halo in ("a2a", "ring"):
        tr = ShardedPairTrainer({**base, "halo": halo}, ds,
                                task="pair_binary",
                                work_dir=str(tmp_path / halo))
        tr.train()
        outs[halo] = jax.tree_util.tree_leaves(tr.params)
    for x, y in zip(outs["a2a"], outs["ring"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_screening_cli(tmp_path):
    """--pro_shards on the LIT-PCBA screening family: the weighted-CE
    sharded loss (class_weights from the dataset) trains and the final
    line carries the screening metrics (BEDROC/EF@k)."""
    import ast
    import glam_tpu.run as r
    trainer = r.main(["--dataset", "ALDH1",
                      "--dataset_root", "datasets/scr_demo",
                      "--epochs", "1", "--e_dim", "16",
                      "--hid_dim_alpha", "2", "--message_steps", "1",
                      "--pro_shards", "4", "--halo", "auto",
                      "--work_dir", str(tmp_path)])
    assert trainer.task == "pair_screening"
    assert trainer.class_weights is not None
    lines = (trainer.log_save_dir / "log.txt").read_text()\
        .strip().splitlines()
    parts = [ast.literal_eval(p) for p in lines[-1].split("|")]
    assert "bedroc" in parts[1] and "ef_001" in parts[1]
    assert "valbedroc" in parts[2]
    assert np.isfinite(parts[0]["testloss"])


def test_halo_auto_resolves_at_corpus_level(tmp_path):
    """--halo auto: the trainer plans both exchanges over the corpus,
    resolves to ONE plan (one executable serves every sample), logs the
    decision, and trains to the same parameters as naming that plan
    explicitly."""
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    ds = BindingDBDataset("datasets/dti_demo")
    ds.train, ds.val, ds.test = ds.train[:8], ds.val[:4], ds.test[:4]
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-3,
            "seed": 11, "e_dim": 16, "hid_dim_alpha": 2,
            "message_steps": 1, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5", "epochs": 1,
            "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
            "end_act": "CELU", "graph_do": "_None()"}
    auto = ShardedPairTrainer({**base, "halo": "auto"}, ds,
                              task="pair_binary",
                              work_dir=str(tmp_path / "auto"))
    assert auto.halo in ("a2a", "ring")
    log = (auto.log_save_dir / "log.txt").read_text()
    assert f"halo auto -> {auto.halo}" in log
    auto.train()
    explicit = ShardedPairTrainer({**base, "halo": auto.halo}, ds,
                                  task="pair_binary",
                                  work_dir=str(tmp_path / "explicit"))
    explicit.train()
    for x, y in zip(jax.tree_util.tree_leaves(auto.params),
                    jax.tree_util.tree_leaves(explicit.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0, atol=0)
    with pytest.raises(ValueError, match="halo"):
        ShardedPairTrainer({**base, "halo": "bogus"}, ds,
                           task="pair_binary",
                           work_dir=str(tmp_path / "bad"))


def test_halo_auto_picks_ring_on_banded_corpus(tmp_path):
    """The trainer's corpus-level auto flips to ring where it should:
    banded contact maps at 8 shards (a2a's D*H budget ships >2x the
    rows the per-distance ring plan does).  The ring-resolved trainer
    completes a training epoch."""
    import numpy as np
    from glam_tpu.data.graph import GraphArrays
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    base_ds = BindingDBDataset("datasets/dti_demo")
    L = 256
    s, r = [], []
    for i in range(L - 1):
        s += [i, i + 1]
        r += [i + 1, i]
    pro = GraphArrays(
        nodes=np.random.RandomState(0).randn(L, 49).astype(np.float32),
        edges=np.ones((len(s), 8), np.float32),
        senders=np.asarray(s, np.int32),
        receivers=np.asarray(r, np.int32),
        y=np.zeros(1, np.float32))
    mols = [p[0] for p in base_ds.train[:6]]
    pairs = [(m, pro) for m in mols]

    class _DS:
        num_node_features = 15
        num_edge_features = 4
        pro_num_node_features = 49
        pro_num_edge_features = 8
    ds = _DS()
    ds.train, ds.val, ds.test = pairs[:4], pairs[4:5], pairs[5:6]
    tr = ShardedPairTrainer(
        {"dataset": "bindingdb_c", "pro_shards": 8, "halo": "auto",
         "lr": 1e-3, "seed": 2, "e_dim": 16, "hid_dim_alpha": 2,
         "message_steps": 1, "mol_block": "_TripletMessage",
         "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
         "mol_readout": "GlobalPool5", "epochs": 1,
         "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
         "end_act": "CELU", "graph_do": "_None()"},
        ds, task="pair_binary", work_dir=str(tmp_path))
    assert tr.halo == "ring"
    assert "halo auto -> ring" in tr._halo_note
    tr.train()
    assert np.isfinite(tr.records["val_losses"][-1])


def test_probe_compile_sharded(tmp_path):
    """--probe_compile on the sharded DTI path: a passing floor leaves
    training bit-identical to a probe-free run (disposable probe state,
    restored noise key — the config is STOCHASTIC so key restoration is
    load-bearing); an unreachable floor retries 3x then continues."""
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    ds = BindingDBDataset("datasets/dti_demo")
    ds.train, ds.val, ds.test = ds.train[:8], ds.val[:4], ds.test[:4]
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-3,
            "seed": 7, "e_dim": 16, "hid_dim_alpha": 2,
            "message_steps": 1, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5", "epochs": 1,
            "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
            "end_act": "CELU", "graph_do": "Dropout(0.2)"}
    outs, logs = {}, {}
    for name, floor in (("off", 0.0), ("ok", 1.0), ("slow", 1e30)):
        tr = ShardedPairTrainer({**base, "probe_compile": floor}, ds,
                                task="pair_binary",
                                work_dir=str(tmp_path / name))
        tr.train()
        outs[name] = jax.tree_util.tree_leaves(tr.params)
        logs[name] = (tr.log_save_dir / "log.txt").read_text()
    assert "compile probe ok" in logs["ok"]
    # the FINAL attempt keeps its executable instead of evicting it
    # (evicting would force an unvalidated 4th compile on the first
    # real step), so only the first two failures log SLOW
    assert logs["slow"].count("compile probe SLOW") == 2
    assert "floor not reached" in logs["slow"]
    for other in ("ok", "slow"):
        for x, y in zip(outs["off"], outs[other]):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)


def test_sharded_config_validation():
    """Unsupported flax-side norms are rejected eagerly with clear
    errors (the AutoML solver resamples them via sharded_config_ok)."""
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import (ShardedPairTrainer,
                                                     sharded_config_ok)
    assert sharded_config_ok({"graph_norm": "_PairNorm"})
    # graph_norm='_BatchNorm' is SUPPORTED since round 4
    assert sharded_config_ok({"graph_norm": "_BatchNorm"})
    assert not sharded_config_ok({"pre_norm": "_BatchNorm"})
    assert not sharded_config_ok({"flat_norm": "_LayerNorm"})
    ds = BindingDBDataset("datasets/dti_demo")
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "epochs": 1,
            "e_dim": 16, "hid_dim_alpha": 2, "message_steps": 1}
    with pytest.raises(ValueError, match="pre_norm"):
        ShardedPairTrainer({**base, "pre_norm": "_BatchNorm"}, ds)


class TestPairBatch:
    """--pair_batch B (VERDICT round-3 item 1): B pairs per optimizer
    step with the molecule tower vmapped and every protein still
    node-sharded; gradient parity vs the B=1 forward, e2e CLI, and a
    ckpt that round-trips through the dense PairArchitecture."""

    def test_step_grads_match_mean_of_per_pair(self, tmp_path):
        """One batched optimizer step == one step on the MEAN of the
        per-pair gradients (same params), to float tolerance."""
        import jax.numpy as jnp
        import optax
        from glam_tpu.data.pair_datasets import BindingDBDataset
        from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
        ds = BindingDBDataset("datasets/dti_demo")
        ds.train, ds.val, ds.test = ds.train[:4], ds.val[:2], ds.test[:2]
        base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-2,
                "seed": 3, "e_dim": 16, "hid_dim_alpha": 2,
                "message_steps": 1, "mol_block": "_TripletMessage",
                "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
                "mol_readout": "GlobalPool5", "epochs": 1,
                "optim": "SGD"}
        trb = ShardedPairTrainer({**base, "pair_batch": 4}, ds,
                                 task="pair_binary",
                                 work_dir=str(tmp_path / "b"))
        tr1 = ShardedPairTrainer(base, ds, task="pair_binary",
                                 work_dir=str(tmp_path / "s"))
        # identical inits (same seed/config)
        for a, b in zip(jax.tree_util.tree_leaves(trb.params),
                        jax.tree_util.tree_leaves(tr1.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        chunk = ds.train[:4]
        mol_b, pro_in, y, w = trb._collate(chunk)
        pb, ob, lb = trb._step(trb.params, trb.opt_state, mol_b,
                               pro_in, y, w)
        # reference: mean of per-pair grads through the B=1 loss
        import jax as _jax
        loss = tr1._loss_fn()
        fwd = tr1.fwd_eval
        grads = []
        for pair in chunk:
            m, p, yv = tr1._sample(pair)
            g = _jax.grad(lambda pr: loss(fwd(pr, m, *p),
                                          jnp.asarray(yv)))(tr1.params)
            grads.append(g)
        mean_g = _jax.tree_util.tree_map(
            lambda *xs: sum(xs) / len(xs), *grads)
        upd, _ = tr1.tx.update(mean_g, tr1.opt_state, tr1.params)
        want = optax.apply_updates(tr1.params, upd)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(pb)[0],
                jax.tree_util.tree_flatten_with_path(want)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))

    def test_e2e_cli_and_ckpt_roundtrip(self, tmp_path):
        trainer = _run(tmp_path, extra=["--pair_batch", "3"])
        assert trainer.B == 3
        res = json.loads(
            (trainer.log_save_dir / "result.json").read_text())
        assert np.isfinite(res["loss"]["testloss"])
        # ckpt round-trip: batched sharded eval == dense restored model
        from flax import serialization
        from glam_tpu.data.batching import GraphLoader
        with open(trainer.log_save_dir / "best_save.ckpt", "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        merged = serialization.from_bytes(trainer._flax_params,
                                          payload["params"])
        chunk = trainer.splits["test"][:3]
        mol_b, pro_in, y, w = trainer._collate(chunk)
        logits, _ = trainer._infer(trainer.params, mol_b, pro_in, y)
        for b, pair in enumerate(chunk):
            m1, _, _ = trainer._sample(pair)
            pro_b = next(iter(GraphLoader([pair[1]], 1, 1)))
            single = np.asarray(trainer.model.apply(
                {"params": merged}, m1, pro_b, True))[0]
            np.testing.assert_allclose(np.asarray(logits)[b], single,
                                       rtol=1e-4, atol=1e-4)

    def test_stochastic_batched_trains(self, tmp_path):
        """Dropout + train RReLU in the batched regime: loss decreases
        over epochs and the run completes."""
        trainer = _run(tmp_path, extra=[
            "--pair_batch", "3", "--graph_do", "Dropout(0.2)",
            "--graph_act", "RReLU", "--epochs", "2"])
        assert trainer.stochastic
        assert len(trainer.records["val_losses"]) == 2

    def test_pair_batch_needs_pro_shards(self, tmp_path):
        import glam_tpu.run as r
        with pytest.raises(ValueError, match="pair_batch"):
            r.main(["--dataset", "bindingdb_c",
                    "--dataset_root", "datasets/dti_demo",
                    "--epochs", "1", "--pair_batch", "2",
                    "--work_dir", str(tmp_path)])


class TestShardedBatchNorm:
    """graph_norm='_BatchNorm' on the production --pro_shards path
    (VERDICT round-3 item 5: previously rejected/resampled)."""

    def test_config_ok_accepts_batchnorm(self):
        from glam_tpu.train.sharded_pair_trainer import sharded_config_ok
        assert sharded_config_ok({"graph_norm": "_BatchNorm"})
        assert not sharded_config_ok({"pre_norm": "_LayerNorm"})

    def test_bn_cli_and_eval_roundtrip(self, tmp_path):
        """BN sharded training runs from the CLI; the checkpoint's
        batch_stats restore into the dense PairArchitecture and its
        EVAL forward (running averages) matches the sharded eval."""
        from flax import serialization
        from glam_tpu.data.batching import GraphLoader
        trainer = _run(tmp_path, extra=["--graph_norm", "_BatchNorm",
                                        "--epochs", "2"])
        assert trainer._has_bn and trainer.stochastic
        res = json.loads(
            (trainer.log_save_dir / "result.json").read_text())
        assert np.isfinite(res["loss"]["testloss"])
        with open(trainer.log_save_dir / "final_save.ckpt", "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        merged = serialization.from_bytes(trainer._flax_params,
                                          payload["params"])
        stats = serialization.from_bytes(trainer._pair_bn0,
                                         payload["batch_stats"])
        # running stats actually moved off the init values
        ra = stats["mol2"]["conv"]["BatchNorm_0"]
        assert float(np.abs(np.asarray(ra["mean"])).sum()) > 0
        pair = trainer.splits["test"][0]
        mol_b, pro_in, y = trainer._sample(pair)
        pro_b = next(iter(GraphLoader([pair[1]], 1, 1)))
        single = np.asarray(trainer.model.apply(
            {"params": merged, "batch_stats": stats}, mol_b, pro_b,
            True))[0]
        sharded = np.asarray(trainer._infer(
            trainer.params, mol_b, pro_in, 0.0)[0])
        np.testing.assert_allclose(sharded, single, rtol=1e-4,
                                   atol=1e-4)

    def test_bn_batched_trains(self, tmp_path):
        trainer = _run(tmp_path, extra=["--graph_norm", "_BatchNorm",
                                        "--pair_batch", "3"])
        assert trainer._has_bn and trainer.B == 3
        res = json.loads(
            (trainer.log_save_dir / "result.json").read_text())
        assert np.isfinite(res["loss"]["testloss"])


def test_feature_matrix_pair_batch_ring_bn_stochastic(tmp_path):
    """The full round-4 feature matrix in ONE run: batched pairs +
    ring halo + BatchNorm + dropout + train-RReLU.  Catches
    interaction bugs between the axes; asserts the run completes, the
    stats moved, and the ckpt round-trips through the dense model."""
    import ast
    from flax import serialization
    from glam_tpu.data.batching import GraphLoader
    trainer = _run(tmp_path, extra=[
        "--pair_batch", "3", "--halo", "ring",
        "--graph_norm", "_BatchNorm", "--graph_do", "Dropout(0.2)",
        "--graph_act", "RReLU", "--epochs", "2"])
    assert trainer.B == 3 and trainer._has_bn and trainer.stochastic
    assert trainer.halo == "ring"
    res = json.loads((trainer.log_save_dir / "result.json").read_text())
    assert np.isfinite(res["loss"]["testloss"])
    with open(trainer.log_save_dir / "final_save.ckpt", "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    stats = serialization.from_bytes(trainer._pair_bn0,
                                     payload["batch_stats"])
    ra = stats["mol2"]["conv"]["BatchNorm_0"]
    assert float(np.abs(np.asarray(ra["mean"])).sum()) > 0
    merged = serialization.from_bytes(trainer._flax_params,
                                      payload["params"])
    chunk = trainer.splits["test"][:3]
    mol_b, pro_in, y, w = trainer._collate(chunk)
    logits, _ = trainer._infer(trainer.params, mol_b, pro_in, y)
    for b, pair in enumerate(chunk):
        m1, _, _ = trainer._sample(pair)
        pro_b = next(iter(GraphLoader([pair[1]], 1, 1)))
        dense = np.asarray(trainer.model.apply(
            {"params": merged, "batch_stats": stats}, m1, pro_b,
            True))[0]
        np.testing.assert_allclose(np.asarray(logits)[b], dense,
                                   rtol=1e-4, atol=1e-4)


def test_bn_resume_final_ckpt_parity(tmp_path):
    """Resume with BatchNorm: the final checkpoint must pair the
    BEST-epoch params with the BEST-epoch running statistics (code
    review r4: best_bn was seeded from the resumed LAST-epoch stats)."""
    from flax import serialization
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    ds = BindingDBDataset("datasets/dti_demo")
    ds.train, ds.val, ds.test = ds.train[:16], ds.val[:8], ds.test[:8]
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-3,
            "seed": 3, "e_dim": 16, "hid_dim_alpha": 2,
            "message_steps": 1, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5", "graph_norm": "_BatchNorm",
            "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
            "end_act": "CELU", "graph_do": "_None()"}

    def final_payload(tr):
        with open(tr.log_save_dir / "final_save.ckpt", "rb") as f:
            return serialization.msgpack_restore(f.read())

    a = ShardedPairTrainer({**base, "epochs": 3}, ds,
                           task="pair_binary",
                           work_dir=str(tmp_path / "straight"))
    a.train()
    b1 = ShardedPairTrainer({**base, "epochs": 1}, ds,
                            task="pair_binary",
                            work_dir=str(tmp_path / "resumed1"))
    b1.train()
    b2 = ShardedPairTrainer({**base, "epochs": 3}, ds,
                            task="pair_binary",
                            work_dir=str(tmp_path / "resumed2"))
    b2.resume(b1.log_save_dir)
    b2.train()
    pa, pb = final_payload(a), final_payload(b2)
    sa = serialization.from_bytes(a._pair_bn0, pa["batch_stats"])
    sb = serialization.from_bytes(b2._pair_bn0, pb["batch_stats"])
    for x, y in zip(jax.tree_util.tree_leaves(sa),
                    jax.tree_util.tree_leaves(sb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_sharded_train_stats_logging(tmp_path, monkeypatch):
    """GLAM_TRAIN_STATS=1 logs per-epoch pairs/s in the sharded
    trainer too (observability parity with the dense Trainer)."""
    monkeypatch.setenv("GLAM_TRAIN_STATS", "1")
    trainer = _run(tmp_path, extra=["--pair_batch", "2"])
    log = (trainer.log_save_dir / "log.txt").read_text()
    assert "train stats:" in log and "pairs/s" in log


def test_resume_rejects_defaulted_key_mismatch(tmp_path):
    """A pre-round-4 checkpoint whose saved args LACK 'pair_batch'
    must not silently resume under --pair_batch 4: absent keys compare
    against the flag defaults (ADVICE round-4)."""
    import json
    from flax import serialization
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer
    ds = BindingDBDataset("datasets/dti_demo")
    ds.train, ds.val, ds.test = ds.train[:8], ds.val[:4], ds.test[:4]
    base = {"dataset": "bindingdb_c", "pro_shards": 4, "lr": 1e-3,
            "seed": 3, "e_dim": 16, "hid_dim_alpha": 2,
            "message_steps": 1, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5", "epochs": 1,
            "graph_act": "CELU", "pre_act": "CELU", "flat_act": "CELU",
            "end_act": "CELU", "graph_do": "_None()"}
    a = ShardedPairTrainer(dict(base), ds, task="pair_binary",
                           work_dir=str(tmp_path / "old"))
    a.save_resume_ckpt(epoch=1, wait=0)
    ckpt = a.log_save_dir / "last_save.ckpt"
    payload = serialization.msgpack_restore(ckpt.read_bytes())
    saved = json.loads(payload["args"])
    saved.pop("pair_batch", None)  # pre-round-4 layout
    payload["args"] = json.dumps(saved)
    ckpt.write_bytes(serialization.msgpack_serialize(payload))
    b = ShardedPairTrainer({**base, "pair_batch": 4}, ds,
                           task="pair_binary",
                           work_dir=str(tmp_path / "new"))
    with pytest.raises(ValueError, match="pair_batch"):
        b.resume(a.log_save_dir)
