"""Production DTI training with the PROTEIN tower sharded over a mesh.

`python -m glam_tpu.run --dataset bindingdb_c ... --pro_shards N` routes
here: the molecule tower runs replicated (flax), the giant contact-map
protein graph is node-partitioned over an N-device ("graph",) mesh with
the boundary-only halo exchange, and every fwd+bwd step differentiates
through the shard_map (parallel/sharded_model.py — gradients match the
single-device PairArchitecture, tests/test_sharded_model.py).  This is
a NEW capability (the reference processes every protein single-device,
src_2gi_dti_scr/utils.py:283-293); it exists for proteins too large for
one chip's HBM.

Contract kept from the Trainer family: per-epoch log lines, best/final
checkpoints (saved in the PairArchitecture layout via
``insert_pair_params``, so serving/ensembling tools load them
unchanged), early stopping on val loss, and the parseable final
``{loss}|{test}|{val}`` line the AutoML layer consumes.

Regime notes (documented restrictions of the sharded path):
  * one pair per optimizer step by default; ``--pair_batch B`` trains
    B pairs per step (the reference's per-batch pair loop,
    src_2gi_dti_scr/trainer.py:216-236) — the replicated molecule
    tower is vmapped over the B pairs while every pair's protein stays
    node-sharded over the full mesh, loss = masked mean over the batch
    (short final chunks padded with weight-0 repeats), still ONE
    compiled executable;
  * every protein is padded to the corpus maxima
    (``shard_inputs(node_budget=..., edge_budget=..., halo_budget=...)``)
    so ALL samples share one compiled executable;
  * end_norm must be '_None' (reference DTI default); the protein
    tower's flat dropout is deterministic (molecule tower honors all
    flax dropouts via its own rng stream); graph dropout + train-mode
    RReLU are fully supported through ``make_stochastic_inputs``.
ReduceLROnPlateau (torch parity) runs on the val loss like the Trainer.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..data.batching import GraphLoader
from ..nn.activations import is_stochastic
from ..nn.blocks import parse_dropout
from ..nn.model import PairArchitecture, model_config_from_args
from ..parallel.data_parallel import make_mesh
from ..parallel.sharded_model import (extract_pair_params,
                                      insert_pair_params,
                                      make_sharded_pair_forward,
                                      make_stochastic_inputs,
                                      shard_inputs)
from .metrics import binary_metrics, regression_metrics, screening_metrics
from .optim import (ReduceLROnPlateau, get_learning_rate, make_optimizer,
                    set_learning_rate)
from .pair_trainer import _set_pair_max_nodes


def sharded_config_ok(config: dict) -> bool:
    """True when a sampled DTI config fits the sharded pair path's
    supported subset (the solver resamples otherwise: the dense path
    still searches the full space, this is the sharded trainer's
    honest capability boundary).  graph_norm='_BatchNorm' IS supported
    (round 4): psum batch statistics in the sharded protein tower +
    mutable flax stats in the molecule tower, torch momentum-0.1 EMA
    into running averages for eval/serving."""
    if str(config.get("pre_norm", "_None")).strip() != "_None":
        return False
    if str(config.get("flat_norm", "_None")).strip() != "_None":
        return False
    return True


class ShardedPairTrainer:
    """Giant-protein DTI trainer over a node-sharded mesh."""

    def __init__(self, args: Dict, dataset, task: str = "pair_binary",
                 work_dir: Optional[str] = None):
        args = dict(args)
        args["task"] = task
        args["num_tasks"] = 1
        args["out_dim"] = 1 if task in ("pair_regression",
                                        "pair_binary_bce") else 2
        self.args = args
        self.task = task
        self.class_weights = getattr(dataset, "class_weights", None)
        n = int(args.get("pro_shards", 2))
        devs = jax.devices()
        if len(devs) < n:
            raise ValueError(f"--pro_shards {n} needs {n} devices, "
                             f"have {len(devs)}")
        self.n_shards = n
        self.mesh = make_mesh(devs[:n], ("graph",))
        self.halo = str(args.get("halo", "a2a"))
        if self.halo not in ("a2a", "ring", "auto"):
            raise ValueError(f"halo must be 'a2a', 'ring' or 'auto', "
                             f"got {self.halo!r}")

        for key in ("pre_norm", "flat_norm"):
            if str(args.get(key, "_None")).strip() != "_None":
                raise ValueError(
                    f"--pro_shards: {key} must be '_None' (the sharded "
                    "protein tower has no pre/flat norm; see "
                    "SHARDED_SUPPORTED_CONFIG)")
        # sharded pair-head requirement — mutate the FLAT arg too, so
        # every downstream consumer (AutoML blend rebuild, summary
        # config strings, resume checks) sees the config that actually
        # trained
        args["end_norm"] = "_None"
        overrides = {
            "mol_in_dim": dataset.num_node_features,
            "mol_edge_in_dim": dataset.num_edge_features,
            "pro_in_dim": dataset.pro_num_node_features,
            "pro_edge_in_dim": dataset.pro_num_edge_features,
            "out_dim": args["out_dim"],
            "end_norm": "_None",
        }
        _set_pair_max_nodes(overrides, dataset.train + dataset.val
                            + dataset.test, hetero=True)
        cfg = model_config_from_args(args, **overrides)
        args["model_cfg"] = dataclasses.asdict(cfg)
        self.cfg = cfg
        self.model = PairArchitecture(cfg, hetero=True)

        # ---- one padded shape for every sample ----------------------
        pairs = dataset.train + dataset.val + dataset.test
        mol_nb = 8 * -(-max(p[0].nodes.shape[0] for p in pairs) // 8)
        mol_eb = 8 * -(-max(p[0].senders.shape[0] for p in pairs) // 8)
        self._mol_budgets = (mol_nb + 8, mol_eb + 8)
        self._pro_budgets = self._plan_pro_budgets(pairs)
        self._pro_cache: Dict[int, tuple] = {}
        self.splits = {"train": dataset.train, "valid": dataset.val,
                       "test": dataset.test}

        # ---- params / optimizer / jitted steps ----------------------
        seed = int(args.get("seed", 1234))
        m0, p0, _ = self._sample(dataset.train[0])
        variables = jax.jit(
            lambda r, a, b: self.model.init(r, a, b, True))(
            jax.random.PRNGKey(seed), m0,
            self._dummy_pro_batch(dataset.train[0][1]))
        self._flax_params = variables["params"]
        self.params = extract_pair_params(
            variables["params"], cfg.pro_block, cfg.pro_readout,
            graph_norm="_None" if cfg.graph_norm.strip() == "_None"
            else cfg.graph_norm)
        self.tx = make_optimizer(args.get("optim", "Adam"),
                                 float(args.get("lr", 1e-3)),
                                 k=int(args.get("k", 6)))
        self.opt_state = self.tx.init(self.params)
        rate = parse_dropout(args.get("graph_do", "_None()"))
        self._has_bn = cfg.graph_norm.strip() == "_BatchNorm"
        # BatchNorm trains on batch statistics: the train forward runs
        # the molecule tower in flax train mode (mutable stats), which
        # rides the stochastic machinery even at dropout rate 0
        self.stochastic = (rate > 0.0 or self._has_bn
                           or is_stochastic(args.get("graph_act",
                                                     "CELU")))
        self._drop_rate = rate
        self.B = max(1, int(args.get("pair_batch", 1)))
        if self._has_bn:
            bn = variables["batch_stats"]
            self._mol_bn = bn["mol1"]
            self._pair_bn0 = bn  # dense-layout template for ckpts
            ra = bn["mol2"]["conv"]["BatchNorm_0"]
            self._pro_ra = {"mean": jnp.asarray(ra["mean"]),
                            "var": jnp.asarray(ra["var"])}
            self.fwd_eval = make_sharded_pair_forward(
                self.mesh, cfg, bn_mode="running", n_pairs=self.B)
            self.fwd_train = make_sharded_pair_forward(
                self.mesh, cfg, stochastic=True, track_bn_stats=True,
                n_pairs=self.B)
        else:
            self._mol_bn = self._pro_ra = None
            self.fwd_eval = make_sharded_pair_forward(self.mesh, cfg,
                                                      n_pairs=self.B)
            self.fwd_train = (make_sharded_pair_forward(
                self.mesh, cfg, stochastic=True, n_pairs=self.B)
                if self.stochastic else self.fwd_eval)
        self._build_steps()
        self._key = jax.random.PRNGKey(seed + 1)
        self.scheduler = ReduceLROnPlateau(
            factor=float(args.get("lr_reduce_rate", 0.7)),
            patience=int(args.get("lr_reduce_patience", 20)))
        self._wait = 0
        self._start_epoch = 1
        self._best_params = self.params
        self._best_bn = (self._mol_bn, self._pro_ra)

        # ---- run dir / logging --------------------------------------
        base = Path(work_dir or ".") / f"log_{args.get('dataset', 'dti')}"
        self.run_id = time.strftime("%Y-%m-%d_%H:%M:%S") + \
            f"_seed_{seed}_shard{n}"
        self.log_save_dir = base / self.run_id
        self.log_save_dir.mkdir(parents=True, exist_ok=True)
        self.records = {"val_losses": []}
        self.log(f"sharded DTI trainer: {n} shards, task={task}, "
                 f"stochastic={self.stochastic}, pair_batch={self.B}")
        if getattr(self, "_halo_note", None):
            self.log(self._halo_note)
        self.log(str({k: v for k, v in args.items() if k != "model_cfg"}))

    # ------------------------------------------------------------------
    def _plan_pro_budgets(self, pairs):
        """Corpus-wide shape floors so one executable serves every
        protein.  Two passes: the global node budget FIRST (shard
        boundaries depend on Nl, so edge/halo budgets planned at a
        protein's own Nl would be wrong), then every distinct protein
        re-planned AT that node budget to collect the edge-slot and
        halo maxima (a single global H for 'a2a'; per-distance budgets
        for 'ring').  halo='auto' plans both and resolves here at the
        CORPUS level (one executable -> one plan for every sample):
        ring only when its total padded rows are under half of a2a's
        D*H, the same 2x threshold as the per-graph shard_inputs auto
        (ring's D-1 sequential ppermutes cost more dispatch than one
        all_to_all, so small row savings are not worth it)."""
        from ..parallel.graph_partition import (build_halo_exchange,
                                                build_halo_exchange_ring,
                                                split_large_graph)
        want_ring = self.halo in ("ring", "auto")
        want_a2a = self.halo in ("a2a", "auto")
        nb = max(pro.nodes.shape[0] for _, pro in pairs)
        seen, eb, hb = set(), 0, 0
        ring = [0] * (self.n_shards - 1)
        for _, pro in pairs:
            if id(pro) in seen:
                continue
            seen.add(id(pro))
            nsh, esh, sg, rl, em = split_large_graph(
                pro.nodes, pro.edges, pro.senders, pro.receivers,
                self.n_shards, node_budget=nb)
            eb = max(eb, esh.shape[1])
            if want_ring:
                _, budgets, _ = build_halo_exchange_ring(
                    sg, em, nsh.shape[1])
                ring = [max(a, b) for a, b in zip(ring, budgets)]
            if want_a2a:
                _, _, _, H = build_halo_exchange(sg, em, nsh.shape[1])
                hb = max(hb, H)
        if self.halo == "auto":
            ring_rows, a2a_rows = sum(ring), self.n_shards * hb
            self.halo = ("ring" if 2 * ring_rows < a2a_rows else "a2a")
            self._halo_note = (f"halo auto -> {self.halo} (ring rows "
                               f"{ring_rows} vs a2a rows {a2a_rows})")
        return nb, eb, hb, tuple(ring)

    def _pro_inputs(self, pro):
        key = id(pro)
        if key not in self._pro_cache:
            nb, eb, hb, ring = self._pro_budgets
            kw = dict(node_budget=nb, edge_budget=eb)
            if self.halo == "ring":
                kw.update(halo="ring", ring_budgets=ring)
            else:
                kw.update(halo="a2a", halo_budget=hb)
            arrs = shard_inputs(pro.nodes, pro.edges, pro.senders,
                                pro.receivers, self.n_shards, **kw)
            self._pro_cache[key] = tuple(
                tuple(jnp.asarray(x) for x in a)
                if isinstance(a, tuple) else jnp.asarray(a)
                for a in arrs)
        return self._pro_cache[key]

    def _dummy_pro_batch(self, pro):
        return next(iter(GraphLoader([pro], 1, 1)))

    def _sample(self, pair):
        mol, pro = pair
        nb, eb = self._mol_budgets
        mol_b = next(iter(GraphLoader([mol], 1, 1, node_budget=nb,
                                      edge_budget=eb)))
        return mol_b, self._pro_inputs(pro), float(mol.y[0])

    def _collate(self, chunk):
        """Stack <=B pairs into one batched step input: short chunks
        are padded by repeating the last pair at weight 0, so every
        step runs the SAME executable and padding rows contribute
        nothing to the masked mean loss."""
        pairs = list(chunk)
        w = [1.0] * len(pairs) + [0.0] * (self.B - len(pairs))
        pairs += [pairs[-1]] * (self.B - len(pairs))
        mols, pros, ys = zip(*(self._sample(p) for p in pairs))
        mol_b = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *mols)
        pro_b = tuple(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *pros))
        return (mol_b, pro_b, jnp.asarray(ys, jnp.float32),
                jnp.asarray(w, jnp.float32))

    # ------------------------------------------------------------------
    def _loss_fn(self):
        task = self.task
        cw = (jnp.asarray(self.class_weights, jnp.float32)
              if self.class_weights is not None else None)

        def loss(logits, y):
            if task == "pair_regression":
                return (logits[0] - y) ** 2
            if task == "pair_binary_bce":
                z = logits[0]
                return jnp.maximum(z, 0.0) - z * y + jnp.log1p(
                    jnp.exp(-jnp.abs(z)))
            # 2-logit CE (pair_binary / pair_screening)
            tgt = jnp.clip(y.astype(jnp.int32), 0, logits.shape[0] - 1)
            ce = (jax.nn.logsumexp(logits) - logits[tgt])
            if task == "pair_screening" and cw is not None:
                ce = ce * cw[tgt]
            return ce

        return loss

    def _build_steps(self):
        loss = self._loss_fn()
        fwd_t = self.fwd_train
        fwd_e = self.fwd_eval
        tx = self.tx
        has_bn = self._has_bn
        B = self.B

        def _pro_ema(pro_ra, pm, pv, w=None):
            """torch momentum-0.1 EMA over the protein tower's per-step
            batch statistics — the same update sequence the weight-tied
            single-device MessageBlock performs (one BatchNorm module
            updating once per message step).  Batched steps first take
            the weight-averaged statistics across the chunk."""
            if w is not None:  # pm/pv: [B, S, C] -> [S, C]
                wn = w / jnp.maximum(jnp.sum(w), 1.0)
                pm = jnp.einsum("b,bsc->sc", wn, pm)
                pv = jnp.einsum("b,bsc->sc", wn, pv)
            mean, var = pro_ra["mean"], pro_ra["var"]
            for s in range(pm.shape[0]):
                mean = 0.9 * mean + 0.1 * pm[s]
                var = 0.9 * var + 0.1 * pv[s]
            return {"mean": mean, "var": var}

        def _avg_mol_bn(new_bn, w=None):
            if w is None:
                return new_bn
            wn = w / jnp.maximum(jnp.sum(w), 1.0)
            return jax.tree_util.tree_map(
                lambda x: jnp.tensordot(wn, x, axes=1), new_bn)

        def _eval_params(params, pro_ra):
            if not has_bn:
                return params
            return {**params, "pro": {**params["pro"],
                                      "norm_ra": pro_ra}}

        if B == 1:
            def objective(params, mol_bn, mol_b, pro_in, y):
                if has_bn:
                    pred, new_bn, stats = fwd_t(params, mol_b, mol_bn,
                                                *pro_in)
                    return loss(pred, y), (new_bn, stats)
                return loss(fwd_t(params, mol_b, *pro_in), y), None

            @jax.jit
            def step(params, opt_state, mol_bn, pro_ra, mol_b, pro_in,
                     y):
                (lval, aux), grads = jax.value_and_grad(
                    objective, has_aux=True)(params, mol_bn, mol_b,
                                             pro_in, y)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if has_bn:
                    new_bn, (pm, pv) = aux
                    pro_ra = _pro_ema(pro_ra, pm, pv)
                    return params, opt_state, new_bn, pro_ra, lval
                return params, opt_state, mol_bn, pro_ra, lval

            @jax.jit
            def infer(params, mol_bn, pro_ra, mol_b, pro_in, y):
                p = _eval_params(params, pro_ra)
                if has_bn:
                    logits = fwd_e(p, mol_b, mol_bn, *pro_in)
                else:
                    logits = fwd_e(p, mol_b, *pro_in)
                return logits, loss(logits, y)

            self._step_raw = step
            self._infer_raw = infer
            return

        # batched regime: logits [B, out]; masked mean over the pair
        # batch (weight-0 rows are padding repeats of the last chunk)
        def objective_b(params, mol_bn, mol_b, pro_in, y, w):
            if has_bn:
                # w also weights the cross-pair JOINT BN statistics
                # (padding repeats excluded — dense packed-batch parity)
                pred, new_bn, stats = fwd_t(params, mol_b, mol_bn, w,
                                            *pro_in)
                per = jax.vmap(loss)(pred, y)
            else:
                per = jax.vmap(loss)(fwd_t(params, mol_b, *pro_in), y)
                new_bn, stats = None, None
            return (jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0),
                    (new_bn, stats))

        @jax.jit
        def step_b(params, opt_state, mol_bn, pro_ra, mol_b, pro_in,
                   y, w):
            (lval, aux), grads = jax.value_and_grad(
                objective_b, has_aux=True)(params, mol_bn, mol_b,
                                           pro_in, y, w)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if has_bn:
                new_bn, (pm, pv) = aux
                mol_bn = _avg_mol_bn(new_bn, w)
                pro_ra = _pro_ema(pro_ra, pm, pv, w)
            return params, opt_state, mol_bn, pro_ra, lval

        @jax.jit
        def infer_b(params, mol_bn, pro_ra, mol_b, pro_in, y):
            p = _eval_params(params, pro_ra)
            if has_bn:
                logits = fwd_e(p, mol_b, mol_bn, *pro_in)
            else:
                logits = fwd_e(p, mol_b, *pro_in)
            return logits, jax.vmap(loss)(logits, y)

        self._step_raw = step_b
        self._infer_raw = infer_b

    def _step(self, params, opt_state, mol_b, pro_in, y, w=None):
        """One optimizer step (old call signature kept): BN running
        statistics, when present, advance as trainer state."""
        extra = (y,) if w is None else (y, w)
        params, opt_state, mol_bn, pro_ra, lval = self._step_raw(
            params, opt_state, self._mol_bn, self._pro_ra, mol_b,
            pro_in, *extra)
        if self._has_bn:
            self._mol_bn, self._pro_ra = mol_bn, pro_ra
        return params, opt_state, lval

    def _infer(self, params, mol_b, pro_in, y):
        return self._infer_raw(params, self._mol_bn, self._pro_ra,
                               mol_b, pro_in, y)

    def _noise(self, pro_in):
        """Stochastic inputs: (mol_rng,) + noise arrays with the PADDED
        global node shape (static across samples -> one executable)."""
        self._key, k_mol, k_pro = jax.random.split(self._key, 3)
        n_global = pro_in[0].shape[0] * pro_in[0].shape[1]  # D * Nl
        drop, slope = make_stochastic_inputs(
            k_pro, n_global, self.cfg.hid_dim, self.cfg.message_steps,
            self.n_shards, rate=self._drop_rate)
        return (k_mol,) + tuple(pro_in) + (jnp.asarray(drop),
                                           jnp.asarray(slope))

    def _noise_batch(self, pro_in):
        """Batched stochastic inputs: per-pair mol rngs [B] and noise
        arrays [B, D, S, Nl, C] — each pair draws its own shard-count-
        independent noise from a fold_in of one step key."""
        self._key, k_mol, k_pro = jax.random.split(self._key, 3)
        n_global = pro_in[0].shape[1] * pro_in[0].shape[2]  # D * Nl
        drops, slopes = [], []
        for b in range(self.B):
            d, s = make_stochastic_inputs(
                jax.random.fold_in(k_pro, b), n_global,
                self.cfg.hid_dim, self.cfg.message_steps,
                self.n_shards, rate=self._drop_rate)
            drops.append(d)
            slopes.append(s)
        mol_rngs = jax.random.split(k_mol, self.B)
        return ((mol_rngs,) + tuple(pro_in)
                + (jnp.asarray(np.stack(drops)),
                   jnp.asarray(np.stack(slopes))))

    # ------------------------------------------------------------------
    def _probe_compile(self) -> None:
        """Validated compile for the sharded step (same policy as
        Trainer._probe_compile; memory/axon-tpu-quirks): with
        --probe_compile FLOOR (edges/s over the pair's true mol+pro
        edges), time the compiled sharded train dispatch on the first
        train pair; below the floor, evict the just-written
        persistent-cache entries, clear the jit cache and recompile
        (up to 3 attempts, keeping the last).  Probe steps never assign
        back to params/opt_state and the noise PRNG key is restored, so
        training itself is bit-unaffected."""
        floor = float(self.args.get("probe_compile", 0) or 0)
        if floor <= 0:
            return
        from ..utils.cache import (evict_new_cache_entries,
                                   snapshot_cache_entries)
        key0 = self._key
        if self.B == 1:
            pair = self.splits["train"][0]
            edges_per_call = float(pair[0].senders.shape[0]
                                   + pair[1].senders.shape[0])
            mol_b, pro_in, y = self._sample(pair)
            inputs = self._noise(pro_in) if self.stochastic else pro_in
            extra = (jnp.asarray(y),)
        else:
            chunk = self.splits["train"][:self.B]
            edges_per_call = float(sum(
                p[0].senders.shape[0] + p[1].senders.shape[0]
                for p in chunk))
            mol_b, pro_in, y, w = self._collate(chunk)
            inputs = (self._noise_batch(pro_in) if self.stochastic
                      else pro_in)
            extra = (y, w)
        self._key = key0  # the probe must not advance the noise stream
        bn0 = (self._mol_bn, self._pro_ra)  # nor the BN running stats
        reps = 3
        for attempt in range(3):
            snap = snapshot_cache_entries()
            p, o, lv = self._step(self.params, self.opt_state, mol_b,
                                  inputs, *extra)  # compile + run
            jax.block_until_ready(lv)
            t0 = time.time()
            for _ in range(reps):
                p, o, lv = self._step(p, o, mol_b, inputs, *extra)
            jax.block_until_ready(lv)
            rate = edges_per_call * reps / max(time.time() - t0, 1e-9)
            if rate >= floor:
                self.log(f"compile probe ok: {rate:.3e} edges/s "
                         f"(attempt {attempt + 1})")
                self._mol_bn, self._pro_ra = bn0
                return
            if attempt == 2:
                # keep the final executable IN-PROCESS, but drop its
                # persistent-cache entries so later processes re-roll
                # instead of reloading a validated-slow executable
                # (same policy as Trainer._probe_compile)
                n = evict_new_cache_entries(snap)
                self.log("compile probe: floor not reached after 3 "
                         "attempts; continuing with the last executable"
                         f" (evicted its {n} persistent-cache entries)")
                self._mol_bn, self._pro_ra = bn0
                return
            n = evict_new_cache_entries(snap)
            self.log(f"compile probe SLOW: {rate:.3e} < {floor:.1e} "
                     f"edges/s; evicted {n} cache entries, recompiling "
                     f"(attempt {attempt + 1})")
            jax.clear_caches()
            self._build_steps()

    def train(self):
        self._probe_compile()
        epochs = int(self.args.get("epochs", 10))
        patience = int(self.args.get("early_stop_patience", 50))
        seed = int(self.args.get("seed", 1234))
        best = (min(self.records["val_losses"])
                if self.records["val_losses"] else float("inf"))
        best_params, wait = self._best_params, self._wait
        best_bn = self._best_bn  # best-EPOCH stats (survives resume)
        import os
        stats = os.environ.get("GLAM_TRAIN_STATS", "0") == "1"
        for ep in range(self._start_epoch, epochs + 1):
            t_ep = time.time() if stats else 0.0
            order = np.random.RandomState(seed + ep).permutation(
                len(self.splits["train"]))
            tr_losses = []  # (chunk mean loss, n real pairs)
            if self.B == 1:
                for i in order:
                    mol_b, pro_in, y = self._sample(
                        self.splits["train"][i])
                    inputs = (self._noise(pro_in) if self.stochastic
                              else pro_in)
                    self.params, self.opt_state, lv = self._step(
                        self.params, self.opt_state, mol_b, inputs,
                        jnp.asarray(y))
                    tr_losses.append((float(lv), 1))
            else:
                for lo in range(0, len(order), self.B):
                    chunk = [self.splits["train"][i]
                             for i in order[lo:lo + self.B]]
                    mol_b, pro_in, y, w = self._collate(chunk)
                    inputs = (self._noise_batch(pro_in)
                              if self.stochastic else pro_in)
                    self.params, self.opt_state, lv = self._step(
                        self.params, self.opt_state, mol_b, inputs,
                        y, w)
                    # size-weighted epoch mean: the short final chunk
                    # must not be over-weighted (dense-Trainer parity)
                    tr_losses.append((float(lv), len(chunk)))
            if stats:
                # achieved pairs/s through the training loop (the
                # float(lv) conversions above synchronized every step)
                dt = time.time() - t_ep
                self.log(f"\ttrain stats: {len(order)} pairs in "
                         f"{dt:.2f}s = {len(order) / max(dt, 1e-9):.2f}"
                         " pairs/s")
            val_loss, val_m = self.valid_iterations("valid")
            self.records["val_losses"].append(val_loss)
            lr = get_learning_rate(self.opt_state)
            new_lr = self.scheduler.step(val_loss, lr)
            if new_lr != lr:
                self.opt_state = set_learning_rate(self.opt_state,
                                                   new_lr)
            n_tr = sum(n for _, n in tr_losses)
            trn_loss = (sum(l * n for l, n in tr_losses)
                        / max(n_tr, 1))
            self.log(f"Epoch:{ep} trn_loss:{trn_loss:.4f} "
                     f"val_loss:{val_loss:.4f} val_result:{val_m} "
                     f"lr_cur:{new_lr:.7f}")
            if val_loss < best:
                best, best_params, wait = val_loss, self.params, 0
                best_bn = (self._mol_bn, self._pro_ra)
                self._best_params, self._best_bn = best_params, best_bn
                self.save_ckpt(ep)
            else:
                wait += 1
            self.save_resume_ckpt(ep, wait)
            if wait >= patience:
                self.log(f"early stop at epoch {ep}")
                break
        self.params = best_params
        self._mol_bn, self._pro_ra = best_bn
        self.save_ckpt(epochs, final_save=True)

    def valid_iterations(self, mode: str = "valid"):
        split = self.splits["test" if mode == "test"
                            and self.splits["test"] else "valid"]
        ys, outs, losses = [], [], []
        if self.B == 1:
            for pair in split:
                mol_b, pro_in, y = self._sample(pair)
                logits, lv = self._infer(self.params, mol_b, pro_in,
                                         jnp.asarray(y))
                ys.append(y)
                outs.append(np.asarray(logits))
                losses.append(float(lv))
        else:
            for lo in range(0, len(split), self.B):
                chunk = split[lo:lo + self.B]
                mol_b, pro_in, y, w = self._collate(chunk)
                logits, lv = self._infer(self.params, mol_b, pro_in, y)
                n_real = len(chunk)
                ys.extend(np.asarray(y)[:n_real].tolist())
                outs.extend(np.asarray(logits)[:n_real])
                losses.extend(np.asarray(lv)[:n_real].tolist())
        out = np.stack(outs)
        yt = np.asarray(ys)
        mean_loss = float(np.mean(losses))
        if self.task == "pair_regression":
            return mean_loss, regression_metrics(yt, out[:, 0])
        if self.task == "pair_binary_bce":
            score = 1.0 / (1.0 + np.exp(-out[:, 0]))
            return mean_loss, binary_metrics(yt, score)
        ex = np.exp(out - out.max(-1, keepdims=True))
        score = (ex / ex.sum(-1, keepdims=True))[:, 1]
        pred = out.argmax(-1)
        metric_fn = (screening_metrics if self.task == "pair_screening"
                     else binary_metrics)
        return mean_loss, metric_fn(yt, score, pred)

    def train_and_test(self):
        self.train()
        self.log("Testing...")
        val_loss, val_result = self.valid_iterations("valid")
        test_loss, test_result = self.valid_iterations("test")
        loss_info = {"testloss": float(test_loss),
                     "valloss": float(val_loss)}
        val_new = {"val" + k: v for k, v in val_result.items()}
        # the AutoML summary contract (automl/summary.py:read_logs):
        # literal_eval-able config on the SECOND-TO-LAST line, the
        # {loss}|{test}|{val} result on the last
        self.log(str(self.args))
        self.log(f"{loss_info}|{test_result}|{val_new}")
        try:
            with open(self.log_save_dir / "result.json", "w") as f:
                json.dump({"run_id": self.run_id, "loss": loss_info,
                           "test": test_result, "val": val_new}, f)
        except OSError:
            pass
        return loss_info, test_result, val_new

    # ------------------------------------------------------------------
    def save_ckpt(self, epoch: int, final_save: bool = False):
        """Reference-layout checkpoint: sharded-trained weights written
        back into the PairArchitecture tree (insert_pair_params), same
        payload keys as Trainer.save_ckpt, so serving/ensemble tools
        load it unchanged."""
        merged = insert_pair_params(self._flax_params, self.params,
                                    self.cfg.pro_block,
                                    self.cfg.pro_readout,
                                    graph_norm=self.cfg.graph_norm)
        if self._has_bn:
            from ..parallel.sharded_model import insert_pair_bn_stats
            stats = insert_pair_bn_stats(self._pair_bn0, self._mol_bn,
                                         self._pro_ra)
        else:
            stats = {}
        name = "final_save.ckpt" if final_save else "best_save.ckpt"
        payload = {
            "args": json.dumps(self.args),
            "records": json.dumps(self.records),
            "params": serialization.to_bytes(merged),
            "batch_stats": serialization.to_bytes(stats),
        }
        with open(self.log_save_dir / name, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        self.log(f"Model saved at epoch {epoch}")

    def save_resume_ckpt(self, epoch: int, wait: int):
        """Mid-training resume snapshot (sharded param layout +
        optimizer state + noise PRNG key + scheduler/early-stop state);
        the per-epoch shuffle derives from seed+epoch, so no replay
        state is needed."""
        payload = {
            "args": json.dumps(self.args),
            "records": json.dumps(self.records),
            "params": serialization.to_bytes(self.params),
            "best_params": serialization.to_bytes(self._best_params),
            "opt_state": serialization.to_bytes(self.opt_state),
            "key": serialization.to_bytes(np.asarray(self._key)),
            "epoch": epoch,
            "wait": wait,
            "scheduler": json.dumps({"best": self.scheduler.best,
                                     "num_bad": self.scheduler.num_bad}),
        }
        if self._has_bn:
            payload["mol_bn"] = serialization.to_bytes(self._mol_bn)
            payload["pro_ra"] = serialization.to_bytes(self._pro_ra)
            # the BEST-epoch stats too: on resume, the final checkpoint
            # must pair best-epoch params with best-epoch statistics
            payload["best_mol_bn"] = serialization.to_bytes(
                self._best_bn[0])
            payload["best_pro_ra"] = serialization.to_bytes(
                self._best_bn[1])
        with open(self.log_save_dir / "last_save.ckpt", "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    def resume(self, run_dir) -> int:
        """Restore from ``<run_dir>/last_save.ckpt`` and continue in
        that run dir; returns the next epoch."""
        path = Path(run_dir)
        if path.is_dir():
            path = path / "last_save.ckpt"
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        saved_args = json.loads(payload["args"])
        # 'halo' compares the RAW flag: ring and a2a only agree to
        # ~1e-5, so silently switching the exchange plan mid-run would
        # break the bit-identical resume guarantee ('auto' re-resolves
        # deterministically on the same corpus, so flag equality
        # suffices)
        # absent keys compare against the flag DEFAULTS (ADVICE
        # round-4): a pre-round-4 checkpoint without 'pair_batch' must
        # not silently resume under --pair_batch 4 (different chunking/
        # loss weighting would break bit-identical resume)
        defaults = {"halo": "a2a", "pair_batch": 1}
        for k in ("dataset", "seed", "model_cfg", "optim", "task",
                  "pro_shards", "halo", "pair_batch"):
            saved = saved_args.get(k, defaults.get(k))
            cur = self.args.get(k, defaults.get(k))
            if saved is not None and cur is not None and saved != cur:
                raise ValueError(f"resume mismatch on {k!r}")
        self.records = json.loads(payload["records"])
        sched = json.loads(payload["scheduler"])
        self.scheduler.best = sched["best"]
        self.scheduler.num_bad = int(sched["num_bad"])
        self.params = serialization.from_bytes(self.params,
                                               payload["params"])
        self._best_params = serialization.from_bytes(
            self._best_params, payload["best_params"])
        self.opt_state = serialization.from_bytes(self.opt_state,
                                                  payload["opt_state"])
        self._key = jnp.asarray(serialization.from_bytes(
            np.asarray(self._key), payload["key"]))
        if self._has_bn:
            self._mol_bn = serialization.from_bytes(self._mol_bn,
                                                    payload["mol_bn"])
            self._pro_ra = serialization.from_bytes(self._pro_ra,
                                                    payload["pro_ra"])
            self._best_bn = (
                serialization.from_bytes(self._mol_bn,
                                         payload["best_mol_bn"]),
                serialization.from_bytes(self._pro_ra,
                                         payload["best_pro_ra"]))
        self._wait = int(payload["wait"])
        self._start_epoch = int(payload["epoch"]) + 1
        self.log_save_dir = path.parent
        self.run_id = self.log_save_dir.name
        self.log(f"resumed from epoch {payload['epoch']}")
        return self._start_epoch

    def log(self, msg=None):
        line = "" if msg is None else str(msg)
        print(line)
        try:
            with open(self.log_save_dir / "log.txt", "a") as f:
                f.write(line + "\n")
        except OSError:
            pass
