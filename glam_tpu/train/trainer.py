"""Training engine: jitted train/eval steps + epoch loop with early stop,
ReduceLROnPlateau, best-checkpointing and parseable result logging.

Parity with the reference Trainer (/root/reference/src_1gp/trainer.py:29-159)
and its task trainers (:162-346), redesigned for JAX/TPU:
  * the epoch loop stays on host; the per-batch step is one jitted
    function (forward+backward+update) over static-shape GraphBatches,
  * NaN-label masking is done inside the jitted loss with masks instead
    of boolean indexing (shape-stable),
  * checkpoints keep the reference's payload structure
    {'args', 'records', params} with best-on-min-val-loss + final save,
  * each run writes log.txt whose last line is the machine-parseable
    ``{loss_info}|{test_result}|{val_result}`` triple the ensemble layer
    consumes (trainer.py:107-111).

Task trainers (one class, behavior keyed by ``task``):
  regression       out [G,1]; criterion(out, y); RMSE/R2/CI metrics
  binary_nan       out [G,T*2] -> (G,T,2) softmax CE path
  binary_nan_bce   out [G,T] logits; masked BCEWithLogits (y >= 0)
"""
from __future__ import annotations

import json
import time
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.training import train_state

from ..data.batching import GraphLoader
from ..data.graph import GraphBatch
from ..nn.model import Architecture, ModelConfig, model_config_from_args
from .losses import BCE_STYLE, CE_STYLE, get_loss
from .metrics import (auto_metrics, binary_metrics_multi_target_nan,
                      regression_metrics)
from .optim import (ReduceLROnPlateau, get_learning_rate, make_optimizer,
                    set_learning_rate)


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def _utc_run_id(seed: int) -> str:
    ts = datetime.now(timezone.utc).strftime("%Y-%m-%d_%H:%M:%S.%f")[:-3]
    return f"{ts}_seed_{seed}"


# a trial is treated as diverged when its loss/outputs are non-finite
# OR absurdly large-but-finite: with branch-safe activations (nn/
# activations.py celu) an lr=1e8 run reaches ~1e27 losses WITHOUT ever
# producing a NaN, and such params never recover either
_DIVERGE_LIMIT = 1e15


def _diverged(*values) -> bool:
    return any(not np.isfinite(v) or abs(float(v)) > _DIVERGE_LIMIT
               for v in values)


def make_loss_fn(task: str, loss_name: str, num_tasks: int):
    """Build ``loss(outputs [G, D], y [G, T], graph_mask) -> scalar``."""
    criterion = get_loss(loss_name)

    if task == "regression":
        def loss_fn(out, y, gmask):
            pred = out.reshape(-1)
            tgt = y[:, 0]
            return criterion(pred, tgt, weight=gmask.astype(pred.dtype))
    elif task == "binary_nan_bce":
        def loss_fn(out, y, gmask):
            mask = (y >= 0) & gmask[:, None]
            return criterion(out, jnp.maximum(y, 0.0),
                             weight=mask.astype(out.dtype))
    elif task == "binary_nan":
        def loss_fn(out, y, gmask):
            logits = out.reshape(y.shape[0], num_tasks, 2)
            mask = (y >= 0) & gmask[:, None]
            return criterion(logits, jnp.maximum(y, 0.0),
                             weight=mask.astype(out.dtype))
    else:
        raise ValueError(f"unknown task {task!r}")
    return loss_fn


def pallas_enabled(args: Dict) -> bool:
    """Resolve the --pallas flag: 'auto' picks the measured-fastest path.

    Measured on TPU v5e (bench.py, both paths in one process so the
    remote-compile executable-quality variance cancels): the XLA segment
    path runs the flagship train step at 325M edges/s vs 2.2M for the
    fused one-hot-MXU Pallas kernel — the kernel's window gathers burn
    W*E MACs per real edge and run at HIGHEST (6-pass) precision, so it
    only wins in the dispatch-latency-bound regime (1.15-1.32x when
    steps are not scan-fused).  'auto' therefore resolves to the segment
    path; --pallas 1 opts into the fused kernel (with per-batch loader
    fallback when a graph cannot be packed)."""
    val = str(args.get("pallas", 0)).strip().lower()
    if val == "auto":
        return False
    return bool(int(val))


def make_weight_fn(task: str):
    """Per-shard loss weight (the loss's denominator mask sum) used by the
    data-parallel step to combine shard losses/grads exactly: the losses
    are weighted means, so psum(x*w)/psum(w) over shards reproduces the
    single-device global-batch value bit-for-bit (up to psum ordering)."""
    if task in ("binary_nan", "binary_nan_bce"):
        def weight_fn(y, gmask):
            return jnp.sum(((y >= 0) & gmask[:, None]).astype(jnp.float32))
    else:  # graph-level weighting (regression + all pair tasks)
        def weight_fn(y, gmask):
            return jnp.sum(gmask.astype(jnp.float32))
    return weight_fn


class Trainer:
    """Single-tower trainer; see module docstring."""

    TASK = "regression"

    def __init__(self, args: Dict, model, train_graphs, valid_graphs,
                 test_graphs=None, print_log: bool = True,
                 work_dir: Optional[str] = None):
        self.args = dict(args)
        self.model = model
        self.print_log = print_log
        self.start = time.time()
        self.task = self.args.get("task", self.TASK)
        self.num_tasks = int(self.args.get("num_tasks", 1))
        nt = self.num_tasks

        # data parallelism over the first n_devices chips: loaders yield
        # device-stacked sub-batches; the jitted step shard_maps over a
        # ("data",) mesh with weighted-psum grad combining (beyond the
        # reference, which is strictly single-device per trial)
        self.n_devices = int(self.args.get("n_devices", 1))
        self.mesh = None
        if self.n_devices > 1:
            from ..parallel.data_parallel import make_mesh
            devs = jax.devices()
            if len(devs) < self.n_devices:
                raise ValueError(
                    f"--n_devices {self.n_devices} but only {len(devs)} "
                    f"devices visible")
            self.mesh = make_mesh(devs[:self.n_devices], ("data",))

        seed = int(self.args.get("seed", 1234))
        self._make_loaders(train_graphs, valid_graphs, test_graphs)

        self.loss_fn = self._make_loss()
        self.tx = make_optimizer(self.args.get("optim", "Adam"),
                                 float(self.args.get("lr", 1e-3)),
                                 k=int(self.args.get("k", 6)))
        self.scheduler = ReduceLROnPlateau(
            factor=float(self.args.get("lr_reduce_rate", 0.7)),
            patience=int(self.args.get("lr_reduce_patience", 20)),
            min_lr=1e-6)

        # init params on a sample batch
        rng = jax.random.PRNGKey(seed)
        sample = next(iter(self.valid_loader if valid_graphs
                           else self.train_loader))
        variables = self._init_variables(rng, sample)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.state = TrainState.create(apply_fn=self.model.apply,
                                       params=params, tx=self.tx,
                                       batch_stats=batch_stats)
        self.records: Dict[str, List] = {"val_losses": []}

        base = Path(work_dir) if work_dir else Path.cwd()
        self.run_id = _utc_run_id(seed)
        self.log_save_dir = base / f"log_{self.args.get('dataset', 'run')}" \
            / self.run_id
        self.log_save_dir.mkdir(parents=True, exist_ok=True)

        self._build_steps()
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        self.log(msgs=[f"\t{k}:{v}\n" for k, v in self.args.items()])
        self.log(f"save id: {self.run_id}")
        self.log(f"run device: {jax.devices()[0]}")
        self.log("train set num:{}    valid set num:{}    test set num: {}"
                 .format(len(train_graphs), len(valid_graphs),
                         len(test_graphs) if test_graphs else 0))
        self.log("total parameters:" + str(n_params))

    # -- overridable wiring hooks (PairTrainer replaces these) ----------
    def _make_loaders(self, train_graphs, valid_graphs, test_graphs):
        bs = int(self.args.get("batch_size", 32))
        seed = int(self.args.get("seed", 1234))
        nt = self.num_tasks
        # fused Pallas attention path: only _TripletMessage consumes the
        # block packing, and giant graphs can exceed its node window
        pp = pallas_enabled(self.args) \
            and self.args.get("mol_block") == "_TripletMessage"
        nd = self.n_devices
        ebs = max((32 // nd) * nd, nd)  # eval bs 32, n_devices-divisible
        self.train_loader = GraphLoader(train_graphs, bs, nt, shuffle=True,
                                        seed=seed, pallas_pack=pp,
                                        n_devices=nd)
        self.valid_loader = GraphLoader(valid_graphs, ebs, nt,
                                        pallas_pack=pp, n_devices=nd)
        self.test_loader = (GraphLoader(test_graphs, ebs, nt,
                                        pallas_pack=pp, n_devices=nd)
                            if test_graphs else None)

    def _make_loss(self):
        return make_loss_fn(self.task, self.args.get("loss", "mse"),
                            self.num_tasks)

    def _make_weight(self):
        return make_weight_fn(self.task)

    def _init_variables(self, rng, sample):
        parts = self._as_parts(sample)
        if self.n_devices > 1:  # loaders yield device-stacked batches
            parts = jax.tree_util.tree_map(lambda a: a[0], parts)
        # jit the init: unjitted, flax runs the whole forward eagerly —
        # measured ~150 one-op XLA compiles (~10s) per trial process.
        # One jitted program traces once and lands in the persistent
        # compilation cache, so AutoML trials/CLI runs pay ~1s instead.
        return jax.jit(lambda r, *p: self.model.init(r, *p, True))(
            {"params": rng, "dropout": jax.random.PRNGKey(1)}, *parts)

    # ------------------------------------------------------------------
    @staticmethod
    def _as_parts(batch) -> Tuple[GraphBatch, ...]:
        """Normalize a loader item to a tuple of GraphBatches.

        Single-tower loaders yield one GraphBatch; pair loaders yield
        (mol, mol2|pro).  The jitted steps and the epoch loop below are
        generic over this tuple, so PairTrainer only swaps loaders, loss
        and the metric heads (the reference duplicated the whole Trainer
        per task tree instead, src_2gi_*/trainer.py)."""
        if isinstance(batch, GraphBatch):
            return (batch,)
        return tuple(batch)

    @staticmethod
    def _stackable(pending) -> bool:
        """True when all pending batch tuples share one pytree structure
        and leaf shapes (a loader's pack-overflow recovery can change the
        batch shape mid-epoch; such a transition group runs per-batch)."""
        def sig(parts):
            leaves, treedef = jax.tree_util.tree_flatten(parts)
            return treedef, tuple((l.shape, l.dtype) for l in leaves)

        first = sig(pending[0])
        return all(sig(p) == first for p in pending[1:])

    def _build_steps(self):
        loss_fn = self.loss_fn
        model = self.model
        compute_dtype = jnp.dtype(self.args.get("dtype", "float32"))

        def to_compute(tree):
            """Mixed precision: master params/optimizer stay f32; the
            whole forward+backward runs in compute_dtype (bf16 halves
            HBM traffic and doubles MXU rate on TPU).  Cast happens
            inside the differentiated function, so grads come back f32
            through the astype and the f32 loss."""
            if compute_dtype == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                tree)

        def _grads_and_loss(params, batch_stats, parts, drop_rng,
                            scale=None):
            cparts = to_compute(parts)

            def compute(p):
                variables = {"params": to_compute(p)}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                    out, updates = model.apply(
                        variables, *cparts, False,
                        rngs={"dropout": drop_rng},
                        mutable=["batch_stats"])
                    new_stats = updates.get("batch_stats", batch_stats)
                else:
                    out = model.apply(variables, *cparts, False,
                                      rngs={"dropout": drop_rng})
                    new_stats = batch_stats
                loss = loss_fn(out.astype(jnp.float32), parts[0].y,
                               parts[0].graph_mask)
                if scale is not None:
                    # DP: pre-scaling the per-shard loss makes shard_map's
                    # capture transpose (auto-psum of grads w.r.t. the
                    # replicated params) produce the weighted global mean
                    loss = loss * scale
                return loss, new_stats

            return jax.value_and_grad(compute, has_aux=True)(params)

        def train_step(state: TrainState, parts, rng):
            drop_rng = jax.random.fold_in(rng, state.step)
            (loss, new_stats), grads = _grads_and_loss(
                state.params, state.batch_stats, parts, drop_rng)
            state = state.apply_gradients(grads=grads)
            if state.batch_stats:
                state = state.replace(batch_stats=new_stats)
            return state, loss

        def eval_step(params, batch_stats, parts):
            variables = {"params": to_compute(params)}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, *to_compute(parts), True)
            out = out.astype(jnp.float32)
            loss = loss_fn(out, parts[0].y, parts[0].graph_mask)
            return out, loss

        if self.n_devices > 1:
            train_step, eval_step = self._build_dp_steps(_grads_and_loss,
                                                         eval_step)

        def train_scan(state: TrainState, stacked, rng):
            # S stacked batches -> S optimizer steps in ONE dispatch
            # (lax.scan); cuts host->device dispatch latency S-fold for
            # small-molecule workloads, which are latency-bound.
            def body(st, parts):
                st, loss = train_step(st, parts, rng)
                return st, loss

            state, losses = jax.lax.scan(body, state, stacked)
            return state, jnp.mean(losses)

        def eval_scan(params, batch_stats, stacked):
            # S stacked eval batches -> ONE dispatch; outputs stay on
            # device until the group transfer (the tunnel round-trip per
            # dispatch dominates eval time for small molecule batches).
            def body(_, parts):
                return None, eval_step(params, batch_stats, parts)

            _, (outs, losses) = jax.lax.scan(body, None, stacked)
            return outs, losses

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._train_scan = jax.jit(train_scan, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)
        self._eval_scan = jax.jit(eval_scan)

    def _build_dp_steps(self, grads_and_loss, local_eval_step):
        """Data-parallel train/eval steps: shard_map over the ("data",)
        mesh; per-shard weighted-mean losses/grads are combined with a
        weighted psum so the result equals the single-device global-batch
        computation exactly (weights = the loss's mask denominators,
        which also zeroes out all-padding trailing device slots)."""
        from functools import partial
        from jax.sharding import PartitionSpec as P
        mesh, axis, D = self.mesh, "data", self.n_devices
        weight_fn = self._make_weight()
        rep = P()

        def batch_specs(parts):
            return jax.tree_util.tree_map(lambda _: P(axis), parts)

        def dp_train_step(state: TrainState, parts, rng):
            def per_shard(params, batch_stats, parts, rng, step):
                parts = jax.tree_util.tree_map(lambda a: a[0], parts)
                drop_rng = jax.random.fold_in(
                    rng, step * D + jax.lax.axis_index(axis))
                w = weight_fn(parts[0].y, parts[0].graph_mask)
                wn = w / jnp.maximum(jax.lax.psum(w, axis), 1e-12)
                # the wn pre-scale makes the grads w.r.t. the captured
                # (replicated) params — which shard_map's transpose
                # auto-psums over the mesh — equal the exact global
                # weighted-mean gradient; no explicit grad collective
                (loss, new_stats), grads = grads_and_loss(
                    params, batch_stats, parts, drop_rng, scale=wn)
                loss = jax.lax.psum(loss, axis)
                if new_stats:
                    # running BN stats: plain pmean (standard local-batch
                    # DP BatchNorm; stats are diagnostics, not the loss)
                    new_stats = jax.lax.pmean(new_stats, axis)
                return grads, loss, new_stats

            shard_fn = jax.shard_map(
                partial(per_shard, state.params, state.batch_stats),
                mesh=mesh,
                in_specs=(batch_specs(parts), rep, rep),
                out_specs=(rep, rep, rep))
            grads, loss, new_stats = shard_fn(parts, rng, state.step)
            state = state.apply_gradients(grads=grads)
            if state.batch_stats:
                state = state.replace(batch_stats=new_stats)
            return state, loss

        def dp_eval_step(params, batch_stats, parts):
            def per_shard(params, batch_stats, parts):
                sparts = jax.tree_util.tree_map(lambda a: a[0], parts)
                out, loss = local_eval_step(params, batch_stats, sparts)
                w = weight_fn(sparts[0].y, sparts[0].graph_mask)
                wn = w / jnp.maximum(jax.lax.psum(w, axis), 1e-12)
                return out[None], jax.lax.psum(loss * wn, axis)

            shard_fn = jax.shard_map(
                partial(per_shard, params, batch_stats),
                mesh=mesh,
                in_specs=(batch_specs(parts),),
                out_specs=(P(axis), rep))
            return shard_fn(parts)

        return dp_train_step, dp_eval_step

    # ------------------------------------------------------------------
    def train_iterations(self, rng) -> float:
        scan = int(self.args.get("scan_steps", 8))
        losses: List[Tuple[float, int]] = []  # (group mean, n batches)
        pending: List[Tuple[GraphBatch, ...]] = []
        # GLAM_TRAIN_STATS=1: per-epoch achieved edges/s through THIS
        # loop (wall clock incl. a trailing device sync) + the fraction
        # of it spent blocked on the prefetch iterator — connects the
        # microbench headline to the loop users actually run
        import os
        stats = os.environ.get("GLAM_TRAIN_STATS", "0") == "1"
        t_start = time.perf_counter() if stats else 0.0
        t_fetch, n_edges = 0.0, 0

        def flush():
            if not pending:
                return
            if len(pending) == scan and scan > 1 \
                    and self._stackable(pending):
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *pending)
                self.state, loss = self._train_scan(self.state, stacked,
                                                    rng)
                losses.append((loss, scan))
            else:
                for parts in pending:
                    self.state, loss = self._train_step(self.state, parts,
                                                        rng)
                    losses.append((loss, 1))
            pending.clear()

        from ..data.batching import prefetch
        it = prefetch(iter(self.train_loader))
        while True:
            if stats:
                t0 = time.perf_counter()
            batch = next(it, None)
            if stats:
                t_fetch += time.perf_counter() - t0
            if batch is None:
                break
            if stats:
                n_edges += int(np.asarray(batch.edge_mask).sum())
            pending.append(self._as_parts(batch))
            if len(pending) == max(scan, 1):
                flush()
        flush()
        if losses:
            self.log("\tbatch 0 training loss: {:.5f}".format(
                float(losses[0][0])), with_time=True)
        if stats and losses:
            jax.block_until_ready(losses[-1][0])
            dt = time.perf_counter() - t_start
            self.log(f"\ttrain stats: {n_edges:.3e} edges in {dt:.2f}s "
                     f"= {n_edges / max(dt, 1e-9):.3e} edges/s, "
                     f"prefetch stall {t_fetch / max(dt, 1e-9):.1%}",
                     with_time=True)
        # per-batch (not per-group) mean: scan groups carry their size
        total = sum(n for _, n in losses)
        return float(sum(float(l) * n for l, n in losses) / max(total, 1))

    def _merge_devices(self, a: np.ndarray) -> np.ndarray:
        """Flatten a leading device axis of a DP-stacked array."""
        a = np.asarray(a)
        if self.n_devices > 1:
            return a.reshape((-1,) + a.shape[2:])
        return a

    def _gather(self, mode: str):
        loader = {"valid": self.valid_loader, "test": self.test_loader,
                  "inference": self.test_loader}[mode]
        scan = int(self.args.get("scan_steps", 8))
        outs, ys, masks, losses = [], [], [], []
        pending: List[Tuple[GraphBatch, ...]] = []

        def flush():
            if not pending:
                return
            if len(pending) == scan and scan > 1 \
                    and self._stackable(pending):
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *pending)
                out, loss = self._eval_scan(self.state.params,
                                            self.state.batch_stats, stacked)
                outs.extend(self._merge_devices(o)      # [S(, D), G, out]
                            for o in np.asarray(out))
                losses.extend(float(l) for l in np.asarray(loss))
            else:
                for parts in pending:
                    out, loss = self._eval_step(self.state.params,
                                                self.state.batch_stats,
                                                parts)
                    outs.append(self._merge_devices(out))
                    losses.append(float(loss))
            for parts in pending:
                ys.append(self._merge_devices(parts[0].y))
                masks.append(self._merge_devices(parts[0].graph_mask))
            pending.clear()

        from ..data.batching import prefetch
        for batch in prefetch(iter(loader)):
            pending.append(self._as_parts(batch))
            if len(pending) == max(scan, 1):
                flush()
        flush()
        m = np.concatenate(masks)
        return (np.concatenate(outs)[m], np.concatenate(ys)[m],
                float(np.mean(losses)))

    def valid_iterations(self, mode: str = "valid"):
        out, y, mean_loss = self._gather(
            "valid" if mode == "valid" else
            ("test" if self.test_loader else "valid"))
        if mode != "inference" and (not np.isfinite(out).all()
                                    or np.abs(out).max() > _DIVERGE_LIMIT):
            # diverged params: sklearn metrics reject NaN/degenerate
            # scores — emit an inf-loss sentinel instead of crashing
            return float("inf"), {"diverged": 1.0}
        if self.task == "regression":
            pred = out.reshape(-1)
            tgt = y[:, 0]
            if mode == "inference":
                return tgt, pred
            return mean_loss, regression_metrics(tgt, pred)
        if self.task == "binary_nan_bce":
            score = 1.0 / (1.0 + np.exp(-out))
            if mode == "inference":
                return score, y
            return mean_loss, binary_metrics_multi_target_nan(y, score)
        # binary_nan (2-logit-per-task)
        logits = out.reshape(out.shape[0], self.num_tasks, 2)
        ex = np.exp(logits - logits.max(-1, keepdims=True))
        prob = ex / ex.sum(-1, keepdims=True)
        score = prob[..., 1]
        pred = logits.argmax(-1)
        if mode == "inference":
            return y, score, pred
        return mean_loss, binary_metrics_multi_target_nan(y, score, pred)

    # ------------------------------------------------------------------
    def _probe_compile(self, rng) -> None:
        """Validated compile: reject lottery-slow executables.

        The tunneled remote-compile service has ~30x run-to-run
        executable-quality variance (memory/axon-tpu-quirks), and with
        the persistent cache enabled a slow executable would be reloaded
        by every rerun of this config.  With --probe_compile FLOOR
        (edges/s) set, time the compiled train dispatch on the first
        batch before training; below the floor, evict the just-written
        persistent-cache entries, clear the jit cache, and recompile
        (up to 3 attempts, keeping the last).  Probe steps run on
        disposable copies of the train state — training itself is
        unaffected."""
        floor = float(self.args.get("probe_compile", 0) or 0)
        if floor <= 0:
            return
        from ..utils.cache import (evict_new_cache_entries,
                                   snapshot_cache_entries)
        scan = int(self.args.get("scan_steps", 8))
        ep = getattr(self.train_loader, "epoch", 0)
        batch = next(iter(self.train_loader))
        if hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(ep)  # undo the probe's iterator
        parts = self._as_parts(batch)
        if scan > 1:
            payload = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * scan), parts)
            fn = self._train_scan
        else:
            payload, fn = parts, self._train_step
        edges_per_call = float(np.asarray(
            parts[0].edge_mask).sum()) * max(scan, 1)

        def fresh_state():  # fn donates its state argument
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(x).copy(), self.state)

        reps = 3
        for attempt in range(3):
            snap = snapshot_cache_entries()
            st, loss = fn(fresh_state(), payload, rng)  # compile+run
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(reps):
                st, loss = fn(st, payload, rng)
            jax.block_until_ready(loss)
            rate = edges_per_call * reps / max(time.time() - t0, 1e-9)
            if rate >= floor:
                self.log(f"compile probe ok: {rate:.3e} edges/s "
                         f"(attempt {attempt + 1})", with_time=True)
                return
            if attempt == 2:
                # keep the final executable IN-PROCESS (evicting the
                # jit cache would force an unvalidated 4th compile on
                # the first real step) — but drop its PERSISTENT-cache
                # entries, or every later process would reload this
                # validated-slow executable instead of re-rolling
                # (observed: three run.py processes pinned at the same
                # 7.9e5 edges/s through the shared cache)
                n = evict_new_cache_entries(snap)
                self.log("compile probe: floor not reached after 3 "
                         "attempts; continuing with the last executable"
                         f" (evicted its {n} persistent-cache entries)",
                         with_time=True)
                return
            n = evict_new_cache_entries(snap)
            self.log(f"compile probe SLOW: {rate:.3e} < {floor:.1e} "
                     f"edges/s; evicted {n} cache entries, recompiling "
                     f"(attempt {attempt + 1})", with_time=True)
            jax.clear_caches()

    def train(self):
        self.log("Training start...")
        rng = jax.random.PRNGKey(int(self.args.get("seed", 1234)) + 7)
        self._probe_compile(rng)
        early_stop_cnt = getattr(self, "_early_stop_cnt", 0)
        start_epoch = getattr(self, "_start_epoch", 0)
        epochs = int(self.args.get("epochs", 30))
        patience = int(self.args.get("early_stop_patience", 50))
        epoch = start_epoch
        if start_epoch and hasattr(self.train_loader, "set_epoch"):
            # replay the shuffle sequence so a resumed run sees the same
            # batch order a straight-through run would have at this epoch
            self.train_loader.set_epoch(start_epoch)
        for epoch in range(start_epoch, epochs):
            trn_loss = self.train_iterations(rng)
            val_loss, result = self.valid_iterations()
            if _diverged(trn_loss, val_loss):
                # diverged (NaN/inf/absurd params): they never recover,
                # so stop instead of wasting the remaining epochs or
                # feeding NaN scores to sklearn (the reference crashes
                # here; the solver treats both as a skipped trial)
                self.log(f"Epoch:{epoch} diverged "
                         f"(trn_loss:{trn_loss} val_loss:{val_loss}); "
                         "stopping training early.", with_time=True)
                break
            lr = get_learning_rate(self.state.opt_state)
            new_lr = self.scheduler.step(val_loss, lr)
            if new_lr != lr:
                self.state = self.state.replace(opt_state=set_learning_rate(
                    self.state.opt_state, new_lr))
            self.log("Epoch:{} trn_loss:{:.5f} val_loss:{:.5f} "
                     "val_result:{} lr_cur:{:.7f}".format(
                         epoch, trn_loss, val_loss, result, new_lr),
                     with_time=True)
            self.records["val_losses"].append(val_loss)
            if val_loss == min(self.records["val_losses"]):
                self.save_ckpt(epoch)
                early_stop_cnt = 0
            else:
                early_stop_cnt += 1
            self.save_resume_ckpt(epoch, early_stop_cnt)
            if 0 < patience < early_stop_cnt:
                self.log("Early stop hitted!")
                break
        self.save_ckpt(epoch, final_save=True)

    def train_and_test(self):
        self.train()
        self.log("Testing...")
        self.load_best_ckpt()
        val_loss, val_result = self.valid_iterations(mode="valid")
        test_loss, test_result = self.valid_iterations(mode="test")
        self.log(msg=str(self.args))
        loss_info = {"testloss": float(test_loss), "valloss": float(val_loss)}
        val_new = {"val" + k: v for k, v in val_result.items()}
        self.log(f"{loss_info}|{test_result}|{val_new}")
        self._write_structured_result(loss_info, test_result, val_new)
        return loss_info, test_result, val_new

    def _write_structured_result(self, loss_info, test_result, val_new):
        """Structured artifacts (SURVEY.md §5: same artifacts as the
        reference but as JSON, no eval-parsing needed): result.json in
        the run dir + an appended record in <work_dir>/results.jsonl."""
        record = {
            "run_id": self.run_id,
            "dataset": self.args.get("dataset"),
            "note": self.args.get("note"),
            "seed": self.args.get("seed"),
            "config": {k: v for k, v in self.args.items()
                       if k != "model_cfg"},
            "loss": loss_info,
            "test": test_result,
            "val": val_new,
            "epochs_run": len(self.records["val_losses"]),
        }
        try:
            with open(self.log_save_dir / "result.json", "w") as f:
                json.dump(record, f, indent=1)
            with open(self.log_save_dir.parent / "results.jsonl", "a") as f:
                f.write(json.dumps(record) + "\n")
        except OSError:
            pass

    # ------------------------------------------------------------------
    def gen_test_batch(self, path="other/test_batch.npz"):
        """Save one eval batch as a fixture (reference
        trainer.py:123-126 gen_test_batch saved a pickled PyG batch)."""
        import os
        batch = next(iter(self.valid_loader))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **{k: np.asarray(v)
                          for k, v in batch._asdict().items()
                          if v is not None})
        return path

    def write_datasets(self, out_dir="."):
        """Export the split SMILES+labels as CSVs (reference DTI
        trainer.py:128-143 write_datasets)."""
        import pandas as pd
        from pathlib import Path as _P
        out = _P(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for name, loader in [("train", self.train_loader),
                             ("valid", self.valid_loader),
                             ("test", self.test_loader)]:
            if loader is None:
                continue
            graphs = getattr(loader, "graphs", None)
            if graphs is not None:
                pd.DataFrame({
                    "smiles": [g.smi for g in graphs],
                    "label": [float(g.y.reshape(-1)[0]) for g in graphs],
                }).to_csv(out / f"{name}.csv", index=False)
                continue
            pairs = getattr(loader, "pairs", None)
            if pairs is not None:  # DTI exporter (trainer.py:128-143)
                pd.DataFrame({
                    "smiles": [p[0].smi for p in pairs],
                    "partner": [p[1].smi for p in pairs],
                    "label": [float(p[0].y.reshape(-1)[0]) for p in pairs],
                }).to_csv(out / f"{name}.csv", index=False)

    # ------------------------------------------------------------------
    def pasp(self):
        """PASP robustness evaluation for regression models (reference
        TrainerMolRegression.pasp, trainer.py:329-346): for perturbation
        levels 1-3, DeltaRMSE = rmse(P, P') - rmse(Q, Q')."""
        from ..data.batching import GraphLoader
        from ..data.perturb import perturb_test
        from .metrics import regression_metrics

        results = {}
        for level in (1, 2, 3):
            self.log(f"Run model for perturbed test level {level}...")
            M, M_prime, Q, Q_prime = perturb_test(
                self.args["dataset_root"], self.args["dataset"], level)
            saved = self.test_loader
            self.test_loader = GraphLoader(M, 32, self.num_tasks)
            _, P = self.valid_iterations(mode="inference")
            self.test_loader = GraphLoader(M_prime, 32, self.num_tasks)
            _, P_prime = self.valid_iterations(mode="inference")
            self.test_loader = saved
            l_pp = regression_metrics(P, P_prime)
            l_qq = regression_metrics(Q, Q_prime)
            self.log(f"L(P, P') is {l_pp}, and\n L(Q, Q') is {l_qq}")
            delta = l_pp["rmse"] - l_qq["rmse"]
            self.log(f"Delta_RMSE={delta}")
            results[level] = delta
        return results

    # ------------------------------------------------------------------
    def save_ckpt(self, epoch: int, final_save: bool = False):
        name = "final_save.ckpt" if final_save else "best_save.ckpt"
        payload = {
            "args": json.dumps(self.args),
            "records": json.dumps(self.records),
            "params": serialization.to_bytes(self.state.params),
            "batch_stats": serialization.to_bytes(self.state.batch_stats),
        }
        with open(self.log_save_dir / name, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        self.log(f"Model saved at epoch {epoch}")

    def save_resume_ckpt(self, epoch: int, early_stop_cnt: int):
        """Full-training-state snapshot for mid-training resume — a
        capability the reference lacks (SURVEY.md §5: 'No mid-training
        resume — a killed run restarts from epoch 0').  Captures params,
        batch stats, optimizer state (incl. lookahead slow weights and
        the injected learning rate), scheduler state, early-stop counter
        and the epoch, so ``resume()`` continues bit-identically to a
        straight-through run."""
        payload = {
            "args": json.dumps(self.args),
            "records": json.dumps(self.records),
            "params": serialization.to_bytes(self.state.params),
            "batch_stats": serialization.to_bytes(self.state.batch_stats),
            "opt_state": serialization.to_bytes(self.state.opt_state),
            "step": int(self.state.step),
            "epoch": epoch,
            "early_stop_cnt": early_stop_cnt,
            "scheduler": json.dumps({"best": self.scheduler.best,
                                     "num_bad": self.scheduler.num_bad}),
        }
        with open(self.log_save_dir / "last_save.ckpt", "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    def resume(self, run_dir) -> int:
        """Restore full training state from ``<run_dir>/last_save.ckpt``
        (or a direct ckpt path) and point this trainer's logging /
        best-checkpointing at that run dir.  Returns the next epoch;
        ``train()`` will continue from it."""
        import shutil
        path = Path(run_dir)
        if path.is_dir():
            path = path / "last_save.ckpt"
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        saved_args = json.loads(payload["args"])
        # model/optimizer-shaping args passed flat (not via model_cfg)
        # would otherwise surface as opaque from_bytes structure errors —
        # or, for optim, silently misread optimizer state
        for key in ("dataset", "batch_size", "seed", "model_cfg", "e_dim",
                    "hid_dim_alpha", "mol_block", "mol_readout",
                    "message_steps", "optim", "task"):
            if key in saved_args and key in self.args \
                    and saved_args[key] != self.args[key]:
                raise ValueError(
                    f"resume mismatch on {key!r}: checkpoint has "
                    f"{saved_args[key]!r}, this run has {self.args[key]!r}")
        self.records = json.loads(payload["records"])
        sched = json.loads(payload["scheduler"])
        self.scheduler.best = sched["best"]
        self.scheduler.num_bad = int(sched["num_bad"])
        self.state = self.state.replace(
            params=serialization.from_bytes(self.state.params,
                                            payload["params"]),
            batch_stats=serialization.from_bytes(self.state.batch_stats,
                                                 payload["batch_stats"]),
            opt_state=serialization.from_bytes(self.state.opt_state,
                                               payload["opt_state"]),
            step=int(payload["step"]))
        self._early_stop_cnt = int(payload["early_stop_cnt"])
        self._start_epoch = int(payload["epoch"]) + 1
        # continue the original run dir (logs, best_save) and drop the
        # fresh one __init__ just created
        fresh = self.log_save_dir
        self.log_save_dir = path.parent
        if fresh != self.log_save_dir:
            shutil.rmtree(fresh, ignore_errors=True)
        self.run_id = self.log_save_dir.name
        self.log(f"Resumed from {path} at epoch {self._start_epoch}")
        return self._start_epoch

    def load_best_ckpt(self):
        path = self.log_save_dir / "best_save.ckpt"
        if not path.exists():
            # a run that diverged before its first finite val loss never
            # saved a best checkpoint; keep the current params so the
            # test phase reports the diverged sentinel cleanly
            self.log("No best checkpoint saved (diverged run?); "
                     "keeping current params")
            return
        self.log(f"The best ckpt is {path}")
        self.load_ckpt(path)

    def load_ckpt(self, path):
        self.log(f"Ckpt loading: {path}")
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        self.args.update(json.loads(payload["args"]))
        self.records = json.loads(payload["records"])
        params = serialization.from_bytes(self.state.params,
                                          payload["params"])
        stats = serialization.from_bytes(self.state.batch_stats,
                                         payload["batch_stats"])
        self.state = self.state.replace(params=params, batch_stats=stats)

    # ------------------------------------------------------------------
    def log(self, msg=None, msgs=None, with_time=False):
        if not self.print_log:
            return
        if with_time and msg is not None:
            el = time.time() - self.start
            msg = msg + " time elapsed {:.2f} hrs ({:.1f} mins)".format(
                el / 3600.0, el / 60.0)
        with open(self.log_save_dir / "log.txt", "a+") as f:
            if msgs:
                f.writelines([m if m.endswith("\n") else m + "\n"
                              for m in msgs])
            if msg is not None:
                f.write(str(msg) + "\n")
                print(msg)


def make_trainer(args: Dict, dataset, trainer_kind: str,
                 work_dir: Optional[str] = None,
                 model_overrides: Optional[Dict] = None) -> Trainer:
    """Assemble model+trainer from a flat config dict and a MolDataset."""
    args = dict(args)
    args["task"] = trainer_kind
    args["num_tasks"] = dataset.num_tasks
    overrides = dict(model_overrides or {})
    from ..data.batching import max_graph_nodes
    overrides.setdefault("max_nodes", max_graph_nodes(dataset.graphs))
    overrides.setdefault("mol_in_dim", dataset.num_node_features)
    overrides.setdefault("mol_edge_in_dim", dataset.num_edge_features)
    overrides.setdefault("out_dim", args.get("out_dim", 1))
    cfg = model_config_from_args(args, **overrides)
    import dataclasses
    args["model_cfg"] = dataclasses.asdict(cfg)  # self-describing ckpts
    model = Architecture(cfg)
    return Trainer(args, model, dataset.train, dataset.val, dataset.test,
                   work_dir=work_dir)
