"""Inference/serving API: load a trained checkpoint, predict from SMILES.

The reference has no serving story beyond re-instantiating a Trainer
(trainer.py:349-384); this module provides the production path the
framework is meant to ship with:

    pred = Predictor.from_checkpoint("log_demo/<run_id>")
    scores = pred.predict_smiles(["CCO", "c1ccccc1"])

or an ensemble over several runs:

    ens = EnsemblePredictor.from_runs("log_demo", n=3)

Batches are padded to the checkpointed budgets so repeated calls reuse
one compiled executable.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from flax import serialization

from .data.datasets import featurize_smiles
from .data.batching import GraphLoader
from .data.graph import GraphArrays
from .nn.model import Architecture, model_config_from_args


class Predictor:
    """Single-model predictor over molecular SMILES."""

    def __init__(self, model, params, batch_stats, args: Dict,
                 batch_size: int = 32):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.args = args
        self.batch_size = batch_size
        self.task = args.get("task", "regression")
        self.num_tasks = int(args.get("num_tasks", 1))
        self.out_dim = int(args.get("out_dim", 1))
        # pin loader budgets so repeated predict calls share ONE
        # compiled executable (max_nodes = the checkpointed per-graph
        # cap; molecular edge count <= ~2.4x nodes, pad generously)
        mc = args.get("model_cfg", {})
        max_nodes = int(mc.get("max_nodes", 132))
        self._node_budget = 8 * -(-(batch_size * max_nodes + 1) // 8)
        self._edge_budget = 8 * -(-(3 * batch_size * max_nodes) // 8)

        def forward(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, batch, True)

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, run_dir, which: str = "best_save.ckpt",
                        batch_size: int = 32) -> "Predictor":
        run_dir = Path(run_dir)
        with open(run_dir / which, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        args = json.loads(payload["args"])
        if "model_cfg" in args:
            from .nn.model import ModelConfig
            cfg = ModelConfig(**args["model_cfg"])
        else:
            cfg = model_config_from_args(
                args, out_dim=args.get("out_dim", 1))
        model = Architecture(cfg)
        # materialize the param structure, then restore bytes into it
        dummy = _dummy_batch(cfg)
        variables = jax.jit(lambda r, d: model.init(r, d, True))(
            jax.random.PRNGKey(0), dummy)
        params = serialization.from_bytes(variables["params"],
                                          payload["params"])
        stats = serialization.from_bytes(
            variables.get("batch_stats", {}), payload["batch_stats"])
        return cls(model, params, stats, args, batch_size)

    def predict_smiles(self, smiles: Sequence[str]) -> np.ndarray:
        """Returns [N, out] predictions (logits for classification,
        values for regression); unparseable SMILES yield NaN rows."""
        graphs: List[Optional[GraphArrays]] = []
        for smi in smiles:
            try:
                x, snd, rcv, e = featurize_smiles(smi)
                graphs.append(GraphArrays(
                    nodes=x, edges=e, senders=snd, receivers=rcv,
                    y=np.zeros(self.num_tasks, np.float32), smi=smi))
            except ValueError:
                graphs.append(None)
        valid = [g for g in graphs if g is not None]
        outs = []
        if valid:
            try:
                loader = GraphLoader(valid, self.batch_size,
                                     self.num_tasks,
                                     node_budget=self._node_budget,
                                     edge_budget=self._edge_budget)
                batches = list(loader)
            except ValueError:
                # inputs exceed the pinned budgets (unusually large
                # molecules): fall back to input-derived shapes
                batches = list(GraphLoader(valid, self.batch_size,
                                           self.num_tasks))
            for batch in batches:
                out = np.asarray(self._forward(self.params,
                                               self.batch_stats, batch))
                outs.append(out[np.asarray(batch.graph_mask)])
            preds = np.concatenate(outs, axis=0)
        else:
            preds = np.zeros((0, self.out_dim), np.float32)
        width = preds.shape[1] if preds.size else self.out_dim
        full = np.full((len(smiles), width), np.nan, np.float32)
        vi = 0
        for i, g in enumerate(graphs):
            if g is not None:
                full[i] = preds[vi]
                vi += 1
        return full

    def predict_scores(self, smiles: Sequence[str]) -> np.ndarray:
        """Probability scores for classification tasks (sigmoid/softmax
        applied per the trained head)."""
        out = self.predict_smiles(smiles)
        if self.task == "binary_nan_bce":
            return 1.0 / (1.0 + np.exp(-out))
        if self.task == "binary_nan":
            logits = out.reshape(out.shape[0], self.num_tasks, 2)
            ex = np.exp(logits - logits.max(-1, keepdims=True))
            return (ex / ex.sum(-1, keepdims=True))[..., 1]
        return out


def _dummy_batch(cfg):
    g = GraphArrays(nodes=np.zeros((2, cfg.mol_in_dim), np.float32),
                    edges=np.zeros((2, cfg.mol_edge_in_dim), np.float32),
                    senders=np.asarray([0, 1], np.int32),
                    receivers=np.asarray([1, 0], np.int32),
                    y=np.zeros(1, np.float32))
    return next(iter(GraphLoader([g], 1, 1)))


class EnsemblePredictor:
    """Mean-score ensemble over several run checkpoints (reference
    blending semantics, metrics.py:153-186)."""

    def __init__(self, predictors: List[Predictor]):
        if not predictors:
            raise ValueError("no predictors")
        self.predictors = predictors

    @classmethod
    def from_runs(cls, logs_dir, n: int = 3,
                  dataset: Optional[str] = None) -> "EnsemblePredictor":
        from .automl.summary import select_top_runs
        logs_dir = Path(logs_dir)
        ds = dataset or logs_dir.name.replace("log_", "")
        sel = select_top_runs(logs_dir, ds, n)
        preds = [Predictor.from_checkpoint(logs_dir / rid)
                 for rid in sel["id"]]
        return cls(preds)

    def predict_scores(self, smiles: Sequence[str]) -> np.ndarray:
        return np.mean([p.predict_scores(smiles)
                        for p in self.predictors], axis=0)

    def predict_smiles(self, smiles: Sequence[str]) -> np.ndarray:
        return np.mean([p.predict_smiles(smiles)
                        for p in self.predictors], axis=0)


class PairPredictor:
    """Pair-model predictor: DDI (SMILES, SMILES) or DTI (SMILES,
    protein sequence + contact map) from a PairArchitecture checkpoint
    — incl. checkpoints trained SHARDED (run.py --pro_shards), which
    are saved in the same layout."""

    def __init__(self, model, params, args: Dict, hetero: bool,
                 contact_maps: Optional[Dict] = None,
                 batch_stats=None, batch_size: int = 16):
        self.model = model
        self.params = params
        self.args = args
        self.hetero = hetero
        self.contact_maps = contact_maps or {}
        self.task = args.get("task", "pair_binary")
        self.batch_stats = batch_stats or {}
        self._pro_cache: Dict[str, GraphArrays] = {}
        # serving throughput: pairs are packed batch_size-at-a-time into
        # ONE forward dispatch, and the pad budgets are STICKY across
        # predict calls (monotone floors) so repeated calls with
        # same-scale inputs reuse one compiled executable instead of
        # recompiling per distinct worst-case shape
        self.batch_size = max(int(batch_size), 1)
        self._budget1 = self._budget2 = None

        def forward(params, batch_stats, b1, b2):
            variables = {"params": params}
            if batch_stats:
                # BatchNorm checkpoints: eval mode reads the trained
                # running averages (serving with init stats would be
                # silently wrong)
                variables["batch_stats"] = batch_stats
            return model.apply(variables, b1, b2, True)

        jit_fwd = jax.jit(forward)
        self._forward = lambda params, b1, b2: jit_fwd(
            params, self.batch_stats, b1, b2)

    @classmethod
    def from_checkpoint(cls, run_dir, which: str = "best_save.ckpt",
                        contact_maps: Optional[Dict] = None,
                        batch_size: int = 16) -> "PairPredictor":
        from .nn.model import ModelConfig, PairArchitecture
        run_dir = Path(run_dir)
        with open(run_dir / which, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        args = json.loads(payload["args"])
        cfg = ModelConfig(**args["model_cfg"])
        # DDI tasks (pair_binary_bce / pair_multiclass) are homo
        # two-molecule models; DTI/screening/regression are hetero
        hetero = args.get("task", "pair_binary") not in (
            "pair_binary_bce", "pair_multiclass")
        model = PairArchitecture(cfg, hetero=hetero)
        b1 = _dummy_batch(cfg)
        if hetero:
            g2 = GraphArrays(
                nodes=np.zeros((2, cfg.pro_in_dim), np.float32),
                edges=np.zeros((2, cfg.pro_edge_in_dim), np.float32),
                senders=np.asarray([0, 1], np.int32),
                receivers=np.asarray([1, 0], np.int32),
                y=np.zeros(1, np.float32))
            b2 = next(iter(GraphLoader([g2], 1, 1)))
        else:
            b2 = b1
        variables = jax.jit(lambda r, a, b: model.init(r, a, b, True))(
            jax.random.PRNGKey(0), b1, b2)
        params = serialization.from_bytes(variables["params"],
                                          payload["params"])
        stats = {}
        if payload.get("batch_stats") and "batch_stats" in variables:
            try:
                stats = serialization.from_bytes(
                    variables["batch_stats"], payload["batch_stats"])
            except ValueError:
                # only an EMPTY payload (pre-BN checkpoint) may fall
                # back to init stats; a non-empty batch_stats payload
                # that fails to restore means corrupt/mismatched
                # trained running averages — serving with init stats
                # would be silently wrong (ADVICE round-4)
                restored = serialization.msgpack_restore(
                    payload["batch_stats"]) if isinstance(
                        payload["batch_stats"], bytes) else \
                    payload["batch_stats"]
                if restored:
                    raise ValueError(
                        f"checkpoint {run_dir / which} carries a "
                        "non-empty batch_stats payload that does not "
                        "match this model's batch_stats tree — "
                        "refusing to serve with init running stats")
                stats = {}  # pre-BN checkpoint with an empty payload
        return cls(model, params, args, hetero, contact_maps,
                   batch_stats=stats, batch_size=batch_size)

    def _protein(self, seq: str) -> Optional[GraphArrays]:
        if seq in self._pro_cache:
            return self._pro_cache[seq]
        cm = self.contact_maps.get(seq)
        if cm is None:
            return None
        from .chem.proteins import protein_to_arrays
        nodes, snd, rcv, attr = protein_to_arrays(seq, cm)
        g = GraphArrays(nodes=nodes, edges=attr, senders=snd,
                        receivers=rcv, y=np.zeros(1, np.float32),
                        smi=seq)
        self._pro_cache[seq] = g
        return g

    def predict_pairs(self, pairs: Sequence[tuple]) -> np.ndarray:
        """pairs: (smiles, smiles) for DDI or (smiles, sequence) for
        DTI.  Returns [N, out] logits; unresolvable inputs yield NaN."""
        from .data.batching import PairGraphLoader
        samples: List[Optional[tuple]] = []
        for a, b in pairs:
            try:
                x, snd, rcv, e = featurize_smiles(a)
                g1 = GraphArrays(nodes=x, edges=e, senders=snd,
                                 receivers=rcv,
                                 y=np.zeros(1, np.float32), smi=a)
            except ValueError:
                samples.append(None)
                continue
            if self.hetero:
                g2 = self._protein(b)
            else:
                try:
                    x2, s2, r2, e2 = featurize_smiles(b)
                    g2 = GraphArrays(nodes=x2, edges=e2, senders=s2,
                                     receivers=r2,
                                     y=np.zeros(1, np.float32), smi=b)
                except ValueError:
                    g2 = None
            samples.append((g1, g2) if g2 is not None else None)
        valid = [s for s in samples if s is not None]
        out_dim = int(self.args.get("out_dim", 1))
        if valid:
            outs = []
            loader = PairGraphLoader(valid, self.batch_size, 1,
                                     budget1=self._budget1,
                                     budget2=self._budget2)
            self._budget1, self._budget2 = loader.budget1, loader.budget2
            for b1, b2 in loader:
                out = np.asarray(self._forward(self.params, b1, b2))
                outs.append(out[np.asarray(b1.graph_mask)])
            preds = np.concatenate(outs, axis=0)
        else:
            preds = np.zeros((0, out_dim), np.float32)
        width = preds.shape[1] if preds.size else out_dim
        full = np.full((len(samples), width), np.nan, np.float32)
        vi = 0
        for i, s in enumerate(samples):
            if s is not None:
                full[i] = preds[vi]
                vi += 1
        return full

    def predict_scores(self, pairs: Sequence[tuple]) -> np.ndarray:
        """Interaction probability per pair (sigmoid for the 1-logit
        DDI head, softmax P(class 1) for the 2-logit DTI head)."""
        out = self.predict_pairs(pairs)
        if self.task == "pair_binary_bce":
            return 1.0 / (1.0 + np.exp(-out[:, 0]))
        if self.task in ("pair_binary", "pair_screening"):
            ex = np.exp(out - np.nanmax(out, axis=-1, keepdims=True))
            return (ex / ex.sum(-1, keepdims=True))[:, 1]
        return out[:, 0]
