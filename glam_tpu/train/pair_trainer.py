"""Pair-task trainers (DDI / DTI / screening).

Parity with the reference pair trainers:
  pair_binary_bce   DDI TrainerMolBinaryClassificationNANBCE
                    (src_2gi_ddi/trainer.py:146-191): sigmoid + BCE on a
                    single pair logit
  pair_multiclass   DDI TrainerMolMultiClassificationNANBCE (:194-239):
                    CE over C classes + log-softmax scores
  pair_regression   DTI TrainerRegression
                    (src_2gi_dti_scr/trainer.py:162-207)
  pair_binary       DTI TrainerBinaryClassification (:210-259): 2-logit
                    softmax, returns labels/pred_labels/scores
  pair_screening    DTI TrainerScreening (:262-267): class-weighted CE +
                    screening metrics (BEDROC/EF)

Shares the Trainer skeleton (epoch loop, early stop, scheduler, ckpt,
parseable final line); only the loaders, jitted steps and metric heads
differ.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..data.batching import PairGraphLoader
from ..nn.model import PairArchitecture, model_config_from_args
from .losses import bce_logits, cross_entropy, get_loss
from .metrics import (binary_metrics, multi_class_metrics,
                      regression_metrics, screening_metrics)
from .trainer import Trainer


def make_pair_loss_fn(task: str, loss_name: str, num_classes: int,
                      class_weights=None):
    if task == "pair_binary_bce":
        def loss_fn(out, y, gmask):
            return bce_logits(out[:, 0], y[:, 0],
                              weight=gmask.astype(out.dtype))
    elif task == "pair_multiclass":
        def loss_fn(out, y, gmask):
            return cross_entropy(out, y[:, 0],
                                 weight=gmask.astype(out.dtype))
    elif task == "pair_regression":
        criterion = get_loss(loss_name)

        def loss_fn(out, y, gmask):
            return criterion(out[:, 0], y[:, 0],
                             weight=gmask.astype(out.dtype))
    elif task in ("pair_binary", "pair_screening"):
        # honor the searched DTI losses (reference glam.py:87 samples
        # wce/focal, bindingdb tweak ce/focal; trainers resolve via
        # get_loss + dataset class weights for wce)
        name = (loss_name if loss_name in ("ce", "wce", "focal")
                else ("wce" if task == "pair_screening" else "ce"))
        cw = (jnp.asarray(class_weights, jnp.float32)
              if class_weights is not None and name == "wce" else None)
        if name == "focal":
            criterion = get_loss("focal")

            def loss_fn(out, y, gmask):
                return criterion(out, y[:, 0],
                                 weight=gmask.astype(out.dtype))
        else:
            def loss_fn(out, y, gmask):
                return cross_entropy(out, y[:, 0],
                                     weight=gmask.astype(out.dtype),
                                     class_weight=cw)
    else:
        raise ValueError(f"unknown pair task {task!r}")
    return loss_fn


class PairTrainer(Trainer):
    """Trainer over (GraphBatch, GraphBatch) pair streams."""

    def __init__(self, args: Dict, model, train_pairs, valid_pairs,
                 test_pairs=None, print_log: bool = True,
                 work_dir: Optional[str] = None, class_weights=None):
        self.class_weights = class_weights
        self._pair_data = (train_pairs, valid_pairs, test_pairs)
        super().__init__(args, model, train_pairs, valid_pairs, test_pairs,
                         print_log=print_log, work_dir=work_dir)

    # -- loader / loss wiring overrides --------------------------------
    def _make_loaders(self, train_graphs, valid_graphs, test_graphs):
        bs = int(self.args.get("batch_size", 32))
        seed = int(self.args.get("seed", 1234))
        nt = self.num_tasks
        # fused Pallas attention: mol towers only; the hetero protein
        # tower keeps the XLA path (giant contact-map graphs exceed the
        # kernel's node window)
        from .trainer import pallas_enabled
        pp = pallas_enabled(self.args)
        hetero = bool(getattr(self.model, "hetero", False))
        pp1 = pp and self.args.get("mol_block") == "_TripletMessage"
        pp2 = pp1 and not hetero
        nd = self.n_devices
        ebs = max((32 // nd) * nd, nd)
        kw = dict(pallas_pack1=pp1, pallas_pack2=pp2, n_devices=nd)
        self.train_loader = PairGraphLoader(train_graphs, bs, nt,
                                            shuffle=True, seed=seed, **kw)
        self.valid_loader = PairGraphLoader(valid_graphs, ebs, nt, **kw)
        self.test_loader = (PairGraphLoader(test_graphs, ebs, nt, **kw)
                            if test_graphs else None)

    def _make_loss(self):
        return make_pair_loss_fn(self.task, self.args.get("loss", "bcel"),
                                 int(self.args.get("num_classes", 1)),
                                 self.class_weights)

    def _make_weight(self):
        """DP shard weight; wce's denominator is the class-weight sum."""
        loss_name = self.args.get("loss", "bcel")
        name = (loss_name if loss_name in ("ce", "wce", "focal")
                else ("wce" if self.task == "pair_screening" else "ce"))
        if self.task in ("pair_binary", "pair_screening") \
                and name == "wce" and self.class_weights is not None:
            cw = jnp.asarray(self.class_weights, jnp.float32)

            def weight_fn(y, gmask):
                tgt = jnp.clip(y[:, 0].astype(jnp.int32), 0,
                               cw.shape[0] - 1)
                return jnp.sum(cw[tgt] * gmask.astype(jnp.float32))
            return weight_fn
        from .trainer import make_weight_fn
        return make_weight_fn(self.task)

    # jitted steps, train_iterations and _gather come from Trainer —
    # they are generic over the batch-parts tuple (Trainer._as_parts);
    # only the metric heads below differ.
    def valid_iterations(self, mode: str = "valid"):
        out, y, mean_loss = self._gather(
            "valid" if mode == "valid" else
            ("test" if self.test_loader else "valid"))
        if mode != "inference" and not np.isfinite(out).all():
            # diverged params (see Trainer.valid_iterations)
            return float("inf"), {"diverged": 1.0}
        yt = y[:, 0]
        if self.task == "pair_regression":
            pred = out[:, 0]
            if mode == "inference":
                return yt, pred
            return mean_loss, regression_metrics(yt, pred)
        if self.task == "pair_binary_bce":
            score = 1.0 / (1.0 + np.exp(-out[:, 0]))
            if mode == "inference":
                return score, yt
            return mean_loss, binary_metrics(yt, score)
        if self.task == "pair_multiclass":
            logits = out
            ex = np.exp(logits - logits.max(-1, keepdims=True))
            prob = ex / ex.sum(-1, keepdims=True)
            pred = logits.argmax(-1)
            if mode == "inference":
                return yt, pred, prob
            return mean_loss, multi_class_metrics(yt, prob, pred)
        # pair_binary / pair_screening: 2-logit softmax
        ex = np.exp(out - out.max(-1, keepdims=True))
        prob = ex / ex.sum(-1, keepdims=True)
        score = prob[:, 1]
        pred = out.argmax(-1)
        if mode == "inference":
            return yt, pred, score
        metric_fn = (screening_metrics if self.task == "pair_screening"
                     else binary_metrics)
        return mean_loss, metric_fn(yt, score, pred)


def make_ddi_trainer(args: Dict, dataset, work_dir=None,
                     model_overrides: Optional[Dict] = None) -> PairTrainer:
    args = dict(args)
    nc = getattr(dataset, "num_classes", 1)
    args["task"] = ("pair_multiclass" if nc > 2 else "pair_binary_bce")
    args["num_classes"] = nc
    args["num_tasks"] = 1
    args["out_dim"] = nc if nc > 2 else 1
    overrides = dict(model_overrides or {})
    overrides.setdefault("mol_in_dim", dataset.num_node_features)
    overrides.setdefault("mol_edge_in_dim", dataset.num_edge_features)
    overrides.setdefault("out_dim", args["out_dim"])
    _set_pair_max_nodes(overrides, dataset.train + dataset.val
                        + dataset.test)
    cfg = model_config_from_args(args, **overrides)
    import dataclasses
    args["model_cfg"] = dataclasses.asdict(cfg)  # self-describing ckpts
    model = PairArchitecture(cfg, hetero=False)
    return PairTrainer(args, model, dataset.train, dataset.val,
                       dataset.test, work_dir=work_dir)


def make_dti_trainer(args: Dict, dataset, task: str = "pair_binary",
                     work_dir=None,
                     model_overrides: Optional[Dict] = None) -> PairTrainer:
    args = dict(args)
    args["task"] = task
    args["num_tasks"] = 1
    args["out_dim"] = 1 if task == "pair_regression" else 2
    overrides = dict(model_overrides or {})
    overrides.setdefault("mol_in_dim", dataset.num_node_features)
    overrides.setdefault("mol_edge_in_dim", dataset.num_edge_features)
    overrides.setdefault("pro_in_dim", dataset.pro_num_node_features)
    overrides.setdefault("pro_edge_in_dim", dataset.pro_num_edge_features)
    overrides.setdefault("out_dim", args["out_dim"])
    _set_pair_max_nodes(overrides, dataset.train + dataset.val
                        + dataset.test, hetero=True)
    cfg = model_config_from_args(args, **overrides)
    import dataclasses
    args["model_cfg"] = dataclasses.asdict(cfg)  # self-describing ckpts
    model = PairArchitecture(cfg, hetero=True)
    weights = getattr(dataset, "class_weights", None)
    return PairTrainer(args, model, dataset.train, dataset.val,
                       dataset.test, work_dir=work_dir,
                       class_weights=weights)


def make_auto_trainer(args: Dict, dataset, kind: str, work_dir=None):
    """Route a trainer-kind string from ``auto_dataset`` to the right
    factory — the single dispatch point used by the run CLI and the
    ensemble rebuild, making all three task families reachable from one
    command surface (the reference ships three separate run.py trees)."""
    if kind == "pair_ddi":
        return make_ddi_trainer(args, dataset, work_dir=work_dir)
    if kind in ("pair_binary", "pair_screening", "pair_regression"):
        return make_dti_trainer(args, dataset, task=kind, work_dir=work_dir)
    from .trainer import make_trainer
    return make_trainer(args, dataset, kind, work_dir=work_dir)


def _set_pair_max_nodes(overrides: Dict, pairs, hetero: bool = False):
    m1 = max((p[0].nodes.shape[0] for p in pairs), default=1)
    m2 = max((p[1].nodes.shape[0] for p in pairs), default=1)
    overrides.setdefault("max_nodes", m1 if hetero else max(m1, m2))
    overrides.setdefault("pro_max_nodes" if hetero else "max_nodes",
                         m2 if hetero else max(m1, m2))
