"""Trained-accuracy parity for the PAIR (DTI) family: the hetero pair
model trained end-to-end in glam_tpu (JAX) vs the independent pure-torch
pair twin, same everything.

Protocol (mirrors scripts/train_torch_twin.py): for each seed,
initialize the glam PairArchitecture(hetero=True), TRANSPLANT the
identical initial parameters into the torch twin, then train both with
the same PairGraphLoader shuffle stream, the same 1-logit BCE loss, and
the same Adam(lr) for the same number of epochs; compare final test
AUC.  Real BindingDB/DrugBank are unavailable (zero egress), so the
bundled corpora stand in: datasets/dti_demo (bindingdb_c format,
cross-tower XNOR label) for --task dti (hetero towers), and
datasets/ddi_demo (drugbank_caster format) for --task ddi (two
mol towers, separate weights).

Usage:
  python scripts/train_torch_pair_twin.py --task dti --epochs 20
  python scripts/train_torch_pair_twin.py --task ddi --epochs 10
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")  # self-contained, chip-free

import numpy as np
import torch

from glam_tpu.data.batching import PairGraphLoader
from glam_tpu.data.pair_datasets import BindingDBDataset
from glam_tpu.nn.model import ModelConfig, PairArchitecture
from glam_tpu.train.metrics import binary_metrics
from glam_tpu.train.optim import make_optimizer
from glam_tpu.train.trainer import TrainState, make_loss_fn
from torch_pair_twin import (TorchPairTwin, load_glam_pair_params,
                             to_torch)
from torch_twin import torch_loss


def _auc(ys, scores, masks):
    y, s, m = (np.concatenate(a) for a in (ys, scores, masks))
    valid = m[:, None] & (y >= 0)
    return binary_metrics(y[valid], s[valid])["auc"]


def run_glam(cfg, ds, seed, epochs, bs, lr, hetero=True):
    model = PairArchitecture(cfg, hetero=hetero)
    loader = PairGraphLoader(ds.train, bs, 1, shuffle=True, seed=seed)
    b1, b2 = next(iter(PairGraphLoader(ds.train[:bs], bs, 1)))
    variables = model.init(jax.random.PRNGKey(seed), b1, b2, True)
    init_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_optimizer("Adam", lr),
                              batch_stats={})
    loss_fn = make_loss_fn("binary_nan_bce", "bcel", 1)

    @jax.jit
    def step(state, b1, b2):
        def compute(p):
            out = model.apply({"params": p}, b1, b2, True)
            return loss_fn(out, b1.y, b1.graph_mask)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads=grads), loss

    loader.set_epoch(0)
    for ep in range(epochs):
        for b1, b2 in loader:
            state, _ = step(state, b1, b2)

    @jax.jit
    def infer(params, b1, b2):
        return model.apply({"params": params}, b1, b2, True)

    ys, scores, masks = [], [], []
    for b1, b2 in PairGraphLoader(ds.test, bs, 1):
        out = np.asarray(infer(state.params, b1, b2))
        ys.append(np.asarray(b1.y))
        scores.append(1.0 / (1.0 + np.exp(-out)))
        masks.append(np.asarray(b1.graph_mask))
    return _auc(ys, scores, masks), init_params


def run_torch(cfg, ds, seed, epochs, bs, lr, init_params, hetero=True):
    twin = TorchPairTwin(hid=cfg.hid_dim, e_dim=cfg.e_dim,
                         steps=cfg.message_steps, out_dim=cfg.out_dim,
                         max_nodes=cfg.max_nodes,
                         pro_max_nodes=cfg.pro_max_nodes,
                         hetero=hetero)
    load_glam_pair_params(twin, init_params)
    opt = torch.optim.Adam(twin.parameters(), lr=lr)
    loader = PairGraphLoader(ds.train, bs, 1, shuffle=True, seed=seed)
    loader.set_epoch(0)
    twin.train()
    for ep in range(epochs):
        for b1, b2 in loader:
            tb1, tb2 = to_torch(b1), to_torch(b2)
            opt.zero_grad()
            torch_loss("binary_nan_bce", twin(tb1, tb2), tb1.y,
                       tb1.graph_mask).backward()
            opt.step()
    twin.eval()
    ys, scores, masks = [], [], []
    with torch.no_grad():
        for b1, b2 in PairGraphLoader(ds.test, bs, 1):
            tb1, tb2 = to_torch(b1), to_torch(b2)
            out = twin(tb1, tb2).numpy()
            ys.append(np.asarray(b1.y))
            scores.append(1.0 / (1.0 + np.exp(-out)))
            masks.append(np.asarray(b1.graph_mask))
    return _auc(ys, scores, masks)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="dti", choices=["dti", "ddi"])
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--seeds", default="1,12,123")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--e_dim", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args(argv)
    hetero = args.task == "dti"
    if hetero:
        ds = BindingDBDataset(args.dataset_root or "datasets/dti_demo")
    else:
        from glam_tpu.data.pair_datasets import DDIDataset
        ds = DDIDataset(args.dataset_root or "datasets/ddi_demo")
    max_m = max(g.nodes.shape[0] for g, _ in ds.train + ds.test) + 1
    max_p = (max(p.nodes.shape[0] for _, p in ds.train + ds.test) + 1
             if hetero else max_m)
    cfg = ModelConfig(mol_block="_TripletMessage",
                      mol_readout="GlobalPool5",
                      pro_block="_GCNConv", pro_readout="GlobalLAPool",
                      hid_dim_alpha=4, e_dim=args.e_dim, message_steps=2,
                      out_dim=1, max_nodes=max_m, pro_max_nodes=max_p,
                      pre_norm="_None", graph_norm="_None",
                      flat_norm="_None", end_norm="_None",
                      pre_do="_None()", graph_do="_None()",
                      flat_do="_None()", end_do="_None()",
                      pre_act="CELU", graph_act="CELU", flat_act="CELU",
                      end_act="CELU", graph_res=True)
    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        t0 = time.time()
        aj, init_params = run_glam(cfg, ds, seed, args.epochs,
                                   args.batch_size, args.lr, hetero)
        t1 = time.time()
        at = run_torch(cfg, ds, seed, args.epochs, args.batch_size,
                       args.lr, init_params, hetero)
        t2 = time.time()
        row = {"seed": seed, "glam_auc": round(float(aj), 4),
               "torch_auc": round(float(at), 4),
               "glam_s": round(t1 - t0, 1), "torch_s": round(t2 - t1, 1)}
        rows.append(row)
        print(json.dumps(row))
    gj = np.array([r["glam_auc"] for r in rows])
    gt = np.array([r["torch_auc"] for r in rows])
    print(json.dumps({
        "summary": f"{args.task}_demo pair AUC over {len(rows)} seeds x "
                   f"{args.epochs} epochs",
        "glam_mean": round(float(gj.mean()), 4),
        "glam_std": round(float(gj.std()), 4),
        "torch_mean": round(float(gt.mean()), 4),
        "torch_std": round(float(gt.std()), 4),
        "delta": round(float(gj.mean() - gt.mean()), 4)}))


if __name__ == "__main__":
    main()
