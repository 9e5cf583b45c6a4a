"""Trained-accuracy parity: the flagship model trained end-to-end in
glam_tpu (JAX) vs the independent pure-torch twin, same everything.

Protocol (VERDICT r2 item 1): for each seed, initialize the glam model,
TRANSPLANT the identical initial parameters into the torch twin, then
train both with the same data stream (same GraphLoader shuffle order),
the same loss, and the same Adam(lr) for the same number of epochs;
compare final test metrics.  The reference's real corpora (ESOL /
Tox21 / BindingDB) are unavailable here (zero egress), so the bundled
demo (binary, bcel) and physprop_perturb (LogP regression, mse) stand
in — both are real chemistry with non-trivial targets.

Usage:
  python scripts/train_torch_twin.py --dataset demo \
      --dataset_root datasets/demo --epochs 10 --seeds 1,12,123
  python scripts/train_torch_twin.py --dataset physprop_perturb \
      --dataset_root datasets/physprop --epochs 10 --seeds 1,12,123

Prints one JSON line per seed and a final summary line; record the
summary in STATUS.md.
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

import jax.numpy as jnp
import numpy as np
import torch

from glam_tpu.data.batching import GraphLoader
from glam_tpu.nn.model import Architecture, ModelConfig
from glam_tpu.train.metrics import binary_metrics, regression_metrics
from glam_tpu.train.optim import make_optimizer
from glam_tpu.train.trainer import TrainState, make_loss_fn
from torch_twin import TorchFlagship, load_glam_params, to_torch, torch_loss


def build_dataset(name, root):
    if name == "physprop_perturb":
        from glam_tpu.data.perturb import PerturbationDataset
        ds = PerturbationDataset(root)
        return ds, "regression", "mse"
    from glam_tpu.data.datasets import MolDataset
    ds = MolDataset(root, dataset=name)
    return ds, "binary_nan_bce", "bcel"


def eval_metrics(task, y, scores, mask):
    y, scores, mask = (np.concatenate(a) for a in (y, scores, mask))
    if task == "regression":
        return regression_metrics(y[mask, 0], scores[mask, 0])
    valid = mask[:, None] & (y >= 0)
    return binary_metrics(y[valid], scores[valid])


def run_glam(cfg, task, loss_name, ds, seed, epochs, bs, lr):
    model = Architecture(cfg)
    loader = GraphLoader(ds.train, bs, ds.num_tasks, shuffle=True,
                         seed=seed)
    batch0 = next(iter(GraphLoader(ds.train[:bs], bs, ds.num_tasks)))
    variables = model.init(jax.random.PRNGKey(seed), batch0, True)
    init_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_optimizer("Adam", lr), batch_stats={})
    loss_fn = make_loss_fn(task, loss_name, ds.num_tasks)

    @jax.jit
    def step(state, b, rng):
        def compute(p):
            out = model.apply({"params": p}, b, False,
                              rngs={"dropout": rng})
            return loss_fn(out, b.y, b.graph_mask)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads=grads), loss

    key = jax.random.PRNGKey(seed + 1)
    loader.set_epoch(0)
    for ep in range(epochs):
        for b in loader:
            key, sub = jax.random.split(key)
            state, _ = step(state, b, sub)

    @jax.jit
    def infer(params, b):
        out = model.apply({"params": params}, b, True)
        return out

    ys, scores, masks = [], [], []
    for b in GraphLoader(ds.test, bs, ds.num_tasks):
        out = np.asarray(infer(state.params, b))
        if task != "regression":
            out = 1.0 / (1.0 + np.exp(-out))
        ys.append(np.asarray(b.y))
        scores.append(out)
        masks.append(np.asarray(b.graph_mask))
    return eval_metrics(task, ys, scores, masks), init_params


def run_torch(cfg, task, loss_name, ds, seed, epochs, bs, lr,
              init_params):
    twin = TorchFlagship(hid=cfg.hid_dim, e_dim=cfg.e_dim,
                         steps=cfg.message_steps, out_dim=cfg.out_dim,
                         max_nodes=cfg.max_nodes)
    load_glam_params(twin, init_params)
    opt = torch.optim.Adam(twin.parameters(), lr=lr)
    loader = GraphLoader(ds.train, bs, ds.num_tasks, shuffle=True,
                         seed=seed)  # identical shuffle stream
    loader.set_epoch(0)
    twin.train()
    for ep in range(epochs):
        for b in loader:
            tb = to_torch(b)
            opt.zero_grad()
            torch_loss(task, twin(tb), tb.y, tb.graph_mask).backward()
            opt.step()
    twin.eval()
    ys, scores, masks = [], [], []
    with torch.no_grad():
        for b in GraphLoader(ds.test, bs, ds.num_tasks):
            tb = to_torch(b)
            out = twin(tb).numpy()
            if task != "regression":
                out = 1.0 / (1.0 + np.exp(-out))
            ys.append(np.asarray(b.y))
            scores.append(out)
            masks.append(np.asarray(b.graph_mask))
    return eval_metrics(task, ys, scores, masks)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="demo")
    ap.add_argument("--dataset_root", default="datasets/demo")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seeds", default="1,12,123")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--e_dim", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args(argv)
    ds, task, loss_name = build_dataset(args.dataset, args.dataset_root)
    max_nodes = max(g.nodes.shape[0] for g in ds.graphs) + 1
    cfg = ModelConfig(mol_block="_TripletMessage",
                      mol_readout="GlobalPool5", hid_dim_alpha=4,
                      e_dim=args.e_dim, message_steps=3,
                      out_dim=ds.num_tasks, max_nodes=max_nodes,
                      graph_do="_None()", end_do="_None()",
                      pre_act="CELU", graph_act="CELU", flat_act="CELU")
    key_metric = "rmse" if task == "regression" else "auc"
    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        t0 = time.time()
        mj, init_params = run_glam(cfg, task, loss_name, ds, seed,
                                   args.epochs, args.batch_size, args.lr)
        t1 = time.time()
        mt = run_torch(cfg, task, loss_name, ds, seed, args.epochs,
                       args.batch_size, args.lr, init_params)
        t2 = time.time()
        row = {"seed": seed, "glam": mj[key_metric],
               "torch": mt[key_metric],
               "glam_s": round(t1 - t0, 1), "torch_s": round(t2 - t1, 1)}
        rows.append(row)
        print(json.dumps({"dataset": args.dataset, "metric": key_metric,
                          **row, "glam_all": mj, "torch_all": mt},
                         default=float))
    gj = np.array([r["glam"] for r in rows])
    gt = np.array([r["torch"] for r in rows])
    print(json.dumps({
        "summary": f"{args.dataset} {key_metric} over "
                   f"{len(rows)} seeds x {args.epochs} epochs",
        "glam_mean": round(float(gj.mean()), 4),
        "glam_std": round(float(gj.std()), 4),
        "torch_mean": round(float(gt.mean()), 4),
        "torch_std": round(float(gt.std()), 4),
        "delta": round(float(gj.mean() - gt.mean()), 4)}))


if __name__ == "__main__":
    main()
