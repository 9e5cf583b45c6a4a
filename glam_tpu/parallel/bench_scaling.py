"""Scaling-efficiency benchmark harness: edges/s at 1 -> N devices.

BASELINE.md target: >=80% edges/s scaling efficiency from 1 chip to N.
On a multi-chip host/slice this measures the real ICI path; on the
single-chip dev box it runs over the virtual CPU mesh (correctness of
the harness, not absolute numbers).

Usage:
    python -m glam_tpu.parallel.bench_scaling [--devices 1 2 4 8]
prints one JSON line per device count plus a scaling-efficiency summary.
"""
from __future__ import annotations

import argparse
import json
import time
from typing import List

import numpy as np


def _build(model_cfg, n_graphs: int):
    import jax
    from ..chem.featurize import smiles_to_arrays
    from ..data.batching import GraphLoader
    from ..data.graph import GraphArrays

    smis = ["CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
            "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
            "Clc1cc2c(Oc3ccccc3C3CN(CC32)C)cc1"]
    rng = np.random.RandomState(0)
    graphs = []
    for i in range(n_graphs):
        x, s, r, e = smiles_to_arrays(smis[i % len(smis)])
        graphs.append(GraphArrays(
            nodes=x, edges=e, senders=s, receivers=r,
            y=np.asarray([rng.randn()], np.float32), smi=""))
    return graphs


def measure(n_devices: int, graphs_per_device: int = 512,
            n_iter: int = 30) -> dict:
    import jax
    import jax.numpy as jnp
    from ..nn.model import Architecture, ModelConfig
    from ..train.losses import get_loss
    from ..train.optim import make_optimizer
    from ..train.trainer import TrainState, make_loss_fn
    from .data_parallel import (make_dp_train_step, make_mesh,
                                stack_batches)
    from ..data.batching import GraphLoader

    devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        raise RuntimeError(f"need {n_devices} devices")
    mesh = make_mesh(devices, ("data",))
    graphs = _build(None, graphs_per_device * n_devices)
    loader = GraphLoader(graphs, graphs_per_device, 1)
    per_dev = list(loader)[:n_devices]
    stacked = stack_batches(per_dev)
    cfg = ModelConfig(mol_block="_TripletMessage",
                      mol_readout="GlobalPool5", hid_dim_alpha=4,
                      e_dim=1024, message_steps=3, max_nodes=40,
                      graph_do="_None()", flat_do="_None()",
                      end_do="_None()", pre_act="CELU", graph_act="CELU",
                      flat_act="CELU")
    model = Architecture(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, per_dev[0], True)
    tx = make_optimizer("Adam", 1e-3)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))
    loss_fn = make_loss_fn("regression", "mse", 1)
    step = make_dp_train_step(model, loss_fn, mesh)
    rng = jax.random.PRNGKey(2)
    state, loss = step(state, stacked, rng)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, loss = step(state, stacked, rng)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    edges = sum(int(np.asarray(b.edge_mask).sum()) for b in per_dev)
    return {"devices": n_devices,
            "edges_per_sec": edges * n_iter / dt,
            "step_ms": dt / n_iter * 1e3}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--graphs_per_device", type=int, default=512)
    args = p.parse_args(argv)
    import jax
    avail = len(jax.devices())
    counts: List[int] = args.devices or [d for d in (1, 2, 4, 8)
                                         if d <= avail]
    results = []
    for d in counts:
        r = measure(d, args.graphs_per_device)
        results.append(r)
        print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                          for k, v in r.items()}))
    if len(results) > 1:
        base = results[0]["edges_per_sec"] / results[0]["devices"]
        eff = (results[-1]["edges_per_sec"]
               / results[-1]["devices"]) / base
        print(json.dumps({"metric": "scaling_efficiency",
                          "value": round(eff, 4),
                          "from_devices": results[0]["devices"],
                          "to_devices": results[-1]["devices"]}))
    return results


if __name__ == "__main__":
    main()
