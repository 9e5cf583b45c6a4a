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


def analytic(L: int = 900, C: int = 60, heads: int = 3, steps: int = 3,
             shard_counts=(2, 4, 8), band: int = 6,
             long_range_frac: float = 0.05,
             ici_link_bytes_per_sec: float = 4.5e10,
             flops_per_sec: float = 1.0e13, seed: int = 0,
             fusion_nm: int = 40) -> List[dict]:
    """Analytic per-step compute/communication model for the sharded
    giant-graph (protein) trainer — makes the BASELINE.md >=80% scaling
    target falsifiable before real multi-chip hardware exists.

    Builds an L-residue contact-map-like graph (backbone chain + banded
    contacts + ``long_range_frac`` random long-range contacts, the
    RaptorX regime of reference src_2gi_dti_scr/utils.py:283-293),
    partitions it with the production ``split_large_graph`` +
    ``build_halo_exchange`` planner, and computes per shard and per
    training step:

      * matmul FLOPs of the sharded TripletMessage tower (fwd+bwd ~ 3x
        fwd: one fwd pass + two matmul transposes per op);
      * bytes shipped over ICI by the v2 boundary-only halo exchange
        (two tables per message step: projected nodes [H*, heads, C]
        and attention scalars [H*, heads]; backward doubles it — the
        transpose of all_to_all is all_to_all);
      * predicted efficiency  t_comp / (t_comp + t_comm)  with NO
        compute/comm overlap (conservative) at v5e-class numbers
        (one 45 GB/s ICI link, ~10 TFLOP/s f32 — the rate
        scripts/profile_step_flops.py measured for the flagship step);
      * overlap-aware efficiency  t_comp / (t_comp + max(0, t_comm -
        t_overlap)): the per-step work whose dependencies do NOT
        involve the halo result — the edge projection (eh), the local
        attention terms a_i/a_e, and (pair path, ``fusion_nm`` > 0)
        the previous step's cross-graph fusion einsum, which
        run_tower defers until after the next exchange is issued
        (sharded_model.py) — can hide in the collective's flight time
        under XLA's latency-hiding scheduler with async collectives.
        The non-overlappable tail (logits -> softmax -> aggregate ->
        GRU, all downstream of the halo table) stays serial.
    """
    from .graph_partition import (build_halo_exchange,
                                  build_halo_exchange_ring,
                                  split_large_graph)

    rng = np.random.RandomState(seed)
    snd, rcv = [], []
    for i in range(L - 1):  # backbone i <-> i+1
        snd += [i, i + 1]
        rcv += [i + 1, i]
    for i in range(L):      # banded contacts
        for j in range(i + 2, min(L, i + band + 1)):
            snd += [i, j]
            rcv += [j, i]
    n_long = int(long_range_frac * L)
    for _ in range(n_long):  # long-range contacts (the halo makers)
        i, j = rng.randint(0, L, 2)
        if abs(i - j) > band:
            snd += [i, j]
            rcv += [j, i]
    snd = np.asarray(snd, np.int32)
    rcv = np.asarray(rcv, np.int32)
    E = len(snd)
    nodes = rng.randn(L, 49).astype(np.float32)
    edges = rng.randn(E, 8).astype(np.float32)
    out = []
    for D in shard_counts:
        nsh, esh, sg, rl, emask = split_large_graph(nodes, edges, snd,
                                                    rcv, D)
        n_local, e_local = nsh.shape[1], esh.shape[1]
        send_idx, send_mask, _, H = build_halo_exchange(sg, emask,
                                                        n_local)
        # --- FLOPs per shard per message step (matmul terms, fwd) ---
        HC = heads * C
        fwd = (n_local * C * HC * 2          # xp = x @ wn
               + e_local * 8 * HC * 2        # eh = e @ we
               + 2 * n_local * HC * 2        # a_i, a_j einsums
               + e_local * HC * 2            # a_e
               + e_local * heads * C * 3     # alpha * eh * xh gather-mult
               + n_local * HC * C * 2        # aggr @ wscale
               + n_local * C * 3 * C * 2 * 2   # GRU two matmuls
               + fusion_nm * n_local * C * 2)  # pair-path fusion einsum
        flops_step = 3 * fwd * steps         # fwd + bwd ~ 3x fwd
        # --- overlappable FLOPs: independent of the halo result ------
        # eh projection + a_i/a_e local attention terms overlap within
        # EVERY step; the deferred fusion einsum overlaps the NEXT
        # step's exchange, so only S-1 of S fusions can hide (the last
        # step has no subsequent collective).  xp itself FEEDS the
        # exchange, so it cannot hide behind it.
        ov_core = (e_local * 8 * HC * 2      # eh
                   + n_local * HC * 2        # a_i
                   + e_local * HC * 2)       # a_e
        ov_fusion = fusion_nm * n_local * C * 2
        ov_step = 3 * (ov_core * steps
                       + ov_fusion * max(steps - 1, 0))
        # --- ICI bytes per shard per message step (v2 halo, fwd) ---
        halo_rows = D * H                    # padded all_to_all buffer
        bytes_fwd = halo_rows * (heads * C + heads) * 4
        bytes_step = 2 * bytes_fwd * steps   # bwd transposes the a2a
        t_comp = flops_step / flops_per_sec
        t_comm = bytes_step / ici_link_bytes_per_sec
        t_ov = ov_step / flops_per_sec
        real_halo = int(send_mask.sum())
        # --- v3 ring plan: per-distance ppermute budgets ---
        _, budgets, _ = build_halo_exchange_ring(sg, emask, n_local)
        ring_rows = int(sum(budgets))
        ring_fwd = ring_rows * (heads * C + heads) * 4
        ring_step = 2 * ring_fwd * steps     # bwd inverts each permute
        t_ring = ring_step / ici_link_bytes_per_sec
        out.append({
            "shards": D, "L": L, "edges": E, "halo_budget_H": int(H),
            "real_halo_rows": real_halo,
            "flops_per_shard_step": int(flops_step),
            "ici_bytes_per_shard_step": int(bytes_step),
            "t_compute_us": round(t_comp * 1e6, 2),
            "t_comm_us": round(t_comm * 1e6, 2),
            "predicted_efficiency": round(
                t_comp / (t_comp + t_comm), 4),
            "t_overlap_us": round(t_ov * 1e6, 2),
            "overlap_predicted_efficiency": round(
                t_comp / (t_comp + max(0.0, t_comm - t_ov)), 4),
            "ring_halo_rows": ring_rows,
            "ring_ici_bytes_per_shard_step": int(ring_step),
            "ring_t_comm_us": round(t_ring * 1e6, 2),
            "ring_predicted_efficiency": round(
                t_comp / (t_comp + t_ring), 4),
            "ring_overlap_predicted_efficiency": round(
                t_comp / (t_comp + max(0.0, t_ring - t_ov)), 4),
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--graphs_per_device", type=int, default=512)
    p.add_argument("--analytic", action="store_true",
                   help="print the analytic ICI scaling model instead "
                        "of measuring")
    args = p.parse_args(argv)
    if args.analytic:
        for row in analytic():
            print(json.dumps(row))
        return None
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
