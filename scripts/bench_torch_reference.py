"""Measured torch-CPU reference point for bench.py's vs_baseline.

Implements the flagship GLAM model (TripletMessage 3-head attention +
GRU + GlobalPool5 + MLP head, 3 weight-tied message steps — the
reference's default architecture, /root/reference/src_1gp/model.py:23-65)
in PURE torch with the same vectorization a PyG CPU run would get
(index_add_/scatter segment ops are the same OpenMP C++ kernels PyG's
CPU path uses), and times full train steps (forward+backward+Adam) on
the same 512-molecule batch bench.py uses.

This gives a MEASURED ratio for BENCH provenance, complementing the
documented 2.0e6 edges/s A100-PyG estimate (which cannot be measured
here: no GPU, no torch_geometric in this environment).

Usage: python scripts/bench_torch_reference.py [--bg 512] [--iters 10]
Prints one JSON line {"metric": "torch_cpu_train_step_edges_per_sec", ...}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import torch

from glam_tpu.chem.featurize import smiles_to_arrays

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "Clc1cc2c(Oc3ccccc3C3CN(CC32)C)cc1",
    "CCN(CC)CCNC(=O)c1ccc(cc1)N", "O=C(O)c1ccccc1Nc1cccc(c1)C(F)(F)F",
    "CC1=CC(=O)C=CC1=O", "c1ccc2c(c1)ccc1ccccc12",
]


def build_batch(bg):
    xs, es, snds, rcvs, gids = [], [], [], [], []
    n_off = 0
    for i in range(bg):
        x, s, r, e = smiles_to_arrays(SMILES[i % len(SMILES)])
        xs.append(x)
        es.append(e)
        snds.append(s + n_off)
        rcvs.append(r + n_off)
        gids.append(np.full(x.shape[0], i, np.int64))
        n_off += x.shape[0]
    return (torch.tensor(np.concatenate(xs)),
            torch.tensor(np.concatenate(es)),
            torch.tensor(np.concatenate(snds), dtype=torch.long),
            torch.tensor(np.concatenate(rcvs), dtype=torch.long),
            torch.tensor(np.concatenate(gids)), bg)


def segment_softmax(logits, seg, n_seg):
    # PyG torch_geometric.utils.softmax semantics (scatter-max shift)
    m = torch.full((n_seg, logits.shape[1]), -1e30)
    m = m.index_reduce(0, seg, logits, "amax", include_self=True)
    ex = torch.exp(logits - m[seg])
    den = torch.zeros_like(m).index_add_(0, seg, ex)
    return ex / (den[seg] + 1e-16)


class Flagship(torch.nn.Module):
    """TripletMessage(H=3) + GRU + GlobalPool5 + head, hid=60, e_dim=1024."""

    def __init__(self, fin=15, fe=4, hid=60, heads=3, e_dim=1024,
                 steps=3):
        super().__init__()
        self.hid, self.heads, self.steps = hid, heads, steps
        H, C = heads, hid
        self.lin0 = torch.nn.Linear(fin, hid)
        self.wn = torch.nn.Parameter(torch.randn(C, H * C) * 0.05)
        self.we = torch.nn.Parameter(torch.randn(fe, H * C) * 0.05)
        self.watt = torch.nn.Parameter(torch.randn(H, 3 * C) * 0.05)
        self.wscale = torch.nn.Parameter(torch.randn(H * C, C) * 0.05)
        self.bias = torch.nn.Parameter(torch.zeros(C))
        self.gru = torch.nn.GRUCell(hid, hid)
        self.flat = torch.nn.Linear(5 * hid, e_dim)
        self.out = torch.nn.Linear(e_dim, 1)

    def conv(self, x, e, snd, rcv):
        H, C = self.heads, self.hid
        N = x.shape[0]
        xp = (x @ self.wn).view(N, H, C)
        ep = (e @ self.we).view(-1, H, C)
        w_i, w_e, w_j = (self.watt[:, :C], self.watt[:, C:2 * C],
                         self.watt[:, 2 * C:])
        a_i = torch.einsum("nhc,hc->nh", xp, w_i)
        a_j = torch.einsum("nhc,hc->nh", xp, w_j)
        a_e = torch.einsum("ehc,hc->eh", ep, w_e)
        logits = torch.nn.functional.leaky_relu(
            a_i[rcv] + a_e + a_j[snd], 0.2)
        alpha = segment_softmax(logits, rcv, N)
        msg = (alpha.unsqueeze(-1) * ep * xp[snd]).view(-1, H * C)
        aggr = torch.zeros(N, H * C).index_add_(0, rcv, msg)
        return aggr @ self.wscale + self.bias

    def forward(self, x, e, snd, rcv, gid, G):
        x = torch.celu(self.lin0(x))
        h = None
        for _ in range(self.steps):
            m = torch.celu(self.conv(x, e, snd, rcv))
            h = self.gru(m, h if h is not None else torch.zeros_like(m))
            x = h
        # GlobalPool5: [mean, add, sort_pool(k=3)] per graph
        C = self.hid
        add = torch.zeros(G, C).index_add_(0, gid, x)
        cnt = torch.zeros(G).index_add_(0, gid, torch.ones(len(gid)))
        mean = add / cnt.clamp(min=1).unsqueeze(-1)
        # per-graph top-3 by last channel (PyG global_sort_pool k=3)
        key = x[:, -1]
        order = torch.argsort(gid * 1e6 + (-key))  # graph-major desc key
        xs, gs = x[order], gid[order]
        first = torch.zeros(G, dtype=torch.long)
        first.index_reduce_(0, gs, torch.arange(len(gs)), "amin",
                            include_self=False)
        top = torch.zeros(G, 3, C)
        for k in range(3):
            idx = (first + k).clamp(max=len(gs) - 1)
            valid = (gs[idx] == torch.arange(G))
            top[:, k] = xs[idx] * valid.unsqueeze(-1)
        pooled = torch.cat([mean, add, top.reshape(G, 3 * C)], -1)
        return self.out(torch.celu(self.flat(pooled)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bg", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)
    torch.manual_seed(0)
    x, e, snd, rcv, gid, G = build_batch(args.bg)
    y = torch.randn(G, 1)
    model = Flagship()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(
            model(x, e, snd, rcv, gid, G), y)
        loss.backward()
        opt.step()
        return loss

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    edges = int(snd.shape[0])
    eps = edges * args.iters / dt
    print(json.dumps({
        "metric": "torch_cpu_train_step_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "threads": torch.get_num_threads(),
        "batch_graphs": args.bg, "edges_per_batch": edges,
    }))
    return eps


if __name__ == "__main__":
    main()
