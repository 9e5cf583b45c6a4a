"""Trainable pure-torch twin of the hetero-pair (DTI) PairArchitecture.

Extends the flagship twin (scripts/torch_twin.py) to the pair families:
the reference's DTI model is torch+PyG (/root/reference/src_2gi_dti_scr/
model.py:22-56, layer.py dot_and_global_pool2); real BindingDB corpora
are unavailable here (zero egress), so trained/gradient parity for the
pair path is demonstrated against THIS independent implementation:

  * molecule tower: TripletMessage(H=3) + GRU + GlobalPool5 (reusing the
    single-graph twin's conv/pool, torch.nn.GRUCell / torch.topk),
  * protein tower: PyG-semantics GCNConv (self-loops, symmetric
    normalization) + GlobalAttention (LAPool) readout — GRU disabled for
    GCN exactly like MessageBlock (reference layer.py:248),
  * per-message-step cross-graph fusion ``dot_and_global_pool2``
    ([max, mean] of the all-pairs node dot-product matrix, the
    reference's per-batch Python loop done batched),
  * head: lin_out0 (CELU) -> lin_out1, input [out1 | out2 | 2*steps
    fusion stats] (reference src_2gi_dti_scr/model.py:46-56).

hetero=False gives the DDI homo-pair twin instead: both towers are
mol-configured TripletMessage towers with separate weights (reference
src_2gi_ddi/model.py:22-37).

Consumes the exact padded GraphBatch pairs the JAX model sees and can
be initialized from a PairArchitecture param tree for
activation/gradient parity (tests/test_torch_pair_twin.py).
"""
from __future__ import annotations

import numpy as np
import torch

from torch_twin import TorchFlagship, _celu, to_torch  # noqa: F401


class TorchPairTwin(torch.nn.Module):
    """PairArchitecture twin for the parity configs.

    hetero=True (DTI): mol_block=_TripletMessage/GlobalPool5 tower 1,
    pro_block=_GCNConv/GlobalLAPool tower 2 (GRU disabled for GCN).
    hetero=False (DDI): BOTH towers are mol-configured TripletMessage/
    GlobalPool5 with SEPARATE weights (reference
    src_2gi_ddi/model.py:22-37).  CELU everywhere, no norms/dropout."""

    def __init__(self, fin_m: int = 15, fe_m: int = 4, fin_p: int = 49,
                 fe_p: int = 8, hid: int = 60, heads: int = 3,
                 e_dim: int = 64, steps: int = 2, out_dim: int = 1,
                 max_nodes: int = 32, pro_max_nodes: int = 256,
                 hetero: bool = True):
        super().__init__()
        self.hid, self.steps, self.hetero = hid, steps, hetero
        self.pro_max_nodes = pro_max_nodes if hetero else max_nodes
        # molecule tower: the single-graph twin with flat_out = hid
        # (pair towers emit hid-dim vectors, nn/model.py PairArchitecture)
        self.mol = TorchFlagship(fin=fin_m, fe=fe_m, hid=hid, heads=heads,
                                 e_dim=hid, steps=steps, out_dim=1,
                                 max_nodes=max_nodes)
        if hetero:
            # protein tower: lin0 -> steps x (GCN -> residual -> celu)
            # -> LAPool -> flat
            self.lin0_p = torch.nn.Linear(fin_p, hid)
            self.gcn_w = torch.nn.Parameter(torch.empty(hid, hid))
            self.gcn_b = torch.nn.Parameter(torch.zeros(hid))
            torch.nn.init.xavier_uniform_(self.gcn_w)
            self.gate_nn = torch.nn.Linear(hid, 1)
            self.att_nn = torch.nn.Linear(hid, 2 * hid)
            self.flat_p = torch.nn.Linear(2 * hid, hid)
        else:
            # DDI: second molecule tower, separate weights
            self.mol2 = TorchFlagship(fin=fin_m, fe=fe_m, hid=hid,
                                      heads=heads, e_dim=hid,
                                      steps=steps, out_dim=1,
                                      max_nodes=max_nodes)
        # head
        self.lin_out0 = torch.nn.Linear(2 * hid + 2 * steps, e_dim)
        self.lin_out1 = torch.nn.Linear(e_dim, out_dim)

    # -- PyG GCNConv: self-loops + symmetric normalization ------------
    def gcn(self, x, snd, rcv):
        N = x.shape[0]
        xp = x @ self.gcn_w
        ones = torch.ones(snd.shape[0], dtype=x.dtype)
        deg = torch.zeros(N, dtype=x.dtype).index_add(0, rcv, ones) + 1.0
        dinv = deg.clamp(min=1e-12).rsqrt()
        norm = dinv[snd] * dinv[rcv]
        out = torch.zeros(N, self.hid, dtype=x.dtype).index_add(
            0, rcv, norm.unsqueeze(-1) * xp[snd])
        out = out + (dinv * dinv).unsqueeze(-1) * xp   # self-loop term
        return out + self.gcn_b

    # -- PyG GlobalAttention (LAPool): softmax(gate) . nn(x) ----------
    def lapool(self, x, node_graph, n_graphs):
        gate = self.gate_nn(x)[:, 0]
        m = torch.full((n_graphs,), -torch.inf, dtype=x.dtype)
        m = m.index_reduce(0, node_graph, gate.detach(), "amax",
                           include_self=True)
        m = torch.where(torch.isfinite(m), m, torch.zeros_like(m))
        ex = torch.exp(gate - m[node_graph])
        den = torch.zeros(n_graphs, dtype=x.dtype).index_add(
            0, node_graph, ex)
        alpha = ex / (den[node_graph] + 1e-16)
        val = self.att_nn(x)
        return torch.zeros(n_graphs, val.shape[-1],
                           dtype=x.dtype).index_add(
            0, node_graph, alpha.unsqueeze(-1) * val)

    def mol_tower(self, b, tw=None):
        tw = tw if tw is not None else self.mol
        x = _celu(tw.lin0(b.nodes))
        h = x
        acts = []
        for _ in range(self.steps):
            m = _celu(tw.conv(x, b.edges, b.senders, b.receivers))
            h = tw.gru(m, h)
            x = _celu(h + x)
            acts.append(x)
        pooled = tw.pool5(x, b.node_graph, b.node_pos, b.n_node)
        return _celu(tw.flat(pooled)), acts

    def pro_tower(self, b, n_graphs):
        x = _celu(self.lin0_p(b.nodes))
        acts = []
        for _ in range(self.steps):
            # MessageBlock with GCN: no GRU (layer.py:248), residual, act
            x = _celu(self.gcn(x, b.senders, b.receivers) + x)
            acts.append(x)
        pooled = self.lapool(x, b.node_graph, n_graphs)
        return _celu(self.flat_p(pooled)), acts

    # -- dot_and_global_pool2: [max, mean] per pair (nn/fusion.py) ----
    def fusion2(self, xm, xp, bm, bp, n_graphs):
        Mm, Mp = self.mol.max_nodes, self.pro_max_nodes
        dm = self._dense(xm, bm, n_graphs, Mm)
        dp = self._dense(xp, bp, n_graphs, Mp)
        s = torch.einsum("gmc,gpc->gmp", dm, dp)
        mv = (torch.arange(Mm).unsqueeze(0)
              < bm.n_node.unsqueeze(1))                  # [G, Mm]
        pv = (torch.arange(Mp).unsqueeze(0)
              < bp.n_node.unsqueeze(1))
        valid = mv.unsqueeze(2) & pv.unsqueeze(1)
        flat = s.reshape(n_graphs, -1)
        vflat = valid.reshape(n_graphs, -1)
        cnt = vflat.sum(1).to(flat.dtype)
        neg = torch.where(vflat, flat,
                          torch.tensor(-torch.inf, dtype=flat.dtype))
        mx = neg.max(dim=1).values
        mean = torch.where(vflat, flat,
                           torch.zeros_like(flat)).sum(1) / cnt.clamp(
            min=1.0)
        empty = cnt < 0.5
        zero = torch.zeros_like(mx)
        return torch.stack([torch.where(empty, zero, mx),
                            torch.where(empty, zero, mean)], dim=-1)

    def _dense(self, x, b, G, M):
        ok = b.node_pos < M
        ng, np_, xr = b.node_graph[ok], b.node_pos[ok], x[ok]
        dense = torch.zeros(G, M, x.shape[-1], dtype=x.dtype)
        return dense.index_put((ng, np_), xr, accumulate=True)

    def forward(self, bm, bp, return_acts: bool = False):
        G = bm.n_node.shape[0]
        out1, xs1 = self.mol_tower(bm)
        if self.hetero:
            out2, xs2 = self.pro_tower(bp, G)
        else:
            out2, xs2 = self.mol_tower(bp, self.mol2)
        fus = [self.fusion2(x1, x2, bm, bp, G)
               for x1, x2 in zip(xs1, xs2)]
        feats = torch.cat([out1, out2] + fus, dim=-1)
        z = _celu(self.lin_out0(feats))
        out = self.lin_out1(z)
        return (out, xs1, xs2) if return_acts else out


def _load_mol_tower(tw: TorchFlagship, m1) -> None:
    """Transplant one TripletMessage tower subtree into a TorchFlagship."""
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)  # noqa
    tw.lin0.weight.copy_(t(m1["lin0"]["linear"]["kernel"]).T)
    tw.lin0.bias.copy_(t(m1["lin0"]["linear"]["bias"]))
    conv = m1["conv"]["TripletMessage_0"]
    tw.wn.copy_(t(conv["weight_node"]))
    tw.we.copy_(t(conv["weight_edge"]))
    tw.watt.copy_(t(conv["weight_triplet_att"]))
    tw.wscale.copy_(t(conv["weight_scale"]))
    tw.bias.copy_(t(conv["bias"]))
    gru = m1["conv"]["gru"]
    tw.gru.weight_ih.copy_(t(gru["w_ih"]).T)
    tw.gru.weight_hh.copy_(t(gru["w_hh"]).T)
    tw.gru.bias_ih.copy_(t(gru["b_ih"]))
    tw.gru.bias_hh.copy_(t(gru["b_hh"]))
    tw.flat.weight.copy_(t(m1["flat"]["linear"]["kernel"]).T)
    tw.flat.bias.copy_(t(m1["flat"]["linear"]["bias"]))


def load_glam_pair_params(twin: TorchPairTwin, params) -> None:
    """Transplant a PairArchitecture param tree (hetero or homo)."""
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)  # noqa
    with torch.no_grad():
        _load_mol_tower(twin.mol, params["mol1"])
        m2 = params["mol2"]
        if twin.hetero:
            twin.lin0_p.weight.copy_(t(m2["lin0"]["linear"]["kernel"]).T)
            twin.lin0_p.bias.copy_(t(m2["lin0"]["linear"]["bias"]))
            twin.gcn_w.copy_(t(m2["conv"]["GCNConv_0"]["weight"]))
            twin.gcn_b.copy_(t(m2["conv"]["GCNConv_0"]["bias"]))
            twin.gate_nn.weight.copy_(
                t(m2["readout"]["gate_nn"]["kernel"]).T)
            twin.gate_nn.bias.copy_(t(m2["readout"]["gate_nn"]["bias"]))
            twin.att_nn.weight.copy_(t(m2["readout"]["nn"]["kernel"]).T)
            twin.att_nn.bias.copy_(t(m2["readout"]["nn"]["bias"]))
            twin.flat_p.weight.copy_(t(m2["flat"]["linear"]["kernel"]).T)
            twin.flat_p.bias.copy_(t(m2["flat"]["linear"]["bias"]))
        else:
            _load_mol_tower(twin.mol2, m2)
        twin.lin_out0.weight.copy_(
            t(params["lin_out0"]["linear"]["kernel"]).T)
        twin.lin_out0.bias.copy_(t(params["lin_out0"]["linear"]["bias"]))
        twin.lin_out1.weight.copy_(
            t(params["lin_out1"]["linear"]["kernel"]).T)
        twin.lin_out1.bias.copy_(t(params["lin_out1"]["linear"]["bias"]))


def _mol_tower_grads(tw: TorchFlagship):
    g = lambda p: p.grad.detach().numpy()  # noqa: E731
    return {
        "lin0": {"linear": {"kernel": g(tw.lin0.weight).T,
                            "bias": g(tw.lin0.bias)}},
        "conv": {
            "TripletMessage_0": {
                "weight_node": g(tw.wn),
                "weight_edge": g(tw.we),
                "weight_triplet_att": g(tw.watt),
                "weight_scale": g(tw.wscale),
                "bias": g(tw.bias)},
            "gru": {"w_ih": g(tw.gru.weight_ih).T,
                    "w_hh": g(tw.gru.weight_hh).T,
                    "b_ih": g(tw.gru.bias_ih),
                    "b_hh": g(tw.gru.bias_hh)},
        },
        "flat": {"linear": {"kernel": g(tw.flat.weight).T,
                            "bias": g(tw.flat.bias)}},
    }


def torch_pair_grads_as_glam_tree(twin: TorchPairTwin):
    """The twin's .grad tensors arranged as a PairArchitecture tree."""
    g = lambda p: p.grad.detach().numpy()  # noqa: E731
    if twin.hetero:
        mol2 = {
            "lin0": {"linear": {"kernel": g(twin.lin0_p.weight).T,
                                "bias": g(twin.lin0_p.bias)}},
            "conv": {"GCNConv_0": {"weight": g(twin.gcn_w),
                                   "bias": g(twin.gcn_b)}},
            "readout": {
                "gate_nn": {"kernel": g(twin.gate_nn.weight).T,
                            "bias": g(twin.gate_nn.bias)},
                "nn": {"kernel": g(twin.att_nn.weight).T,
                       "bias": g(twin.att_nn.bias)}},
            "flat": {"linear": {"kernel": g(twin.flat_p.weight).T,
                                "bias": g(twin.flat_p.bias)}},
        }
    else:
        mol2 = _mol_tower_grads(twin.mol2)
    return {
        "mol1": _mol_tower_grads(twin.mol),
        "mol2": mol2,
        "lin_out0": {"linear": {"kernel": g(twin.lin_out0.weight).T,
                                "bias": g(twin.lin_out0.bias)}},
        "lin_out1": {"linear": {"kernel": g(twin.lin_out1.weight).T,
                                "bias": g(twin.lin_out1.bias)}},
    }
