"""Trainable pure-torch twin of the flagship glam_tpu Architecture.

The reference implementation is torch+PyG (/root/reference/src_1gp/
model.py:23-65, layer.py:15-64); real ESOL/Tox21/BindingDB corpora are
unavailable in this environment (zero egress), so trained-accuracy
parity is demonstrated against THIS twin instead: an independent torch
implementation of the same flagship model (TripletMessage H=3 + GRU +
GlobalPool5 + MLP head, CELU activations) that

  * consumes the exact same padded GraphBatch arrays the JAX model sees
    (padded edges point at padding nodes; no masking in the hot ops),
  * can be initialized with a glam_tpu parameter tree
    (:func:`load_glam_params`) for per-layer activation / gradient
    parity checks (tests/test_torch_twin.py), and
  * trains end-to-end with the same data stream / loss / Adam protocol
    (scripts/train_torch_twin.py) for metric-level parity across seeds.

torch.nn.GRUCell / torch autograd / torch.topk are independent
implementations of the math the JAX side re-derives, so agreement here
is evidence of correctness, not self-confirmation.
"""
from __future__ import annotations

import types

import numpy as np
import torch


def _celu(x):
    return torch.celu(x)


class TorchFlagship(torch.nn.Module):
    """Flagship Architecture: lin0 -> steps x (TripletMessage -> celu ->
    GRU -> residual -> celu) -> GlobalPool5 -> flat -> out.

    Matches ModelConfig(mol_block='_TripletMessage',
    mol_readout='GlobalPool5', pre/graph/flat acts CELU, no norms, no
    dropout) — the bench.py / parity-test configuration.
    """

    def __init__(self, fin: int = 15, fe: int = 4, hid: int = 60,
                 heads: int = 3, e_dim: int = 1024, steps: int = 3,
                 out_dim: int = 1, residual: bool = True,
                 max_nodes: int = 132, sort_k: int = 3):
        super().__init__()
        self.hid, self.heads, self.steps = hid, heads, steps
        self.residual, self.max_nodes, self.sort_k = residual, max_nodes, sort_k
        H, C = heads, hid
        self.lin0 = torch.nn.Linear(fin, hid)
        self.wn = torch.nn.Parameter(torch.empty(C, H * C))
        self.we = torch.nn.Parameter(torch.empty(fe, H * C))
        self.watt = torch.nn.Parameter(torch.empty(H, 3 * C))
        self.wscale = torch.nn.Parameter(torch.empty(H * C, C))
        self.bias = torch.nn.Parameter(torch.zeros(C))
        self.gru = torch.nn.GRUCell(hid, hid)
        self.flat = torch.nn.Linear(5 * hid, e_dim)
        self.out = torch.nn.Linear(e_dim, out_dim)
        for w in (self.wn, self.we, self.watt, self.wscale):
            torch.nn.init.kaiming_uniform_(w, a=np.sqrt(5))

    # -- TripletMessage (decomposed attention, segment softmax 1e-16) --
    def conv(self, x, e, snd, rcv):
        H, C = self.heads, self.hid
        N = x.shape[0]
        xh = (x @ self.wn).view(N, H, C)
        eh = (e @ self.we).view(-1, H, C)
        w_i, w_e, w_j = (self.watt[:, :C], self.watt[:, C:2 * C],
                         self.watt[:, 2 * C:])
        a_i = torch.einsum("nhc,hc->nh", xh, w_i)
        a_j = torch.einsum("nhc,hc->nh", xh, w_j)
        a_e = torch.einsum("ehc,hc->eh", eh, w_e)
        logits = torch.nn.functional.leaky_relu(
            a_i[rcv] + a_e + a_j[snd], 0.2)
        # segment softmax, PyG semantics (max-shift, +1e-16 denominator;
        # empty segments get max 0) — ops/segment.py:segment_softmax
        m = torch.full((N, logits.shape[1]), -torch.inf,
                       dtype=logits.dtype)
        m = m.index_reduce(0, rcv, logits.detach(), "amax",
                           include_self=True)
        m = torch.where(torch.isfinite(m), m, torch.zeros_like(m))
        ex = torch.exp(logits - m[rcv])
        den = torch.zeros_like(m).index_add(0, rcv, ex)
        alpha = ex / (den[rcv] + 1e-16)
        msg = (alpha.unsqueeze(-1) * eh * xh[snd]).reshape(-1, H * C)
        aggr = torch.zeros(N, H * C, dtype=x.dtype).index_add(0, rcv, msg)
        return aggr @ self.wscale + self.bias

    # -- GlobalPool5: [mean, sum, sort_pool(k)] (readouts.py) ----------
    def pool5(self, x, node_graph, node_pos, n_node):
        G = n_node.shape[0]
        C = x.shape[-1]
        total = torch.zeros(G, C, dtype=x.dtype).index_add(0, node_graph, x)
        mean = total / n_node.clamp(min=1).unsqueeze(-1).to(x.dtype)
        # dense [G, M, C] scatter-add view (scatter_nodes_to_dense).
        # Padding nodes may carry node_pos >= max_nodes; the JAX scatter
        # silently DROPS out-of-bounds indices (the padding convention),
        # so mirror that by filtering before index_put
        ok = node_pos < self.max_nodes
        ng, np_, xr = node_graph[ok], node_pos[ok], x[ok]
        dense = torch.zeros(G, self.max_nodes, C, dtype=x.dtype)
        dense = dense.index_put((ng, np_), xr, accumulate=True)
        occ = torch.zeros(G, self.max_nodes, dtype=x.dtype)
        occ = occ.index_put((ng, np_),
                            torch.ones(xr.shape[0], dtype=x.dtype),
                            accumulate=True) > 0
        keys = torch.where(occ, dense[..., -1].detach(),
                           torch.tensor(-torch.inf, dtype=x.dtype))
        _, idx = torch.topk(keys, self.sort_k, dim=1)           # [G, k]
        rows = torch.gather(
            dense, 1, idx.unsqueeze(-1).expand(-1, -1, C))      # [G, k, C]
        valid = torch.gather(occ, 1, idx)
        rows = rows * valid.unsqueeze(-1).to(x.dtype)
        return torch.cat([mean, total, rows.reshape(G, -1)], dim=-1)

    def forward(self, b, return_acts: bool = False):
        x = _celu(self.lin0(b.nodes))
        h = x  # MessageBlock: h=None -> h=x on the first step
        acts = []
        for _ in range(self.steps):
            m = _celu(self.conv(x, b.edges, b.senders, b.receivers))
            h = self.gru(m, h)
            y = h + x if self.residual else h
            x = _celu(y)
            acts.append(x)
        pooled = self.pool5(x, b.node_graph, b.node_pos, b.n_node)
        z = _celu(self.flat(pooled))
        out = self.out(z)
        return (out, acts) if return_acts else out


def to_torch(batch) -> types.SimpleNamespace:
    """GraphBatch (JAX/numpy) -> torch tensors (same padded layout)."""
    f32 = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)  # noqa
    i64 = lambda a: torch.tensor(np.asarray(a), dtype=torch.long)     # noqa
    return types.SimpleNamespace(
        nodes=f32(batch.nodes), edges=f32(batch.edges),
        senders=i64(batch.senders), receivers=i64(batch.receivers),
        node_graph=i64(batch.node_graph), node_pos=i64(batch.node_pos),
        n_node=i64(batch.n_node), y=f32(batch.y),
        node_mask=torch.tensor(np.asarray(batch.node_mask)),
        graph_mask=torch.tensor(np.asarray(batch.graph_mask)))


def load_glam_params(model: TorchFlagship, params) -> None:
    """Transplant a glam_tpu Architecture param tree into the twin."""
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)  # noqa
    mol = params["mol"]
    with torch.no_grad():
        model.lin0.weight.copy_(t(mol["lin0"]["linear"]["kernel"]).T)
        model.lin0.bias.copy_(t(mol["lin0"]["linear"]["bias"]))
        conv = mol["conv"]["TripletMessage_0"]
        model.wn.copy_(t(conv["weight_node"]))
        model.we.copy_(t(conv["weight_edge"]))
        model.watt.copy_(t(conv["weight_triplet_att"]))
        model.wscale.copy_(t(conv["weight_scale"]))
        model.bias.copy_(t(conv["bias"]))
        gru = mol["conv"]["gru"]
        model.gru.weight_ih.copy_(t(gru["w_ih"]).T)
        model.gru.weight_hh.copy_(t(gru["w_hh"]).T)
        model.gru.bias_ih.copy_(t(gru["b_ih"]))
        model.gru.bias_hh.copy_(t(gru["b_hh"]))
        model.flat.weight.copy_(t(mol["flat"]["linear"]["kernel"]).T)
        model.flat.bias.copy_(t(mol["flat"]["linear"]["bias"]))
        model.out.weight.copy_(
            t(params["lin_out1"]["linear"]["kernel"]).T)
        model.out.bias.copy_(t(params["lin_out1"]["linear"]["bias"]))


def torch_grads_as_glam_tree(model: TorchFlagship):
    """The twin's .grad tensors arranged as a glam_tpu param tree
    (transposed back), for gradient-parity assertions."""
    g = lambda p: p.grad.detach().numpy()  # noqa: E731
    return {
        "mol": {
            "lin0": {"linear": {"kernel": g(model.lin0.weight).T,
                                "bias": g(model.lin0.bias)}},
            "conv": {
                "TripletMessage_0": {
                    "weight_node": g(model.wn),
                    "weight_edge": g(model.we),
                    "weight_triplet_att": g(model.watt),
                    "weight_scale": g(model.wscale),
                    "bias": g(model.bias)},
                "gru": {"w_ih": g(model.gru.weight_ih).T,
                        "w_hh": g(model.gru.weight_hh).T,
                        "b_ih": g(model.gru.bias_ih),
                        "b_hh": g(model.gru.bias_hh)},
            },
            "flat": {"linear": {"kernel": g(model.flat.weight).T,
                                "bias": g(model.flat.bias)}},
        },
        "lin_out1": {"linear": {"kernel": g(model.out.weight).T,
                                "bias": g(model.out.bias)}},
    }


def torch_loss(task: str, out, y, graph_mask):
    """train/losses.py semantics in torch (weighted mean, +max(sum w, 1))."""
    if task == "regression":
        w = graph_mask.to(out.dtype)
        loss = (out.reshape(-1) - y[:, 0]) ** 2
        return (loss * w).sum() / w.sum().clamp(min=1.0)
    if task == "binary_nan_bce":
        mask = (y >= 0) & graph_mask.unsqueeze(-1)
        w = mask.to(out.dtype)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            out, y.clamp(min=0.0), reduction="none")
        return (loss * w).sum() / w.sum().clamp(min=1.0)
    raise ValueError(task)
