"""Full-model training/inference over ONE giant graph sharded on a mesh.

Round-2 generalization (VERDICT items 3/8): the sharded path now
  * supports the FULL conv family of the search space — ``_TripletMessage``
    (flagship), ``_TripletMessageLight``, ``_NNConv``, ``_GCNConv`` (the
    reference's default protein tower, src_2gi_dti_scr/run.py:19) and
    ``_GATConv`` — and all three readouts (GlobalLAPool, GlobalPool5
    incl. cross-shard sort-pool, Set2Set);
  * uses the boundary-only (v2) halo exchange: each message step ships
    just the projected features neighbor shards reference (host-planned
    ``send_idx``) with one ``all_to_all`` over ICI — O(D*H*C) bytes
    instead of the v1 all-gather's O(N*C);
  * is TRAINABLE: ``make_sharded_forward`` is differentiable through the
    shard_map (the readout leaves the manual region as a replicated
    pooled vector; the head + loss run outside), and
    ``make_sharded_train_step`` takes one optimizer step with gradients
    that match the single-device :class:`Architecture` oracle
    (tests/test_sharded_model.py).

Scale motivation: protein contact-map graphs reach L~900 residues with
dense contact neighborhoods (reference src_2gi_dti_scr/utils.py:283-293);
partitioning the node axis over a slice bounds per-chip memory while the
halo traffic stays proportional to the contact boundary.

Supported config subset (deterministic giant-graph regime):
graph_norm in {'_None', '_PairNorm', '_GraphSizeNorm', '_LayerNorm',
'_BatchNorm'} — per-graph statistics become global psum statistics (one
giant graph IS one norm group); BatchNorm offers bn_mode='batch'
(global masked batch statistics, single-device TRAIN parity — the
sharded-serving default, since for one giant graph the batch statistics
are the population statistics) or 'running' (trained running averages
via extract_params(batch_stats=...), single-device EVAL parity).
Dropouts '_None()', acts in {CELU, ReLU, LeakyReLU, RReLU (eval slope),
_None}, optional residual, GRU state for TripletMessage/
TripletMessageLight/NNConv (disabled for GCN/GAT, as in MessageBlock —
reference layer.py:248).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .graph_partition import build_halo_exchange, split_large_graph

# ONE definition site for the cell/activation math shared with the flax
# layer library (nn/blocks.py GRUCell, nn/readouts.py Set2Set): the
# sharded tower cannot silently drift from the single-device twin.
from ..nn.activations import get_activation
from ..nn.cells import gru_cell as _gru
from ..nn.cells import lstm_cell as _lstm
from ..nn.convs import NO_GRU_CONVS


def _act(name: str):
    """Deterministic (eval-mode) activation from the shared registry."""
    fn = get_activation(name)
    return lambda x: fn(x, deterministic=True)


def _extract_tower(mol: Dict, conv: str, readout: str,
                   graph_norm: str = "_None",
                   bn_stats: Optional[Dict] = None) -> Dict:
    """Pull one tower's arrays (lin0/conv/[gru]/[norm]/readout/flat) out
    of a trained _Tower param subtree.  ``bn_stats`` is the tower's
    "batch_stats" collection subtree — required only for
    graph_norm='_BatchNorm' with bn_mode='running'."""
    kind = conv.strip().lstrip("_")
    convp = mol["conv"][f"{kind}_0"]
    out = {
        "lin0": {"kernel": mol["lin0"]["linear"]["kernel"],
                 "bias": mol["lin0"]["linear"]["bias"]},
        "flat": {"kernel": mol["flat"]["linear"]["kernel"],
                 "bias": mol["flat"]["linear"]["bias"]},
    }
    gn = graph_norm.strip()
    if gn == "_LayerNorm":
        ln = mol["conv"]["GraphLayerNorm_0"]
        out["norm"] = {"scale": ln["scale"], "bias": ln["bias"]}
    elif gn == "_BatchNorm":
        bn = mol["conv"]["BatchNorm_0"]
        out["norm"] = {"scale": bn["scale"], "bias": bn["bias"]}
        if bn_stats is not None:  # running stats for bn_mode="running"
            ra = bn_stats["conv"]["BatchNorm_0"]
            out["norm_ra"] = {"mean": ra["mean"], "var": ra["var"]}
    key = conv.strip()
    if key == "_TripletMessage":
        out["conv"] = {k: convp[k] for k in
                       ("weight_node", "weight_edge",
                        "weight_triplet_att", "weight_scale", "bias")}
    elif key == "_TripletMessageLight":
        out["conv"] = {k: convp[k] for k in
                       ("weight_node", "weight_triplet_att", "bias")}
    elif key == "_NNConv":
        out["conv"] = {
            "edge_mlp_0": {"kernel": convp["edge_mlp_0"]["kernel"],
                           "bias": convp["edge_mlp_0"]["bias"]},
            "edge_mlp_1": {"kernel": convp["edge_mlp_1"]["kernel"],
                           "bias": convp["edge_mlp_1"]["bias"]},
            "root": convp["root"], "bias": convp["bias"]}
    elif key == "_GCNConv":
        out["conv"] = {"weight": convp["weight"], "bias": convp["bias"]}
    elif key == "_GATConv":
        out["conv"] = {k: convp[k] for k in
                       ("weight", "att_src", "att_dst", "bias")}
    else:
        raise ValueError(f"sharded path: unsupported conv {conv!r}")
    if key not in NO_GRU_CONVS:  # MessageBlock.has_gru (layer.py:248)
        out["gru"] = {k: mol["conv"]["gru"][k]
                      for k in ("w_ih", "w_hh", "b_ih", "b_hh")}
    # GlobalPool5 has no parameters, so flax omits the module entirely
    ro = mol.get("readout", {})
    if readout == "GlobalLAPool":
        out["gate"] = {"kernel": ro["gate_nn"]["kernel"],
                       "bias": ro["gate_nn"]["bias"]}
        out["val"] = {"kernel": ro["nn"]["kernel"], "bias": ro["nn"]["bias"]}
    elif readout == "Set2Set":
        out["lstm"] = {"w_ih": ro["lstm_w_ih"], "w_hh": ro["lstm_w_hh"],
                       "b_ih": ro["lstm_b_ih"], "b_hh": ro["lstm_b_hh"]}
    elif readout != "GlobalPool5":
        raise ValueError(f"sharded path: unsupported readout {readout!r}")
    return out


def extract_params(arch_params: Dict, conv: str = "_TripletMessage",
                   readout: str = "GlobalLAPool",
                   graph_norm: str = "_None",
                   batch_stats: Optional[Dict] = None) -> Dict:
    """Pull the arrays the sharded forward needs out of a trained
    Architecture param tree (any conv/readout in the supported subset).
    Pass the model's "batch_stats" collection for
    graph_norm='_BatchNorm' + bn_mode='running'."""
    out = _extract_tower(arch_params["mol"], conv, readout, graph_norm,
                         bn_stats=(batch_stats or {}).get("mol"))
    out["out"] = {"kernel": arch_params["lin_out1"]["linear"]["kernel"],
                  "bias": arch_params["lin_out1"]["linear"]["bias"]}
    return jax.tree_util.tree_map(jnp.asarray, out)


def extract_pair_params(pair_params: Dict, pro_conv: str = "_GCNConv",
                        pro_readout: str = "GlobalPool5",
                        graph_norm: str = "_None",
                        batch_stats: Optional[Dict] = None) -> Dict:
    """Pull the arrays :func:`make_sharded_pair_forward` needs out of a
    trained PairArchitecture(hetero=True) param tree.  The molecule
    tower (``mol1``) is kept verbatim — the pair forward applies the
    production flax ``_Tower`` to it; the protein tower (``mol2``) is
    flattened for the sharded functional path."""
    out = {
        "mol1": pair_params["mol1"],
        "pro": _extract_tower(pair_params["mol2"], pro_conv, pro_readout,
                              graph_norm,
                              bn_stats=(batch_stats or {}).get("mol2")),
        "out0": {"kernel": pair_params["lin_out0"]["linear"]["kernel"],
                 "bias": pair_params["lin_out0"]["linear"]["bias"]},
        "out1": {"kernel": pair_params["lin_out1"]["linear"]["kernel"],
                 "bias": pair_params["lin_out1"]["linear"]["bias"]},
    }
    return jax.tree_util.tree_map(jnp.asarray, out)


def insert_params(arch_params: Dict, sharded: Dict,
                  conv: str = "_TripletMessage",
                  readout: str = "GlobalLAPool",
                  graph_norm: str = "_LayerNorm") -> Dict:
    """Inverse of :func:`extract_params`: write sharded-trained arrays
    back into an Architecture param tree (train sharded on the mesh,
    then serve/fine-tune single-device with the same checkpoint)."""
    # tree_map rebuilds every container, so mutating `out` below never
    # touches the caller's tree
    out = jax.tree_util.tree_map(jnp.asarray, arch_params)
    _insert_tower(out["mol"], sharded, conv, readout, graph_norm)
    out["lin_out1"]["linear"]["kernel"] = sharded["out"]["kernel"]
    out["lin_out1"]["linear"]["bias"] = sharded["out"]["bias"]
    return out


def _insert_tower(mol: Dict, sharded: Dict, conv: str,
                  readout: str, graph_norm: str = "_LayerNorm") -> None:
    kind = conv.strip().lstrip("_")
    mol["lin0"]["linear"]["kernel"] = sharded["lin0"]["kernel"]
    mol["lin0"]["linear"]["bias"] = sharded["lin0"]["bias"]
    mol["conv"][f"{kind}_0"].update(sharded["conv"])
    if "gru" in sharded:
        mol["conv"]["gru"].update(sharded["gru"])
    if "norm" in sharded:
        norm_mod = {"_LayerNorm": "GraphLayerNorm_0",
                    "_BatchNorm": "BatchNorm_0"}[graph_norm.strip()]
        mol["conv"][norm_mod].update(sharded["norm"])
    if readout == "GlobalLAPool":
        mol["readout"]["gate_nn"]["kernel"] = sharded["gate"]["kernel"]
        mol["readout"]["gate_nn"]["bias"] = sharded["gate"]["bias"]
        mol["readout"]["nn"]["kernel"] = sharded["val"]["kernel"]
        mol["readout"]["nn"]["bias"] = sharded["val"]["bias"]
    elif readout == "Set2Set":
        for k, v in sharded["lstm"].items():
            mol["readout"][f"lstm_{k}"] = v
    mol["flat"]["linear"]["kernel"] = sharded["flat"]["kernel"]
    mol["flat"]["linear"]["bias"] = sharded["flat"]["bias"]


def insert_bn_stats(arch_batch_stats: Dict, sharded: Dict) -> Dict:
    """Write sharded-trained running statistics (``norm_ra``, updated by
    make_sharded_train_step(track_bn_stats=True)) back into an
    Architecture "batch_stats" collection, so the sharded-trained model
    serves single-device in EVAL mode (use_running_average=True)."""
    out = jax.tree_util.tree_map(jnp.asarray, arch_batch_stats)
    out["mol"]["conv"]["BatchNorm_0"]["mean"] = sharded["norm_ra"]["mean"]
    out["mol"]["conv"]["BatchNorm_0"]["var"] = sharded["norm_ra"]["var"]
    return out


def insert_pair_params(pair_params: Dict, sharded: Dict,
                       pro_conv: str = "_GCNConv",
                       pro_readout: str = "GlobalPool5") -> Dict:
    """Inverse of :func:`extract_pair_params`: write pair-sharded-trained
    arrays back into a PairArchitecture(hetero=True) param tree (train
    the giant-protein DTI model sharded, then serve it single-device)."""
    out = jax.tree_util.tree_map(jnp.asarray, pair_params)
    out["mol1"] = jax.tree_util.tree_map(jnp.asarray, sharded["mol1"])
    _insert_tower(out["mol2"], sharded["pro"], pro_conv, pro_readout)
    out["lin_out0"]["linear"]["kernel"] = sharded["out0"]["kernel"]
    out["lin_out0"]["linear"]["bias"] = sharded["out0"]["bias"]
    out["lin_out1"]["linear"]["kernel"] = sharded["out1"]["kernel"]
    out["lin_out1"]["linear"]["bias"] = sharded["out1"]["bias"]
    return out


def _halo_table(z_local, send_idx, axis):
    """Boundary-only exchange of any per-node array: ship the rows
    neighbor shards reference (one all_to_all over ICI) and append them
    to the local table.  Edge senders were remapped into this layout by
    :func:`glam_tpu.parallel.graph_partition.build_halo_exchange`."""
    send = z_local[send_idx]                      # [D, H, ...]
    halo = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)        # [D, H, ...]
    return jnp.concatenate(
        [z_local, halo.reshape((-1,) + z_local.shape[1:])], axis=0)


def _fusion_stats(x1, x2, mol_mask, nmask, axis):
    """[max, mean] of the cross-graph dot-product matrix for ONE pair
    (``dot_and_global_pool`` stats5=False, nn/fusion.py) with the second
    (protein) side sharded over the mesh: psum/pmax reductions across
    the node shards, differentiable max via owner selection."""
    s = jnp.einsum("mc,nc->mn", x1, x2,
                   preferred_element_type=jnp.float32)   # [Nm, Nl]
    valid = mol_mask[:, None] & nmask[None, :]
    smax_l = jnp.max(jnp.where(valid, s, -jnp.inf))
    # pmax has no differentiation rule: take the global max through a
    # stop_gradient pmax, then route the value (and its gradient) from
    # the shard(s) that own it
    owner = (jax.lax.stop_gradient(smax_l)
             == jax.lax.pmax(jax.lax.stop_gradient(smax_l), axis))
    n_own = jax.lax.psum(owner.astype(s.dtype), axis)
    mx = (jax.lax.psum(jnp.where(owner, smax_l, 0.0), axis)
          / jnp.maximum(n_own, 1.0))
    tot = jax.lax.psum(jnp.sum(jnp.where(valid, s, 0.0)), axis)
    cnt = jax.lax.psum(jnp.sum(valid.astype(s.dtype)), axis)
    mean = tot / jnp.maximum(cnt, 1.0)
    return jnp.stack([mx, mean])


def _make_run_tower(message_steps: int, heads: int, conv: str,
                    readout: str, graph_act: str, pre_act: str,
                    residual: bool, graph_norm: str, sort_k: int,
                    axis: str, bn_mode: str = "batch",
                    track_bn: bool = False):
    """Build the per-shard tower body: pre-linear -> message steps (v2
    halo exchange) -> cross-shard readout.  Returns
    ``run_tower(params, *local_arrays, fusion=None)`` -> pooled vector
    (replicated via psum), plus per-step fusion stats when ``fusion``
    = (xs1 [S,Nm,C], mol_mask [Nm]) is given (the pair model)."""
    act_g = _act(graph_act)
    act_pre = _act(pre_act)
    conv_key = conv.strip()
    use_gru = conv_key not in NO_GRU_CONVS
    gn = graph_norm.strip()
    if gn not in ("_None", "_PairNorm", "_GraphSizeNorm", "_LayerNorm",
                  "_BatchNorm"):
        raise ValueError(
            f"sharded path: unsupported graph_norm {graph_norm!r}")
    if bn_mode not in ("batch", "running"):
        raise ValueError(f"bn_mode must be 'batch' or 'running', "
                         f"got {bn_mode!r}")

    if track_bn and not (gn == "_BatchNorm" and bn_mode == "batch"):
        raise ValueError("track_bn requires graph_norm='_BatchNorm' "
                         "with bn_mode='batch'")

    def pairnorm(p, x, nmask, log=None):
        """PyG PairNorm(scale=1) over the ONE giant graph: the per-graph
        center/scale become global psum statistics across shards."""
        m = nmask[:, None].astype(x.dtype)
        cnt = jnp.maximum(jax.lax.psum(jnp.sum(m), axis), 1.0)
        mean = jax.lax.psum(jnp.sum(x * m, axis=0), axis) / cnt
        xc = (x - mean) * m[:, 0][:, None]
        ms = jax.lax.psum(jnp.sum(xc * xc), axis) / cnt
        return xc / jnp.sqrt(1e-5 + ms)

    def graphsizenorm(p, x, nmask, log=None):
        """PyG GraphSizeNorm: x / sqrt(|V|) with |V| the GLOBAL node
        count of the one giant graph (nn/norms.py:121)."""
        cnt = jax.lax.psum(jnp.sum(nmask.astype(x.dtype)), axis)
        return x * jax.lax.rsqrt(jnp.maximum(cnt, 1.0))

    def layernorm(p, x, nmask, log=None):
        """PyG graph LayerNorm (nn/norms.py:75): one scalar mean/var
        over ALL node*channel entries of the giant graph (psum across
        shards), per-channel affine from the trained norm params."""
        m = nmask[:, None].astype(x.dtype)
        denom = (jax.lax.psum(jnp.sum(m), axis)
                 * jnp.asarray(x.shape[-1], x.dtype))
        denom = jnp.maximum(denom, 1.0)
        mean = jax.lax.psum(jnp.sum(x * m), axis) / denom
        xc = (x - mean) * m
        var = jax.lax.psum(jnp.sum(xc * xc), axis) / denom
        out = xc / jnp.sqrt(var + 1e-5)
        return out * p["norm"]["scale"] + p["norm"]["bias"]

    def batchnorm(p, x, nmask, log=None):
        """Masked BatchNorm1d (nn/norms.py:37, torch semantics) over the
        ONE giant graph.  bn_mode='batch': the batch statistics are the
        GLOBAL masked mean / biased variance (psum across shards) —
        matches the single-device TRAIN-mode forward exactly.
        bn_mode='running': the trained running stats (extract_params
        batch_stats=...) — matches the single-device EVAL forward.
        With ``track_bn`` (make_sharded_train_step track_bn_stats=True)
        each step's (mean, UNBIASED var) is collected via ``log`` so the
        train step can apply the torch momentum-0.1 EMA to the running
        stats — same update sequence as the single-device weight-tied
        MessageBlock, whose one BatchNorm module updates once per
        message step."""
        if bn_mode == "running":
            mean, var = p["norm_ra"]["mean"], p["norm_ra"]["var"]
        else:
            m = nmask[:, None].astype(x.dtype)
            cnt = jnp.maximum(jax.lax.psum(jnp.sum(m), axis), 1.0)
            mean = jax.lax.psum(jnp.sum(x * m, axis=0), axis) / cnt
            xc = (x - mean) * m
            var = jax.lax.psum(jnp.sum(xc * xc, axis=0), axis) / cnt
            if log is not None:
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                log.append((mean, unbiased))
        inv = jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * inv * p["norm"]["scale"] + p["norm"]["bias"]

    norm_fn = {"_None": lambda p, x, nmask, log=None: x,
               "_PairNorm": pairnorm,
               "_GraphSizeNorm": graphsizenorm,
               "_LayerNorm": layernorm,
               "_BatchNorm": batchnorm}[gn]

    def _masked_seg_softmax(logits, rcv_l, emask, Nl):
        """segment_softmax over real local edges (1e-16 PyG epsilon)."""
        mask = emask if logits.ndim == 1 else emask[:, None]
        neg = jnp.where(mask, logits, -jnp.inf)
        seg_max = jax.ops.segment_max(neg, rcv_l, num_segments=Nl)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(mask, jnp.exp(logits - seg_max[rcv_l]), 0.0)
        denom = jax.ops.segment_sum(ex, rcv_l, num_segments=Nl)
        return ex / (denom[rcv_l] + 1e-16)

    def _finish(p, y, x_local, h_prev, nmask):
        """MessageBlock tail (nn/blocks.py): [celu -> GRU] -> residual
        -> act; the residual adds the PRE-norm x_local."""
        if use_gru:
            y = _act("CELU")(y)
            y = _gru(p["gru"], y, h_prev)
            h_new = y
        else:
            h_new = h_prev
        if residual:
            y = y + x_local
        return act_g(y) * nmask[:, None], h_new

    def triplet_step(p, x_local, x_in, h_prev, edges_l, snd_l, rcv_l,
                     emask, nmask, send_idx, enorm, self_norm):
        # x_in = norm(x_local) feeds the conv; the residual adds the
        # PRE-norm x_local (MessageBlock semantics, nn/blocks.py)
        C = x_local.shape[-1]
        H = heads
        xp = x_in @ p["conv"]["weight_node"]             # [Nl, H*C]
        watt = p["conv"]["weight_triplet_att"]           # [H, 3C]
        xh = xp.reshape(-1, H, C)
        eh = (edges_l @ p["conv"]["weight_edge"]).reshape(-1, H, C)
        a_i = jnp.einsum("nhc,hc->nh", xh, watt[:, :C])
        a_j = jnp.einsum("nhc,hc->nh", xh, watt[:, 2 * C:])
        a_e = jnp.einsum("ehc,hc->eh", eh, watt[:, C:2 * C])
        # v2 halo: ship only the boundary rows neighbors reference
        xh_t = _halo_table(xh, send_idx, axis)           # [Nl+D*H, H, C]
        a_j_t = _halo_table(a_j, send_idx, axis)
        logits = a_i[rcv_l] + a_e + a_j_t[snd_l]         # [El, H]
        logits = jnp.where(logits >= 0, logits, 0.2 * logits)
        Nl = x_local.shape[0]
        alpha = _masked_seg_softmax(logits, rcv_l, emask, Nl)
        msg = alpha[:, :, None] * eh * xh_t[snd_l]       # [El, H, C]
        aggr = jax.ops.segment_sum(msg.reshape(-1, H * C), rcv_l,
                                   num_segments=Nl)
        y = aggr @ p["conv"]["weight_scale"] + p["conv"]["bias"]
        return _finish(p, y, x_local, h_prev, nmask)

    def triplet_light_step(p, x_local, x_in, h_prev, edges_l, snd_l,
                           rcv_l, emask, nmask, send_idx, enorm,
                           self_norm):
        """Single-head TripletMessageLight (nn/convs.py:130): attention
        over [x_i, e_raw, x_j], message α·x'_j, bias-only update."""
        C = x_local.shape[-1]
        xp = x_in @ p["conv"]["weight_node"]             # [Nl, C]
        watt = p["conv"]["weight_triplet_att"]           # [2C + Fe]
        Fe = watt.shape[0] - 2 * C
        a_i = xp @ watt[:C]
        a_e = edges_l @ watt[C:C + Fe]
        a_j = xp @ watt[C + Fe:]
        xp_t = _halo_table(xp, send_idx, axis)
        a_j_t = _halo_table(a_j, send_idx, axis)
        logits = a_i[rcv_l] + a_e + a_j_t[snd_l]         # [El]
        logits = jnp.where(logits >= 0, logits, 0.2 * logits)
        Nl = x_local.shape[0]
        alpha = _masked_seg_softmax(logits, rcv_l, emask, Nl)
        aggr = jax.ops.segment_sum(alpha[:, None] * xp_t[snd_l], rcv_l,
                                   num_segments=Nl)
        return _finish(p, aggr + p["conv"]["bias"], x_local, h_prev,
                       nmask)

    def nnconv_step(p, x_local, x_in, h_prev, edges_l, snd_l, rcv_l,
                    emask, nmask, send_idx, enorm, self_norm):
        """PyG NNConv (nn/convs.py:169): per-edge weight matrix from the
        edge MLP, message x'_s @ W(e), aggr='mean', root + bias."""
        C = x_local.shape[-1]
        mlp = p["conv"]
        h1 = jnp.maximum(edges_l @ mlp["edge_mlp_0"]["kernel"]
                         + mlp["edge_mlp_0"]["bias"], 0.0)
        wmat = (h1 @ mlp["edge_mlp_1"]["kernel"]
                + mlp["edge_mlp_1"]["bias"]).reshape(-1, C, C)
        x_t = _halo_table(x_in, send_idx, axis)
        msg = jnp.einsum("ec,eco->eo", x_t[snd_l], wmat)  # [El, C]
        msg = jnp.where(emask[:, None], msg, 0.0)
        Nl = x_local.shape[0]
        tot = jax.ops.segment_sum(msg, rcv_l, num_segments=Nl)
        cnt = jax.ops.segment_sum(emask.astype(x_in.dtype), rcv_l,
                                  num_segments=Nl)
        aggr = tot / jnp.maximum(cnt, 1.0)[:, None]
        y = aggr + x_in @ mlp["root"] + mlp["bias"]
        return _finish(p, y, x_local, h_prev, nmask)

    def gat_step(p, x_local, x_in, h_prev, edges_l, snd_l, rcv_l, emask,
                 nmask, send_idx, enorm, self_norm):
        """PyG GATConv heads=1 (nn/convs.py:241): self-loop per node +
        softmax over incoming edges incl. the loop (1e-16 epsilon)."""
        xp = x_in @ p["conv"]["weight"]                  # [Nl, C]
        a_src = xp @ p["conv"]["att_src"][0]
        a_dst = xp @ p["conv"]["att_dst"][0]
        xp_t = _halo_table(xp, send_idx, axis)
        a_src_t = _halo_table(a_src, send_idx, axis)
        slope = 0.2
        logits = a_src_t[snd_l] + a_dst[rcv_l]           # [El]
        logits = jnp.where(logits >= 0, logits, slope * logits)
        self_logit = a_src + a_dst                       # [Nl]
        self_logit = jnp.where(self_logit >= 0, self_logit,
                               slope * self_logit)
        Nl = x_local.shape[0]
        neg = jnp.where(emask, logits, -jnp.inf)
        seg_max = jax.ops.segment_max(neg, rcv_l, num_segments=Nl)
        m = jnp.maximum(jnp.where(jnp.isfinite(seg_max), seg_max,
                                  -jnp.inf), self_logit)  # [Nl], finite
        ex = jnp.where(emask, jnp.exp(logits - m[rcv_l]), 0.0)
        ex_self = jnp.exp(self_logit - m)
        denom = (jax.ops.segment_sum(ex, rcv_l, num_segments=Nl)
                 + ex_self + 1e-16)
        num = (jax.ops.segment_sum(ex[:, None] * xp_t[snd_l], rcv_l,
                                   num_segments=Nl)
               + ex_self[:, None] * xp)
        y = num / denom[:, None] + p["conv"]["bias"]
        return _finish(p, y, x_local, h_prev, nmask)

    def gcn_step(p, x_local, x_in, h_prev, edges_l, snd_l, rcv_l, emask,
                 nmask, send_idx, enorm, self_norm):
        xp = x_in @ p["conv"]["weight"]
        xp_t = _halo_table(xp, send_idx, axis)
        Nl = x_local.shape[0]
        w = jnp.where(emask, enorm, 0.0)
        out = jax.ops.segment_sum(w[:, None] * xp_t[snd_l], rcv_l,
                                  num_segments=Nl)
        y = out + self_norm[:, None] * xp + p["conv"]["bias"]
        # GRU disabled for GCN/GAT (MessageBlock.has_gru, layer.py:248)
        return _finish(p, y, x_local, h_prev, nmask)

    conv_step = {"_TripletMessage": triplet_step,
                 "_TripletMessageLight": triplet_light_step,
                 "_NNConv": nnconv_step,
                 "_GCNConv": gcn_step,
                 "_GATConv": gat_step}[conv_key]

    def pool(params, x, nmask):
        if readout == "GlobalLAPool":
            gate = (x @ params["gate"]["kernel"]
                    + params["gate"]["bias"])[:, 0]
            gate = jnp.where(nmask, gate, -jnp.inf)
            # softmax max-shift cancels analytically -> no grad needed;
            # stop_gradient on the INPUT keeps pmax (which has no
            # differentiation rule) out of the jvp trace entirely
            gmax = jax.lax.pmax(
                jax.lax.stop_gradient(jnp.max(gate)), axis)
            ex = jnp.where(nmask, jnp.exp(gate - gmax), 0.0)
            denom = jax.lax.psum(jnp.sum(ex), axis) + 1e-16
            val = x @ params["val"]["kernel"] + params["val"]["bias"]
            return jax.lax.psum(jnp.sum(ex[:, None] * val, axis=0),
                                axis) / denom             # [2C]
        if readout == "GlobalPool5":
            m = nmask[:, None]
            total = jax.lax.psum(jnp.sum(x * m, axis=0), axis)
            cnt = jax.lax.psum(jnp.sum(nmask.astype(x.dtype)), axis)
            mean = total / jnp.maximum(cnt, 1.0)
            # cross-shard sort-pool: local top-k by last channel, then
            # global top-k over the gathered D*k candidates (same
            # descending order + index tie-breaks as global_sort_pool)
            keys = jnp.where(nmask, x[:, -1], -jnp.inf)
            kv, ki = jax.lax.top_k(keys, sort_k)          # [k]
            rows = x[ki]                                  # [k, C]
            kv_all = jax.lax.all_gather(kv, axis).reshape(-1)
            rows_all = jax.lax.all_gather(rows, axis).reshape(
                -1, x.shape[-1])
            gv, gi = jax.lax.top_k(kv_all, sort_k)
            top = jnp.where(jnp.isfinite(gv)[:, None], rows_all[gi], 0.0)
            return jnp.concatenate([mean, total, top.reshape(-1)])  # [5C]
        # Set2Set (processing_steps=3): replicated LSTM state, sharded
        # attention
        C = x.shape[-1]
        q_star = jnp.zeros((2 * C,), x.dtype)
        h = jnp.zeros((C,), x.dtype)
        c = jnp.zeros((C,), x.dtype)
        for _ in range(3):
            q, c = _lstm(params["lstm"], q_star[None], h[None],
                         c[None])
            q = q[0]
            c = c[0]
            h = q
            e = jnp.where(nmask, x @ q, -jnp.inf)
            emax = jax.lax.pmax(
                jax.lax.stop_gradient(jnp.max(e)), axis)
            ex = jnp.where(nmask, jnp.exp(e - emax), 0.0)
            den = jax.lax.psum(jnp.sum(ex), axis) + 1e-16
            r = jax.lax.psum(jnp.sum(ex[:, None] * x, axis=0),
                             axis) / den
            q_star = jnp.concatenate([q, r])
        return q_star                                     # [2C]

    def run_tower(params, nodes_l, edges_l, snd_l, rcv_l, emask, nmask,
                  send_idx, enorm, self_norm, fusion=None):
        x = nodes_l @ params["lin0"]["kernel"] + params["lin0"]["bias"]
        x = act_pre(x)
        x = x * nmask[:, None]
        h = x
        stats = []
        bn_log = [] if track_bn else None
        for step in range(message_steps):
            x_in = norm_fn(params, x, nmask, bn_log)
            x, h = conv_step(params, x, x_in, h, edges_l, snd_l, rcv_l,
                             emask, nmask, send_idx, enorm, self_norm)
            if fusion is not None:
                xs1, mol_mask = fusion
                stats.append(_fusion_stats(xs1[step], x, mol_mask,
                                           nmask, axis))
        pooled = pool(params, x, nmask)  # replicated (psum'd) vector
        if track_bn:
            assert fusion is None, "track_bn + fusion unsupported"
            bn_means = jnp.stack([m for (m, _) in bn_log])  # [S, C]
            bn_vars = jnp.stack([v for (_, v) in bn_log])   # [S, C]
            return pooled, bn_means, bn_vars
        if fusion is None:
            return pooled
        return pooled, jnp.stack(stats)  # [S, 2] replicated

    return run_tower


def make_sharded_forward(mesh, message_steps: int, heads: int = 3,
                         conv: str = "_TripletMessage",
                         readout: str = "GlobalLAPool",
                         graph_act: str = "CELU", pre_act: str = "CELU",
                         flat_act: str = "CELU", residual: bool = True,
                         graph_norm: str = "_None",
                         sort_k: int = 3, axis: str = "graph",
                         bn_mode: str = "batch",
                         track_bn_stats: bool = False):
    """Differentiable sharded forward over one giant graph.

    Returns fn(params, node_shards [D,Nl,F], edge_shards [D,El,Fe],
    senders_local [D,El], receivers_local [D,El], edge_mask [D,El],
    node_mask [D,Nl], send_idx [D,D,H], edge_norm [D,El],
    self_norm [D,Nl]) -> prediction [out_dim].  ``senders_local`` and
    ``send_idx`` come from :func:`shard_inputs`; edge_norm/self_norm are
    the host-precomputed GCN symmetric normalization (ignored for
    TripletMessage)."""
    act_flat = _act(flat_act)
    run_tower = _make_run_tower(message_steps, heads, conv, readout,
                                graph_act, pre_act, residual, graph_norm,
                                sort_k, axis, bn_mode,
                                track_bn=track_bn_stats)

    def tower_local(params, *arrs):
        return run_tower(params, *(a[0] for a in arrs))

    # check_vma=False: the sort-pool path derives its (genuinely
    # replicated) output from an all_gather, which the static
    # varying-axes analysis cannot prove replicated
    tower = jax.shard_map(
        tower_local, mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 9,
        out_specs=(P(), P(), P()) if track_bn_stats else P(),
        check_vma=False)

    def forward(params, *inputs):
        res = tower(params, *inputs)
        pooled = res[0] if track_bn_stats else res
        out = pooled @ params["flat"]["kernel"] + params["flat"]["bias"]
        out = act_flat(out)
        out = out @ params["out"]["kernel"] + params["out"]["bias"]
        if track_bn_stats:
            return out, (res[1], res[2])  # per-step (mean, unbiased var)
        return out

    return jax.jit(forward)


def make_sharded_pair_forward(mesh, cfg, axis: str = "graph",
                              bn_mode: str = "batch"):
    """Hetero-pair (DTI) forward with the PROTEIN tower sharded.

    The molecule graph is small (<=cfg.max_nodes): its tower runs
    replicated through the production flax ``_Tower`` (any mol
    conv/readout/norm the model supports, deterministic mode).  The
    protein contact-map graph (L~900, reference
    src_2gi_dti_scr/utils.py:283-293) is node-partitioned over the mesh
    with the v2 boundary-only halo exchange; the per-step cross-graph
    fusion (``dot_and_global_pool`` [max, mean], model.py PairArchitecture)
    reduces across shards with psum/pmax.

    Returns fn(params, mol_batch: GraphBatch, *pro_inputs) -> [out_dim]
    where params comes from :func:`extract_pair_params` and pro_inputs
    from :func:`shard_inputs` on the protein graph.  Protein-tower
    config restrictions match :func:`make_sharded_forward`; the head
    requires end_norm='_None' (end dropout is a deterministic no-op)."""
    from ..nn.model import _Tower
    if cfg.end_norm.strip() != "_None":
        raise ValueError("sharded pair path: end_norm must be _None")
    hid = cfg.hid_dim
    t1 = _Tower(in_dim=cfg.mol_in_dim, edge_dim=cfg.mol_edge_in_dim,
                hid_dim=hid, flat_out=hid, block=cfg.mol_block,
                readout=cfg.mol_readout, message_steps=cfg.message_steps,
                cfg=cfg, max_nodes=cfg.max_nodes)
    run_tower = _make_run_tower(cfg.message_steps, 3, cfg.pro_block,
                                cfg.pro_readout, cfg.graph_act,
                                cfg.pre_act, bool(cfg.graph_res),
                                cfg.graph_norm, 3, axis, bn_mode)
    act_flat = _act(cfg.flat_act)
    act_end = _act(cfg.end_act)

    def pair_tower_local(params, xs1, mol_mask, *arrs):
        return run_tower(params, *(a[0] for a in arrs),
                         fusion=(xs1, mol_mask))

    pair_tower = jax.shard_map(
        pair_tower_local, mesh=mesh,
        in_specs=(P(), P(), P()) + (P(axis),) * 9,
        out_specs=(P(), P()), check_vma=False)

    def forward(params, mol_batch, *pro_inputs):
        out1, xs1 = t1.apply({"params": params["mol1"]}, mol_batch, True,
                             return_nodes=True)
        xs1 = jnp.stack(xs1)                            # [S, Nm, C]
        # fusion counts only the real pair's molecule nodes (graph 0)
        mol_mask = mol_batch.node_mask & (mol_batch.node_graph == 0)
        pooled2, fus = pair_tower(params["pro"], xs1, mol_mask,
                                  *pro_inputs)
        out2 = act_flat(pooled2 @ params["pro"]["flat"]["kernel"]
                        + params["pro"]["flat"]["bias"])
        # PairArchitecture head: [out1 | out2 | per-step (max, mean)]
        feats = jnp.concatenate([out1[0], out2, fus.reshape(-1)])
        z = act_end(feats @ params["out0"]["kernel"]
                    + params["out0"]["bias"])
        return z @ params["out1"]["kernel"] + params["out1"]["bias"]

    return jax.jit(forward)


def make_sharded_pair_train_step(mesh, cfg, lr: float = 1e-3,
                                 axis: str = "graph"):
    """One SGD step on a (small molecule, sharded giant protein) pair:
    fwd+bwd through both towers and the cross-shard fusion.

    Returns step(params, mol_batch, pro_inputs, y) -> (params, loss)."""
    fwd = make_sharded_pair_forward(mesh, cfg, axis=axis)

    def loss_fn(params, mol_batch, pro_inputs, y):
        pred = fwd(params, mol_batch, *pro_inputs)
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(params, mol_batch, pro_inputs, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, mol_batch,
                                                  pro_inputs, y)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params,
                                        grads)
        return params, loss

    return step


def make_sharded_train_step(mesh, message_steps: int, lr: float = 1e-3,
                            track_bn_stats: bool = False,
                            bn_momentum: float = 0.1, **kw):
    """One SGD training step on a sharded giant graph: full fwd+bwd
    through the shard_map'd tower (halo exchanges differentiate to the
    transposed collectives), gradients exact vs the single-device model.

    With ``track_bn_stats=True`` (requires graph_norm='_BatchNorm',
    bn_mode='batch' and params carrying ``norm_ra`` from
    extract_params(batch_stats=...)), the step also applies the torch
    momentum-0.1 EMA to the running statistics — once per message step
    in tower order, exactly the update sequence the single-device
    weight-tied MessageBlock performs (nn/norms.py:BatchNorm), so a
    sharded-trained model can later serve with bn_mode='running'.

    Returns step(params, inputs_tuple, y) -> (params, loss)."""
    fwd = make_sharded_forward(mesh, message_steps,
                               track_bn_stats=track_bn_stats, **kw)

    def loss_fn(params, inputs, y):
        if track_bn_stats:
            pred, stats = fwd(params, *inputs)
            return jnp.mean((pred - y) ** 2), stats
        return jnp.mean((fwd(params, *inputs) - y) ** 2), None

    @jax.jit
    def step(params, inputs, y):
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, inputs, y)
        # running stats are buffers, not parameters: no gradient update
        grads = dict(grads)
        grads.pop("norm_ra", None)
        new = {k: jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                         params[k], grads[k])
               for k in grads}
        if "norm_ra" in params:
            new["norm_ra"] = params["norm_ra"]
        if track_bn_stats:
            means, uvars = stats            # [S, C] each, replicated
            mean = new["norm_ra"]["mean"]
            var = new["norm_ra"]["var"]
            for s in range(means.shape[0]):  # sequential EMA, S steps
                mean = (1 - bn_momentum) * mean + bn_momentum * means[s]
                var = (1 - bn_momentum) * var + bn_momentum * uvars[s]
            new["norm_ra"] = {"mean": mean, "var": var}
        return new, loss

    return step


def shard_inputs(nodes: np.ndarray, edges: np.ndarray,
                 senders: np.ndarray, receivers: np.ndarray,
                 n_parts: int):
    """Host-side partitioning for the v2 sharded model: node/edge shards,
    halo plan, node mask, and the GCN symmetric normalization
    (global-degree, self-loops — PyG GCNConv semantics)."""
    nsh, esh, sg, rl, emask = split_large_graph(nodes, edges, senders,
                                                receivers, n_parts)
    N = nodes.shape[0]
    Nl = nsh.shape[1]
    send_idx, _, snd_l, _ = build_halo_exchange(sg, emask, Nl)
    nmask = np.zeros((n_parts, Nl), bool)
    for d in range(n_parts):
        lo = d * Nl
        nmask[d, :max(0, min(Nl, N - lo))] = True
    # GCN normalization on GLOBAL degrees (in-degree + self-loop)
    deg = np.bincount(receivers, minlength=N).astype(np.float32) + 1.0
    dinv = 1.0 / np.sqrt(deg)
    enorm = np.zeros(emask.shape, np.float32)
    self_norm = np.zeros((n_parts, Nl), np.float32)
    for d in range(n_parts):
        for e in range(emask.shape[1]):
            if emask[d, e]:
                enorm[d, e] = dinv[sg[d, e]] * dinv[rl[d, e] + d * Nl]
        n_real = max(0, min(Nl, N - d * Nl))
        dd = dinv[d * Nl:d * Nl + n_real]
        self_norm[d, :n_real] = dd * dd
    return nsh, esh, snd_l, rl, emask, nmask, send_idx, enorm, self_norm
