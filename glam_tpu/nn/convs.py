"""Message-passing convolution layers (flax.linen), TPU-first.

Re-designs of the reference conv layers
(/root/reference/src_1gp/layer.py:15-158) on the padded GraphBatch
layout.  Differences from the torch/PyG implementation that matter for
TPU performance:

  * Triplet attention logits are decomposed: the per-edge score
    ``(x_i ‖ e_ij ‖ x_j) · w`` (the author-annotated dominant cost,
    layer.py:48-49) is computed as three *node/edge-level* projections
    gathered per edge — O(E·H) gather traffic instead of O(E·H·3C) —
    mathematically identical (dot of concat == sum of dots).
  * Aggregations are ``jax.ops.segment_sum`` over receiver ids; XLA
    lowers these to TPU-friendly sorted-scatter; a fused Pallas path is
    provided in :mod:`glam_tpu.ops.pallas` for the hot configurations.
  * Self-loops (GCN/GAT) are appended as a static-size edge block.

All convs share the signature
``__call__(x, edge_attr, senders, receivers) -> x'`` with shapes
[N, C], [E, Fe], [E], [E]; padded edges must point at padding nodes.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_mean, segment_softmax, segment_sum
from .init import (glorot_uniform_pyg, kaiming_uniform,
                   kaiming_uniform_fan, pyg_uniform, torch_linear_bias,
                   torch_linear_kernel)


def _leaky_relu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _ell_softmax(logits, mask):
    """Masked softmax over the K (axis=1) neighbor axis of [N, K, ...].

    Matches segment-softmax semantics: per-destination max subtraction,
    +1e-16 in the denominator, zero weights for empty rows."""
    neg = jnp.where(mask, logits, -jnp.inf)
    mx = jnp.max(neg, axis=1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(mask, jnp.exp(logits - mx), 0.0)
    return ex / (jnp.sum(ex, axis=1, keepdims=True) + 1e-16)


class TripletMessage(nn.Module):
    """Multi-head edge-conditioned attention MP (reference layer.py:15-64).

    math (per edge s->r, head h):
      x' = x Wn ; e' = e We                     (projections to H*C)
      a  = leaky_relu( [x'_r, e', x'_s] . w_h ) (attention logit)
      α  = segment_softmax(a over incoming edges of r)
      m  = α * e' * x'_s                        (elementwise, per head)
      out_r = (Σ_s m) reshaped to H*C @ Wscale + bias
    """
    channels: int
    edge_channels: int
    heads: int = 3
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_attr, senders, receivers, ell=None,
                 pack=None):
        C, H = self.channels, self.heads
        # torch kaiming_uniform_ on the reference's (in, out)-shaped
        # Parameters takes fan = size(1) (layer.py:29-34); the 3D
        # (1, H, 3C) attention tensor gets fan = H * 3C
        wn = self.param("weight_node", kaiming_uniform(1), (C, H * C))
        we = self.param("weight_edge", kaiming_uniform(1),
                        (self.edge_channels, H * C))
        watt = self.param("weight_triplet_att",
                          kaiming_uniform_fan(H * 3 * C), (H, 3 * C))
        wscale = self.param("weight_scale", kaiming_uniform(1),
                            (H * C, C))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (C,))

        xp = x @ wn                       # [N, H*C]
        ep = edge_attr @ we               # [E, H*C]
        # decompose attention: w = [w_i | w_e | w_j] per head
        w_i = watt[:, :C]                 # [H, C]
        w_e = watt[:, C:2 * C]
        w_j = watt[:, 2 * C:]
        xh = xp.reshape(-1, H, C)
        eh = ep.reshape(-1, H, C)
        a_i = jnp.einsum("nhc,hc->nh", xh, w_i)   # [N, H]
        a_j = jnp.einsum("nhc,hc->nh", xh, w_j)   # [N, H]
        a_e = jnp.einsum("ehc,hc->eh", eh, w_e)   # [E, H]
        if pack is not None:
            # fully-fused Pallas attention step (ops/pallas/triplet_fused):
            # the kernel recomputes the edge projection and a_e from the
            # raw edge_attr in-VMEM, so eh/a_e above are dead code XLA
            # prunes on this branch
            from ..ops.pallas.triplet_fused import fused_triplet_attention
            perm, lrcv, lsnd, starts, pmask = pack
            # block-diagonal [H*C, H] so a_e = (edge_attr @ we) @ wemat
            head_of = jnp.arange(H * C) // C
            wemat = (jax.nn.one_hot(head_of, H, dtype=jnp.float32)
                     * w_e.reshape(-1).astype(jnp.float32)[:, None])
            # the fused kernel is f32-only (f32 VMEM scratch / out_shape)
            # and accumulates at HIGHEST precision regardless, so under
            # --dtype bfloat16 we cast its inputs up rather than fail at
            # Mosaic lowering; everything else stays in compute dtype
            f32 = lambda a: a.astype(jnp.float32)  # noqa: E731
            aggr = fused_triplet_attention(
                H, C, self.negative_slope, None, f32(xp), f32(a_i),
                f32(a_j), f32(edge_attr), f32(we), wemat, senders,
                receivers, perm, lrcv, lsnd, starts, pmask).astype(xp.dtype)
        elif ell is not None:
            nbr, eid, mask = ell                  # [N, K]
            logits = _leaky_relu(
                a_i[:, None, :] + a_e[eid] + a_j[nbr],
                self.negative_slope)              # [N, K, H]
            alpha = _ell_softmax(logits, mask[..., None])
            msg = alpha[..., None] * eh[eid] * xh[nbr]    # [N, K, H, C]
            aggr = jnp.sum(msg, axis=1).reshape(-1, H * C)
        else:
            logits = a_i[receivers] + a_e + a_j[senders]  # [E, H]
            logits = _leaky_relu(logits, self.negative_slope)
            alpha = segment_softmax(logits, receivers, x.shape[0])
            msg = alpha[:, :, None] * eh * xh[senders]    # [E, H, C]
            aggr = segment_sum(msg.reshape(-1, H * C), receivers,
                               x.shape[0])
        return aggr @ wscale + bias


class TripletMessageLight(nn.Module):
    """Single-head variant (reference layer.py:67-104): attention over
    [x_i, e_raw, x_j]; message α·x_j; bias-only update."""
    channels: int
    edge_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_attr, senders, receivers, ell=None):
        C = self.channels
        # reference shapes: (C, C) -> fan size(1) = C; (1, 2C+E) -> fan
        # size(1) = 2C+E
        wn = self.param("weight_node", kaiming_uniform(1), (C, C))
        watt = self.param("weight_triplet_att",
                          kaiming_uniform_fan(2 * C + self.edge_channels),
                          (2 * C + self.edge_channels,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (C,))
        xp = x @ wn
        w_i = watt[:C]
        w_e = watt[C:C + self.edge_channels]
        w_j = watt[C + self.edge_channels:]
        a_i = xp @ w_i
        a_j = xp @ w_j
        a_e = edge_attr @ w_e
        if ell is not None:
            nbr, eid, mask = ell
            logits = _leaky_relu(a_i[:, None] + a_e[eid] + a_j[nbr],
                                 self.negative_slope)      # [N, K]
            alpha = _ell_softmax(logits, mask)
            aggr = jnp.sum(alpha[..., None] * xp[nbr], axis=1)
        else:
            logits = _leaky_relu(a_i[receivers] + a_e + a_j[senders],
                                 self.negative_slope)
            alpha = segment_softmax(logits, receivers, x.shape[0])
            aggr = segment_sum(alpha[:, None] * xp[senders], receivers,
                               x.shape[0])
        return aggr + bias


class NNConv(nn.Module):
    """Edge-conditioned conv, PyG NNConv parity (reference layer.py:115-122):
    edge MLP Linear(Fe,32)-ReLU-Linear(32, Cin*Cout), message
    x_s @ W(e), aggr='mean', root weight + bias."""
    in_channels: int
    out_channels: int
    edge_channels: int
    hidden: int = 32

    @nn.compact
    def __call__(self, x, edge_attr, senders, receivers, ell=None):
        ci, co = self.in_channels, self.out_channels
        h1 = nn.Dense(self.hidden, kernel_init=torch_linear_kernel(),
                      bias_init=torch_linear_bias(self.edge_channels),
                      name="edge_mlp_0")(edge_attr)
        h1 = jax.nn.relu(h1)
        wmat = nn.Dense(ci * co, kernel_init=torch_linear_kernel(),
                        bias_init=torch_linear_bias(self.hidden),
                        name="edge_mlp_1")(h1)
        wmat = wmat.reshape(-1, ci, co)                    # [E, Ci, Co]
        msg = jnp.einsum("ec,eco->eo", x[senders], wmat)   # [E, Co]
        if ell is not None:
            nbr, eid, mask = ell
            gathered = jnp.where(mask[..., None], msg[eid], 0.0)  # [N,K,Co]
            cnt = jnp.maximum(jnp.sum(mask, axis=1,
                                      keepdims=True).astype(x.dtype), 1.0)
            aggr = jnp.sum(gathered, axis=1) / cnt
        else:
            aggr = segment_mean(msg, receivers, x.shape[0])
        # PyG 1.7 NNConv.reset_parameters: uniform(in_channels, root)
        # and uniform(in_channels, bias) — both U(+-1/sqrt(Ci))
        root = self.param("root", pyg_uniform(ci), (ci, co))
        bias = self.param("bias", pyg_uniform(ci), (co,))
        return aggr + x @ root + bias


class GCNConv(nn.Module):
    """PyG GCNConv parity: self-loops + symmetric normalization + bias.

    Only topology is used (edge_attr ignored — reference layer.py:143-149
    drops it too)."""
    in_channels: int
    out_channels: int
    edge_channels: int = 0

    @nn.compact
    def __call__(self, x, edge_attr, senders, receivers, ell=None):
        N = x.shape[0]
        # PyG 1.7 GCNConv: glorot(weight), zeros(bias)
        w = self.param("weight",
                       glorot_uniform_pyg(self.in_channels
                                          + self.out_channels),
                       (self.in_channels, self.out_channels))
        bias = self.param("bias", lambda k, s: jnp.zeros(s),
                          (self.out_channels,))
        xp = x @ w
        if ell is not None:
            nbr, eid, mask = ell
            deg = jnp.sum(mask, axis=1).astype(xp.dtype) + 1.0
            dinv = jax.lax.rsqrt(deg)
            norm = jnp.where(mask, dinv[:, None] * dinv[nbr], 0.0)  # [N,K]
            out = jnp.sum(norm[..., None] * xp[nbr], axis=1)
        else:
            ones = jnp.ones(senders.shape[0], xp.dtype)
            deg = segment_sum(ones, receivers, N) + 1.0    # + self-loop
            dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
            norm = dinv[senders] * dinv[receivers]         # [E]
            out = segment_sum(norm[:, None] * xp[senders], receivers, N)
        out = out + (dinv * dinv)[:, None] * xp            # self-loop term
        return out + bias


class GATConv(nn.Module):
    """PyG 1.7 GATConv parity (multi-head concat, slope 0.2, self-loops;
    the reference wrapper uses heads=1 — naive-oracle tested for heads=3
    in tests/test_parity_extra.py)."""
    in_channels: int
    out_channels: int
    edge_channels: int = 0
    heads: int = 1
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edge_attr, senders, receivers, ell=None):
        N = x.shape[0]
        H, C = self.heads, self.out_channels
        # PyG 1.7 GATConv: glorot(weight [in, H*C]) and glorot(att
        # [1, H, 2C] -> fan H + 2C); zeros(bias)
        w = self.param("weight",
                       glorot_uniform_pyg(self.in_channels + H * C),
                       (self.in_channels, H * C))
        att_src = self.param("att_src", glorot_uniform_pyg(H + 2 * C),
                             (H, C))
        att_dst = self.param("att_dst", glorot_uniform_pyg(H + 2 * C),
                             (H, C))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (H * C,))
        xp = (x @ w).reshape(N, H, C)
        a_src = jnp.einsum("nhc,hc->nh", xp, att_src)
        a_dst = jnp.einsum("nhc,hc->nh", xp, att_dst)
        if ell is not None:
            # neighbors in K slots + the self-loop as a K+1-th slot
            nbr, eid, mask = ell
            logits_n = a_src[nbr] + a_dst[:, None, :]      # [N, K, H]
            logits_s = (a_src + a_dst)[:, None, :]         # [N, 1, H]
            logits = _leaky_relu(
                jnp.concatenate([logits_n, logits_s], axis=1),
                self.negative_slope)                       # [N, K+1, H]
            full_mask = jnp.concatenate(
                [mask, jnp.ones((N, 1), bool)], axis=1)[..., None]
            alpha = _ell_softmax(logits, full_mask)
            vals = jnp.concatenate([xp[nbr], xp[:, None]], axis=1)
            out = jnp.sum(alpha[..., None] * vals, axis=1).reshape(N, H * C)
        else:
            # append one self-loop per node (static shape: E + N edges)
            loop = jnp.arange(N, dtype=senders.dtype)
            snd = jnp.concatenate([senders, loop])
            rcv = jnp.concatenate([receivers, loop])
            logits = _leaky_relu(a_src[snd] + a_dst[rcv],
                                 self.negative_slope)
            alpha = segment_softmax(logits, rcv, N)        # [E+N, H]
            msg = alpha[:, :, None] * xp[snd]              # [E+N, H, C]
            out = segment_sum(msg, rcv, N).reshape(N, H * C)
        return out + bias


CONVS = {
    "_TripletMessage": TripletMessage,
    "_TripletMessageLight": TripletMessageLight,
    "_NNConv": NNConv,
    "_GCNConv": GCNConv,
    "_GATConv": GATConv,
}

# convs whose GRU state update is disabled in MessageBlock (layer.py:248)
NO_GRU_CONVS = ("_GCNConv", "_GATConv")


def get_conv(name: str, in_dim: int, out_dim: int, edge_dim: int):
    key = name.strip()
    if key not in CONVS:
        raise KeyError(f"unknown conv {name!r}; have {sorted(CONVS)}")
    if key == "_TripletMessage":
        return TripletMessage(channels=in_dim, edge_channels=edge_dim)
    if key == "_TripletMessageLight":
        return TripletMessageLight(channels=in_dim, edge_channels=edge_dim)
    if key == "_NNConv":
        return NNConv(in_channels=in_dim, out_channels=out_dim,
                      edge_channels=edge_dim)
    if key == "_GCNConv":
        return GCNConv(in_channels=in_dim, out_channels=out_dim)
    return GATConv(in_channels=in_dim, out_channels=out_dim)
