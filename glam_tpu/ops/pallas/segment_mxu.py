"""Pallas TPU kernel: fused segment-softmax + weighted scatter (SpMM).

The attention-aggregation inner loop of every GLAM conv is

    alpha = segment_softmax(logits over incoming edges of each node)
    out[r] = sum_e alpha[e] * values[e]          (scatter-add by receiver)

On TPU, scattering by arbitrary indices is slow; this kernel exploits a
host-side packing (:func:`pack_blocks`): edges are sorted by receiver
and grouped into fixed-size blocks of E_BLOCK edges spanning at most
W_BLOCK distinct receivers, with no receiver's edge-run straddling a
block boundary.  Inside one grid step the whole reduction becomes

    alpha  = masked softmax over matching local-receiver rows
    out_w  = onehot(local_receiver) [W, E] @ (alpha * values) [E, C]

— a dense MXU matmul per block, no scatters at all.  Per-head softmax is
supported via logits [E, H] with values [E, H*C] (head-major columns).

The XLA segment-op implementation (glam_tpu.ops.segment) is the
correctness oracle; tests run this kernel in interpreter mode on CPU and
compiled on the real chip.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

E_BLOCK = 256   # edges per block
W_BLOCK = 128   # max distinct receivers per block (MXU-width scatter)


def pack_blocks(receivers: np.ndarray, num_nodes: int,
                e_block: int = E_BLOCK, w_block: int = W_BLOCK
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack receiver-sorted edges into fixed blocks.

    Input: receivers [E] (ANY order).  Returns
      perm        [Ep]      edge permutation into block order (padded
                            slots repeat edge 0 with mask False)
      local_rcv   [Ep]      receiver index local to the block's window
      win_start   [nblk]    first global receiver of each block's window
      edge_mask   [Ep]      True for real edge slots
    where Ep = nblk * e_block.  Guarantees: all edges of one receiver
    land in the same block; each block covers < w_block receivers.
    """
    order = np.argsort(receivers, kind="stable")
    rsorted = receivers[order]
    blocks = []  # list of (edge_indices, window_start)
    cur: list = []
    cur_rcv_count = 0
    cur_start = -1
    last_r = -1
    runs = []  # (receiver, [edge ids])
    i = 0
    E = len(receivers)
    while i < E:
        j = i
        while j < E and rsorted[j] == rsorted[i]:
            j += 1
        runs.append((int(rsorted[i]), order[i:j]))
        i = j
    for r, ids in runs:
        n = len(ids)
        if n > e_block:
            raise ValueError(
                f"receiver {r} has {n} edges > e_block {e_block}")
        new_count = (r - cur_start + 1) if cur_start >= 0 else 1
        if cur and (len(cur) + n > e_block or new_count > w_block):
            blocks.append((np.asarray(cur), cur_start))
            cur = []
            cur_start = -1
        if cur_start < 0:
            cur_start = r
        cur.extend(ids.tolist())
        last_r = r
    if cur:
        blocks.append((np.asarray(cur), cur_start))
    if not blocks:
        blocks = [(np.zeros(0, np.int64), 0)]
    nblk = len(blocks)
    perm = np.zeros((nblk, e_block), np.int64)
    local = np.zeros((nblk, e_block), np.int32)
    mask = np.zeros((nblk, e_block), bool)
    starts = np.zeros((nblk,), np.int32)
    for b, (ids, start) in enumerate(blocks):
        n = len(ids)
        perm[b, :n] = ids
        local[b, :n] = receivers[ids] - start
        mask[b, :n] = True
        starts[b] = start
    return (perm.reshape(-1), local.reshape(-1), starts,
            mask.reshape(-1))


def _kernel(starts_ref, logits_ref, values_ref, local_ref, mask_ref,
            out_ref, *, num_heads: int, channels: int):
    """One block: masked per-receiver-per-head softmax + MXU scatter."""
    from jax.experimental import pallas as pl

    lg = logits_ref[...]                       # [E_BLOCK, H]
    vals = values_ref[...]                     # [E_BLOCK, H*C]
    local = local_ref[...]                     # [E_BLOCK, 1] int32
    emask = mask_ref[...]                      # [E_BLOCK, 1] bool
    eb = lg.shape[0]

    # scatter matrix: sm[w, e] = 1 iff local[e] == w and edge real
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (W_BLOCK, eb), 0)
    sm = (w_ids == local[:, 0][None, :]) & emask[:, 0][None, :]
    smf = sm.astype(jnp.float32)               # [W, E]

    # segment softmax via two scatter-matmuls (max via masked trick):
    # per-receiver max: use exp-free stabilization with a matmul-max —
    # MXU has no max-matmul, so compute max by (W,E) masked select +
    # row-reduce on the VPU.
    neg_inf = jnp.float32(-1e30)
    lg_masked = jnp.where(emask, lg, neg_inf)  # [E, H]
    # per-window-row max over matching edges: [W, H]
    per_w = jnp.where(sm[:, :, None], lg_masked[None, :, :], neg_inf)
    wmax = jnp.max(per_w, axis=1)              # [W, H]
    wmax = jnp.where(wmax > neg_inf / 2, wmax, 0.0)
    shifted = lg_masked - jnp.take_along_axis(
        wmax, jnp.clip(local, 0, W_BLOCK - 1), axis=0)     # [E, H]
    ex = jnp.where(emask, jnp.exp(shifted), 0.0)           # [E, H]
    denom = jnp.dot(smf, ex, preferred_element_type=jnp.float32)  # [W, H]
    inv = 1.0 / (denom + 1e-16)
    alpha = ex * jnp.take_along_axis(inv, jnp.clip(local, 0, W_BLOCK - 1),
                                     axis=0)               # [E, H]
    # expand per-head alpha across channels (head-major columns)
    alpha_full = jnp.repeat(alpha, channels, axis=1)        # [E, H*C]
    weighted = alpha_full * vals
    out_ref[...] = jnp.dot(smf, weighted,
                           preferred_element_type=jnp.float32)  # [W, H*C]


def fused_segment_softmax_spmm(logits: jnp.ndarray, values: jnp.ndarray,
                               perm: jnp.ndarray, local_rcv: jnp.ndarray,
                               win_start: jnp.ndarray,
                               edge_mask: jnp.ndarray, num_nodes: int,
                               num_heads: int, channels: int,
                               interpret: bool = False) -> jnp.ndarray:
    """alpha=segment_softmax(logits); out=scatter_add(alpha*values).

    logits [E, H], values [E, H*C] in ORIGINAL edge order; packing
    arrays from :func:`pack_blocks`.  Returns [num_nodes, H*C].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nblk = win_start.shape[0]
    lg = logits[perm].reshape(nblk, E_BLOCK, num_heads)
    vals = values[perm].reshape(nblk, E_BLOCK, num_heads * channels)
    local = local_rcv.reshape(nblk, E_BLOCK, 1)
    mask = edge_mask.reshape(nblk, E_BLOCK, 1)

    kernel = functools.partial(_kernel, num_heads=num_heads,
                               channels=channels)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, E_BLOCK, num_heads),
                         lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, E_BLOCK, num_heads * channels),
                         lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, E_BLOCK, 1), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, E_BLOCK, 1), lambda b, s: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, W_BLOCK, num_heads * channels),
                               lambda b, s: (b, 0, 0)),
    )

    def kernel3(starts_ref, lg_ref, vals_ref, local_ref, mask_ref,
                out_ref):
        _kernel(starts_ref, lg_ref.at[0], vals_ref.at[0], local_ref.at[0],
                mask_ref.at[0], out_ref.at[0], num_heads=num_heads,
                channels=channels)

    windows = pl.pallas_call(
        kernel3,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nblk, W_BLOCK, num_heads * channels), jnp.float32),
        interpret=interpret,
    )(win_start, lg, vals, local, mask)

    # overlap-add the block windows into the node table (windows may
    # overlap when consecutive blocks share a receiver range boundary)
    out = jnp.zeros((num_nodes + W_BLOCK, num_heads * channels),
                    jnp.float32)
    idx = win_start[:, None] + jnp.arange(W_BLOCK)[None, :]
    out = out.at[idx.reshape(-1)].add(
        windows.reshape(-1, num_heads * channels))
    return out[:num_nodes]


def segment_softmax_spmm_reference(logits, values, receivers, num_nodes):
    """XLA oracle with identical semantics."""
    from ..segment import segment_softmax, segment_sum
    alpha = segment_softmax(logits, receivers, num_nodes)   # [E, H]
    C = values.shape[1] // logits.shape[1]
    alpha_full = jnp.repeat(alpha, C, axis=1)
    return segment_sum(alpha_full * values, receivers, num_nodes)
