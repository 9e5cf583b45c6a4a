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
from typing import Optional, Tuple

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
    emaskf = mask_ref[...]                     # [E_BLOCK, 1] float32 0/1
    eb = lg.shape[0]

    # scatter matrix: sm[w, e] = 1 iff local[e] == w and edge real.
    # All per-receiver reductions AND the gathers back to edges are
    # expressed through this one-hot matrix on the MXU — Mosaic has no
    # general gather, and one-hot matmul is the fast path anyway.
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (W_BLOCK, eb), 0)
    onehot = (w_ids == local[:, 0][None, :]).astype(jnp.float32)
    smf = onehot * emaskf[:, 0][None, :]       # [W, E] f32 0/1

    # per-receiver max without boolean-minor-dim broadcasts (Mosaic
    # restriction): shift logits positive, mask by multiplying with the
    # one-hot scatter matrix, reduce per head (H is tiny/static).
    lmin = jnp.min(lg)                          # block-wide lower bound
    pos = (lg - lmin + 1.0) * emaskf            # >=1 valid, 0 padded
    wmax_cols = []
    for h in range(num_heads):
        per_w = smf * pos[:, h][None, :]        # [W, E]
        wmax_cols.append(jnp.max(per_w, axis=1, keepdims=True))
    wmax = jnp.concatenate(wmax_cols, axis=1) + (lmin - 1.0)  # [W, H]
    # gather wmax back to edges: smf.T @ wmax  (one-hot matmul gather)
    edge_max = jnp.dot(smf.T, wmax, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    # padded slots get edge_max=0 (zero smf column); exp of their RAW
    # logit could overflow to inf and poison the block via inf*0=NaN,
    # so zero their shifted logits before exponentiating
    shifted = (lg - edge_max) * emaskf                       # [E, H]
    ex = jnp.exp(shifted) * emaskf                           # [E, H]
    denom = jnp.dot(smf, ex, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [W, H]
    inv = 1.0 / (denom + 1e-16)
    edge_inv = jnp.dot(smf.T, inv, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    alpha = ex * edge_inv                                   # [E, H]
    # expand per-head alpha across channels (head-major columns) with a
    # static 0/1 expander matmul — Mosaic supports neither jnp.repeat
    # nor (E, H*C) -> (E, H, C) shape casts
    col = jax.lax.broadcasted_iota(jnp.int32,
                                   (num_heads, num_heads * channels), 1)
    row = jax.lax.broadcasted_iota(jnp.int32,
                                   (num_heads, num_heads * channels), 0)
    expander = (col // channels == row).astype(jnp.float32)  # [H, H*C]
    alpha_full = jnp.dot(alpha, expander,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [E, H*C]
    weighted = alpha_full * vals
    out_ref[...] = jnp.dot(smf, weighted,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # [W, H*C]


def fused_segment_softmax_spmm(logits: jnp.ndarray, values: jnp.ndarray,
                               perm: jnp.ndarray, local_rcv: jnp.ndarray,
                               win_start: jnp.ndarray,
                               edge_mask: jnp.ndarray, num_nodes: int,
                               num_heads: int, channels: int,
                               interpret: Optional[bool] = None
                               ) -> jnp.ndarray:
    """alpha=segment_softmax(logits); out=scatter_add(alpha*values).

    logits [E, H], values [E, H*C] in ORIGINAL edge order; packing
    arrays from :func:`pack_blocks`.  Returns [num_nodes, H*C].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # TPU kernels can't run on the CPU backend; fall back to the
        # interpreter there (tests / debugging)
        interpret = jax.default_backend() == "cpu"
    nblk = win_start.shape[0]
    lg = logits[perm].reshape(nblk, E_BLOCK, num_heads)
    vals = values[perm].reshape(nblk, E_BLOCK, num_heads * channels)
    local = local_rcv.reshape(nblk, E_BLOCK, 1)
    mask = edge_mask.astype(jnp.float32).reshape(nblk, E_BLOCK, 1)

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
