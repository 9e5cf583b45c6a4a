"""Cross-graph fusion pooling for pair tasks (DDI / DTI).

The reference computes, for every sample pair g, the all-pairs node
dot-product matrix ``S_g = X_mol_g @ X_pro_g^T`` and reduces it to
scalar statistics — implemented there as a **Python loop over the batch**
(/root/reference/src_1gp/layer.py:270-283, flagged as a hot spot in
SURVEY.md §3.3).

TPU-native version: scatter both node sets to dense per-graph tensors
[G, M, C] and compute one batched matmul [G, Mm, Mp] on the MXU, then
masked statistics.  Parity notes:
  * ``item.std()``  -> torch default is the *unbiased* std (n-1 divisor)
  * ``item.median()`` -> torch returns the lower middle element for even
    counts, i.e. sorted[(n-1)//2]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.segment import scatter_nodes_to_dense


def _pair_scores(xm, xp, m_graph, m_pos, m_count, p_graph, p_pos, p_count,
                 num_graphs, max_m, max_p):
    dm = scatter_nodes_to_dense(xm, m_graph, m_pos, num_graphs, max_m)
    dp = scatter_nodes_to_dense(xp, p_graph, p_pos, num_graphs, max_p)
    s = jnp.einsum("gmc,gpc->gmp", dm, dp,
                   preferred_element_type=jnp.float32)   # [G, Mm, Mp]
    mvalid = (jnp.arange(max_m)[None, :] < m_count[:, None])
    pvalid = (jnp.arange(max_p)[None, :] < p_count[:, None])
    valid = mvalid[:, :, None] & pvalid[:, None, :]      # [G, Mm, Mp]
    return s, valid


def dot_and_global_pool(xm, xp, m_graph, m_pos, m_count, p_graph, p_pos,
                        p_count, num_graphs, max_m, max_p, stats5: bool):
    """Per-pair dot-product statistics.

    stats5=False -> [max, mean] (dot_and_global_pool2, DDI/DTI towers)
    stats5=True  -> [max, mean, median, min, std] (dot_and_global_pool5)
    Empty graphs yield zeros.
    """
    s, valid = _pair_scores(xm, xp, m_graph, m_pos, m_count, p_graph, p_pos,
                            p_count, num_graphs, max_m, max_p)
    G = num_graphs
    flat = s.reshape(G, -1)
    vflat = valid.reshape(G, -1)
    cnt = jnp.sum(vflat, axis=1).astype(flat.dtype)       # [G]
    safe_cnt = jnp.maximum(cnt, 1.0)
    neg = jnp.where(vflat, flat, -jnp.inf)
    pos = jnp.where(vflat, flat, jnp.inf)
    mx = jnp.max(neg, axis=1)
    mean = jnp.sum(jnp.where(vflat, flat, 0.0), axis=1) / safe_cnt
    empty = cnt < 0.5
    mx = jnp.where(empty, 0.0, mx)
    mean = jnp.where(empty, 0.0, mean)
    if not stats5:
        return jnp.stack([mx, mean], axis=-1)
    mn = jnp.where(empty, 0.0, jnp.min(pos, axis=1))
    # unbiased std over the valid entries
    d = jnp.where(vflat, flat - mean[:, None], 0.0)
    var = jnp.sum(d * d, axis=1) / jnp.maximum(cnt - 1.0, 1.0)
    std = jnp.where(empty, 0.0, jnp.sqrt(var))
    # torch lower median: sorted[(n-1)//2]; pad with +inf so real entries
    # sort first
    srt = jnp.sort(pos, axis=1)
    med_idx = jnp.clip(((cnt - 1.0) / 2.0).astype(jnp.int32), 0,
                       flat.shape[1] - 1)
    med = jnp.take_along_axis(srt, med_idx[:, None], axis=1)[:, 0]
    med = jnp.where(empty, 0.0, med)
    return jnp.stack([mx, mean, med, mn, std], axis=-1)
