"""Segment (scatter/gather) primitives — XLA implementations.

These are the TPU-native equivalents of the reference's native kernel
surface (SURVEY.md §2.b): ``torch_scatter.scatter``, PyG's segment
``softmax`` and ``torch_sparse`` SpMM.  XLA lowers ``jax.ops.segment_*``
to efficient one-hot-matmul or scatter HLOs on TPU; Pallas variants for
the fused hot path live in :mod:`glam_tpu.ops.pallas`.

All functions assume the GraphBatch padding convention (padded edges
point at padding nodes) so **no masking is required** here: padded
contributions land in padding segments.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Mean with zero for empty segments (torch_scatter 'mean' parity)."""
    tot = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones_like(segment_ids, jnp.float32),
                              segment_ids, num_segments=num_segments)
    cnt = jnp.maximum(cnt, 1.0)
    return tot / cnt.reshape((-1,) + (1,) * (tot.ndim - 1))


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    """Max with -inf for empty segments."""
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids: jnp.ndarray, num_segments: int,
                  weights: jnp.ndarray | None = None) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape[0], jnp.float32)
    if weights is not None:
        ones = ones * weights
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Numerically-stable softmax within segments.

    Exact parity with ``torch_geometric.utils.softmax`` (used at reference
    layer.py:51,95): subtract the per-segment max, exponentiate, divide by
    the per-segment sum **plus 1e-16** (PyG's epsilon).  Entries of empty /
    padding segments come out finite (their value is irrelevant — padded
    messages aggregate into padding nodes)."""
    seg_max = jax.ops.segment_max(logits, segment_ids,
                                  num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return ex / (denom[segment_ids] + 1e-16)


def scatter_nodes_to_dense(x: jnp.ndarray, node_graph: jnp.ndarray,
                           node_pos: jnp.ndarray, num_graphs: int,
                           max_nodes: int) -> jnp.ndarray:
    """Scatter flat node features [N, C] to dense [G, max_nodes, C].

    Positions beyond a graph's node count stay zero.  ``node_pos`` is
    precomputed by the batcher; nodes with pos >= max_nodes are dropped
    (the batcher guarantees this cannot happen for real nodes)."""
    C = x.shape[-1]
    dense = jnp.zeros((num_graphs, max_nodes, C), x.dtype)
    ok = node_pos < max_nodes
    g = jnp.where(ok, node_graph, num_graphs - 1)
    p = jnp.where(ok, node_pos, max_nodes - 1)
    contrib = jnp.where(ok[:, None], x, 0.0)
    return dense.at[g, p].add(contrib)


def segment_topk_by_channel(x: jnp.ndarray, segment_ids: jnp.ndarray,
                            node_pos: jnp.ndarray, num_segments: int,
                            max_nodes: int, k: int) -> jnp.ndarray:
    """Per-graph top-k node feature rows ranked by the LAST channel.

    Parity with PyG ``global_sort_pool(x, batch, k)`` (reference
    layer.py:202): sort nodes of each graph by x[:, -1] descending, take
    the first k rows, flatten to [G, k*C]; graphs with fewer than k nodes
    are zero-padded."""
    C = x.shape[-1]
    dense = scatter_nodes_to_dense(x, segment_ids, node_pos, num_segments,
                                   max_nodes)  # [G, M, C]
    # mark empty slots with -inf key so they sort last
    occupied = scatter_nodes_to_dense(
        jnp.ones((x.shape[0], 1), x.dtype), segment_ids, node_pos,
        num_segments, max_nodes)[..., 0] > 0  # [G, M]
    keys = jnp.where(occupied, dense[..., -1], -jnp.inf)
    _, idx = jax.lax.top_k(keys, k)                      # [G, k]
    rows = jnp.take_along_axis(dense, idx[..., None], axis=1)  # [G, k, C]
    valid = jnp.take_along_axis(occupied, idx, axis=1)   # [G, k]
    rows = jnp.where(valid[..., None], rows, 0.0)
    return rows.reshape(num_segments, k * C)
