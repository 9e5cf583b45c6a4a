"""Graph-aware normalization layers (flax.linen).

TPU-native re-implementations of the reference's norm wrappers
(/root/reference/src_1gp/layer.py:107-194) with padded-batch semantics:
statistics are computed over *real* nodes only (node_mask) and per-graph
statistics use the GraphBatch padding-graph convention so padding never
pollutes real graphs.

Parity targets (PyG 1.7):
  _BatchNorm     torch BatchNorm1d(eps=1e-5, momentum=0.1) over nodes
  _LayerNorm     PyG graph LayerNorm: scalar mean/var per graph over all
                 node*channel entries, affine per channel
  _PairNorm      PyG PairNorm(scale=1): per-graph center, divide by
                 sqrt(eps + mean squared row-norm of the graph)
  _GraphSizeNorm x_i / sqrt(|V_g|)
  _None          identity
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_count, segment_sum


class NoNorm(nn.Module):
    features: int = 0

    @nn.compact
    def __call__(self, x, *, node_graph=None, node_mask=None, n_node=None,
                 use_running_average: bool = True, stats_weight=None):
        return x


class BatchNorm(nn.Module):
    """Masked BatchNorm1d with torch semantics (biased var to normalize,
    unbiased var into running stats, momentum 0.1).

    ``axis_name`` (optional) joins the batch statistics across a named
    vmap/shard axis: the masked (count, sum, sq-sum) accumulators are
    psum'd over that axis before normalizing, so B vmapped instances
    normalize with ONE joint batch statistic — the packed-batch
    semantics of the dense path (used by the batched sharded pair
    forward, parallel/sharded_model.py).  ``stats_weight`` (call-time
    scalar) weights this instance's contribution to those joint
    statistics (0 = excluded, e.g. a padding pair); the normalization
    itself is always applied to every row."""
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, node_graph=None, node_mask=None, n_node=None,
                 use_running_average: bool = True, stats_weight=None):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        scale = self.param("scale", lambda k, s: jnp.ones(s), (self.features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (self.features,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if node_mask is None:
                m = jnp.ones((x.shape[0], 1), x.dtype)
            else:
                m = node_mask.astype(x.dtype)[:, None]
            if stats_weight is not None:
                m = m * stats_weight
            psum = ((lambda v: jax.lax.psum(v, self.axis_name))
                    if self.axis_name is not None else (lambda v: v))
            cnt = jnp.maximum(psum(jnp.sum(m)), 1.0)
            mean = psum(jnp.sum(x * m, 0)) / cnt
            var = psum(jnp.sum(((x - mean) ** 2) * m, 0)) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (x - mean) * inv * scale + bias


class GraphLayerNorm(nn.Module):
    """PyG LayerNorm(in_channels) with batch: scalar mean/var per graph."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, node_graph=None, node_mask=None, n_node=None,
                 use_running_average: bool = True, stats_weight=None):
        scale = self.param("scale", lambda k, s: jnp.ones(s), (self.features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (self.features,))
        if node_graph is None:
            mean = jnp.mean(x)
            xc = x - mean
            var = jnp.mean(xc ** 2)
            out = xc / jnp.sqrt(var + self.eps)
        else:
            G = n_node.shape[0]
            norm = jnp.maximum(n_node.astype(x.dtype), 1.0) * x.shape[-1]
            mean = segment_sum(jnp.sum(x, -1), node_graph, G) / norm
            xc = x - mean[node_graph][:, None]
            var = segment_sum(jnp.sum(xc * xc, -1), node_graph, G) / norm
            out = xc / jnp.sqrt(var + self.eps)[node_graph][:, None]
        return out * scale + bias


class PairNorm(nn.Module):
    """PyG PairNorm(scale=1, scale_individually=False, eps=1e-5)."""
    features: int = 0
    scale: float = 1.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, node_graph=None, node_mask=None, n_node=None,
                 use_running_average: bool = True, stats_weight=None):
        if node_graph is None:
            xc = x - jnp.mean(x, 0)
            ms = jnp.mean(jnp.sum(xc * xc, -1))
            return self.scale * xc / jnp.sqrt(self.eps + ms)
        G = n_node.shape[0]
        cnt = jnp.maximum(n_node.astype(x.dtype), 1.0)
        mean = segment_sum(x, node_graph, G) / cnt[:, None]
        xc = x - mean[node_graph]
        ms = segment_sum(jnp.sum(xc * xc, -1), node_graph, G) / cnt
        return self.scale * xc / jnp.sqrt(self.eps + ms)[node_graph][:, None]


class GraphSizeNorm(nn.Module):
    """PyG GraphSizeNorm: x_i / sqrt(num nodes of graph(i))."""
    features: int = 0

    @nn.compact
    def __call__(self, x, *, node_graph=None, node_mask=None, n_node=None,
                 use_running_average: bool = True, stats_weight=None):
        if node_graph is None:
            return x / jnp.sqrt(jnp.asarray(x.shape[0], x.dtype))
        inv = jnp.where(n_node > 0,
                        1.0 / jnp.sqrt(jnp.maximum(
                            n_node.astype(x.dtype), 1.0)), 1.0)
        return x * inv[node_graph][:, None]


NORMS = {
    "_None": NoNorm,
    "_BatchNorm": BatchNorm,
    "_LayerNorm": GraphLayerNorm,
    "_PairNorm": PairNorm,
    "_GraphSizeNorm": GraphSizeNorm,
}


def get_norm(name: str, features: int,
             axis_name: Optional[str] = None) -> nn.Module:
    """``axis_name`` applies to _BatchNorm only: join batch statistics
    across that named vmap/shard axis (see BatchNorm.axis_name)."""
    key = name.strip()
    if key not in NORMS:
        raise KeyError(f"unknown norm {name!r}; have {sorted(NORMS)}")
    if key == "_BatchNorm" and axis_name is not None:
        return BatchNorm(features=features, axis_name=axis_name)
    return NORMS[key](features=features)
