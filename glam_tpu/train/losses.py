"""Loss registry — all 14 reference loss names (reference loss.py:39-58).

Each loss is a pure function ``loss(pred, target, weight=None) -> scalar``
over already-masked (flat) arrays; NaN-target masking is handled by the
trainers (reference semantics: mask y >= 0 before the loss,
trainer.py:244-245).  torch-parity notes:
  huber/smae   torch SmoothL1Loss (beta=1)
  bce          expects probabilities; bcel expects logits
  kl           torch KLDivLoss default reduction 'mean' is the *element*
               mean of target*(log(target)-input) with input=log-probs
  hinge        torch HingeEmbeddingLoss (targets in {1,-1})
  focal        FocalLoss(alpha=0.25, gamma=2) over 2-class logits
  mtce         MultiTargetCrossEntropy: log_softmax over class dim + NLL
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _wmean(x, weight):
    if weight is None:
        return jnp.mean(x)
    w = weight.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def mse(pred, target, weight=None):
    return _wmean((pred - target) ** 2, weight)


def mae(pred, target, weight=None):
    return _wmean(jnp.abs(pred - target), weight)


def smooth_l1(pred, target, weight=None):
    d = jnp.abs(pred - target)
    return _wmean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5), weight)


def bce_probs(pred, target, weight=None):
    p = jnp.clip(pred, 1e-12, 1.0 - 1e-12)
    return _wmean(-(target * jnp.log(p) + (1 - target) * jnp.log1p(-p)),
                  weight)


def bce_logits(pred, target, weight=None):
    # numerically-stable BCEWithLogits
    loss = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))
    return _wmean(loss, weight)


def cross_entropy(logits, target, weight=None, class_weight=None):
    """torch CrossEntropyLoss: logits [..., C], integer targets [...]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = target.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = class_weight[tgt]
        base = weight if weight is not None else jnp.ones_like(nll)
        w = w * base
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return _wmean(nll, weight)


def nll(logp, target, weight=None):
    tgt = target.astype(jnp.int32)
    return _wmean(-jnp.take_along_axis(logp, tgt[..., None],
                                       axis=-1)[..., 0], weight)


def kl_div(log_pred, target, weight=None):
    t = jnp.maximum(target, 1e-12)
    return _wmean(target * (jnp.log(t) - log_pred), weight)


def hinge_embedding(pred, target, weight=None, margin: float = 1.0):
    loss = jnp.where(target > 0, pred, jnp.maximum(0.0, margin - pred))
    return _wmean(loss, weight)


def focal(logits, target, weight=None, alpha: float = 0.25,
          gamma: float = 2.0):
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = target.astype(jnp.int32)
    ce_i = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce_i)
    return _wmean(alpha * (1 - pt) ** gamma * ce_i, weight)


def multi_target_ce(logits, target, weight=None):
    """logits [N, T, C], integer targets [N, T] (reference loss.py:20-36)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(target.astype(jnp.int32), 0, logits.shape[-1] - 1)
    nll_i = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return _wmean(nll_i, weight)


LOSSES: Dict[str, Callable] = {
    "mse": mse,
    "mae": mae,
    "huber": smooth_l1,
    "smae": smooth_l1,
    "bce": bce_probs,
    "bcen": bce_probs,
    "bcel": bce_logits,
    "bceln": bce_logits,
    "mtce": multi_target_ce,
    "kl": kl_div,
    "hinge": hinge_embedding,
    "nll": nll,
    "ce": cross_entropy,
    "wce": cross_entropy,   # class-weighted CE (DTI screening trainer)
    "focal": focal,
}


def get_loss(name: str) -> Callable:
    if name not in LOSSES:
        raise ValueError(f"loss not found: {name!r}")
    return LOSSES[name]


# losses that consume 2-class logit pairs per task (trainer picks the
# (N,T,2) reshape path, reference dataset.py:40-45)
CE_STYLE = frozenset({"ce", "mtce", "wce"})
# losses on 1-logit-per-task outputs
BCE_STYLE = frozenset({"bce", "bcel", "bcen", "bceln"})
