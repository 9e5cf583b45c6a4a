"""Optimizers: Adam / SGD / Ranger, with runtime-mutable learning rate.

Ranger (reference ranger.py:31-207, vendored byte-identical in all three
trees) = RAdam + Lookahead + Gradient Centralization, reimplemented as
optax transforms:

  * RAdam: ``scale_by_radam_ref`` — the reference's exact update math
    (betas=(0.95, 0.999), eps=1e-5, N_sma_threshhold=5, torch eps
    placement); oracle-tested against a numpy transcription of the
    algorithm in tests/test_parity_extra.py.
  * Gradient centralization (use_gc=True, gc_conv_only=False): subtract
    the per-output-unit mean from gradients of every parameter with
    ndim > 1.  torch weights are [out, in...] and centralize over dims
    1..n; flax kernels are [in..., out], so we centralize over all axes
    *except the last*.
  * Lookahead (alpha=0.5, every k steps): slow weights kept inside the
    transformation state (no special parameter container), syncing
    fast -> slow + alpha*(fast - slow) every k-th step.

The whole optimizer is wrapped in ``optax.inject_hyperparams`` so the
ReduceLROnPlateau scheduler (reference trainer.py:55-56) can overwrite
``opt_state.hyperparams['learning_rate']`` between epochs without
recompiling.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def gradient_centralization() -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g
        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class RAdamRefState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_radam_ref(b1: float = 0.95, b2: float = 0.999,
                       eps: float = 1e-5,
                       threshold: float = 5.0) -> optax.GradientTransformation:
    """RAdam with the reference Ranger's exact update math
    (reference ranger.py:141-186).  Differs from ``optax.radam`` in eps
    placement: the reference divides by ``sqrt(v) + eps`` and folds the
    ``sqrt(1 - b2^t)`` bias correction into the step size, so eps is NOT
    scaled by the correction (optax adds eps to the corrected
    ``sqrt(v_hat)``) — a ~30x larger effective eps at step 1.  The
    non-rectified branch (N_sma <= threshold) is bias-corrected momentum
    with no second-moment denominator, as in the reference."""

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamRefState(count=jnp.zeros([], jnp.int32), mu=z,
                             nu=jax.tree_util.tree_map(jnp.zeros_like,
                                                       params))

    def update_fn(updates, state, params=None):
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        b2t = b2 ** tf
        n_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_max - 2.0 * tf * b2t / (1.0 - b2t)
        bias1 = 1.0 - b1 ** tf
        rect = jnp.sqrt((1.0 - b2t) * (n_sma - 4.0) / (n_max - 4.0)
                        * (n_sma - 2.0) / n_sma
                        * n_max / (n_max - 2.0)) / bias1
        plain = 1.0 / bias1
        use_rect = n_sma > threshold

        def step(m, v):
            rectified = rect * m / (jnp.sqrt(v) + eps)
            return jnp.where(use_rect, rectified, plain * m)

        out = jax.tree_util.tree_map(step, mu, nu)
        return out, RAdamRefState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    count: jnp.ndarray
    slow: optax.Params


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead as a terminal transform over the incoming update deltas."""

    def init_fn(params):
        return LookaheadState(count=jnp.zeros([], jnp.int32),
                              slow=jax.tree_util.tree_map(jnp.copy, params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % k) == 0

        def leaf(u, p, s):
            fast_new = p + u
            slow_new = jnp.where(sync, s + alpha * (fast_new - s), s)
            upd = jnp.where(sync, slow_new - p, u)
            return upd, slow_new

        flat_u, tdef = jax.tree_util.tree_flatten(updates)
        flat_p = tdef.flatten_up_to(params)
        flat_s = tdef.flatten_up_to(state.slow)
        out = [leaf(u, p, s) for u, p, s in zip(flat_u, flat_p, flat_s)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_slow = tdef.unflatten([o[1] for o in out])
        return new_updates, LookaheadState(count=count, slow=new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(name: str, lr: float, k: int = 6) -> optax.GradientTransformation:
    """Build the named optimizer with a mutable learning_rate hyperparam."""
    name = name.strip()

    if name == "Adam":
        def make(learning_rate):
            # torch Adam defaults: betas (0.9, 0.999), eps 1e-8
            return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "SGD":
        def make(learning_rate):
            return optax.sgd(learning_rate)
    elif name == "Ranger":
        def make(learning_rate):
            return optax.chain(
                gradient_centralization(),
                scale_by_radam_ref(b1=0.95, b2=0.999, eps=1e-5,
                                   threshold=5.0),
                optax.scale_by_learning_rate(learning_rate),
                lookahead(k=k, alpha=0.5),
            )
    else:
        raise ValueError(f"Error optimizer argv: {name!r}")
    return optax.inject_hyperparams(make)(learning_rate=lr)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, jnp.asarray(opt_state.hyperparams["learning_rate"]).dtype)
    return opt_state


class ReduceLROnPlateau:
    """Host-side torch ReduceLROnPlateau parity (mode='min').

    new_lr = max(lr * factor, min_lr) after `patience` epochs without
    improvement (reference trainer.py:55-56: factor=lr_reduce_rate,
    patience=lr_reduce_patience, min_lr=1e-6)."""

    def __init__(self, factor: float = 0.7, patience: int = 20,
                 min_lr: float = 1e-6, threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best: Optional[float] = None
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if self.best is None or metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
            return lr
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr
