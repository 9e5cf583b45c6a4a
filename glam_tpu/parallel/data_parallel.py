"""Data parallelism over device meshes (jax.sharding + shard_map).

The reference has **no** distributed layer (SURVEY.md §2.c — its only
parallelism is one-OS-process-per-trial on separate GPUs).  Here the
batch dimension of graph batches is sharded over a ``Mesh`` axis
("data"): each device holds its own padded sub-batch (stacked leading
device axis), computes loss/grads locally, and gradients are averaged
with ``lax.pmean`` over ICI.  Parameters and optimizer state are
replicated.

Usage:
    mesh = make_mesh(jax.devices(), ("data",))
    step = make_dp_train_step(model, loss_fn, tx, mesh)
    state, loss = step(state, stacked_batch, rng)

``stacked_batch`` is a GraphBatch whose arrays all carry a leading
device axis of size mesh.shape['data'] (see ``stack_batches``).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import GraphBatch


def make_mesh(devices: Sequence, axis_names=("data",),
              shape=None) -> Mesh:
    devs = np.asarray(devices)
    if shape is not None:
        devs = devs.reshape(shape)
    return Mesh(devs, axis_names)


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack per-device GraphBatches along a new leading device axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *batches)


def make_dp_train_step(model, loss_fn: Callable, mesh: Mesh,
                       axis: str = "data"):
    """Jitted data-parallel train step over ``mesh``.

    The returned function has signature (state, stacked_batch, rng) ->
    (state, mean_loss).  Gradients are pmean-ed over the mesh axis, so
    the update is identical on every device (params replicated).
    """
    from ..train.trainer import TrainState  # local import, avoids cycle

    def per_shard_grads(params, batch_stats, batch: GraphBatch, rng, step):
        # shard_map keeps the sharded leading axis at local size 1 — drop it
        batch = jax.tree_util.tree_map(lambda a: a[0], batch)
        drop_rng = jax.random.fold_in(
            rng, step * jax.lax.axis_size(axis) + jax.lax.axis_index(axis))

        def compute(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
                out, updates = model.apply(
                    variables, batch, False, rngs={"dropout": drop_rng},
                    mutable=["batch_stats"])
                new_stats = updates.get("batch_stats", batch_stats)
            else:
                out = model.apply(variables, batch, False,
                                  rngs={"dropout": drop_rng})
                new_stats = batch_stats
            # 1/D pre-scale: shard_map's transpose auto-psums grads
            # w.r.t. the captured replicated params, so the grads that
            # come back are already summed over the mesh — scaling the
            # local loss turns that sum into the cross-shard mean.  (An
            # explicit pmean on top of the implicit psum would be D x
            # too large.)
            loss = loss_fn(out, batch.y, batch.graph_mask) \
                / jax.lax.axis_size(axis)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        loss = jax.lax.psum(loss, axis)
        new_stats = jax.lax.pmean(new_stats, axis) if new_stats else new_stats
        return grads, loss, new_stats

    batch_spec = P(axis)
    rep = P()

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, stacked_batch: GraphBatch, rng):
        shard_fn = jax.shard_map(
            partial(per_shard_grads, state.params, state.batch_stats),
            mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: batch_spec,
                                             stacked_batch), rep, rep),
            out_specs=(rep, rep, rep),
        )
        grads, loss, new_stats = shard_fn(stacked_batch, rng,
                                          state.step)
        state = state.apply_gradients(grads=grads)
        if state.batch_stats:
            state = state.replace(batch_stats=new_stats)
        return state, loss

    return train_step


def make_dp_eval_step(model, loss_fn: Callable, mesh: Mesh,
                      axis: str = "data"):
    def per_shard(params, batch_stats, batch: GraphBatch):
        batch = jax.tree_util.tree_map(lambda a: a[0], batch)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch, True)
        loss = jax.lax.pmean(loss_fn(out, batch.y, batch.graph_mask), axis)
        return out[None], loss

    batch_spec = P(axis)

    @jax.jit
    def eval_step(params, batch_stats, stacked_batch):
        fn = jax.shard_map(
            partial(per_shard, params, batch_stats),
            mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: batch_spec,
                                             stacked_batch),),
            out_specs=(batch_spec, P()),
        )
        return fn(stacked_batch)

    return eval_step
