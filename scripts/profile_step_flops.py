"""Measure achieved FLOP/s of the bench train step on chip.

Uses the exact bench.py workload/structure (which reproducibly compiles
fast on the tunneled remote-compile service) and XLA's own
cost_analysis() for the compiled flop count, giving an honest
utilization number against the chip's peak.  This tells us whether a
Pallas kernel rethink has headroom to win (NEXT.md item 2) or whether
the XLA segment path is already compute-bound.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench  # reuse the exact workload


def main():
    batch = bench.make_batch(512)
    variables = bench.model.init(jax.random.PRNGKey(0), batch, True)
    from glam_tpu.train.optim import make_optimizer
    from glam_tpu.train.trainer import TrainState
    tx = make_optimizer("Adam", 1e-3)
    state = TrainState.create(apply_fn=bench.model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))

    def train_step(state, b, rng):
        def compute(p):
            out = bench.model.apply({"params": p}, b, False,
                                    rngs={"dropout": rng})
            return bench.loss_fn(out.astype(jnp.float32), b.y, b.graph_mask)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads=grads), loss

    S = 8
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x] * S), batch)

    def train_scan(state, sb, rng):
        def body(st, b):
            st, loss = train_step(st, b, rng)
            return st, loss
        state, losses = jax.lax.scan(body, state, sb)
        return state, jnp.mean(losses)

    key = jax.random.PRNGKey(1)
    lowered = jax.jit(train_scan, donate_argnums=(0,)).lower(
        state, stacked, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))

    state2, loss = compiled(state, stacked, key)
    jax.block_until_ready(loss)
    n_iter = 30
    t0 = time.perf_counter()
    st = state2
    for _ in range(n_iter):
        st, loss = compiled(st, stacked, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    per_disp = dt / n_iter
    edges = int(np.asarray(batch.edge_mask).sum())
    nodes = int(np.asarray(batch.node_mask).sum())
    print(f"devices: {jax.devices()}")
    print(f"real nodes {nodes}, real edges {edges}, "
          f"budget nodes {batch.nodes.shape[0]} edges {batch.senders.shape[0]}")
    print(f"compiled flops/dispatch: {flops:.3e}  bytes: {bytes_acc:.3e}")
    print(f"dispatch time: {per_disp*1e3:.2f} ms  "
          f"({per_disp/S*1e3:.3f} ms/step)")
    print(f"achieved: {flops/per_disp/1e12:.2f} TFLOP/s, "
          f"{bytes_acc/per_disp/1e9:.1f} GB/s")
    print(f"edges/s: {edges*S*n_iter/dt:.3e}")


if __name__ == "__main__":
    main()
