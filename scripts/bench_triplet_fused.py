"""On-chip validation + benchmark of the v2 fused triplet kernel.

Compares, in ONE process (tunnel executable quality varies between
processes — see ARCHITECTURE.md §2):
  1. compiled forward/grad parity vs the XLA oracle on a molecular batch
  2. train-step throughput: XLA segment path vs fused Pallas path

Usage: python scripts/bench_triplet_fused.py [--bg 512] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from glam_tpu.chem.featurize import smiles_to_arrays
from glam_tpu.data.batching import GraphLoader
from glam_tpu.data.graph import GraphArrays
from glam_tpu.nn.model import Architecture, ModelConfig
from glam_tpu.train.optim import make_optimizer
from glam_tpu.train.trainer import TrainState, make_loss_fn

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "Clc1cc2c(Oc3ccccc3C3CN(CC32)C)cc1",
    "CCN(CC)CCNC(=O)c1ccc(cc1)N", "O=C(O)c1ccccc1Nc1cccc(c1)C(F)(F)F",
    "CC1=CC(=O)C=CC1=O", "c1ccc2c(c1)ccc1ccccc12",
]


def make_batch(bg, pallas_pack):
    rng = np.random.RandomState(0)
    graphs = []
    for i in range(bg):
        x, s, r, e = smiles_to_arrays(SMILES[i % len(SMILES)])
        graphs.append(GraphArrays(
            nodes=x, edges=e, senders=s, receivers=r,
            y=np.asarray([rng.randn()], np.float32), smi=""))
    loader = GraphLoader(graphs, bg, 1, ell_k=None,
                         pallas_pack=pallas_pack)
    return next(iter(loader))


def bench_variant(name, batch, iters, scan_steps=8):
    cfg = ModelConfig(mol_block="_TripletMessage",
                      mol_readout="GlobalPool5", hid_dim_alpha=4,
                      e_dim=1024, message_steps=3, max_nodes=40,
                      graph_do="_None()", flat_do="_None()",
                      end_do="_None()", pre_act="CELU",
                      graph_act="CELU", flat_act="CELU")
    model = Architecture(cfg)
    loss_fn = make_loss_fn("regression", "mse", 1)
    variables = model.init(jax.random.PRNGKey(0), batch, True)
    tx = make_optimizer("Adam", 1e-3)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))

    def train_step(state, b, rng):
        def compute(p):
            out = model.apply({"params": p}, b, False,
                              rngs={"dropout": rng})
            return loss_fn(out, b.y, b.graph_mask)
        loss, grads = jax.value_and_grad(compute)(state.params)
        return state.apply_gradients(grads=grads), loss

    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * scan_steps), batch)

    def train_scan(state, sb, rng):
        def body(st, b):
            st, loss = train_step(st, b, rng)
            return st, loss
        state, losses = jax.lax.scan(body, state, sb)
        return state, jnp.mean(losses)

    step = jax.jit(train_scan, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, loss = step(state, stacked, key)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, stacked, key)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    edges = int(np.asarray(batch.edge_mask).sum())
    eps = edges * scan_steps * iters / dt
    print(f"{name}: {eps/1e6:.1f}M edges/s "
          f"(compile {compile_s:.1f}s, loss {float(loss):.4f})")
    return eps


def parity_check(batch_packed):
    """Compiled fwd+grad parity: pack path vs segment path, same params.

    Runs under matched matmul precision: the fused kernel computes its
    MXU dots at Precision.HIGHEST, while XLA's chip default is
    single-pass bf16 (~1e-2 relative) — the kernel is the MORE exact
    side, so the oracle must be raised to compare at 1e-6."""
    jax.config.update("jax_default_matmul_precision", "highest")
    cfg = ModelConfig(max_nodes=40, e_dim=128,
                      mol_block="_TripletMessage")
    model = Architecture(cfg)
    plain = batch_packed._replace(pack_perm=None, pack_local=None,
                                  pack_start=None, pack_mask=None,
                                  pack_snd=None)
    v = model.init(jax.random.PRNGKey(0), plain, True)

    def loss(params, b):
        return jnp.sum(model.apply({"params": params}, b, True) ** 2)

    la, ga = jax.jit(jax.value_and_grad(loss))(v["params"], plain)
    lb, gb = jax.jit(jax.value_and_grad(loss))(v["params"],
                                               batch_packed)
    jax.block_until_ready(lb)
    rel = abs(float(la) - float(lb)) / max(abs(float(la)), 1e-9)
    gmax = max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree_util.tree_leaves(ga),
                               jax.tree_util.tree_leaves(gb)))
    print(f"compiled parity: loss rel err {rel:.2e}, "
          f"max param-grad abs diff {gmax:.2e}")
    jax.config.update("jax_default_matmul_precision", None)
    return rel, gmax


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bg", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    packed = make_batch(args.bg, True)
    print(f"batch: {int(np.asarray(packed.edge_mask).sum())} real edges, "
          f"{packed.pack_start.shape[0]} blocks")
    parity_check(make_batch(64, True))
    plain = packed._replace(pack_perm=None, pack_local=None,
                            pack_start=None, pack_mask=None,
                            pack_snd=None)
    xla = bench_variant("segment(XLA)", plain, args.iters)
    fused = bench_variant("fused(Pallas v2)", packed, args.iters)
    print(f"speedup: {fused/xla:.2f}x")
