"""Throughput of the sharded DTI trainer vs --pair_batch B.

Measures optimizer-step pairs/sec of ShardedPairTrainer's compiled
train dispatch at B in {1, 4, 16} on the virtual-CPU mesh (VERDICT
round-3 item 1 "Done" criteria; real-ICI numbers are hardware-blocked,
this measures the executable shape and vmap scaling, host-contended).

Run: python scripts/bench_pair_batch.py [--shards 4] [--steps 20]
"""
import argparse
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batches", default="1,4,16")
    args = ap.parse_args()

    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer

    ds = BindingDBDataset("datasets/dti_demo")
    base = {"dataset": "bindingdb_c", "pro_shards": args.shards,
            "lr": 1e-3, "seed": 3, "e_dim": 64, "hid_dim_alpha": 4,
            "message_steps": 3, "mol_block": "_TripletMessage",
            "pro_block": "_GCNConv", "pro_readout": "GlobalLAPool",
            "mol_readout": "GlobalPool5", "epochs": 1}
    rows = []
    for B in [int(x) for x in args.batches.split(",")]:
        tr = ShardedPairTrainer({**base, "pair_batch": B}, ds,
                                task="pair_binary",
                                work_dir="/tmp/bench_pair_batch")
        if B == 1:
            mol_b, pro_in, y = tr._sample(ds.train[0])
            extra = (jnp.asarray(y),)
        else:
            mol_b, pro_in, y, w = tr._collate(ds.train[:B])
            extra = (y, w)
        p, o = tr.params, tr.opt_state
        p, o, lv = tr._step(p, o, mol_b, pro_in, *extra)  # compile
        jax.block_until_ready(lv)
        t0 = time.time()
        for _ in range(args.steps):
            p, o, lv = tr._step(p, o, mol_b, pro_in, *extra)
        jax.block_until_ready(lv)
        dt = time.time() - t0
        pairs_s = B * args.steps / dt
        rows.append((B, dt / args.steps * 1e3, pairs_s))
        print(f"B={B:3d}  step {dt / args.steps * 1e3:8.1f} ms  "
              f"{pairs_s:8.2f} pairs/s")
    b1 = rows[0][2]
    for B, ms, ps in rows:
        print(f"B={B:3d}: {ps / b1:5.2f}x pairs/s vs B=1")


if __name__ == "__main__":
    main()
