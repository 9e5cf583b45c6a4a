"""The giant-protein regime --pro_shards exists for, demonstrated.

Builds an in-memory DTI corpus whose proteins are L=3000-residue
contact-map graphs (banded contacts + long-range pairs — the RaptorX
regime of reference src_2gi_dti_scr/utils.py:283-293 scaled to
chains no single-chip HBM budget wants whole), then trains the
PRODUCTION ShardedPairTrainer over an 8-shard mesh with the ring halo
and a pair batch, printing the planned budgets, halo rows and epoch
wall-clock.

Run: python scripts/giant_protein_demo.py [--shards 8] [--L 3000]
     (forces the CPU backend; real-ICI numbers are hardware-blocked)
"""
import argparse
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402


def synth_protein(L, seed):
    rng = np.random.RandomState(seed)
    snd, rcv = [], []
    for i in range(L - 1):
        snd += [i, i + 1]
        rcv += [i + 1, i]
    for i in range(L):
        for j in range(i + 2, min(L, i + 7)):
            snd += [i, j]
            rcv += [j, i]
    for _ in range(int(0.05 * L)):
        i, j = rng.randint(0, L, 2)
        if abs(i - j) > 6:
            snd += [i, j]
            rcv += [j, i]
    from glam_tpu.data.graph import GraphArrays
    return GraphArrays(
        nodes=rng.randn(L, 49).astype(np.float32),
        edges=rng.randn(len(snd), 8).astype(np.float32),
        senders=np.asarray(snd, np.int32),
        receivers=np.asarray(rcv, np.int32),
        y=np.zeros(1, np.float32), smi=f"GIANT{seed}")


def synth_mol(seed, label):
    from glam_tpu.chem.featurize import smiles_to_arrays
    from glam_tpu.data.graph import GraphArrays
    smis = ["CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
            "c1ccncc1", "CCO", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
            "c1ccc2[nH]ccc2c1"]
    x, s, r, e = smiles_to_arrays(smis[seed % len(smis)])
    return GraphArrays(nodes=x, edges=e, senders=s, receivers=r,
                       y=np.asarray([label], np.float32), smi="")


class _DS:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--L", type=int, default=3000)
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--pair_batch", type=int, default=2)
    args = ap.parse_args()

    from glam_tpu.train.sharded_pair_trainer import ShardedPairTrainer

    t0 = time.time()
    pros = [synth_protein(args.L, s) for s in range(3)]
    pairs = [(synth_mol(i, float(i % 2)), pros[i % len(pros)])
             for i in range(args.pairs)]
    ds = _DS()
    ds.train = pairs[: args.pairs - 4]
    ds.val = pairs[args.pairs - 4: args.pairs - 2]
    ds.test = pairs[args.pairs - 2:]
    ds.num_node_features = 15
    ds.num_edge_features = 4
    ds.pro_num_node_features = 49
    ds.pro_num_edge_features = 8
    ds.class_weights = None
    E = pairs[0][1].senders.shape[0]
    print(f"corpus: {args.pairs} pairs, protein L={args.L} "
          f"({E} edges each), built in {time.time() - t0:.1f}s")

    targs = {"dataset": "bindingdb_c", "pro_shards": args.shards,
             "epochs": 2, "lr": 1e-3, "seed": 7, "e_dim": 64,
             "hid_dim_alpha": 4, "message_steps": 3,
             "mol_block": "_TripletMessage", "pro_block": "_GCNConv",
             "pro_readout": "GlobalLAPool",
             "mol_readout": "GlobalPool5", "halo": "auto",
             "pair_batch": args.pair_batch}
    t0 = time.time()
    tr = ShardedPairTrainer(targs, ds, task="pair_binary",
                            work_dir="/tmp/giant_protein_demo")
    nb, eb, hb, ring = tr._pro_budgets
    print(f"plan: node_budget {nb} -> {nb // args.shards + 1}/shard, "
          f"edge_budget {eb}/shard, halo={tr.halo} "
          f"(a2a budget {hb}, ring budgets {list(ring)}), "
          f"setup {time.time() - t0:.1f}s")
    t0 = time.time()
    tr.train()
    dt = time.time() - t0
    val_loss, val_m = tr.valid_iterations("valid")
    n_steps = 2 * -(-len(ds.train) // args.pair_batch)
    print(f"trained 2 epochs ({n_steps} optimizer steps, "
          f"pair_batch={args.pair_batch}) in {dt:.1f}s on the "
          f"{args.shards}-shard virtual-CPU mesh; "
          f"val_loss={val_loss:.4f} val_auc={val_m.get('auc')}")


if __name__ == "__main__":
    main()
