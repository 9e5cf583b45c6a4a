"""Shape-morph sweep: can re-PADDING land the product trainer program
in the remote-compile service's fast-executable class?

Round-4 found the physprop-shaped flagship Trainer program lands in the
slow executable class deterministically (7.9e5 edges/s on 9/9 compiles)
while bench.py's program is a fast island (STATUS round-4 #7); the
bisect ruled out every SINGLE shape parameter.  This sweep answers the
round-5 VERDICT question: does any semantics-free morph of the product
program — inflating the inert node/edge pad budgets (padding-invariance
is tested; the training math is untouched) — draw a fast executable?

Protocol (memory/axon-tpu-quirks):
  * each variant runs in its OWN subprocess (a process's second big
    compile tends slow, so in-process sweeps are contaminated);
  * the persistent compile cache is OFF (GLAM_TPU_COMPILE_CACHE=off) so
    every draw is a fresh roll;
  * variants run serially (never two chip-bound processes at once);
  * timing mirrors Trainer._probe_compile: the first scan-group payload,
    1 warm-up dispatch + 3 timed dispatches on disposable state.

Usage:
  python scripts/sweep_shape_morph.py --sweep            # orchestrate
  python scripts/sweep_shape_morph.py --node-budget N --edge-budget E
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FLAGSHIP = ["--dataset", "physprop_perturb",
            "--dataset_root", "datasets/physprop",
            "--mol_block", "_TripletMessage", "--e_dim", "1024",
            "--batch_size", "512", "--epochs", "1"]


def child(node_budget: int, edge_budget: int, draws: int,
          max_nodes: int = 0) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glam_tpu.data.batching import GraphLoader
    from glam_tpu.data.datasets import auto_dataset
    from glam_tpu.run import build_parser
    from glam_tpu.train.pair_trainer import make_auto_trainer

    args = vars(build_parser().parse_args(FLAGSHIP))
    if max_nodes:
        # per-graph dense cap (sort-pool slots): semantics-free while
        # >= the corpus max molecule (85 nodes on physprop)
        args["max_nodes"] = max_nodes
    args, dataset, kind = auto_dataset(args)
    trainer = make_auto_trainer(args, dataset, kind,
                                work_dir="/tmp/sweep_morph")
    tl = trainer.train_loader
    base = (tl.node_budget, tl.edge_budget)
    if node_budget or edge_budget:
        trainer.train_loader = GraphLoader(
            tl.graphs, tl.global_batch, tl.num_tasks, shuffle=True,
            seed=int(args.get("seed", 1234)),
            node_budget=node_budget or tl.node_budget,
            edge_budget=edge_budget or tl.edge_budget,
            n_devices=tl.n_devices)
        tl = trainer.train_loader
    scan = int(args.get("scan_steps", 8))
    batch = next(iter(tl))
    tl.set_epoch(0)
    parts = trainer._as_parts(batch)
    payload = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * scan), parts)
    edges_per_call = float(np.asarray(parts[0].edge_mask).sum()) * scan
    rng = jax.random.PRNGKey(7)
    rates = []
    for d in range(draws):
        st = jax.tree_util.tree_map(lambda x: jnp.asarray(x).copy(),
                                    trainer.state)
        st, loss = trainer._train_scan(st, payload, rng)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(3):
            st, loss = trainer._train_scan(st, payload, rng)
        jax.block_until_ready(loss)
        rates.append(edges_per_call * 3
                     / max(time.perf_counter() - t0, 1e-9))
        if d + 1 < draws:
            jax.clear_caches()
    print("SWEEP_RESULT " + json.dumps({
        "node_budget": tl.node_budget, "edge_budget": tl.edge_budget,
        "base_node_budget": base[0], "base_edge_budget": base[1],
        "max_nodes": int(args.get("max_nodes", 132)),
        "rates_edges_per_sec": [round(r, 1) for r in rates],
    }), flush=True)


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


def sweep(draws: int) -> None:
    # baseline physprop budgets are printed by the first child; the
    # variant list morphs them toward (and past) bench.py's island:
    # bench bg=512 has node budget 7832 (real ~7.8k), edge budget 14640.
    # mul variants inflate inert padding only.
    variants = [
        ("baseline", 0, 0),
        ("node+10%", 1.10, 1.0),
        ("node+25%", 1.25, 1.0),
        ("edge+10%", 1.0, 1.10),
        ("edge+25%", 1.0, 1.25),
        ("both+10%", 1.10, 1.10),
        ("both+25%", 1.25, 1.25),
        ("pow2", "pow2", "pow2"),
        ("mult512", "m512", "m512"),
        ("bench-ratio", "bench", "bench"),  # edge = 1.87x node (bench)
    ]
    env = dict(os.environ, GLAM_TPU_COMPILE_CACHE="off")
    base_nb = base_eb = None
    results = []
    for name, mn, me in variants:
        if name == "baseline":
            nb = eb = 0
        else:
            assert base_nb is not None, "run baseline first"
            if mn == "pow2":
                nb, eb = 1 << (base_nb - 1).bit_length(), \
                    1 << (base_eb - 1).bit_length()
            elif mn == "m512":
                nb, eb = _round_up(base_nb, 512), _round_up(base_eb, 512)
            elif mn == "bench":
                nb = base_nb
                eb = _round_up(int(base_nb * 14640 / 7832), 8)
                eb = max(eb, base_eb)
            else:
                nb = _round_up(base_nb * mn, 8)
                eb = _round_up(base_eb * me, 8)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--node-budget", str(nb), "--edge-budget", str(eb),
               "--draws", str(draws)]
        print(f"### variant {name}: node_budget={nb} edge_budget={eb}",
              flush=True)
        try:
            out = subprocess.run(cmd, env=env, capture_output=True,
                                 text=True, timeout=900,
                                 cwd=os.path.join(
                                     os.path.dirname(__file__), ".."))
        except subprocess.TimeoutExpired:
            print(f"### variant {name}: TIMEOUT", flush=True)
            results.append((name, None))
            continue
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("SWEEP_RESULT ")]
        if not line:
            print(f"### variant {name} FAILED:\n{out.stdout[-2000:]}\n"
                  f"{out.stderr[-2000:]}", flush=True)
            results.append((name, None))
            continue
        rec = json.loads(line[0][len("SWEEP_RESULT "):])
        if name == "baseline":
            base_nb, base_eb = rec["base_node_budget"], \
                rec["base_edge_budget"]
        rec["variant"] = name
        results.append((name, rec))
        print("### " + json.dumps(rec), flush=True)
    print("\n=== SWEEP SUMMARY ===")
    for name, rec in results:
        if rec is None:
            print(f"{name:12s}  FAILED/TIMEOUT")
        else:
            print(f"{name:12s}  nb={rec['node_budget']:6d} "
                  f"eb={rec['edge_budget']:6d}  "
                  + "  ".join(f"{r:.3e}"
                              for r in rec["rates_edges_per_sec"]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--node-budget", type=int, default=0)
    ap.add_argument("--edge-budget", type=int, default=0)
    ap.add_argument("--max-nodes", type=int, default=0)
    ap.add_argument("--draws", type=int, default=2)
    a = ap.parse_args()
    if a.sweep:
        sweep(a.draws)
    else:
        child(a.node_budget, a.edge_budget, a.draws, a.max_nodes)
