"""Serving throughput: PairPredictor pairs/s on a DTI checkpoint
(VERDICT round-4 item 8).

Trains a small dense DTI checkpoint on CPU in a subprocess (so this
process's chip stays clean for the serving measurement), then measures
``PairPredictor.predict_scores`` end-to-end — SMILES featurization +
packed batching + jitted forward — at several batch sizes on the chip.
The sticky pad budgets keep ONE compiled executable across calls, so
after the first (compile) call every batch reuses it.

Usage: python scripts/bench_serve.py [--ckpt RUN_DIR] [--n 256]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def train_ckpt(tmp: str) -> str:
    cmd = [sys.executable, "-m", "glam_tpu.run",
           "--dataset", "bindingdb_c", "--dataset_root",
           "datasets/dti_demo", "--epochs", "2", "--batch_size", "32",
           "--platform", "cpu", "--work_dir", tmp]
    print("# training a dense DTI checkpoint on CPU...", flush=True)
    subprocess.run(cmd, check=True, capture_output=True, text=True,
                   cwd=os.path.join(os.path.dirname(__file__), ".."),
                   timeout=1800)
    base = os.path.join(tmp, "log_bindingdb_c")
    runs = sorted(d for d in os.listdir(base)
                  if os.path.isdir(os.path.join(base, d)))
    return os.path.join(base, runs[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    ckpt = a.ckpt or train_ckpt("/tmp/glam_bench_serve")

    import jax
    from glam_tpu.data.pair_datasets import BindingDBDataset
    from glam_tpu.serve import PairPredictor
    ds = BindingDBDataset("datasets/dti_demo")
    pool = ds.test + ds.val + ds.train
    pairs = [(m.smi, p.smi) for (m, p) in pool][:a.n]
    while len(pairs) < a.n:
        pairs = pairs + pairs
    pairs = pairs[:a.n]
    print(f"# device: {jax.devices()[0]}, {len(pairs)} pairs, "
          f"reps={a.reps}")
    for bs in (1, 16, 64, 128):
        pred = PairPredictor.from_checkpoint(
            ckpt, contact_maps=ds.contact_maps, batch_size=bs)
        t0 = time.perf_counter()
        s = pred.predict_scores(pairs)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(a.reps):
            s = pred.predict_scores(pairs)
        warm = (time.perf_counter() - t0) / a.reps
        assert s.shape[0] == len(pairs)
        print(f"batch_size {bs:4d}: cold {len(pairs)/cold:8.1f} pairs/s "
              f"(incl. compile), steady {len(pairs)/warm:8.1f} pairs/s")


if __name__ == "__main__":
    main()
