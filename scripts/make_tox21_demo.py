"""Generate datasets/tox21_demo — a runnable Tox21-FORMAT multitask
corpus (deterministic).

The real Tox21 CSV is not bundled (zero-egress environment), so this
gives users an out-of-the-box command for the NaN-masked multitask
family (reference src_1gp/dataset.py:184-206 task registry,
metrics.py:31-54 per-task masked AUC):

    python -m glam_tpu.run --dataset tox21 \
        --dataset_root datasets/tox21_demo --epochs 5 --split scaffold

Layout matches data/datasets.py:MolDataset for dataset='tox21': the 12
reference task columns, ~25% NaN holes per task (the defining Tox21
property), labels from 12 distinct structural rules so every task is
learnable but not identical.
"""
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from glam_tpu.chem.smiles import parse_smiles  # noqa: E402
from glam_tpu.data.datasets import TASKS  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..", "datasets")


def _props(smi):
    mol = parse_smiles(smi)
    atoms = mol.atoms
    n_arom = sum(a.aromatic for a in atoms)
    rings = sum(a.in_ring for a in atoms)
    return {
        "arom_n": any(a.aromatic and a.symbol == "N" for a in atoms),
        "halogen": any(a.symbol in ("F", "Cl", "Br", "I") for a in atoms),
        "sulfur": any(a.symbol == "S" for a in atoms),
        "charged": any(a.charge != 0 for a in atoms),
        "carbonyl": any(b.order == 2 and "O" in (
            atoms[b.a].symbol, atoms[b.b].symbol) for b in mol.bonds),
        "many_arom": n_arom >= 10,
        "big": len(atoms) >= 25,
        "ring_rich": rings >= 12,
        "o_rich": sum(a.symbol == "O" for a in atoms) >= 3,
        "n_rich": sum(a.symbol == "N" for a in atoms) >= 2,
        "triple": any(b.order == 3 for b in mol.bonds),
        "arom_o_s": any(a.aromatic and a.symbol in ("O", "S")
                        for a in atoms),
    }


def main():
    df = pd.read_csv(os.path.join(ROOT, "demo", "raw", "demo.csv"))
    rng = np.random.RandomState(7)
    tasks = TASKS["tox21"]
    rows = []
    for smi in df["smiles"]:
        try:
            p = _props(smi)
        except Exception:
            continue
        vals = [p[k] for k in ("arom_n", "halogen", "sulfur", "charged",
                               "carbonyl", "many_arom", "big",
                               "ring_rich", "o_rich", "n_rich", "triple",
                               "arom_o_s")]
        row = {"smiles": smi}
        for t, v in zip(tasks, vals):
            # ~25% NaN holes + 5% label noise (so AUC < 1 is expected)
            if rng.rand() < 0.25:
                row[t] = np.nan
            else:
                lab = int(v)
                if rng.rand() < 0.05:
                    lab = 1 - lab
                row[t] = float(lab)
        rows.append(row)
    out = os.path.join(ROOT, "tox21_demo", "raw")
    os.makedirs(out, exist_ok=True)
    full = pd.DataFrame(rows)
    full.to_csv(os.path.join(out, "tox21.csv"), index=False)
    frac = full[tasks].notna().mean().mean()
    pos = np.nanmean(full[tasks].values)
    print(f"tox21_demo: {len(full)} molecules x {len(tasks)} tasks, "
          f"label density {frac:.2f}, positive rate {pos:.2f}")


if __name__ == "__main__":
    main()
