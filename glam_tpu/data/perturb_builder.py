"""Build a PASP perturbation benchmark from a plain property CSV.

TPU-native re-implementation of the reference's perturbation-dataset
construction pipeline
(/root/reference/src_perturbed_dataset/perturb-real_point.ipynb, cells
9-30), which produced ``physprop_perturb.csv`` from physprop.csv:

  1. Fingerprint every molecule; for each molecule, find perturbation
     candidates among the others: Tanimoto similarity in one of the
     three level buckets (level 1 [0.8, 1.0), 2 [0.5, 0.8),
     3 [0.3, 0.5), notebook cell 10) AND |dLogP| < 0.2 (cell 11).
  2. Keep molecules with a candidate at ALL three levels; first
     qualifying candidate per level wins (cells 16-18).
  3. Scaffold split: the test set is ~1/6 of the ORIGINAL corpus drawn
     from the eligible molecules (cell 22); every molecule appearing in
     the test rows (original or perturbed) is excluded from the
     train/val pool, which is then scaffold-split 75/25 (cells 24-27).
  4. Emit the reference CSV schema — Label, SMILES, LogP, then
     SMILES_k/LogP_k/Similrity_k for k=1,2,3 on test rows (the
     reference's 'Similrity' misspelling is kept: the loaders and the
     published file use it).

Differences by design (documented, not drift): fingerprints are our
ECFP-style Morgan bits (chem/fingerprints.py) rather than RDKit path
fingerprints — the buckets select by OUR similarity ranking; scaffold
identity ignores chirality (the SMILES parser parses-and-ignores
stereo).  The all-pairs similarity scan is vectorized popcount rows
(seconds) instead of the notebook's 4-hour Python double loop.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from ..chem.fingerprints import fingerprint_matrix, tanimoto_row
from ..chem.scaffold import random_scaffold_split

LEVEL_BUCKETS = {1: (0.8, 1.0), 2: (0.5, 0.8), 3: (0.3, 0.5)}
COLUMNS = ["Label", "SMILES", "LogP",
           "SMILES_1", "LogP_1", "Similrity_1",
           "SMILES_2", "LogP_2", "Similrity_2",
           "SMILES_3", "LogP_3", "Similrity_3"]


def find_perturb_candidates(smiles, values, thre: float = 0.2,
                            radius: int = 2, n_bits: int = 2048
                            ) -> Dict[int, Dict[int, tuple]]:
    """For each molecule i: {level: (j, similarity)} of the FIRST
    candidate j per level (notebook cells 11-12 iterate j in corpus
    order), restricted to |values[j] - values[i]| < thre."""
    smiles = [str(s) for s in smiles]
    values = np.asarray(values, np.float64)
    fps = fingerprint_matrix(smiles, radius, n_bits)
    popcounts = np.bitwise_count(fps).sum(axis=1)
    out: Dict[int, Dict[int, tuple]] = {}
    n = len(smiles)
    for i in range(n):
        sim = tanimoto_row(fps, i, popcounts)
        ok_val = np.abs(values - values[i]) < thre
        ok_val[i] = False
        ok_val &= popcounts > 0  # unparseable rows never qualify
        found: Dict[int, tuple] = {}
        for level, (lo, hi) in LEVEL_BUCKETS.items():
            mask = ok_val & (sim >= lo) & (sim < hi)
            j = int(np.argmax(mask))
            if mask[j]:
                found[level] = (j, float(sim[j]))
        if len(found) == len(LEVEL_BUCKETS):
            out[i] = found
    return out


def build_perturbed_dataset(df: pd.DataFrame, out_csv: Optional[str] = None,
                            smiles_col: str = "SMILES",
                            value_col: str = "LogP", thre: float = 0.2,
                            seed: int = 0, test_frac: float = 1.0 / 6.0,
                            radius: int = 2, n_bits: int = 2048
                            ) -> pd.DataFrame:
    """Run the full pipeline; returns (and optionally writes) the
    perturbation CSV in the reference schema, loadable by
    PerturbationDataset + perturb_test."""
    smiles = df[smiles_col].astype(str).tolist()
    values = df[value_col].to_numpy(np.float64)
    cands = find_perturb_candidates(smiles, values, thre, radius, n_bits)
    eligible = sorted(cands.keys())
    if not eligible:
        raise ValueError("no molecule has perturbation candidates at all "
                         "three similarity levels; corpus too small or "
                         "too diverse")
    # test quota: ~test_frac of the ORIGINAL corpus, drawn from the
    # eligible molecules via scaffold split (notebook cell 22)
    n_test = int(len(df) * test_frac)
    test_rate = min(n_test / len(eligible), 1.0)
    _, _, te = random_scaffold_split(
        [smiles[i] for i in eligible], seed=seed,
        frac_train=1.0 - test_rate, frac_valid=0.0)
    test_ids = [eligible[k] for k in te]

    test_rows = []
    excluded = set()
    for i in test_ids:
        row = {"Label": "test", "SMILES": smiles[i], "LogP": values[i]}
        excluded.add(smiles[i])
        for level in (1, 2, 3):
            j, sim = cands[i][level]
            row[f"SMILES_{level}"] = smiles[j]
            row[f"LogP_{level}"] = values[j]
            row[f"Similrity_{level}"] = sim
            excluded.add(smiles[j])
        test_rows.append(row)

    # train/val pool: everything not referenced by a test row (cell 24)
    pool = [i for i in range(len(df)) if smiles[i] not in excluded]
    tr, va, _ = random_scaffold_split([smiles[i] for i in pool],
                                      seed=seed, frac_train=0.75,
                                      frac_valid=0.25)
    rows = test_rows + \
        [{"Label": "train", "SMILES": smiles[pool[k]],
          "LogP": values[pool[k]]} for k in tr] + \
        [{"Label": "val", "SMILES": smiles[pool[k]],
          "LogP": values[pool[k]]} for k in va]
    out = pd.DataFrame(rows, columns=COLUMNS)
    if out_csv:
        out.to_csv(out_csv, index=False)
    return out


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="Build a PASP perturbation benchmark CSV from a "
                    "property CSV (reference perturb-real_point.ipynb)")
    p.add_argument("in_csv")
    p.add_argument("out_csv")
    p.add_argument("--smiles_col", default="SMILES")
    p.add_argument("--value_col", default="LogP")
    p.add_argument("--thre", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    df = pd.read_csv(a.in_csv)
    out = build_perturbed_dataset(df, a.out_csv, a.smiles_col, a.value_col,
                                  a.thre, a.seed)
    counts = out["Label"].value_counts().to_dict()
    print(f"wrote {a.out_csv}: {counts}")


if __name__ == "__main__":
    main()
