"""PASP perturbation dataset and robustness-evaluation data.

Parity with reference PertubationDataset + perturb_test
(/root/reference/src_1gp/dataset.py:209-319):
  * physprop CSV ('physprop_perturb.csv': Label, SMILES, LogP,
    SMILES_{1,2,3}, LogP_{1,2,3}, Similrity_{1,2,3}) split by its
    ``Label`` column (train/val/test) instead of random/scaffold;
  * ``perturb_test(root, dataset, level)`` builds the paired test sets:
    M  = original test molecules, M' = perturbed variants at similarity
    level 1/2/3, with label arrays Q (LogP) and Q' (LogP_level).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np
import pandas as pd

from .datasets import MolDataset, featurize_smiles
from .graph import GraphArrays


def _featurize_list(smiles: List[str], labels: List[float]
                    ) -> List[GraphArrays]:
    out = []
    for smi, y in zip(smiles, labels):
        x, snd, rcv, e = featurize_smiles(str(smi))
        out.append(GraphArrays(nodes=x, edges=e, senders=snd, receivers=rcv,
                               y=np.asarray([y], np.float32), smi=str(smi)))
    return out


class PerturbationDataset(MolDataset):
    """physprop_perturb with Label-column splits (dataset.py:247-258)."""

    def __init__(self, root: str, dataset: str = "physprop_perturb",
                 split: str = "label", split_seed: int = 1234):
        self._label_df = pd.read_csv(
            Path(root) / "raw" / f"{dataset}.csv")
        super().__init__(root, dataset=dataset, split="label",
                         split_seed=split_seed, smiles_col="SMILES")

    def _load_or_split(self):
        # align Label rows with the (possibly skip-filtered) graph list
        # by SMILES string
        df = self._label_df
        label_by_smi = dict(zip(df["SMILES"].astype(str), df["Label"]))
        tr, va, te = [], [], []
        for i, g in enumerate(self.graphs):
            lab = label_by_smi.get(g.smi, "train")
            (tr if lab == "train" else va if lab == "val" else te).append(i)
        return (np.asarray(tr, np.int64), np.asarray(va, np.int64),
                np.asarray(te, np.int64))


def perturb_test(root: str, dataset: str = "physprop_perturb",
                 level: int = 1) -> Tuple[List[GraphArrays],
                                          List[GraphArrays],
                                          np.ndarray, np.ndarray]:
    """Build (M, M', Q, Q') for a perturbation level (dataset.py:290-319)."""
    col = {1: "SMILES_1", 2: "SMILES_2", 3: "SMILES_3"}[level]
    df = pd.read_csv(Path(root) / "raw" / f"{dataset}.csv")
    test = df[df.Label == "test"]
    test = test[test[col].notna()]
    original = test["SMILES"].astype(str).tolist()
    perturbed = test[col].astype(str).tolist()
    labels = test["LogP"].astype(float).tolist()
    M = _featurize_list(original, labels)
    M_prime = _featurize_list(perturbed, labels)
    Q = test["LogP"].to_numpy(float)
    Q_prime = test[f"LogP_{level}"].to_numpy(float)
    return M, M_prime, Q, Q_prime
