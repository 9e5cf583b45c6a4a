"""Pair-task datasets: drug-drug interaction (DDI) and drug-target
interaction / virtual screening (DTI).

Parity targets:
  DDIDataset       reference src_2gi_ddi/dataset.py:70-176 — interaction
                   CSV (Drug1_SMILES, Drug2_SMILES, label) + dedup'd
                   molecule store; 70/10/20 random split; per-batch pair
                   assembly replaced by the static-shape PairGraphLoader.
  BindingDBDataset reference src_2gi_dti_scr/dataset.py:124-201 — fixed
                   train/dev/test.txt files of space-separated
                   ``smiles sequence label`` plus a per-sequence contact
                   map store; proteins without contact maps are skipped.
  LITPCBADataset   reference src_2gi_dti_scr/dataset.py:204-326 —
                   per-target active/inactive .smi files, hardcoded
                   target FASTAs, 70/30 train/val of the T set + V set as
                   test, sklearn-style balanced class weights.

Molecule identity: the reference dedups via RDKit canonical SMILES
(src_2gi_ddi/dataset.py:118-124); here molecules are keyed by a canonical
WL graph hash (:func:`glam_tpu.chem.scaffold.molecule_key`), so two raw
spellings of one molecule share a single store entry (and its featurized
graph) exactly like the reference.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..chem.featurize import FeaturizeError
from ..chem.proteins import load_contactmap, protein_to_arrays
from ..chem.scaffold import molecule_key
from .datasets import featurize_smiles
from .graph import GraphArrays


def _mol_graph(smi: str, y) -> Optional[GraphArrays]:
    try:
        x, snd, rcv, e = featurize_smiles(smi)
    except ValueError:
        return None
    return GraphArrays(nodes=x, edges=e, senders=snd, receivers=rcv,
                       y=np.atleast_1d(np.asarray(y, np.float32)), smi=smi)


class DDIDataset:
    """Drug-drug interaction pairs."""

    def __init__(self, root: str, dataset: str = "drugbank_caster",
                 split: str = "random", split_seed: int = 1234,
                 num_classes: Optional[int] = None):
        self.root = Path(root)
        self.dataset = dataset
        csv = self.root / "raw" / dataset / "ddi_total.csv"
        if not csv.exists():
            csv = self.root / "raw" / f"{dataset}.csv"
        df = pd.read_csv(csv)
        self.mol_store: Dict[str, GraphArrays] = {}
        # unresolvable exotic stereo tags (@SP/@TB/@OH, symmetric @AL)
        # merge spellings into ONE store key — count the UNIQUE store
        # molecules affected (not raw parse events: molecule_key and
        # featurization each re-parse, and repeated CSV rows re-key),
        # so the report states how many identities actually merged
        self._exotic_keys: set = set()
        pairs: List[Tuple[str, str, float]] = []
        for s1, s2, y in zip(df["Drug1_SMILES"], df["Drug2_SMILES"],
                             df["label"]):
            k1 = self._featurize(str(s1))
            k2 = self._featurize(str(s2))
            if k1 is None or k2 is None:
                continue
            pairs.append((k1, k2, float(y)))
        self.pairs = pairs
        self.n_exotic_stereo_dropped = len(self._exotic_keys)
        if self.n_exotic_stereo_dropped:
            print(f"[{dataset}] {self.n_exotic_stereo_dropped} store "
                  "molecule(s) carry exotic stereo tags with no "
                  "canonical descriptor (@SP/@TB/@OH or unresolvable "
                  "@AL): those stereoisomer identities merged")
        self.num_tasks = 1
        labels = {p[2] for p in pairs}
        if num_classes is not None:
            self.num_classes = num_classes
        elif labels <= {0.0, 1.0}:
            self.num_classes = 1  # binary sigmoid head
        else:
            # multiclass: class ids are the label VALUES (may be
            # non-contiguous), so the head must span 0..max inclusive
            self.num_classes = int(max(labels)) + 1
        some = next(iter(self.mol_store.values()))
        self.num_node_features = int(some.nodes.shape[1])
        self.num_edge_features = int(some.edges.shape[1])
        rng = np.random.RandomState(split_seed)
        perm = rng.permutation(len(pairs))
        n_tr = int(0.7 * len(pairs))
        n_va = int(0.1 * len(pairs))
        self.train = self._make(perm[:n_tr])
        self.val = self._make(perm[n_tr:n_tr + n_va])
        self.test = self._make(perm[n_tr + n_va:])

    def _featurize(self, smi: str) -> Optional[str]:
        """Featurize once per canonical molecule; returns its store key
        (canonical dedup parity with reference dataset.py:118-124)."""
        from ..chem.smiles import exotic_stereo_counts
        before = sum(exotic_stereo_counts().values())
        key = molecule_key(smi)
        if not key:
            return None
        if sum(exotic_stereo_counts().values()) > before:
            self._exotic_keys.add(key)
        if key not in self.mol_store:
            g = _mol_graph(smi, 0.0)
            if g is None:
                return None
            self.mol_store[key] = g
        return key

    def _make(self, idx) -> List[Tuple[GraphArrays, GraphArrays]]:
        out = []
        for i in idx:
            s1, s2, y = self.pairs[i]
            g1 = self.mol_store[s1]._replace(
                y=np.asarray([y], np.float32))
            out.append((g1, self.mol_store[s2]))
        return out


class BindingDBDataset:
    """DTI with protein contact-map graphs from fixed split files."""

    def __init__(self, root: str, dataset: str = "bindingdb_c",
                 contact_maps: Optional[Dict[str, np.ndarray]] = None):
        self.root = Path(root)
        self.dataset = dataset
        self.pro_store: Dict[str, GraphArrays] = {}
        self.mol_store: Dict[str, GraphArrays] = {}
        self.contact_maps = (contact_maps if contact_maps is not None
                             else self._load_contact_store())
        self.skipped_proteins = 0
        splits = {}
        for name in ("train", "dev", "test"):
            path = self.root / "raw" / dataset / f"{name}.txt"
            splits[name] = self._load_split(path)
        self.train = splits["train"]
        self.val = splits["dev"]
        self.test = splits["test"]
        self.num_tasks = 1
        if self.mol_store:
            some = next(iter(self.mol_store.values()))
            self.num_node_features = int(some.nodes.shape[1])
            self.num_edge_features = int(some.edges.shape[1])
        if self.pro_store:
            somep = next(iter(self.pro_store.values()))
            self.pro_num_node_features = int(somep.nodes.shape[1])
            self.pro_num_edge_features = int(somep.edges.shape[1])

    def _load_contact_store(self) -> Dict[str, np.ndarray]:
        """protein_maps.npz: {sequence -> dense contact matrix}."""
        path = self.root / "raw" / self.dataset / "protein_maps.npz"
        if not path.exists():
            return {}
        z = np.load(path, allow_pickle=False)
        seqs = [str(s) for s in z["sequences"]]
        return {s: z[f"map_{i}"] for i, s in enumerate(seqs)}

    def _protein(self, seq: str) -> Optional[GraphArrays]:
        if seq in self.pro_store:
            return self.pro_store[seq]
        cm = self.contact_maps.get(seq)
        if cm is None:
            return None  # skip proteins w/o contact map (reference :178)
        nodes, snd, rcv, attr = protein_to_arrays(seq, cm)
        g = GraphArrays(nodes=nodes, edges=attr, senders=snd,
                        receivers=rcv, y=np.zeros(1, np.float32), smi=seq)
        self.pro_store[seq] = g
        return g

    def _load_split(self, path: Path
                    ) -> List[Tuple[GraphArrays, GraphArrays]]:
        out = []
        if not path.exists():
            return out
        for line in path.read_text().splitlines():
            parts = line.split()
            if len(parts) < 3:
                continue
            smi, seq, label = parts[0], parts[1], float(parts[2])
            if smi not in self.mol_store:
                g = _mol_graph(smi, 0.0)
                if g is None:
                    continue
                self.mol_store[smi] = g
            pro = self._protein(seq)
            if pro is None:
                self.skipped_proteins += 1
                continue
            mol = self.mol_store[smi]._replace(
                y=np.asarray([label], np.float32))
            out.append((mol, pro))
        return out


LIT_PCBA_TARGETS = ("ALDH1", "ESR1_ant", "KAT2A", "MAPK1", "FEN1")


class LITPCBADataset:
    """LIT-PCBA virtual screening: per-target active/inactive .smi files.

    raw layout: raw/lit_pcba/{target}/{actives,inactives}.smi with
    ``smiles id`` lines, and {target}.seq holding the target FASTA, plus
    an optional {target}.contactmap.txt."""

    def __init__(self, root: str, target: str = "ALDH1",
                 split_seed: int = 1234):
        self.root = Path(root)
        self.target = target
        base = self.root / "raw" / "lit_pcba" / target
        actives = self._read_smi(base / "actives.smi", 1.0)
        inactives = self._read_smi(base / "inactives.smi", 0.0)
        seq = (base / f"{target}.seq").read_text().strip()
        cm_path = base / f"{target}.contactmap.txt"
        if cm_path.exists():
            cm, parsed_seq, _ = load_contactmap(cm_path)
            seq = parsed_seq or seq
        else:
            cm = np.zeros((len(seq), len(seq)), np.float32)
        nodes, snd, rcv, attr = protein_to_arrays(seq, cm)
        self.protein = GraphArrays(nodes=nodes, edges=attr, senders=snd,
                                   receivers=rcv,
                                   y=np.zeros(1, np.float32), smi=seq)
        mols = actives + inactives
        rng = np.random.RandomState(split_seed)
        perm = rng.permutation(len(mols))
        n_tr = int(0.7 * len(mols))
        trn_idx, val_idx = perm[:n_tr], perm[n_tr:]
        self.train = [(mols[i], self.protein) for i in trn_idx]
        self.val = [(mols[i], self.protein) for i in val_idx]
        self.test = list(self.val)  # V-set doubles as test (reference)
        self.num_tasks = 1
        ys = np.asarray([g.y[0] for g in mols])
        # balanced class weights: n / (n_classes * bincount)
        counts = np.bincount(ys.astype(int), minlength=2)
        self.class_weights = len(ys) / (2.0 * np.maximum(counts, 1))
        self.num_node_features = int(mols[0].nodes.shape[1])
        self.num_edge_features = int(mols[0].edges.shape[1])
        self.pro_num_node_features = int(nodes.shape[1])
        self.pro_num_edge_features = int(attr.shape[1])

    @staticmethod
    def _read_smi(path: Path, label: float) -> List[GraphArrays]:
        out = []
        if not path.exists():
            return out
        for line in path.read_text().splitlines():
            parts = line.split()
            if not parts:
                continue
            g = _mol_graph(parts[0], label)
            if g is not None:
                out.append(g)
        return out
