"""Bemis-Murcko scaffold extraction and scaffold-based splitting.

Replaces the reference's RDKit ``MurckoScaffold.MurckoScaffoldSmiles``
(/root/reference/src_1gp/utils.py:119-133) with a first-principles
implementation:

  * scaffold = ring systems + linkers: iteratively delete terminal
    (degree-1) atoms connected by a single bond; atoms double/triple-bonded
    to the remaining framework are kept (matching RDKit's Murcko behavior
    of retaining exocyclic multiple bonds);
  * scaffold *identity* is a canonical graph invariant (Weisfeiler-Lehman
    refinement hash over element/aromatic/charge labels and bond orders)
    rather than a canonical SMILES string — equally deterministic, and
    sufficient for grouping molecules into scaffold classes for splits.
"""
from __future__ import annotations

import hashlib
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .smiles import Mol, SmilesError, parse_smiles
from .stereo import (allene_descriptors, double_bond_descriptors,
                     square_planar_descriptors, tetrahedral_descriptors,
                     wl_refine)


def murcko_scaffold(mol: Mol) -> Tuple[List[int], List[Tuple[int, int, int]]]:
    """Return (kept atom indices, bonds as (a, b, order)) of the scaffold.

    RDKit-parity definition: the framework = ring atoms + linker atoms
    (obtained by iteratively pruning ALL terminal atoms that are not in
    rings, regardless of bond order), plus atoms attached to the
    framework by a multiple bond (exocyclic =O etc. are retained).  A
    molecule with no rings yields an empty scaffold."""
    from .smiles import _ring_bonds

    n = mol.num_atoms()
    ring_atoms = set()
    for ring in _ring_bonds(mol):
        ring_atoms.update(ring)
    if not ring_atoms:
        return [], []
    deg = [0] * n
    adj: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for b in mol.bonds:
        adj[b.a].append((b.b, b.order))
        adj[b.b].append((b.a, b.order))
        deg[b.a] += 1
        deg[b.b] += 1
    alive = [True] * n
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not alive[i] or i in ring_atoms or deg[i] > 1:
                continue
            alive[i] = False
            changed = True
            for (j, _o) in adj[i]:
                if alive[j]:
                    deg[j] -= 1
            deg[i] = 0
    framework = {i for i in range(n) if alive[i]}
    # re-attach atoms multiple-bonded directly to the framework
    kept_set = set(framework)
    for b in mol.bonds:
        if b.order > 1:
            if b.a in framework and b.b not in framework:
                kept_set.add(b.b)
            elif b.b in framework and b.a not in framework:
                kept_set.add(b.a)
    kept = sorted(kept_set)
    bonds = [(b.a, b.b, b.order) for b in mol.bonds
             if b.a in kept_set and b.b in kept_set]
    return kept, bonds


def _wl_hash(labels: Dict[int, str],
             edges: List[Tuple[int, int, int]], rounds: int = 4) -> str:
    """Weisfeiler-Lehman graph hash (canonical scaffold identity)."""
    cur = wl_refine(labels, edges, rounds)
    multiset = ",".join(sorted(cur.values()))
    return hashlib.md5(multiset.encode()).hexdigest()


def scaffold_key(smiles: str) -> str:
    """Deterministic scaffold-class key of a molecule ('' if acyclic)."""
    try:
        mol = parse_smiles(smiles)
    except SmilesError:
        return ""
    kept, bonds = murcko_scaffold(mol)
    if not kept:
        return ""
    labels = {
        i: f"{mol.atoms[i].symbol}{int(mol.atoms[i].aromatic)}"
        f"{mol.atoms[i].charge}" for i in kept}
    return _wl_hash(labels, bonds)


def molecule_key(smiles: str) -> str:
    """Canonical molecule identity key ('' if unparseable).

    Replaces the reference's RDKit canonical-SMILES normalization for
    the DDI molecule store (/root/reference/src_2gi_ddi/dataset.py:118-124,
    isomericSmiles=True at src_1gp/dataset.py:154) with a
    Weisfeiler-Lehman graph hash over the FULL molecule — element,
    aromaticity, charge, H-count and isotope labels plus bond orders,
    augmented with CANONICAL stereo descriptors (chem/stereo.py): a
    spelling-invariant '@'/'@@' tag per resolvable stereocenter and a
    cis/trans flag per configured double bond, so stereoisomers get
    DISTINCT keys (reference isomeric-SMILES dedup semantics) while
    respellings of one molecule still collapse.  WL refinement is not a
    complete isomorphism test, but with atom-level labels at 4 rounds it
    separates all practically occurring molecular graphs; size/label
    multisets are part of the hash by construction."""
    try:
        mol = parse_smiles(smiles)
    except SmilesError:
        return ""
    labels = {
        i: (f"{a.symbol}|{int(a.aromatic)}|{a.charge}|{a.num_h}"
            f"|{a.isotope}")
        for i, a in enumerate(mol.atoms)}
    bonds = [(b.a, b.b, b.order) for b in mol.bonds]
    ranks = wl_refine(labels, bonds)
    tet = tetrahedral_descriptors(mol, ranks)
    ez = double_bond_descriptors(mol, ranks)
    al = allene_descriptors(mol, ranks)
    sp = square_planar_descriptors(mol, ranks)
    labels = {i: lab + f"|S{tet.get(i, 0)}|A{al.get(i, 0)}"
              f"|P{sp.get(i, '')}"
              for i, lab in labels.items()}
    bonds = [(b.a, b.b, f"{b.order}{ez.get(bi, '')}")
             for bi, b in enumerate(mol.bonds)]
    return _wl_hash(labels, bonds)


def random_scaffold_split(
    smiles_list: Sequence[str],
    seed: int = 1234,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scaffold split with randomized group order.

    Mirrors the reference's ``random_scaffold_split``
    (/root/reference/src_1gp/utils.py:137-184): group molecules by
    scaffold, shuffle the groups, then greedily fill validation and test
    up to their quotas, everything else to train.  Uses a seeded RNG (the
    reference's src_1gp copy accidentally ignores its seed — SURVEY.md
    marks that a bug not to replicate; the DDI copy seeds correctly).
    """
    n = len(smiles_list)
    groups: Dict[str, List[int]] = defaultdict(list)
    for i, smi in enumerate(smiles_list):
        groups[scaffold_key(smi)].append(i)
    group_list = list(groups.values())
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(group_list))
    n_total_valid = int(np.floor(frac_valid * n))
    n_total_test = int(np.floor((1.0 - frac_train - frac_valid) * n))
    train_idx: List[int] = []
    valid_idx: List[int] = []
    test_idx: List[int] = []
    for gi in perm:
        group = group_list[gi]
        if len(valid_idx) + len(group) <= n_total_valid:
            valid_idx.extend(group)
        elif len(test_idx) + len(group) <= n_total_test:
            test_idx.extend(group)
        else:
            train_idx.extend(group)
    return (np.asarray(train_idx, np.int64), np.asarray(valid_idx, np.int64),
            np.asarray(test_idx, np.int64))


def random_split(
    n: int,
    seed: int = 1234,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random 80/10/10 split (reference dataset.py:166-174)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_train = int(frac_train * n)
    n_valid = int(frac_valid * n)
    return (perm[:n_train], perm[n_train:n_train + n_valid],
            perm[n_train + n_valid:])
