"""Generate the bundled pair-task demo corpora (deterministic).

datasets/ddi_demo  — drugbank_caster-format DDI pairs built from the
    real demo.csv molecules.  Label rule (learnable from the node
    features, ~60% positive): 1 iff EITHER drug contains an aromatic
    nitrogen.
datasets/dti_demo  — bindingdb_c-format DTI triples over the same
    molecules and 6 synthetic protein sequences with banded contact
    maps.  Label rule (~50% positive, a cross-tower interaction —
    neither tower alone can predict it): 1 iff (molecule has an
    aromatic nitrogen) == (sequence contains tryptophan).

These give users runnable out-of-the-box pair-task commands (the real
DrugBank/BindingDB corpora are license-gated and this environment has
no network); the CSV/txt/npz layouts match data/pair_datasets.py
loaders, i.e. the reference's src_2gi_ddi/dataset.py:118-146 and
src_2gi_dti_scr/dataset.py file formats.
"""
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from glam_tpu.chem.smiles import parse_smiles  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..", "datasets")


def has_aromatic_n(smi: str) -> bool:
    try:
        mol = parse_smiles(smi)
    except Exception:
        return False
    return any(a.aromatic and a.symbol == "N" for a in mol.atoms)


def load_demo_smiles(n=60):
    df = pd.read_csv(os.path.join(ROOT, "demo", "raw", "demo.csv"))
    smis = []
    for s in df["smiles"]:
        try:
            parse_smiles(s)
        except Exception:
            continue
        smis.append(s)
        if len(smis) == n:
            break
    return smis


def make_ddi(smis, n_pairs=500):
    rng = np.random.RandomState(0)
    arom = {s: has_aromatic_n(s) for s in smis}
    rows, seen = [], set()
    while len(rows) < n_pairs:
        s1, s2 = rng.choice(smis, 2, replace=False)
        if (s1, s2) in seen:
            continue
        seen.add((s1, s2))
        rows.append({"Drug1_SMILES": s1, "Drug2_SMILES": s2,
                     "label": int(arom[s1] or arom[s2])})
    out = os.path.join(ROOT, "ddi_demo", "raw")
    os.makedirs(out, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out, "drugbank_caster.csv"), index=False)
    print(f"ddi_demo: {len(df)} pairs, positives "
          f"{df['label'].mean():.2f}")


AA = "ACDEFGHIKLMNPQRSTVWY"


def make_dti(smis, n_train=360, n_dev=60, n_test=80):
    rng = np.random.RandomState(1)
    seqs = []
    for i in range(6):
        L = int(rng.randint(24, 48))
        seq = "".join(rng.choice(list(AA), L))
        if i % 2 == 0 and "W" not in seq:  # half the proteins carry W
            seq = seq[:L // 2] + "W" + seq[L // 2 + 1:]
        elif i % 2 == 1:
            seq = seq.replace("W", "Y")
        seqs.append(seq)
    out = os.path.join(ROOT, "dti_demo", "raw", "bindingdb_c")
    os.makedirs(out, exist_ok=True)
    maps = {}
    for i, s in enumerate(seqs):
        L = len(s)
        m = np.zeros((L, L), np.float32)
        for off in (2, 3):  # banded contacts beyond the backbone
            idx = np.arange(L - off)
            m[idx, idx + off] = m[idx + off, idx] = 0.9
        maps[f"map_{i}"] = m
    np.savez(os.path.join(out, "protein_maps.npz"),
             sequences=np.asarray(seqs), **maps)
    arom = {s: has_aromatic_n(s) for s in smis}
    for name, n in [("train", n_train), ("dev", n_dev), ("test", n_test)]:
        lines = []
        for _ in range(n):
            smi = rng.choice(smis)
            seq = seqs[rng.randint(len(seqs))]
            y = int(arom[smi] == ("W" in seq))
            lines.append(f"{smi} {seq} {y}")
        with open(os.path.join(out, f"{name}.txt"), "w") as f:
            f.write("\n".join(lines))
    print(f"dti_demo: {n_train}/{n_dev}/{n_test} triples, "
          f"{len(seqs)} proteins")




def make_scr(n_actives=40, n_inactives=360, target="ALDH1"):
    """datasets/scr_demo — LIT-PCBA-format virtual-screening corpus.

    Layout matches data/pair_datasets.py:LITPCBADataset (the reference's
    src_2gi_dti_scr/dataset.py:235-326 per-target files): actives.smi /
    inactives.smi ('smiles id' lines), {target}.seq FASTA, and a
    RaptorX-format {target}.contactmap.txt.  Label rule (learnable,
    screening-imbalanced ~10% actives): active iff the molecule has an
    aromatic nitrogen.
    """
    rng = np.random.RandomState(2)
    df = pd.read_csv(os.path.join(ROOT, "demo", "raw", "demo.csv"))
    act, inact = [], []
    for s in df["smiles"]:
        try:
            parse_smiles(s)
        except Exception:
            continue
        (act if has_aromatic_n(s) else inact).append(s)
    act, inact = act[:n_actives], inact[:n_inactives]
    base = os.path.join(ROOT, "scr_demo", "raw", "lit_pcba", target)
    os.makedirs(base, exist_ok=True)
    for name, smis in [("actives.smi", act), ("inactives.smi", inact)]:
        with open(os.path.join(base, name), "w") as f:
            f.write("\n".join(f"{s} SCRDEMO{i}"
                              for i, s in enumerate(smis)))
    L = 40
    seq = "".join(rng.choice(list(AA), L))
    with open(os.path.join(base, f"{target}.seq"), "w") as f:
        f.write(seq + "\n")
    rows = [f"SEQ  {seq}"]
    for off in (2, 3, 4):  # banded contacts beyond the backbone
        for i in range(1, L - off + 1):
            rows.append(f"{i} {i + off} 0.85")
    with open(os.path.join(base, f"{target}.contactmap.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"scr_demo/{target}: {len(act)} actives / {len(inact)} "
          f"inactives, protein L={L}")


if __name__ == "__main__":
    smis = load_demo_smiles()
    make_ddi(smis)
    make_dti(smis)
    make_scr()
