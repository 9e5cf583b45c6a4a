"""Chem subsystem tests: SMILES parsing, featurization, scaffolds.

Golden values hand-derived from the reference feature definitions
(/root/reference/src_1gp/dataset.py:60-97)."""
import numpy as np
import pytest

from glam_tpu.chem.featurize import (NUM_EDGE_FEATURES, NUM_NODE_FEATURES,
                                     is_valid_smiles, smiles_to_arrays)
from glam_tpu.chem.scaffold import (random_scaffold_split, random_split,
                                    scaffold_key)
from glam_tpu.chem.smiles import parse_smiles


class TestParser:
    def test_ethanol(self):
        m = parse_smiles("CCO")
        assert [a.symbol for a in m.atoms] == ["C", "C", "O"]
        assert [a.num_h for a in m.atoms] == [3, 2, 1]
        assert len(m.bonds) == 2

    def test_benzene_aromatic_and_kekule_identical(self):
        xa, sa, ra, ea = smiles_to_arrays("c1ccccc1")
        xk, sk, rk, ek = smiles_to_arrays("C1=CC=CC=C1")
        np.testing.assert_array_equal(xa, xk)
        np.testing.assert_array_equal(ea, ek)

    def test_pyridine(self):
        m = parse_smiles("c1ccncc1")
        assert all(a.aromatic for a in m.atoms)
        n = [a for a in m.atoms if a.symbol == "N"][0]
        assert n.num_h == 0

    def test_pyrrole_bracket_h(self):
        m = parse_smiles("c1cc[nH]c1")
        n = [a for a in m.atoms if a.symbol == "N"][0]
        assert n.num_h == 1 and n.aromatic

    def test_charges(self):
        m = parse_smiles("[NH4+]")
        assert m.atoms[0].charge == 1 and m.atoms[0].num_h == 4
        m = parse_smiles("[O-]C=O")
        assert m.atoms[0].charge == -1

    def test_ring_closure_percent(self):
        m = parse_smiles("C%10CC%10")
        assert len(m.bonds) == 3  # 3-ring

    def test_disconnected(self):
        m = parse_smiles("[Na+].[Cl-]")
        assert len(m.atoms) == 2 and len(m.bonds) == 0

    def test_triple_bond_sp(self):
        m = parse_smiles("C#N")
        assert m.atoms[0].hybridization == 1  # SP
        assert m.atoms[0].num_h == 1

    def test_invalid(self):
        assert not is_valid_smiles("C1CC")      # unclosed ring
        assert not is_valid_smiles("C(C")       # unbalanced paren
        assert not is_valid_smiles("")


class TestFusedAromaticity:
    """Azulene-class perception: per-ring Hueckel fails (5- and 7-rings
    alone are not 4n+2) but the fused system has 10 pi electrons.
    RDKit (the reference's parser, src_1gp/dataset.py:128) perceives
    these; pentalene (8 pi) and heptalene (12 pi) correctly do not
    qualify."""

    def test_azulene_kekule_fully_aromatic(self):
        m = parse_smiles("C1=CC2=CC=CC=CC2=C1")
        assert all(a.aromatic for a in m.atoms)
        assert all(b.order == 4 for b in m.bonds)  # incl. the fusion bond

    def test_azulene_spellings_same_key(self):
        from glam_tpu.chem.scaffold import molecule_key
        k1 = molecule_key("C1=CC2=CC=CC=CC2=C1")
        k2 = molecule_key("c1ccc2cccc2cc1")
        assert k1 == k2 != ""

    def test_pentalene_not_aromatic(self):
        m = parse_smiles("C1=CC2=CC=CC12")
        assert not any(a.aromatic for a in m.atoms)

    def test_indene_sp3_blocks_fused_pass(self):
        m = parse_smiles("C1Cc2ccccc21")
        # benzene ring aromatic, the CH2-bearing 5-ring is not
        assert sum(a.aromatic for a in m.atoms) == 6

    def test_substituted_azulene(self):
        m = parse_smiles("OC1=CC2=CC=CC=CC2=C1")
        assert sum(a.aromatic for a in m.atoms) == 10


class TestFeaturizer:
    def test_shapes(self):
        x, s, r, e = smiles_to_arrays("CC(=O)Oc1ccccc1C(=O)O")  # aspirin
        assert x.shape == (13, NUM_NODE_FEATURES)
        assert e.shape[0] == s.shape[0] == r.shape[0]
        assert e.shape[1] == NUM_EDGE_FEATURES

    def test_ethanol_features(self):
        x, s, r, e = smiles_to_arrays("CCO")
        # C one-hot at idx 1, O at idx 3; SP3 at 9+2; atomic number idx 12
        assert x[0, 1] == 1 and x[2, 3] == 1
        assert x[0, 11] == 1 and x[2, 11] == 1  # SP3
        assert x[0, 12] == 6 and x[2, 12] == 8
        assert (x[:, 13] == 0).all()  # not aromatic
        assert (x[:, 14] == 0).all()  # no explicit-H neighbors
        # both directions, sorted by src*N+dst
        key = s.astype(np.int64) * 3 + r
        assert (np.diff(key) > 0).all()
        assert e[:, 0].sum() == 4  # 2 single bonds x 2 directions

    def test_benzene_features(self):
        x, s, r, e = smiles_to_arrays("c1ccccc1")
        assert (x[:, 13] == 1).all()          # aromatic flags
        assert (x[:, 10] == 1).all()          # SP2
        assert (e[:, 3] == 1).all()           # aromatic bond one-hot
        assert e.shape[0] == 12               # 6 bonds x 2

    def test_unknown_symbol_zero_onehot(self):
        # reference one_of_k_encoding passes on unknown symbols
        x, *_ = smiles_to_arrays("[Na+].[Cl-]")
        assert x[0, :9].sum() == 0            # Na: all-zero symbol one-hot
        assert x[1, :9].sum() == 1            # Cl known

    def test_explicit_h_neighbor_count(self):
        x, *_ = smiles_to_arrays("[H]C([H])([H])[H]")
        c = x[np.argmax(x[:, 1])]
        assert c[14] == 4


class TestScaffold:
    def test_acyclic_empty(self):
        assert scaffold_key("CCO") == ""
        assert scaffold_key("CC(C)Br") == ""

    def test_same_scaffold(self):
        # toluene / ethylbenzene / phenol share the benzene scaffold
        keys = {scaffold_key(s) for s in ["Cc1ccccc1", "CCc1ccccc1",
                                          "Oc1ccccc1"]}
        assert len(keys) == 1 and "" not in keys

    def test_different_scaffolds(self):
        assert scaffold_key("c1ccccc1") != scaffold_key("c1ccncc1")
        assert scaffold_key("c1ccccc1") != scaffold_key("C1CCCCC1")

    def test_split_disjoint_and_deterministic(self):
        smis = ["Cc1ccccc1", "CCc1ccccc1", "c1ccncc1", "C1CCCCC1",
                "CC1CCCCC1", "c1ccc2ccccc2c1", "CCO", "CCC", "CCCC",
                "c1ccsc1"] * 5
        tr, va, te = random_scaffold_split(smis, seed=7)
        tr2, va2, te2 = random_scaffold_split(smis, seed=7)
        np.testing.assert_array_equal(tr, tr2)
        all_idx = np.concatenate([tr, va, te])
        assert len(set(all_idx.tolist())) == len(all_idx) == len(smis)
        # groups must not straddle splits
        groups = {}
        for i, s in enumerate(smis):
            groups.setdefault(scaffold_key(s), []).append(i)
        for g in groups.values():
            in_tr = any(i in set(tr.tolist()) for i in g)
            in_va = any(i in set(va.tolist()) for i in g)
            in_te = any(i in set(te.tolist()) for i in g)
            assert in_tr + in_va + in_te == 1

    def test_random_split_sizes(self):
        tr, va, te = random_split(100, seed=1)
        assert len(tr) == 80 and len(va) == 10 and len(te) == 10


class TestScaffoldRDKitParity:
    def test_acyclic_with_carbonyl_empty(self):
        # RDKit: acyclic molecules have empty scaffolds even with C=O
        assert scaffold_key("CC=O") == ""
        assert scaffold_key("CC(=O)O") == ""
        assert scaffold_key("N#CCCNCCC#N") == ""

    def test_aspirin_scaffold_is_benzene(self):
        assert scaffold_key("CC(=O)Oc1ccccc1C(=O)O") == \
            scaffold_key("c1ccccc1")

    def test_exocyclic_double_bond_kept(self):
        # cyclohexanone scaffold keeps the =O, so it differs from
        # plain cyclohexane
        assert scaffold_key("O=C1CCCCC1") != scaffold_key("C1CCCCC1")

    def test_linker_retained(self):
        # biphenyl-with-CH2-linker differs from benzene
        assert scaffold_key("c1ccccc1Cc1ccccc1") != scaffold_key("c1ccccc1")

    def test_organic_subset_two_letter(self):
        from glam_tpu.chem.smiles import parse_smiles
        # 'In1cccc1' = iodine + aromatic-N five-ring, NOT indium
        m = parse_smiles("In1cccc1")
        assert [a.symbol for a in m.atoms][:2] == ["I", "N"]
        assert len(m.atoms) == 6


class TestValenceSanitization:
    """RDKit-parity input sanitization (VERDICT round-3 item 3): the
    parser must REJECT chemically impossible valences that RDKit's
    sanitization rejects, so dataset membership on dirty corpora
    matches the reference's skip-row behavior
    (/root/reference/src_1gp/dataset.py:129,151-158)."""

    REJECTS = [
        "C(C)(C)(C)(C)C",      # pentavalent carbon
        "[CH5]",               # impossible explicit H count
        "FF(F)F",              # hypervalent fluorine
        "CN(=O)=O",            # pentavalent neutral N (nitro spelling)
        "O=Cl(=O)(=O)O",       # neutral hypervalent chlorine
        "O=I(=O)c1ccccc1",     # neutral hypervalent iodine
        "C[Na]C",              # divalent sodium
        "OO(O)O",              # trivalent oxygen
        "C=[CH3]",             # CH3 with a double bond = valence 5
    ]
    ACCEPTS = [
        "CCO", "c1ccccc1", "C1=CC=CN1", "c1cc[nH]c1",
        "[NH4+]",                         # N+ isoelectronic with C
        "[BH4-]",                         # B- (electropositive +charge)
        "C[N+](C)(C)C", "C[N+](=O)[O-]",  # charged nitro form
        "OS(=O)(=O)O", "FS(F)(F)(F)(F)F", # S(VI)
        "ClP(Cl)(Cl)(Cl)Cl",              # P(V)
        "[O-][Cl+3]([O-])([O-])[O-]",     # charge-separated perchlorate
        "[O-]c1ccccc1", "[Na+].[Cl-]", "[2H]OC", "[Fe+2]",
        "C[Si](C)(C)C", "[H][H]", "B(O)(O)O",
        "c1ccc2ccccc2c1", "C1=CC2=CC=CC2=C1",  # fused aromatics
    ]

    def test_rejects(self):
        from glam_tpu.chem.smiles import SmilesError
        for smi in self.REJECTS:
            with pytest.raises(SmilesError):
                parse_smiles(smi)

    def test_accepts(self):
        for smi in self.ACCEPTS:
            parse_smiles(smi)  # must not raise

    def test_validate_opt_out(self):
        # tools that need RDKit-free leniency can opt out explicitly
        m = parse_smiles("CN(=O)=O", validate=False)
        assert len(m.atoms) == 4

    def test_dataset_membership(self, tmp_path):
        # a dirty corpus row is SKIPPED (reference parity), not trained on
        from glam_tpu.data.datasets import MolDataset
        raw = tmp_path / "raw"
        raw.mkdir()
        rows = ["CCO,1", "C(C)(C)(C)(C)C,0", "c1ccccc1,1", "CCN,0",
                "CN(=O)=O,1", "CCCC,0", "CCOC,1", "CCCO,0", "CC=C,1",
                "CCC#N,0"]
        (raw / "demo.csv").write_text(
            "smiles,label\n" + "\n".join(rows) + "\n")
        ds = MolDataset(str(tmp_path), dataset="demo")
        total = len(ds.train) + len(ds.val) + len(ds.test)
        assert total == 8  # pentavalent-C and nitro-N rows are gone


class TestKekulizationCheck:
    """RDKit-parity kekulization (round 4): an aromatic-written system
    must admit a Kekulé assignment — rejects the classic dirty-corpus
    spelling n1cccc1 (pyrrole missing its [nH]) the way RDKit's
    "Can't kekulize mol" does."""

    REJECTS = [
        "n1cccc1",            # pyrrole-type N written pyridine-type
        "c1cccc1",            # odd all-carbon aromatic ring
        "c1ccn2ccccc2c1",     # neutral bridgehead-N 10-atom system
    ]
    ACCEPTS = [
        "c1ccccc1", "c1cc[nH]c1", "n1ccccc1", "c1ccncc1",
        "c1ccoc1", "c1ccsc1",
        "c1ccc2[nH]ccc2c1",        # indole
        "c1ccn2cccc2c1",           # indolizine (bridgehead n, no need)
        "c1ccc2cccc[n+]2c1",       # quinolizinium (bridgehead n+)
        "[nH+]1ccccc1",            # pyridinium
        "c1cc[n-]c1",              # pyrrolide anion
        "[o+]1ccccc1",             # pyrylium
        "c1ccc2ccccc2c1", "c1ccc2cccc2cc1",   # naphthalene, azulene
        "c1ccc2cc3ccccc3cc2c1",    # anthracene
        "O=c1cc[nH]cc1",           # exocyclic double supplies the pi
        "Cc1ccccc1", "c1ccc(cc1)-c1ccccc1",
        "C1=CC=CN1",               # Kekulé-written input: not checked
    ]

    def test_rejects(self):
        from glam_tpu.chem.smiles import SmilesError
        for smi in self.REJECTS:
            with pytest.raises(SmilesError):
                parse_smiles(smi)

    def test_accepts(self):
        for smi in self.ACCEPTS:
            parse_smiles(smi)

    def test_native_agreement(self):
        from glam_tpu.chem import native
        if not native.available():
            pytest.skip("native lib not built")
        for smi in self.REJECTS:
            with pytest.raises(ValueError):
                native.smiles_to_arrays_native(smi)
        for smi in self.ACCEPTS:
            native.smiles_to_arrays_native(smi)
