"""Stereo-aware molecule identity (VERDICT r2 item 3).

The reference dedups molecules by RDKit canonical SMILES with
isomericSmiles=True (src_1gp/dataset.py:154, src_2gi_ddi/dataset.py:
118-124), so stereoisomers are distinct identities while respellings of
one molecule collapse.  Scaffold identity ignores chirality
(includeChirality=False, src_1gp/utils.py:31-39).
"""
import numpy as np

from glam_tpu.chem.featurize import smiles_to_arrays
from glam_tpu.chem.scaffold import molecule_key, scaffold_key
from glam_tpu.chem.smiles import parse_smiles
from glam_tpu.chem.stereo import (double_bond_descriptors,
                                  tetrahedral_descriptors, wl_refine)


def _keys(*smis):
    out = [molecule_key(s) for s in smis]
    assert all(out), out
    return out


class TestTetrahedral:
    def test_enantiomers_distinct(self):
        a, b = _keys("N[C@@H](C)C(=O)O", "N[C@H](C)C(=O)O")
        assert a != b

    def test_stereo_vs_flat_distinct(self):
        a, b = _keys("N[C@@H](C)C(=O)O", "NC(C)C(=O)O")
        assert a != b

    def test_respelling_h_first(self):
        # swapping the first two written neighbors flips the tag
        a, b = _keys("C[C@H](N)C(=O)O", "[C@@H](C)(N)C(=O)O")
        assert a == b

    def test_respelling_branch_order(self):
        a, b = _keys("N[C@@H](C)C(=O)O", "N[C@H](C(=O)O)C")
        assert a == b

    def test_ring_closure_slot(self):
        # the ring bond occupies the neighbor slot of its OPENING digit
        same = _keys("C[C@H]1CCCO1", "C[C@@H]1OCCC1")
        assert same[0] == same[1]
        ent = molecule_key("C[C@@H]1CCCO1")
        assert ent != same[0]

    def test_three_neighbor_lone_pair(self):
        # sulfoxide chirality: lone pair is the phantom 4th neighbor
        a, b = _keys("C[S@](=O)c1ccccc1", "C[S@@](=O)c1ccccc1")
        assert a != b

    def test_symmetric_center_ignored(self):
        # two WL-identical neighbors: '@' carries no information
        a, b = _keys("C[C@H](C)O", "CC(C)O")
        assert a == b

    def test_features_stereo_free(self):
        # the 15-dim layout has no stereo columns (src_1gp/dataset.py)
        for flat, iso in [("NC(C)C(=O)O", "N[C@@H](C)C(=O)O"),
                          ("FC=CF", "F/C=C/F")]:
            fa = smiles_to_arrays(flat)
            fb = smiles_to_arrays(iso)
            for x, y in zip(fa, fb):
                np.testing.assert_array_equal(x, y)


class TestDoubleBond:
    def test_cis_trans_distinct(self):
        a, b = _keys("F/C=C/F", "F/C=C\\F")
        assert a != b

    def test_configured_vs_flat_distinct(self):
        a, b = _keys("F/C=C/F", "FC=CF")
        assert a != b

    def test_slash_flip_invariance(self):
        a, b = _keys("F/C=C/F", "F\\C=C\\F")
        assert a == b

    def test_butene(self):
        t, c = _keys("C/C=C/C", "C/C=C\\C")
        assert t != c

    def test_direction_on_far_substituent(self):
        # config spelled on the OTHER substituent of the sp2 carbon:
        # C(/F)=... flips the side relative to /C(F)=
        a, b = _keys("C/C(F)=C/C", "C(\\C)(/F)=C/C")
        assert a == b

    def test_conflicting_directions_dropped(self):
        """Contradictory directional bonds on one side (geometrically
        impossible, both substituents 'same side') must NOT resolve
        written-order dependently: the descriptor is dropped, so the
        respelling that swaps the two substituents keeps ONE key, and
        both equal the flat (non-stereo) spelling — RDKit's
        conflicting-bond-direction behavior."""
        a, b = _keys("C(/F)(/Cl)=C/Br", "C(/Cl)(/F)=C/Br")
        assert a == b
        flat, = _keys("C(F)(Cl)=CBr")
        assert a == flat

    def test_symmetric_side_ignored(self):
        # both substituents on one side identical: not stereogenic
        a, b = _keys("C/C(C)=C/F", "CC(C)=CF")
        assert a == b


class TestScaffoldStereoFree:
    def test_scaffold_ignores_chirality(self):
        s1 = scaffold_key("N[C@@H](C)C1CCCCC1")
        s2 = scaffold_key("N[C@H](C)C1CCCCC1")
        assert s1 == s2 != ""


class TestSpellingInvarianceStillHolds:
    def test_nonstereo_collapse(self):
        for a, b in [("CCO", "OCC"), ("c1ccccc1", "C1=CC=CC=C1"),
                     ("C1=CC=CN1", "c1cc[nH]c1")]:
            ka, kb = _keys(a, b)
            assert ka == kb, (a, b)

    def test_corpus_smoke(self):
        # stereo-bearing drugs parse and key without error
        drugs = [
            "C[C@@H](CS)C(=O)N1CCC[C@H]1C(=O)O",                # captopril
            "CC(C)C[C@H](NC(=O)[C@@H](N)Cc1ccccc1)C(=O)O",      # dipeptide
            "C/C=C/C=C/C(=O)O",                                  # sorbic acid
            "OC(=O)/C=C\\C(=O)O",                                # maleic
            "OC(=O)/C=C/C(=O)O",                                 # fumaric
        ]
        keys = _keys(*drugs)
        assert len(set(keys)) == len(keys)
        # maleic != fumaric is exactly the cis/trans split
        assert keys[3] != keys[4]


class TestExoticStereoDroppedLoudly:
    """@TB/@OH tags carry no canonical descriptor: identities merge
    (unlike the reference's isomericSmiles=True dedup,
    src_2gi_ddi/dataset.py:118-124) — but never silently.  Every drop
    is counted and warned (VERDICT round-3 item 6).  @AL is
    canonicalized since round 4 (TestAlleneStereo) and @SP since round
    5 (TestSquarePlanarStereo); only their UNRESOLVABLE centers hit
    the counter."""

    def setup_method(self):
        from glam_tpu.chem.smiles import reset_exotic_stereo_counts
        reset_exotic_stereo_counts()

    def test_counter_and_warning(self):
        import warnings
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          parse_smiles)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            parse_smiles("S[As@TB1](F)(Cl)Br")          # trig. bipyr.
            parse_smiles("F[Co@OH1](F)(F)(F)(F)F")      # octahedral
            # @AL and @SP are CANONICALIZED (allene_descriptors /
            # square_planar_descriptors), not counted at parse
            parse_smiles("CC(F)=[C@AL1]=C(C)Cl")
            parse_smiles("F[Pt@SP1](Cl)(Cl)F")
        counts = exotic_stereo_counts()
        assert counts == {"TB": 1, "OH": 1}
        assert sum("DROPPED for molecule identity" in str(x.message)
                   for x in w) == 2

    def test_identities_merge_as_documented(self):
        # the documented (loud) behavior: TB/OH tags differing only in
        # the exotic permutation number map to ONE key
        from glam_tpu.chem.scaffold import molecule_key
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            k1 = molecule_key("S[As@TB1](F)(Cl)(Br)N")
            k2 = molecule_key("S[As@TB2](F)(Cl)(Br)N")
        assert k1 and k1 == k2

    def test_reset(self):
        import warnings
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          parse_smiles,
                                          reset_exotic_stereo_counts)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            parse_smiles("F[Co@OH1](F)(F)(F)(F)F")
        assert exotic_stereo_counts()
        reset_exotic_stereo_counts()
        assert exotic_stereo_counts() == {}

    def test_tetrahedral_unaffected(self):
        # ordinary @/@@ still canonicalize, no counter tick
        from glam_tpu.chem.scaffold import molecule_key
        from glam_tpu.chem.smiles import exotic_stereo_counts
        ka = molecule_key("C[C@@H](N)C(=O)O")
        kb = molecule_key("C[C@H](N)C(=O)O")
        assert ka and kb and ka != kb
        assert exotic_stereo_counts() == {}

    def test_ddi_store_report(self, tmp_path):
        from glam_tpu.data.pair_datasets import DDIDataset
        raw = tmp_path / "raw"
        raw.mkdir()
        (raw / "ddi.csv").write_text(
            "Drug1_SMILES,Drug2_SMILES,label\n"
            "S[As@TB1](F)(Cl)(Br)N,CCO,1\n"
            "S[As@TB2](F)(Cl)(Br)N,CCN,0\n"
            "CCO,CCN,1\n")
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ds = DDIDataset(str(tmp_path), dataset="ddi")
        # the two @TB spellings merged into ONE store molecule — the
        # report counts unique merged identities, not parse events
        assert ds.n_exotic_stereo_dropped == 1
        as_keys = {k for k in ds.mol_store
                   if ds.mol_store[k].smi.startswith("S[As")}
        assert len(as_keys) == 1
        # @SP canonicalizes (round 5): cis/trans spellings stay
        # DISTINCT store molecules, no drop counted
        (raw / "ddi.csv").write_text(
            "Drug1_SMILES,Drug2_SMILES,label\n"
            "N[Pt@SP1](N)(Cl)Cl,CCO,1\n"
            "N[Pt@SP1](Cl)(N)Cl,CCN,0\n")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ds2 = DDIDataset(str(tmp_path), dataset="ddi")
        assert ds2.n_exotic_stereo_dropped == 0
        pt_keys = {k for k in ds2.mol_store
                   if ds2.mol_store[k].smi.startswith("N[Pt")}
        assert len(pt_keys) == 2


class TestAlleneStereo:
    """@AL allene axial chirality (round 4): canonicalized as OpenSMILES
    extended tetrahedral — the two termini's substituents, in order of
    appearance, interpreted like '@'/'@@' — so respellings collapse and
    enantiomers stay distinct."""

    def _key(self, s):
        import warnings
        from glam_tpu.chem.scaffold import molecule_key
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return molecule_key(s)

    def test_enantiomers_distinct(self):
        a = self._key("CC(F)=[C@AL1]=C(C)Cl")
        b = self._key("CC(F)=[C@AL2]=C(C)Cl")
        assert a and b and a != b

    def test_substituent_swap_respelling_collapses(self):
        # swapping one terminus's substituents in the writing is an
        # ODD permutation: the flipped tag spells the SAME enantiomer
        a = self._key("CC(F)=[C@AL1]=C(C)Cl")
        assert self._key("FC(C)=[C@AL2]=C(C)Cl") == a
        # ...and without the flip it is the OTHER one
        assert self._key("FC(C)=[C@AL1]=C(C)Cl") == \
            self._key("CC(F)=[C@AL2]=C(C)Cl")

    def test_terminus_exchange_collapses(self):
        # writing the termini in the other order is the EVEN (13)(24)
        # permutation: same tag, same molecule
        a = self._key("CC(F)=[C@AL1]=C(C)Cl")
        assert self._key("CC(Cl)=[C@AL1]=C(C)F") == a

    def test_implicit_h_termini(self):
        # 1-fluoro-3-methylallene: H occupies its terminus's written
        # slot; enantiomers resolve
        f1 = self._key("CC=[C@AL1]=CF")
        f2 = self._key("CC=[C@AL2]=CF")
        assert f1 and f2 and f1 != f2

    def test_symmetric_allene_enantiomers_distinct(self):
        # penta-2,3-diene (1,3-dimethylallene): the common chiral-
        # allene pattern — termini tie pairwise, the appearance-order
        # tie-break resolves it (ADVICE round-4); no drop is counted
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          reset_exotic_stereo_counts)
        reset_exotic_stereo_counts()
        g1 = self._key("CC=[C@AL1]=CC")
        g2 = self._key("CC=[C@AL2]=CC")
        assert g1 and g2 and g1 != g2
        assert exotic_stereo_counts() == {}
        # 1,3-difluoroallene too
        f1 = self._key("FC=[C@AL1]=CF")
        f2 = self._key("FC=[C@AL2]=CF")
        assert f1 and f2 and f1 != f2

    def test_symmetric_allene_respelling_collapses(self):
        # starting the traversal AT a terminus cycles the four
        # substituent slots (odd): the flipped tag spells the SAME
        # enantiomer and must share its key
        a1 = self._key("CC=[C@AL1]=CC")
        a2 = self._key("CC=[C@AL2]=CC")
        assert self._key("C(=[C@AL2]=CC)C") == a1
        assert self._key("C(=[C@AL1]=CC)C") == a2
        # explicit-H bracket spelling of the terminus: H stays in its
        # written slot
        assert self._key("C[CH]=[C@AL1]=CC") == a1

    def test_nonstereogenic_allene_counted_not_silent(self):
        # 1,1-dimethyl terminus: two WL-equal substituents on ONE
        # terminus — genuinely non-stereogenic, the bogus tag is
        # COUNTED as dropped
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          reset_exotic_stereo_counts)
        reset_exotic_stereo_counts()
        g1 = self._key("CC(C)=[C@AL1]=CC")
        g2 = self._key("CC(C)=[C@AL2]=CC")
        assert g1 == g2 != ""
        assert exotic_stereo_counts().get("AL", 0) == 2

    def test_untagged_allene_unaffected(self):
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          reset_exotic_stereo_counts)
        reset_exotic_stereo_counts()
        k = self._key("CC(F)=C=C(C)Cl")
        assert k and exotic_stereo_counts() == {}


class TestSquarePlanarStereo:
    """@SP square-planar stereo (round 5, VERDICT item 6): canonical
    trans-pairing descriptors — cis/trans platin-class isomers get
    distinct keys, respellings (order permutations with the
    compensating class change, traversal changes) collapse."""

    def _key(self, s):
        import warnings
        from glam_tpu.chem.scaffold import molecule_key
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return molecule_key(s)

    def test_cis_trans_platin_distinct(self):
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          reset_exotic_stereo_counts)
        reset_exotic_stereo_counts()
        cis = self._key("N[Pt@SP1](N)(Cl)Cl")     # U: N trans Cl x2
        trans = self._key("N[Pt@SP1](Cl)(N)Cl")   # U: N-N, Cl-Cl
        assert cis and trans and cis != trans
        assert exotic_stereo_counts() == {}

    def test_class_respelling_collapses(self):
        # same LIGAND order, different class = different pairing:
        # @SP2 ('4': slots 0-1 and 2-3 trans) on [N,N,Cl,Cl] is the
        # TRANS isomer; @SP3 ('Z': 0-3, 1-2) is cis again
        cis = self._key("N[Pt@SP1](N)(Cl)Cl")
        trans = self._key("N[Pt@SP1](Cl)(N)Cl")
        assert self._key("N[Pt@SP2](N)(Cl)Cl") == trans
        assert self._key("N[Pt@SP3](N)(Cl)Cl") == cis
        # order permutation with the compensating class change
        assert self._key("N[Pt@SP2](Cl)(N)Cl") == cis

    def test_four_distinct_ligands(self):
        # OpenSMILES spec example shape: C trans Cl under @SP1
        a = self._key("C[Pt@SP1](F)(Cl)I")
        b = self._key("C[Pt@SP2](F)(Cl)I")
        c = self._key("C[Pt@SP3](F)(Cl)I")
        assert len({a, b, c}) == 3
        # swapping two ligands in the writing with the matching class
        # change respells the same isomer: [C,F,Cl,I]@SP1 pairs
        # (C,Cl),(F,I); [F,C,Cl,I]@SP3 pairs (F,I),(C,Cl) — same
        assert self._key("F[Pt@SP3](C)(Cl)I") == a

    def test_implicit_h_slot(self):
        # bracket H occupies its written slot (after the preceding
        # atom): [Pt@SP1H](C)(F)Cl order is [H,C,F,Cl]? — first-atom
        # centers put H first; via a preceding atom the H sits at
        # slot 1.  C[Pt@SP1H](F)Cl = [C,H,F,Cl]: trans (C,F),(H,Cl)
        a = self._key("C[Pt@SP1H](F)Cl")
        b = self._key("C[Pt@SP2H](F)Cl")
        assert a and b and a != b

    def test_three_identical_ligands_merge_all_classes(self):
        # {Cl,Cl,Cl,N}: all three pairings give the same rank multiset
        # — genuinely no cis/trans isomerism, all classes one key
        k1 = self._key("Cl[Pt@SP1](Cl)(Cl)N")
        k2 = self._key("Cl[Pt@SP2](Cl)(Cl)N")
        k3 = self._key("Cl[Pt@SP3](Cl)(Cl)N")
        assert k1 == k2 == k3 != ""

    def test_malformed_sp_counted(self):
        # 3-coordinate @SP center cannot be interpreted: counted drop
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          reset_exotic_stereo_counts)
        reset_exotic_stereo_counts()
        k = self._key("C[Pt@SP1](F)Cl")
        assert k != ""
        assert exotic_stereo_counts().get("SP", 0) == 1

    def test_tb_oh_still_counted(self):
        from glam_tpu.chem.smiles import (exotic_stereo_counts,
                                          reset_exotic_stereo_counts)
        reset_exotic_stereo_counts()
        k = self._key("S[As@TB1](F)(Cl)(Br)N")
        assert k != ""
        assert exotic_stereo_counts().get("TB", 0) == 1
