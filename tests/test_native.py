"""Native C++ library vs Python oracle parity tests.

Skipped when native/lib/libglam_native.so has not been built
(native/build.sh)."""
import numpy as np
import pandas as pd
import pytest

from glam_tpu.chem import native
from glam_tpu.chem.featurize import smiles_to_arrays
from glam_tpu.data.graph import build_ell

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="glam_native not built")

MOLECULES = [
    "CCO", "c1ccccc1", "C1=CC=CC=C1", "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "c1cc[nH]c1", "[NH4+].[Cl-]",
    "C#N", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "O=C1C=CC(=O)C=C1",
    "[Na+].CCOc1ccc2ccccc2c1C(=O)N[C@H]3[C@H]4SC(C)(C)[C@@H](N4C3=O)C([O-])=O",
    # azulene-class fused aromatics, both spellings (byte-exact twin)
    "C1=CC2=CC=CC=CC2=C1", "c1ccc2cccc2cc1", "OC1=CC2=CC=CC=CC2=C1",
    "C1=CC2=CC=CC12",  # pentalene: must stay NON-aromatic in both
]


class TestNativeFeaturizer:
    @pytest.mark.parametrize("smi", MOLECULES)
    def test_parity_vs_python(self, smi):
        xp, sp, rp, ep = smiles_to_arrays(smi)
        xn, sn, rn, en = native.smiles_to_arrays_native(smi)
        np.testing.assert_array_equal(xn, xp)
        np.testing.assert_array_equal(sn, sp)
        np.testing.assert_array_equal(rn, rp)
        np.testing.assert_array_equal(en, ep)

    def test_demo_corpus_parity(self):
        df = pd.read_csv("datasets/demo/raw/demo.csv").head(200)
        mismatches = 0
        for smi in df.smiles:
            try:
                xp, sp, rp, ep = smiles_to_arrays(smi)
            except Exception:
                with pytest.raises(Exception):
                    native.smiles_to_arrays_native(smi)
                continue
            xn, sn, rn, en = native.smiles_to_arrays_native(smi)
            if not (np.array_equal(xn, xp) and np.array_equal(sn, sp)
                    and np.array_equal(rn, rp) and np.array_equal(en, ep)):
                mismatches += 1
        assert mismatches == 0

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            native.smiles_to_arrays_native("C1CC")


class TestNativeEll:
    def test_parity(self):
        rng = np.random.RandomState(0)
        snd = rng.randint(0, 10, 24).astype(np.int32)
        rcv = rng.randint(0, 10, 24).astype(np.int32)
        k = int(np.bincount(rcv, minlength=12).max()) + 1
        nb_p, ei_p, mk_p = build_ell(snd, rcv, 12, k)
        nb_n, ei_n, mk_n = native.build_ell_native(snd, rcv, 12, k)
        np.testing.assert_array_equal(nb_n, nb_p)
        np.testing.assert_array_equal(ei_n, ei_p)
        np.testing.assert_array_equal(mk_n, mk_p)

    def test_overflow(self):
        snd = np.zeros(5, np.int32)
        rcv = np.zeros(5, np.int32)
        with pytest.raises(ValueError):
            native.build_ell_native(snd, rcv, 3, 4)


class TestNativePackBatch:
    def test_byte_exact_vs_python(self):
        """glam_pack_batch output must equal the Python pad_graphs loop
        field-for-field (the Python path is the oracle)."""
        import glam_tpu.chem.native as nat
        from glam_tpu.data.graph import pad_graphs
        from conftest import SMILES_SET, graphs_from_smiles
        graphs = graphs_from_smiles(SMILES_SET)
        # the C++ packer is opt-in (measured slower than the numpy
        # loop, data/graph.py); force it on for the parity check
        enabled = nat.pack_enabled
        nat.pack_enabled = nat.available
        try:
            b_nat = pad_graphs(graphs, 6, 96, 160, 1)
        finally:
            nat.pack_enabled = enabled
        b_py = pad_graphs(graphs, 6, 96, 160, 1)
        for f in b_py._fields:
            a, b = getattr(b_py, f), getattr(b_nat, f)
            if a is None:
                assert b is None, f
                continue
            assert np.array_equal(np.asarray(a), np.asarray(b)), f

    def test_over_budget_raises(self):
        from glam_tpu.data.graph import pad_graphs
        from conftest import SMILES_SET, graphs_from_smiles
        graphs = graphs_from_smiles(SMILES_SET)
        with pytest.raises(ValueError):
            pad_graphs(graphs, 6, 16, 16, 1)


class TestNativeValenceAgreement:
    """The C++ twin must make the SAME accept/reject decision as the
    Python oracle on RDKit-invalid inputs — with the native featurizer
    default-ON, a disagreement would silently change dataset membership
    depending on which backend built the corpus."""

    def test_probe_agreement(self):
        from tests.test_chem import TestValenceSanitization as TV
        for smi in TV.REJECTS:
            with pytest.raises(ValueError):
                native.smiles_to_arrays_native(smi)
        for smi in TV.ACCEPTS:
            xp, sp, rp, ep = smiles_to_arrays(smi)
            xn, sn, rn, en = native.smiles_to_arrays_native(smi)
            np.testing.assert_array_equal(xn, xp)
