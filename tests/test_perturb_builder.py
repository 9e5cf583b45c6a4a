"""Perturbation-benchmark BUILDER (reference
src_perturbed_dataset/perturb-real_point.ipynb): Morgan fingerprints,
bucketed candidate mining, scaffold-split assembly, and a round-trip
through the PerturbationDataset/perturb_test loaders."""
import numpy as np
import pandas as pd
import pytest

from glam_tpu.chem.fingerprints import (fingerprint, fingerprint_matrix,
                                        tanimoto, tanimoto_row)
from glam_tpu.data.perturb_builder import (LEVEL_BUCKETS,
                                           build_perturbed_dataset,
                                           find_perturb_candidates)


class TestFingerprints:
    def test_identity_and_spelling_invariance(self):
        a = fingerprint("c1ccccc1O")
        b = fingerprint("Oc1ccccc1")
        assert tanimoto(a, b) == 1.0

    def test_similar_ranks_above_dissimilar(self):
        base = fingerprint("CCCCCO")        # pentanol
        near = fingerprint("CCCCCCO")       # hexanol
        far = fingerprint("c1ccc2ccccc2c1")  # naphthalene
        assert tanimoto(base, near) > tanimoto(base, far)
        assert 0.0 < tanimoto(base, near) < 1.0

    def test_row_matches_pairwise(self):
        smis = ["CCO", "CCCO", "c1ccccc1", "CC(=O)O", "CCN"]
        fps = fingerprint_matrix(smis)
        row = tanimoto_row(fps, 0)
        for j in range(len(smis)):
            assert row[j] == pytest.approx(tanimoto(fps[0], fps[j]))
        assert row[0] == 1.0

    def test_unparseable_is_zero(self):
        assert fingerprint("((((") is None
        fps = fingerprint_matrix(["CCO", "(((("])
        assert fps[1].sum() == 0


def _homologous_corpus():
    """Alcohol/acid/amine homolog series + phenols: dense similarity
    neighborhoods so every bucket has candidates."""
    rng = np.random.RandomState(0)
    smis, vals = [], []
    for n in range(1, 11):
        chain = "C" * n
        for head, off in [("O", 0.0), ("N", 0.3), ("C(=O)O", 0.6),
                          ("CO", 0.9), ("S", 1.2)]:
            smis.append(chain + head)
            vals.append(0.5 * n + off)
    for sub in ["", "C", "CC", "O", "N", "Cl", "CCl", "CO", "CN", "CCC"]:
        smis.append(f"{sub}c1ccccc1O" if sub else "c1ccccc1O")
        vals.append(1.0 + 0.1 * len(sub))
    vals = [v + 0.01 * rng.randn() for v in vals]
    return pd.DataFrame({"SMILES": smis, "LogP": vals})


class TestBuilder:
    def test_candidates_respect_buckets_and_threshold(self):
        df = _homologous_corpus()
        cands = find_perturb_candidates(df.SMILES, df.LogP, thre=0.5)
        assert cands, "corpus must yield eligible molecules"
        fps = fingerprint_matrix(df.SMILES.astype(str).tolist())
        vals = df.LogP.to_numpy()
        for i, found in cands.items():
            assert set(found) == {1, 2, 3}
            for level, (j, sim) in found.items():
                lo, hi = LEVEL_BUCKETS[level]
                assert lo <= sim < hi
                assert sim == pytest.approx(tanimoto(fps[i], fps[j]))
                assert abs(vals[j] - vals[i]) < 0.5
                assert j != i

    def test_build_schema_and_disjointness(self, tmp_path):
        df = _homologous_corpus()
        out = build_perturbed_dataset(df, thre=0.5, seed=3)
        assert list(out.columns) == [
            "Label", "SMILES", "LogP",
            "SMILES_1", "LogP_1", "Similrity_1",
            "SMILES_2", "LogP_2", "Similrity_2",
            "SMILES_3", "LogP_3", "Similrity_3"]
        test = out[out.Label == "test"]
        assert len(test) > 0
        assert set(out.Label) <= {"train", "val", "test"}
        # every molecule seen in a test row (original or perturbed) is
        # excluded from train/val (notebook cell 24)
        seen = set(test.SMILES)
        for k in (1, 2, 3):
            seen |= set(test[f"SMILES_{k}"])
            assert test[f"Similrity_{k}"].notna().all()
        trval = out[out.Label != "test"]
        assert not (set(trval.SMILES) & seen)
        assert trval[["SMILES_1", "LogP_1"]].isna().all().all()

    def test_roundtrip_through_pasp_loaders(self, tmp_path):
        """The builder's CSV loads into PerturbationDataset and
        perturb_test — the complete reference pipeline, construction
        through consumption."""
        from glam_tpu.data.perturb import PerturbationDataset, perturb_test
        df = _homologous_corpus()
        root = tmp_path / "built"
        (root / "raw").mkdir(parents=True)
        build_perturbed_dataset(
            df, str(root / "raw" / "physprop_perturb.csv"),
            thre=0.5, seed=3)
        ds = PerturbationDataset(str(root))
        assert len(ds.train) and len(ds.test)
        for level in (1, 2, 3):
            m, mp, q, qp = perturb_test(str(root), level=level)
            assert len(m) == len(mp) == len(q) == len(qp) > 0
            assert np.all(np.abs(q - qp) < 0.5)

    def test_too_diverse_corpus_raises(self):
        df = pd.DataFrame({"SMILES": ["C", "c1ccccc1", "C(F)(F)F"],
                           "LogP": [0.0, 1.0, 2.0]})
        with pytest.raises(ValueError, match="three similarity levels"):
            build_perturbed_dataset(df)
