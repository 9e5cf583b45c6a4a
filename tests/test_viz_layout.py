"""Chemistry-standard 2D depiction (VERDICT round-3 missing #4 / item
7): rings render as regular polygons, fused systems share edges the way
chemists draw them, chains zigzag at 120 degrees, sp centers are
collinear — the properties RDKit's depiction (which the reference uses
via SimilarityMaps, src_1gp/visualize_gp.py:61-131) guarantees."""
import numpy as np
import pytest

from glam_tpu.chem.smiles import parse_smiles
from glam_tpu.viz.layout2d import layout2d


def _metrics(smi):
    mol = parse_smiles(smi)
    xy = layout2d(mol).astype(np.float64)
    bl = np.asarray([np.linalg.norm(xy[b.a] - xy[b.b])
                     for b in mol.bonds])
    med = float(np.median(bl))
    bonded = {(b.a, b.b) for b in mol.bonds}
    bonded |= {(b.b, b.a) for b in mol.bonds}
    n = len(mol.atoms)
    dmin = min((np.linalg.norm(xy[i] - xy[j])
                for i in range(n) for j in range(i + 1, n)
                if (i, j) not in bonded), default=np.inf)
    return mol, xy, bl / med, float(dmin) / med


class TestRings:
    def test_benzene_regular_hexagon(self):
        mol, xy, bl, dmin = _metrics("c1ccccc1")
        np.testing.assert_allclose(bl, 1.0, atol=1e-6)
        # all atoms equidistant from the centroid; 120-degree interior
        c = xy.mean(0)
        r = np.linalg.norm(xy - c, axis=1)
        np.testing.assert_allclose(r, r[0], atol=1e-6)
        assert dmin > 1.7  # cross-ring distance sqrt(3)

    @pytest.mark.parametrize("smi,sizes", [
        ("c1ccc2ccccc2c1", {6, 6}),          # naphthalene
        ("c1ccc2cccc2cc1", {5, 7}),          # azulene
        ("CN1C=NC2=C1C(=O)N(C(=O)N2C)C", {5, 6}),  # caffeine
        ("c1ccc2[nH]ccc2c1", {5, 6}),        # indole
    ])
    def test_fused_pairs_unit_bonds(self, smi, sizes):
        mol, xy, bl, dmin = _metrics(smi)
        # EVERY bond (incl. the fusion bond) has unit length: both
        # rings are regular polygons reflected across the shared edge
        np.testing.assert_allclose(bl, 1.0, atol=1e-5)
        assert dmin > 1.4

    def test_anthracene_linear_fusion(self):
        mol, xy, bl, dmin = _metrics("c1ccc2cc3ccccc3cc2c1")
        np.testing.assert_allclose(bl, 1.0, atol=1e-5)
        assert dmin > 1.4

    def test_peri_fused_pyrene(self):
        mol, xy, bl, dmin = _metrics("c1cc2ccc3cccc4ccc(c1)c2c34")
        np.testing.assert_allclose(bl, 1.0, atol=1e-5)
        assert dmin > 1.4


class TestChains:
    def test_hexane_zigzag(self):
        mol, xy, bl, dmin = _metrics("CCCCCC")
        np.testing.assert_allclose(bl, 1.0, atol=1e-6)
        # interior angles are 120 degrees
        for i in range(1, 5):
            v1 = xy[i - 1] - xy[i]
            v2 = xy[i + 1] - xy[i]
            cos = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
            np.testing.assert_allclose(cos, -0.5, atol=1e-5)
        # a true ZIGZAG extends (always turning one way would curl a
        # 6-chain into a closed hexagon with ends 1 bond apart);
        # bl is already in median-bond units
        med = float(np.median([np.linalg.norm(xy[b.a] - xy[b.b])
                               for b in mol.bonds]))
        assert np.linalg.norm(xy[5] - xy[0]) / med > 3.0

    def test_octane_extends(self):
        mol, xy, bl, dmin = _metrics("CCCCCCCC")
        # end-to-end distance grows monotonically along the chain
        d = [np.linalg.norm(xy[i] - xy[0]) for i in (3, 5, 7)]
        assert d[0] < d[1] < d[2]

    def test_triple_bond_collinear(self):
        mol, xy, bl, dmin = _metrics("CC#CC")
        v1 = xy[1] - xy[0]
        v2 = xy[2] - xy[1]
        v3 = xy[3] - xy[2]
        for a, b in ((v1, v2), (v2, v3)):
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            np.testing.assert_allclose(cos, 1.0, atol=1e-5)

    def test_substituted_ring_no_overlap(self):
        mol, xy, bl, dmin = _metrics("CC(C)Cc1ccc(cc1)C(C)C(=O)O")
        np.testing.assert_allclose(bl, 1.0, atol=1e-5)
        assert dmin > 0.9

    def test_disconnected_components_separated(self):
        mol, xy, bl, dmin = _metrics("[Na+].[Cl-].CCO")
        assert dmin > 1.0  # salts laid out side by side, no overlap


class TestRobustness:
    def test_bridged_fallback_no_collision(self):
        # polycyclic cage beyond the bicyclo template (morphinan):
        # relaxation repair — bonds may stretch, atoms may not coincide
        mol, xy, bl, dmin = _metrics("CN1CCC23c4c5ccc(O)c4OC2C(O)C=CC3C1C5")
        assert dmin > 0.4

    @pytest.mark.parametrize("name,smi", [
        ("norbornane", "C1CC2CCC1C2"),
        ("norbornene", "C1CC2CC1C=C2"),
        ("tropane", "CN1C2CCC1CC2"),
        ("camphor-skeleton", "CC1(C)C2CCC1(C)C(=O)C2"),
    ])
    def test_bicyclo_template_unit_bonds(self, name, smi):
        # bicyclo[x.y.z] cores take the TEMPLATE path (round 5, VERDICT
        # item 9): perimeter polygon at unit bonds + interior bridge
        # with the classic apex bow; no relaxation distortion
        mol, xy, bl, dmin = _metrics(smi)
        assert bl.min() > 0.95 and bl.max() < 1.2, (name, bl)
        assert dmin > 0.5, (name, dmin)

    def test_bicyclo222_compressed_bridge(self):
        # [2.2.2]: the interior 2-atom bridge draws compressed (the
        # standard depiction); perimeter stays unit
        mol, xy, bl, dmin = _metrics("C1CC2CCC1CC2")
        assert bl.max() < 1.2 and bl.min() > 0.55
        assert dmin > 0.45

    def test_adamantane_repair_acceptable(self):
        # 4 bridgeheads: beyond the bicyclo template, relaxation keeps
        # it printable
        mol, xy, bl, dmin = _metrics("C1C2CC3CC1CC(C2)C3")
        assert bl.max() < 1.4 and bl.min() > 0.6
        assert dmin > 0.45

    def test_corpus_smoke_no_collisions(self):
        import csv
        rows = list(csv.DictReader(open("datasets/demo/raw/demo.csv")))
        bad = 0
        for row in rows[:150]:
            try:
                _, _, bl, dmin = _metrics(row["smiles"])
            except ValueError:
                continue
            if dmin < 0.35 or bl.max() > 3.0:
                bad += 1
        assert bad <= 3  # bridged-system tolerance on a real corpus

    def test_goldens_render(self, tmp_path):
        from glam_tpu.viz.attention import draw_molecule
        for name, smi in [("aspirin", "CC(=O)Oc1ccccc1C(=O)O"),
                          ("caffeine", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C"),
                          ("azulene", "c1ccc2cccc2cc1"),
                          ("norbornane", "C1CC2CCC1C2"),
                          ("morphine",
                           "CN1CCC23c4c5ccc(O)c4OC2C(O)C=CC3C1C5")]:
            p = tmp_path / f"{name}.png"
            draw_molecule(smi, path=str(p), title=name)
            assert p.stat().st_size > 10_000
