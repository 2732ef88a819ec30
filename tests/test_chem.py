"""Chemistry kernel: SDF/SMILES parsing, perception, featurization, torsions.

Golden inputs come from the reference repo's example data files (data, not
code): /root/reference/examples/ligands/*.sdf.
"""

import os

import numpy as np
import pytest

from diffphore_tpu.chem import Molecule, mol_from_smiles, parse_sdf
from diffphore_tpu.chem.features import LIG_FEATURE_DIMS, featurize_atoms
from diffphore_tpu.chem.pharmacophore_rules import (
    PHORETYPES,
    ligand_phore_features,
    perceive_phore_types,
)
from diffphore_tpu.chem.sdf import write_sdf
from diffphore_tpu.chem.topology import rotatable_bonds

EXAMPLES = "/root/reference/examples/ligands"
T = {t: i for i, t in enumerate(PHORETYPES)}


@pytest.fixture(scope="module")
def stk243239():
    return parse_sdf(os.path.join(EXAMPLES, "STK243239.sdf"))[0]


def test_sdf_parse_basics(stk243239):
    m = stk243239
    assert m.num_atoms == 25
    assert len(m.bonds) == 26
    assert m.name == "STK243239"
    assert m.props.get("Clean Energy", "").strip() == "34.1907"
    zs = [a.atomic_num for a in m.atoms]
    assert zs.count(7) == 5 and zs.count(16) == 1 and zs.count(35) == 1


def test_aromaticity_perception(stk243239):
    m = stk243239
    # pyridine ring (atoms 3..8 0-based) + triazole ring (12..16) -> 11 atoms
    arom = [i for i, a in enumerate(m.atoms) if a.is_aromatic]
    assert set(range(3, 9)).issubset(arom)
    assert set(range(12, 17)).issubset(arom)
    # amide C=O and CH2/S must not be aromatic
    assert not m.atoms[1].is_aromatic and not m.atoms[11].is_aromatic


def test_remove_hs_preserves_h_counts(stk243239):
    m = stk243239
    noh = m.remove_hs()
    assert noh.num_atoms == 17
    # amide N (idx 2) had one explicit H
    assert noh.total_h_count(2) == 1
    # CH2 carbon (idx 10) had two
    assert noh.total_h_count(10) == 2
    # pyridine N (idx 8): zero
    assert noh.total_h_count(8) == 0


def test_phore_perception_on_example(stk243239):
    m = stk243239.remove_hs()
    fp, counts = perceive_phore_types(m)
    assert fp.shape == (17, 11)
    # donors: amide N-H (2), triazole N-H (16)
    assert fp[2, T["HD"]] == 1 and fp[16, T["HD"]] == 1
    # acceptors: carbonyl O is MB; pyridine N (8) and triazole N 14/15 are HA
    assert fp[8, T["HA"]] == 1
    assert fp[14, T["HA"]] == 1 and fp[15, T["HA"]] == 1
    # halogen-bond donor: Br (9)
    assert fp[9, T["XB"]] == 1
    # aromatic flags -> AR / CR, 2 aromatic rings
    assert fp[:, T["AR"]].sum() == 11
    assert counts["AR"] == 2
    # EX never set on atoms
    assert fp[:, T["EX"]].sum() == 0
    # thioether S: MB + HY
    assert fp[11, T["MB"]] == 1 and fp[11, T["HY"]] == 1


def test_norms_and_angles(stk243239):
    m = stk243239.remove_hs()
    fp, norms, a1, a2, counts = ligand_phore_features(m)
    assert norms.shape == (17, 11, 3)
    # AR norms are unit plane normals with (0, pi) window
    i = 4  # aromatic carbon
    assert np.isclose(np.linalg.norm(norms[i, T["AR"]]), 1.0, atol=1e-6)
    assert a2[i, T["AR"]] == np.pi
    # HD norm on amide N points away from its neighbors, pi/3 window if 1 root
    assert np.isclose(np.linalg.norm(norms[2, T["HD"]]), 1.0, atol=1e-6)


def test_rotatable_bonds(stk243239):
    m = stk243239.remove_hs()
    edges, masks = rotatable_bonds(m)
    # amide C-N(aryl), C(=O)-CH2, CH2-S, S-C(triazolyl) are rotatable
    assert len(edges) >= 4
    assert masks.shape == (len(edges), 17)
    for (u, v), mask in zip(edges, masks):
        assert not mask[u] and mask[v]
        assert 1 < mask.sum() < 16  # proper two-sided split


def test_all_example_ligands_parse_and_perceive():
    import glob

    files = sorted(glob.glob(os.path.join(EXAMPLES, "*.sdf")))
    assert len(files) >= 15
    for f in files:
        m = parse_sdf(f)[0].remove_hs()
        fp, counts = perceive_phore_types(m)
        assert fp.shape[0] == m.num_atoms
        assert fp[:, T["HY"]].sum() > 0  # drug-like: something hydrophobic
        feats = featurize_atoms(m)
        assert feats.shape == (m.num_atoms, 16)
        assert (feats < np.asarray(LIG_FEATURE_DIMS)).all() and (feats >= 0).all()
        edges, masks = rotatable_bonds(m)
        assert len(edges) < m.num_atoms


def test_smiles_parser_basics():
    benzene = mol_from_smiles("c1ccccc1")
    assert benzene.num_atoms == 6
    assert all(a.is_aromatic for a in benzene.atoms)
    assert all(benzene.total_h_count(i) == 1 for i in range(6))

    pyridine = mol_from_smiles("c1ccncc1")
    n_idx = next(i for i, a in enumerate(pyridine.atoms) if a.atomic_num == 7)
    assert pyridine.total_h_count(n_idx) == 0
    fp, _ = perceive_phore_types(pyridine)
    assert fp[n_idx, T["HA"]] == 1

    # charged + branch + ring-closure digits
    m = mol_from_smiles("C[N+](C)(C)CC([O-])=O")  # betaine
    zs = [a.atomic_num for a in m.atoms]
    assert zs.count(7) == 1 and zs.count(8) == 2
    fp, _ = perceive_phore_types(m)
    n_idx = zs.index(7)
    assert fp[n_idx, T["PO"]] == 1
    o_indices = [i for i, z in enumerate(zs) if z == 8]
    assert all(fp[i, T["NE"]] == 1 for i in o_indices)


def test_smiles_acid_and_phenol():
    aspirin = mol_from_smiles("CC(=O)Oc1ccccc1C(=O)O")
    fp, counts = perceive_phore_types(aspirin)
    assert counts["AR"] == 1
    zs = [a.atomic_num for a in aspirin.atoms]
    # carboxylic acid: OH donor + NE on acid oxygens
    acid_oh = [i for i, z in enumerate(zs) if z == 8 and aspirin.total_h_count(i) == 1]
    assert len(acid_oh) == 1 and fp[acid_oh[0], T["HD"]] == 1
    assert fp[:, T["NE"]].sum() == 2

    phenol = mol_from_smiles("Oc1ccccc1")
    fp, _ = perceive_phore_types(phenol)
    assert fp[0, T["HD"]] == 1 and fp[0, T["HA"]] == 1 and fp[0, T["MB"]] == 1


def test_sdf_roundtrip(tmp_path, stk243239):
    m = stk243239
    path = str(tmp_path / "out.sdf")
    write_sdf(m, path, multi_coords=[m.coords, m.coords + 1.0], name="x", marker="rank",
              properties={"fitscore": [0.5, 0.25]})
    back = parse_sdf(path)
    assert len(back) == 2
    assert back[0].num_atoms == 25
    assert np.allclose(back[1].coords, m.coords + 1.0, atol=1e-3)
    assert back[0].props["fitscore"].strip() == "0.5"
    assert back[0].name == "x_rank_0"


def test_featurizer_ethanol():
    m = mol_from_smiles("CCO")
    f = featurize_atoms(m)
    # carbon 0: z index 5, degree 4 (1 heavy + 3 H), numH 3, sp3
    assert f[0][0] == 5 and f[0][2] == 4 and f[0][5] == 3 and f[0][7] == 2
    # oxygen: z index 7, numH 1
    assert f[2][0] == 7 and f[2][5] == 1
    # no rings
    assert (f[:, 9:] == 0).all()


# ---------------------------------------------------------------------------
# AncPhore lipophilicity HY branch (chem/lipo.py; reference hy_check with
# follow_ancphore=True, process_mols.py:564-600)
# ---------------------------------------------------------------------------

def _embedded(smiles: str):
    from diffphore_tpu.chem.embed import embed_molecule

    m = mol_from_smiles(smiles)
    m.coords = embed_molecule(m, seed=0)
    return m


def test_lipo_factors_polar_attenuation():
    from diffphore_tpu.chem.lipo import label_lipo_atoms

    # Ethanol C-C-O: O-H zeroes its shell (the attached C) and that C's
    # neighbours; the terminal methyl survives only via... it is a neighbour
    # of the zeroed C, so it is scaled to 0 too.
    m = mol_from_smiles("CCO")
    p = label_lipo_atoms(m)
    assert p[2] == 0.0  # O itself
    assert p[1] == 0.0  # carbinol C
    assert p[0] == 0.0  # methyl C, killed by the O-H second shell

    # Pure hydrocarbon keeps factor 1 everywhere.
    hexane = mol_from_smiles("CCCCCC")
    assert np.all(label_lipo_atoms(hexane) == 1.0)

    # Carbonyl: the C=O partner and its other neighbours are zeroed; the 0.6
    # attenuation lands three bonds out from O.  Acetone CC(=O)C therefore
    # zeroes everything; 3-pentanone keeps its terminal methyls at 0.6.
    acetone = mol_from_smiles("CC(=O)C")
    assert np.all(label_lipo_atoms(acetone) == 0.0)
    pentanone = mol_from_smiles("CCC(=O)CC")
    p = label_lipo_atoms(pentanone)
    assert p[2] == 0.0 and p[3] == 0.0  # carbonyl C and O
    assert p[1] == 0.0 and p[4] == 0.0  # alpha carbons
    assert p[0] == pytest.approx(0.6) and p[5] == pytest.approx(0.6)

    # Charged atom kills its neighbourhood.
    betaine = mol_from_smiles("C[N+](C)(C)CC([O-])=O")
    p = label_lipo_atoms(betaine)
    assert np.all(p == 0.0)


def test_accessible_surface_monotone():
    from diffphore_tpu.chem.lipo import accessible_surface

    # A bare atom is fully accessible; adding neighbours reduces area.
    lone = Molecule([type(mol_from_smiles("C").atoms[0])(6)], [], coords=[[0.0, 0.0, 0.0]])
    area_lone = accessible_surface(lone, 0, "HY")
    r = 1.7 + 1.4
    assert area_lone == pytest.approx(4 * np.pi * 1.7 * 1.7, rel=0.02)

    m = _embedded("CC")
    a0 = accessible_surface(m, 0, "HY")
    assert 0.0 < a0 < area_lone

    mid = _embedded("CCC")
    a_mid = accessible_surface(mid, 1, "HY")
    assert a_mid < a0  # two blockers < one blocker

    frac = accessible_surface(m, 0, "HA")
    assert 0.0 < frac < 1.0


def test_hy_ancphore_benzene_ring_flagged():
    from diffphore_tpu.chem.lipo import hy_check_ancphore

    m = _embedded("c1ccccc1")
    hy = hy_check_ancphore(m)
    assert hy.all()  # aromatic CH ring: 6 x (1.0 x ~20 A^2) >> 9.87


def test_hy_ancphore_polar_ring_not_flagged():
    from diffphore_tpu.chem.lipo import hy_check_ancphore

    # Glycine: charged/polar everywhere -> nothing hydrophobic.
    m = _embedded("NCC(=O)O")
    assert not hy_check_ancphore(m).any()


def test_hy_ancphore_methyl_group_rule():
    from diffphore_tpu.chem.lipo import hy_check_ancphore

    # Neopentane C(C)(C)(C)C: each methyl has >2 Hs, the central C has 0 Hs;
    # per-methyl group sum = own lipo (~15-20 A^2) > 9.87 -> flagged.
    m = _embedded("CC(C)(C)C")
    hy = hy_check_ancphore(m)
    assert hy[0] and hy[2] and hy[3] and hy[4]

    # Chloroform-like CHCl3: single-H carbon, no ring, no >2H atom -> no HY
    # under the AncPhore rules (the default SMARTS rule WOULD flag the C).
    chcl3 = _embedded("ClC(Cl)Cl")
    assert not hy_check_ancphore(chcl3).any()
    fp, _ = perceive_phore_types(chcl3)
    assert fp[1, T["HY"]] == 1  # contrast: default rule flags it


def test_ligand_phore_features_follow_ancphore_flag():
    m = _embedded("c1ccccc1CCO")
    fp_def, *_rest, counts_def = ligand_phore_features(m)
    fp_anc, *_rest, counts_anc = ligand_phore_features(m, follow_ancphore=True)
    # Only the HY column may differ; others identical.
    for t, k in T.items():
        if t == "HY":
            continue
        assert np.array_equal(fp_def[:, k], fp_anc[:, k])
    assert counts_anc["HY"] == int(fp_anc[:, T["HY"]].sum())
