"""Complex-based .phore generation (reference generate_complex_phore,
process_pharmacophore.py:854 / phor_gen templates run_phore.py:22-36).

No protein structures ship with the reference, so the pocket is synthesized
around a real example ligand: complementary partner atoms are placed at
interaction distance from perceived ligand features and the generated phore
must (a) contain the expected typed features, (b) round-trip the .phore
parser, and (c) score the crystal ligand clearly better than a shifted decoy
pose.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.complex_phore import (
    _ligand_sites, generate_complex_phore, read_protein_atoms,
)
from diffphore_tpu.chem.mol import vdw_radius
from diffphore_tpu.data.phore import parse_phore, write_phore
from diffphore_tpu.ops.fitscore import fitscore, make_phore_arrays

LIG = "/root/reference/examples/ligands/STK243239.sdf"


def _pdb_line(serial, name, resname, chain, resseq, xyz, element):
    return (f"ATOM  {serial:5d} {name:<4s}{resname:>4s} {chain}{resseq:4d}    "
            f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}  1.00  0.00          "
            f"{element:>2s}")


@pytest.fixture(scope="module")
def pocket(tmp_path_factory):
    """Synthesize a pocket PDB complementary to the ligand's features."""
    mol = parse_sdf(LIG)[0].remove_hs()
    sites = _ligand_sites(mol)
    center = mol.coords.mean(0)

    def away(pos, dist):
        v = np.asarray(pos) - center
        n = np.linalg.norm(v)
        u = v / n if n > 1e-6 else np.array([1.0, 0, 0])
        return np.asarray(pos) + dist * u

    lines = []
    serial = [0]
    resseq = [0]

    def add(name, resname, pos, element):
        serial[0] += 1
        resseq[0] += 1
        lines.append(_pdb_line(serial[0], name, resname, "A", resseq[0],
                               pos, element))

    # backbone O acceptor 2.9 A outward from the first ligand donor
    assert sites["HD"], "example ligand must have a donor"
    add("O", "GLY", away(sites["HD"][0][0], 2.9), "O")
    # SER OG donor 2.9 A from the first ligand acceptor
    assert sites["HA"], "example ligand must have an acceptor"
    add("OG", "SER", away(sites["HA"][0][0], 2.9), "O")
    # PHE ring 4.0 A above the first aromatic ring centroid
    assert sites["AR"], "example ligand must have an aromatic ring"
    ar_pos = away(sites["AR"][0][0], 4.0)
    ring_names = ("CG", "CD1", "CD2", "CE1", "CE2", "CZ")
    ring_res = resseq[0] + 1
    for k, nm in enumerate(ring_names):
        ang = 2 * np.pi * k / 6
        serial[0] += 1
        lines.append(_pdb_line(
            serial[0], nm, "PHE", "A", ring_res,
            ar_pos + 1.39 * np.array([np.cos(ang), np.sin(ang), 0.0]), "C"))
    resseq[0] = ring_res
    # LEU side-chain carbon 4.0 A from the first hydrophobic centroid
    assert sites["HY"]
    add("CD1", "LEU", away(sites["HY"][0][0], 4.0), "C")
    # a few pocket wall atoms for exclusion volumes
    for k in range(5):
        add("CB", "ALA", away(mol.coords[k % mol.num_atoms], 3.6), "C")
    # a water that must be ignored
    add("O", "HOH", center + 30.0, "O")

    pdb = tmp_path_factory.mktemp("pocket") / "pocket.pdb"
    pdb.write_text("\n".join(lines) + "\nEND\n")
    return str(pdb), mol


def test_read_protein_atoms(pocket):
    pdb, _ = pocket
    atoms = read_protein_atoms(pdb)
    assert all(a.resname != "HOH" for a in atoms)
    assert any(a.resname == "PHE" for a in atoms)


def test_generate_and_roundtrip(pocket, tmp_path):
    pdb, mol = pocket
    phore = generate_complex_phore(pdb, mol, name="toy_complex")
    types = {f.type for f in phore.features}
    assert {"HD", "HA", "AR", "HY"} <= types, types
    assert len(phore.exclusion_volumes) >= 5
    # features sit on the ligand, norms point outward toward the pocket
    lig_min = mol.coords.min(0) - 1e-3
    lig_max = mol.coords.max(0) + 1e-3
    for f in phore.features:
        c = np.asarray(f.coord)
        assert ((lig_min <= c) & (c <= lig_max)).all()
        assert f.has_norm

    out = str(tmp_path / "toy.phore")
    write_phore(phore, out, overwrite=True)
    parsed = parse_phore(out)[0]
    assert len(parsed.features) == len(phore.features)
    assert len(parsed.exclusion_volumes) == len(phore.exclusion_volumes)
    assert {f.type for f in parsed.features} == types


def test_crystal_ligand_scores_sensibly(pocket, tmp_path):
    pdb, mol = pocket
    phore = generate_complex_phore(pdb, mol)
    ref = make_phore_arrays(phore)
    vdw = jnp.asarray([vdw_radius(a.atomic_num) for a in mol.atoms], jnp.float32)
    from diffphore_tpu.chem.pharmacophore_rules import scoring_phore_fp

    fp = jnp.asarray(scoring_phore_fp(mol), jnp.float32)
    mask = jnp.ones(mol.num_atoms, bool)
    crystal = fitscore(jnp.asarray(mol.coords, jnp.float32), mask, fp, vdw, ref)
    decoy = fitscore(jnp.asarray(mol.coords + 5.0, jnp.float32), mask, fp, vdw, ref)
    assert float(crystal["phscore1"]) > 0.3
    assert float(crystal["phscore1"]) > float(decoy["phscore1"]) + 0.2
    # the crystal pose matches every emitted feature (it generated them)
    assert float(crystal["match_pct"]) >= 0.8


def test_bridge_reference_signature(pocket, tmp_path):
    """utils.ancphore_bridge.generate_complex_phore keeps the reference file
    contract ({tmp_dir}/complex_phores/{id}_complex.phore + content string,
    process_pharmacophore.py:854-883)."""
    from diffphore_tpu.utils.ancphore_bridge import generate_complex_phore

    pdb, mol = pocket
    lig = str(tmp_path / "lig.sdf")
    from diffphore_tpu.chem.sdf import write_sdf

    write_sdf(mol, lig)
    content = generate_complex_phore(lig, pdb, "toy", tmp_dir=str(tmp_path))
    out = tmp_path / "complex_phores" / "toy_complex.phore"
    assert out.exists()
    assert content.startswith("toy_complex")
    assert "$$$$" in content
