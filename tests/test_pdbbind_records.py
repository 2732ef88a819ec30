"""PDBbind split-file record discovery.

Reference counterpart: PhoreDataset's PDBbind-layout conventions
(pdbbind_phore.py read_mol / complex_names_all handling) — a split file of
complex names resolves to {data_dir}/{flag}/{name}/{name}_complex.phore plus
the ligand file searched in the per-complex dir then the ligands/ dir, with
.sdf preferred over .mol2; names missing either file are dropped silently.
"""

import os
import shutil

from diffphore_tpu.data.dataset import records_from_pdbbind_split

SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
LIG = "/root/reference/examples/ligands/STK243239.sdf"


def _mk(tmp_path, name, phore=True, lig_where="complex", lig_ext="sdf"):
    os.makedirs(tmp_path / "phore" / name, exist_ok=True)
    if phore:
        shutil.copy(SQC, tmp_path / "phore" / name / f"{name}_complex.phore")
    if lig_where == "complex":
        os.makedirs(tmp_path / name, exist_ok=True)
        shutil.copy(LIG, tmp_path / name / f"{name}_ligand.{lig_ext}")
    elif lig_where == "ligands":
        os.makedirs(tmp_path / "ligands", exist_ok=True)
        shutil.copy(LIG, tmp_path / "ligands" / f"{name}_ligand.{lig_ext}")


def test_split_resolution_and_skips(tmp_path):
    _mk(tmp_path, "1abc", lig_where="complex")          # per-complex dir
    _mk(tmp_path, "2def", lig_where="ligands")          # ligands/ fallback
    _mk(tmp_path, "3ghi", phore=False)                  # no phore -> dropped
    _mk(tmp_path, "4jkl", lig_where="none")             # no ligand -> dropped
    split = tmp_path / "timesplit_test"
    split.write_text("1abc\n2def\n3ghi\n4jkl\n\n5zzz\n")

    recs = records_from_pdbbind_split(str(split), str(tmp_path))

    assert [r["name"] for r in recs] == ["1abc", "2def"]
    assert recs[0]["ligand_description"].endswith("1abc/1abc_ligand.sdf")
    assert recs[1]["ligand_description"].endswith("ligands/2def_ligand.sdf")
    assert all(r["phore"].endswith(f"{r['name']}_complex.phore") for r in recs)


def test_sdf_preferred_over_mol2(tmp_path):
    _mk(tmp_path, "1abc", lig_where="complex", lig_ext="mol2")
    shutil.copy(LIG, tmp_path / "1abc" / "1abc_ligand.sdf")
    split = tmp_path / "split"
    split.write_text("1abc\n")
    recs = records_from_pdbbind_split(str(split), str(tmp_path))
    assert recs[0]["ligand_description"].endswith(".sdf")


def test_skip_marker_negative_cache(tmp_path):
    """Records that fail featurization (or exceed bucket caps) are
    negative-cached with a .skip marker so later dataset constructions
    don't refeaturize them."""
    from diffphore_tpu.data.dataset import DatasetSettings, PhoreDataset

    recs = [
        {"name": "bad", "ligand_description": "not_a_smiles((("},
        {"name": "ok", "ligand_description": "c1ccccc1C(=O)NC"},
    ]
    s = DatasetSettings(ligand_only=True)
    ds = PhoreDataset(recs, s, str(tmp_path), name="t")
    assert len(ds) == 1
    skips = [
        f for _, _, fs in os.walk(tmp_path) for f in fs if f.endswith(".skip")
    ]
    assert len(skips) == 1
    # second construction: the skip marker suppresses refeaturization
    assert len(PhoreDataset(recs, s, str(tmp_path), name="t")) == 1
