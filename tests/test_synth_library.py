"""Synthetic ligand library generator (data/synth_library.py): the
ligand-only pretraining data source (reference ChEMBL mode,
pdbbind_phore.py:820-918, dataset not shipped)."""

import numpy as np

from diffphore_tpu.data.synth_library import (
    SCAFFOLDS,
    generate_library,
    write_library_csv,
)


def test_generate_library_valid_and_distinct():
    lib = generate_library(12, seed=3)
    assert len(lib) == 12
    assert len(set(lib)) == 12
    from diffphore_tpu.chem.pharmacophore_rules import ligand_phore_features
    from diffphore_tpu.chem.smiles import mol_from_smiles

    for s in lib:
        mol = mol_from_smiles(s)
        assert 8 <= mol.num_atoms <= 48
        fp, _, _, _, _ = ligand_phore_features(mol)
        # enough typed atoms to support random sub-phore extraction
        assert int((fp[:, :-1].sum(axis=1) > 0).sum()) >= 4
        # substituent ring digits (8/9) never collide with scaffold rings:
        # every closure digit must appear an even number of times
        for d in "1289":
            assert s.count(d) % 2 == 0, (s, d)


def test_library_feeds_ligand_only_featurization(tmp_path):
    """A generated CSV row must featurize through the ligand-only dataset
    path (SMILES -> embed -> random ligand phore -> ComplexBatch)."""
    from diffphore_tpu.data.dataset import (
        DatasetSettings,
        featurize_record,
        records_from_csv,
    )

    lib = generate_library(2, seed=11)
    csv_path = tmp_path / "lib.csv"
    write_library_csv(str(csv_path), lib)
    records = records_from_csv(str(csv_path))
    assert len(records) == 2 and records[0]["name"] == "synth_00000"
    s = DatasetSettings(ligand_only=True)
    batch = featurize_record(records[0], s)
    assert batch is not None
    assert np.isfinite(np.asarray(batch.lig_pos)).all()
    assert int(np.asarray(batch.phore_mask[0]).sum()) >= 4


def test_scaffold_sites_well_formed():
    # every scaffold fills to a parseable SMILES with the H substituent
    from diffphore_tpu.chem.smiles import mol_from_smiles
    from diffphore_tpu.data.synth_library import _fill_site

    bad = []
    for sc in SCAFFOLDS:
        s = sc
        for site in ("{R1}", "{R2}", "{N1}", "{N2}"):
            s = _fill_site(s, site, "C")
        try:
            mol_from_smiles(s)
        except Exception as e:  # noqa: BLE001
            bad.append((sc, str(e)))
    assert not bad, bad
