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


def test_v2_templates_well_formed():
    """Every v2 core/cap/linker template composes to parseable SMILES."""
    from diffphore_tpu.chem.smiles import mol_from_smiles
    from diffphore_tpu.data.synth_library import (
        CAPS_HELDOUT, CAPS_TRAIN, CORES_V2_HELDOUT, CORES_V2_TRAIN, LINKERS,
        _fill_site)

    bad = []
    for name, t in {**CORES_V2_TRAIN, **CORES_V2_HELDOUT}.items():
        s = _fill_site(_fill_site(t, "{R1}", "C"), "{R2}", "C")
        try:
            mol_from_smiles(s)
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)))
    for name, c in {**CAPS_TRAIN, **CAPS_HELDOUT}.items():
        try:
            mol_from_smiles("C" + c)
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)))
    for lk in LINKERS:
        try:
            mol_from_smiles("c1ccccc1" + lk + "c8ccccc8")
        except Exception as e:  # noqa: BLE001
            bad.append((lk, str(e)))
    assert not bad, bad


def test_v2_generation_reference_scale():
    """The v2 generator hits the reference's operating envelope (round-4
    verdict missing #3): heavy atoms past 35, torsions 6-15."""
    from diffphore_tpu.data.synth_library import generate_library_v2

    smis, metas = generate_library_v2(30, seed=123)
    assert len(smis) == 30
    h = np.asarray([m["heavy"] for m in metas])
    t = np.asarray([m["torsions"] for m in metas])
    assert (t >= 6).all() and (t <= 15).all()
    assert (h >= 20).all() and (h <= 48).all()
    assert (t >= 8).sum() >= 5, "flexible tail missing"


def test_v2_scaffold_split_is_disjoint():
    """Held-out ring systems appear in NO train-side pool, and held-out
    molecules use held-out cores only (round-4 verdict missing #2)."""
    from diffphore_tpu.data.synth_library import (
        CAPS_HELDOUT, CAPS_TRAIN, CORES_V2_HELDOUT, CORES_V2_TRAIN,
        SCAFFOLDS, SUBSTITUENTS, N_SUBSTITUENTS, generate_library_v2)

    assert not set(CORES_V2_HELDOUT) & set(CORES_V2_TRAIN)
    assert not set(CAPS_HELDOUT) & set(CAPS_TRAIN)
    # no held-out cap fragment is reachable from any train-side pool
    train_frags = (list(CAPS_TRAIN.values()) + list(SUBSTITUENTS)
                   + list(N_SUBSTITUENTS) + list(SCAFFOLDS)
                   + list(CORES_V2_TRAIN.values()))
    for cap in CAPS_HELDOUT.values():
        assert all(cap not in f for f in train_frags), cap
    smis, metas = generate_library_v2(15, seed=7, heldout=True)
    assert {m["core"] for m in metas} <= set(CORES_V2_HELDOUT)
    for m in metas:
        assert set(m["caps"]) <= set(CAPS_HELDOUT)
    # train-side molecules never contain a held-out cap fragment
    smis_t, _ = generate_library_v2(15, seed=8)
    for cap in CAPS_HELDOUT.values():
        assert all(cap not in s for s in smis_t)
