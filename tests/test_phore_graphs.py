"""Phore parser + padded complex construction, golden-checked on the sQC
example data shipped with the reference."""

import numpy as np
import pytest

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.graphs import build_complex, concat_batches, pad_to_bucket, repeat_batch
from diffphore_tpu.data.phore import PHORETYPES, build_phore_graph, parse_phore, write_phore

SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
LIG = "/root/reference/examples/ligands/STK243239.sdf"


@pytest.fixture(scope="module")
def sqc():
    return parse_phore(SQC)[0]


def test_parse_sqc(sqc):
    assert sqc.id == "sQC_Substrate"
    types = [f.type for f in sqc.features]
    assert types == ["MB", "HD", "HD", "HD", "HA"]
    assert len(sqc.exclusion_volumes) == 74
    mb = sqc.features[0]
    assert mb.weight == 1.5 and mb.alpha == 1.0 and mb.has_norm
    assert np.allclose(mb.coord, (36.397, 46.317, 53.961))
    ex = sqc.exclusion_volumes[0]
    assert ex.alpha == 0.837 and not ex.has_norm


def test_phore_graph_topology(sqc):
    g = build_phore_graph(sqc)
    P = g.pos.shape[0]
    assert P == 79 and g.num_features == 5
    src, dst = g.edge_index
    # features fully connected among themselves
    feat_edges = [(s, d) for s, d in zip(src, dst) if s < 5]
    assert len(feat_edges) == 5 * 4
    assert all(d < 5 for _, d in feat_edges)
    # no self edges; every node has at least one outgoing edge
    assert (src != dst).all()
    assert set(range(P)) == set(src.tolist())
    # featurizer columns: EX rows have type index 10 and is_ex index 0
    assert (g.x[5:, 0] == 10).all() and (g.x[5:, 1] == 0).all()
    assert (g.x[:5, 1] == 1).all()
    # norms: unit for has_norm features, zero for EX
    assert np.allclose(np.linalg.norm(g.norm[:5], axis=1), 1.0, atol=1e-6)
    assert np.allclose(g.norm[5:], 0.0)


def test_phore_roundtrip(tmp_path, sqc):
    path = write_phore(sqc, str(tmp_path), name="roundtrip")
    back = parse_phore(path)[0]
    assert len(back.features) == 5 and len(back.exclusion_volumes) == 74
    assert np.allclose(back.features[0].coord, sqc.features[0].coord, atol=1e-3)


def test_build_complex(sqc):
    mol = parse_sdf(LIG)[0].remove_hs()
    c = build_complex("sQC__STK243239", mol, sqc)
    assert c.batch_size == 1
    assert c.num_atoms % 8 == 0 and c.num_phore % 8 == 0
    n = mol.num_atoms
    assert c.lig_mask[0].sum() == n
    assert c.phore_mask[0].sum() == 79
    # centered: phore centroid at origin
    ppos = np.asarray(c.phore_pos[0][np.asarray(c.phore_mask[0])])
    assert np.allclose(ppos.mean(0), 0.0, atol=1e-4)
    # bond adjacency symmetric, no self bonds
    bm = np.asarray(c.bond_mask[0])
    assert (bm == bm.T).all() and not bm.diagonal().any()
    # phorefp nonzero somewhere, norms shaped (11, A, 3)
    assert np.asarray(c.lig_phorefp[0]).sum() > 0
    assert c.lig_norm.shape == (1, 11, c.num_atoms, 3)
    # padded atoms have zero features
    assert np.asarray(c.lig_feat[0][n:]).sum() == 0


def test_repeat_and_concat(sqc):
    mol = parse_sdf(LIG)[0].remove_hs()
    c = build_complex("x", mol, sqc)
    r = repeat_batch(c, 4)
    assert r.batch_size == 4 and len(r.names) == 4
    assert np.allclose(np.asarray(r.lig_pos[0]), np.asarray(r.lig_pos[3]))

    c2 = build_complex("y", mol, sqc)
    a_pad = max(c.num_atoms, c2.num_atoms)
    p_pad = max(c.num_phore, c2.num_phore)
    t_pad = max(c.num_torsions, c2.num_torsions)
    padded = pad_to_bucket([c, c2], a_pad, p_pad, t_pad)
    both = concat_batches(padded)
    assert both.batch_size == 2 and both.names == ("x", "y")


def test_phore_seed_augmentation():
    """A record-level phore_seed swaps the real phore for a random
    ligand-derived sub-phore (distinct per seed), anchored at the ligand's
    clean pose — the --phore_augment data-augmentation path."""
    from diffphore_tpu.data.dataset import DatasetSettings, featurize_record

    mapped = ("/root/reference/examples/output/2/mapping_process/"
              "sQC_Substrate__STK243239/sQC_Substrate__STK243239.sdf")
    s = DatasetSettings()
    base = {"name": "aug_probe", "ligand_description": mapped,
            "phore": SQC, "pose_index": 0}
    real = featurize_record(base, s)
    aug1 = featurize_record({**base, "phore_seed": 1, "aug_num_ex": 2}, s)
    aug2 = featurize_record({**base, "phore_seed": 2, "aug_num_ex": 2}, s)
    assert real is not None and aug1 is not None and aug2 is not None
    # augmented records drop the real 79-point phore for a small sub-phore
    n_real = int(np.asarray(real.phore_mask[0]).sum())
    n_a1 = int(np.asarray(aug1.phore_mask[0]).sum())
    n_a2 = int(np.asarray(aug2.phore_mask[0]).sum())
    assert n_real == 79 and n_a1 < n_real and n_a2 < n_real
    # seeds give distinct phores
    p1 = np.asarray(aug1.phore_pos[0])[: n_a1]
    p2 = np.asarray(aug2.phore_pos[0])[: n_a2]
    assert n_a1 != n_a2 or not np.allclose(p1, p2)
    # ligand pose is unchanged by augmentation (same clean pose, both
    # frames centered on their own phore centroid so compare shapes)
    la = np.asarray(aug1.lig_pos[0])[np.asarray(aug1.lig_mask[0])]
    lr = np.asarray(real.lig_pos[0])[np.asarray(real.lig_mask[0])]
    assert np.allclose(la - la.mean(0), lr - lr.mean(0), atol=1e-4)
    # the random sub-phore sits at the ligand (features perceived from it):
    # phore centroid within a few A of the ligand centroid in world frame
    assert np.linalg.norm(la.mean(0)) < 10.0


def test_conf_seed_augmentation():
    """A record-level conf_seed re-embeds the ligand (fresh conformer as the
    ground-truth pose) and derives a sub-phore from it — the --conf_augment
    path. Distinct seeds must give distinct poses; the real-pose record is
    untouched."""
    from diffphore_tpu.data.dataset import DatasetSettings, featurize_record
    from diffphore_tpu.chem.rmsd import plain_rmsd

    mapped = ("/root/reference/examples/output/2/mapping_process/"
              "sQC_Substrate__STK243239/sQC_Substrate__STK243239.sdf")
    s = DatasetSettings()
    base = {"name": "conf_probe", "ligand_description": mapped,
            "phore": SQC, "pose_index": 0}
    real = featurize_record(base, s)
    c1 = featurize_record({**base, "conf_seed": 1, "aug_num_ex": 2}, s)
    c2 = featurize_record({**base, "conf_seed": 2, "aug_num_ex": 2}, s)
    assert real is not None and c1 is not None and c2 is not None
    assert c1.num_atoms == real.num_atoms
    # conformer records drop the real phore for a ligand-derived sub-phore
    assert int(np.asarray(c1.phore_mask[0]).sum()) < int(
        np.asarray(real.phore_mask[0]).sum())

    def pose(c):
        return np.asarray(c.lig_pos[0])[np.asarray(c.lig_mask[0])]

    # the embedded conformer is a genuinely different pose from the crystal
    # one, and the two seeds differ from each other (centered RMSD > 0.5 A
    # rules out a rigid translation explaining the difference)
    pr, p1, p2 = pose(real), pose(c1), pose(c2)
    assert plain_rmsd(p1 - p1.mean(0), pr - pr.mean(0)) > 0.5
    assert plain_rmsd(p1 - p1.mean(0), p2 - p2.mean(0)) > 0.5
    # sub-phore anchored at the new pose
    assert np.linalg.norm(p1.mean(0)) < 10.0


def test_records_from_csv_drops_nan_cells(tmp_path):
    """Optional CSV columns (pose_index/conf_seed/aug_num_ex) must not leak
    NaN cells into records: the record dict is the featurization cache key,
    so a row without a value has to hash identically to a row from a CSV
    that never had the column (cache stability across CSV schema growth)."""
    from diffphore_tpu.data.dataset import _record_key, records_from_csv

    p1 = tmp_path / "plain.csv"
    p1.write_text("name,ligand_description,phore,pose_index\n"
                  "A,foo.sdf,bar.phore,0\n")
    p2 = tmp_path / "extended.csv"
    p2.write_text(
        "name,ligand_description,phore,pose_index,conf_seed,aug_num_ex\n"
        "A,foo.sdf,bar.phore,0,,\n"
        "B,baz.sdf,bar.phore,0,100,2\n")
    r1, r2 = records_from_csv(str(p1)), records_from_csv(str(p2))
    assert r1[0] == r2[0]
    assert _record_key(r1[0]) == _record_key(r2[0])
    assert "conf_seed" not in r2[0]
    assert r2[1]["conf_seed"] == 100 and r2[1]["aug_num_ex"] == 2


def test_bucket_floor_settings_coarsen_shapes():
    """a_min/p_min/t_min raise the bucket floors so a size-diverse library
    lands in few (A, P, T) shapes (one XLA compile per shape); the digest
    changes so coarse and fine featurizations never share a cache dir."""
    from diffphore_tpu.data.dataset import DatasetSettings, featurize_record

    mapped = ("/root/reference/examples/output/2/mapping_process/"
              "sQC_Substrate__STK243239/sQC_Substrate__STK243239.sdf")
    fine = DatasetSettings()
    coarse = DatasetSettings(a_min=32, p_min=96, t_min=8, p_step=32)
    assert fine.digest() != coarse.digest()
    rec = {"name": "bucket_probe", "ligand_description": mapped,
           "phore": SQC, "pose_index": 0}
    f = featurize_record(rec, fine)
    c = featurize_record(rec, coarse)
    assert f is not None and c is not None
    assert c.lig_pos.shape[1] >= 32 and c.lig_pos.shape[1] % 8 == 0
    assert c.phore_pos.shape[1] >= 96 and (c.phore_pos.shape[1] - 96) % 32 == 0
    assert c.tor_mask.shape[1] >= 8
    # padding must not change the real content
    n = int(np.asarray(f.lig_mask[0]).sum())
    assert int(np.asarray(c.lig_mask[0]).sum()) == n
    np.testing.assert_allclose(
        np.asarray(f.lig_pos[0, :n]), np.asarray(c.lig_pos[0, :n]))
