"""Native ancphore CLI, subprocess bridge, baselines, coordinate recovery."""

import json
import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLD_SDF = "/root/reference/examples/output/1/mapping_process/sQC_Substrate__STK936575/sQC_Substrate__STK936575.sdf"
GOLD_SCORE = "/root/reference/examples/output/1/mapping_process/sQC_Substrate__STK936575/sQC_Substrate__STK936575.score"
SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"


@pytest.fixture(scope="module")
def binary():
    from diffphore_tpu.utils.ancphore_bridge import ensure_built

    path = ensure_built()
    assert path is not None, "C++ ancphore failed to build"
    return path


def test_cpp_scorer_matches_ancphore_ranking(binary, tmp_path):
    out = str(tmp_path / "scores.score")
    subprocess.run(
        [binary, "-d", GOLD_SDF, "--refphore", SQC, "--scores", out,
         "usedMultiConformerFile", "formodel"],
        check=True, timeout=120,
    )
    mine = np.array([[float(x) for x in l.split("\t")[3:]] for l in open(out)])
    ref = np.array([[float(x) for x in l.strip().split("\t")[3:]] for l in open(GOLD_SCORE)])
    assert len(mine) == 40
    # V_ref identity is exact
    assert np.allclose(mine[:, 3], 99.2225, atol=1e-3)
    rank = lambda x: np.argsort(np.argsort(x))
    rc = np.corrcoef(rank(mine[:, -4]), rank(ref[:, -4]))[0, 1]
    assert rc > 0.7, rc


def test_bridge_api(binary, tmp_path):
    from diffphore_tpu.utils.ancphore_bridge import calc_phore_fitting

    score_file = str(tmp_path / "s.score")
    scores = calc_phore_fitting(GOLD_SDF, SQC, score_file, overwrite=True)
    assert scores is not None and len(scores) == 40
    all_cols = calc_phore_fitting(GOLD_SDF, SQC, score_file, return_all=True)
    assert len(all_cols[0]) == 5
    # custom coefficients land in the custom-fitness column (index 6 -> -6);
    # the PhScore columns are fixed presets and must NOT change
    s2 = calc_phore_fitting(GOLD_SDF, SQC, str(tmp_path / "s2.score"),
                            overwrite=True, overlap_coeff=0.5, percent_coeff=0.5,
                            fitness=6)
    s2_ph1 = calc_phore_fitting(GOLD_SDF, SQC, str(tmp_path / "s2.score"), fitness=1)
    assert s2 is not None and not np.allclose(s2, scores)
    assert np.allclose(s2_ph1, scores)


def test_baseline_run_phore(tmp_path):
    import pandas as pd

    csv = tmp_path / "tasks.csv"
    pd.DataFrame([
        {"ligand_description": "/root/reference/examples/ligands/STK936575.sdf",
         "phore": SQC},
        {"ligand_description": "CCO", "phore": ""},  # SMILES + random phore
    ]).to_csv(csv, index=False)
    from diffphore_tpu.baselines.run_phore import main

    main(["--dataset_csv", str(csv), "--out_dir", str(tmp_path / "out"),
          "--tool", "ancphore"])
    results = json.load(open(tmp_path / "out" / "ancphore_results.json"))
    assert len(results) >= 1
    assert all(np.isfinite(r["best_score"]) for r in results)


def test_baseline_missing_binary_skips(tmp_path):
    import pandas as pd

    csv = tmp_path / "tasks.csv"
    pd.DataFrame([{ "ligand_description": "/root/reference/examples/ligands/STK936575.sdf", "phore": SQC}]).to_csv(csv, index=False)
    from diffphore_tpu.baselines.run_phore import main

    # pharao is not installed: must not raise
    main(["--dataset_csv", str(csv), "--out_dir", str(tmp_path / "out2"),
          "--tool", "pharao", "--binary", "pharao_not_installed"])


def test_coord_recovery_roundtrip():
    import jax
    import jax.numpy as jnp

    from diffphore_tpu.chem import parse_sdf
    from diffphore_tpu.ops.coord_recovery import las_distance_matrix, recover_coords

    mol = parse_sdf("/root/reference/examples/ligands/STK936575.sdf")[0].remove_hs()
    from diffphore_tpu.data.phore import parse_phore

    phore = parse_phore(SQC)[0]
    phore_pos = jnp.asarray(np.asarray([f.coord for f in phore.features]), jnp.float32)
    # pose the conformer at the phore centroid (the input SDF frame is
    # arbitrary; cross distances must fall under the 10 A loss cutoff)
    true = mol.coords - mol.coords.mean(0) + np.asarray(phore_pos).mean(0)
    true = jnp.asarray(true, jnp.float32)
    pred_dist = jnp.linalg.norm(true[:, None] - phore_pos[None], axis=-1)
    holo, mask = las_distance_matrix(mol)
    coords, loss = jax.jit(
        lambda k: recover_coords(k, phore_pos, pred_dist,
                                 jnp.ones_like(pred_dist, bool), holo, mask,
                                 n_init=2, steps=300)
    )(jax.random.PRNGKey(0))
    assert float(loss) < 1.0  # distances reproduced
    d = np.linalg.norm(np.asarray(coords)[:, None] - np.asarray(phore_pos)[None], axis=-1)
    assert np.abs(d - np.asarray(pred_dist)).mean() < 0.5


def test_phore_screen_task(binary, tmp_path):
    """--task screen really screens: ranked CSV + AUC/EF from labels
    (round-1 weakness: the flag silently ran the align loop)."""
    import pandas as pd

    from diffphore_tpu.baselines.run_phore import main as phore_main

    ligs = ["STK243239", "STK255897", "STK324209"]
    csv = tmp_path / "screen.csv"
    pd.DataFrame([
        {"ligand_description": f"/root/reference/examples/ligands/{n}.sdf",
         "label": int(i == 0)}
        for i, n in enumerate(ligs)
    ]).to_csv(csv, index=False)
    out = tmp_path / "screen_out"
    phore_main(["--task", "screen", "--tool", "ancphore",
                "--dataset_csv", str(csv), "--phore", SQC,
                "--out_dir", str(out)])
    ranked = pd.read_csv(out / "ancphore_screen_ranked.csv")
    assert len(ranked) == 3
    assert list(ranked["best_score"]) == sorted(ranked["best_score"], reverse=True)
    summary = json.load(open(out / "ancphore_screen_summary.json"))
    assert 0.0 <= summary["roc_auc"] <= 1.0


def test_phore_fishing_task(binary, tmp_path):
    """--task fishing ranks a phore library for one query ligand."""
    import shutil as _sh

    import pandas as pd

    from diffphore_tpu.baselines.run_phore import main as phore_main

    phore_dir = tmp_path / "phores"
    phore_dir.mkdir()
    _sh.copy(SQC, phore_dir / "targetA.phore")
    _sh.copy(SQC, phore_dir / "targetB.phore")
    out = tmp_path / "fishing_out"
    phore_main(["--task", "fishing", "--tool", "ancphore",
                "--ligand", "/root/reference/examples/ligands/STK243239.sdf",
                "--phore_dir", str(phore_dir), "--out_dir", str(out)])
    ranked = pd.read_csv(out / "ancphore_fishing_ranked.csv")
    assert set(ranked["target"]) == {"targetA", "targetB"}


def test_phore_task_flags_require_inputs(tmp_path):
    """screen/fishing without their inputs must error, not fall through."""
    import pytest as _pytest

    from diffphore_tpu.baselines.run_phore import main as phore_main

    with _pytest.raises(SystemExit):
        phore_main(["--task", "screen", "--dataset_csv", "x.csv",
                    "--out_dir", str(tmp_path)])
    with _pytest.raises(SystemExit):
        phore_main(["--task", "fishing", "--out_dir", str(tmp_path)])
