"""Gate the held-out generalization parity readout (VERDICT r3 item 2).

runs/heldout_aug2/DIAGNOSIS.md: the round-3 "STL582276 failure" was a
target artifact -- the pose-0 ground truth is the reference model's own
rank-39/40 pose (fitscore -0.039).  Measured against the reference's
DELIVERED poses (argmax fitscore, reference inference.py:321-350), the
committed round-3 screen recovers a reference top-5 basin below 2 A on all
three never-seen ligands.  This test recomputes that readout from the
committed artifacts so the claim can never silently regress.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def readout():
    from analysis.heldout_screen_eval import eval_screen

    return eval_screen("runs/heldout_aug2/screen", "runs/heldout/val3.csv")


def test_three_heldout_ligands_present(readout):
    assert readout["_summary"]["n"] == 3


def test_parity_all_heldout_recover_a_ref_top5_basin(readout):
    """Best-of-40 < 2 A of a reference top-5-scored pose, on 3/3."""
    assert readout["_summary"]["parity_frac_top5_best_lt2"] == 1.0


def test_parity_stl582276_recovers_the_delivered_pose(readout):
    """The round-3 'failure' ligand: < 1 A of the reference's delivered
    top-1 pose (DIAGNOSIS.md measured 0.81 A)."""
    r = readout["sQC_Substrate__STL582276"]
    assert r["vs_delivered_best"] < 1.0, r


def test_pose0_readout_unchanged(readout):
    """The original pose-0 readout stays reproducible (2/3 < 2 A)."""
    assert readout["_summary"]["frac_best_lt2"] == pytest.approx(2 / 3)


@pytest.fixture(scope="module")
def corpus_readout():
    from analysis.heldout_screen_eval import eval_screen

    return eval_screen("runs/corpus/main/heldout_screen",
                       "runs/heldout/val3.csv")


def test_corpus_model_recovers_all_heldout(corpus_readout):
    """The round-4 corpus-trained model (runs/corpus/README.md): best-of-40
    < 2 A on 3/3 held-out sQC ligands vs BOTH readouts -- the pose-0 target
    AND the reference's delivered pose.  The round-3 STL582276 sampling
    failure is gone."""
    s = corpus_readout["_summary"]
    assert s["n"] == 3
    assert s["frac_best_lt2"] == 1.0
    assert s["parity_frac_delivered_best_lt2"] == 1.0
    assert s["parity_frac_top5_best_lt2"] == 1.0


@pytest.fixture(scope="module")
def corpus2_readout():
    import os

    from analysis.heldout_screen_eval import eval_screen

    if not os.path.isdir("runs/corpus2/main/heldout_screen/ranked_poses"):
        pytest.skip("corpus2 sQC screen not yet committed")
    return eval_screen("runs/corpus2/main/heldout_screen",
                       "runs/heldout/val3.csv")


def test_corpus2_model_delivers_all_heldout_ranked(corpus2_readout):
    """Round-4 verdict item 8 done-criterion, TIGHTENED from 2/3 to 3/3:
    the scaffold-split corpus-v2 model's RANKED top-1 pose lands within
    2 A of a reference top-5-scored pose on ALL three never-seen sQC
    ligands (runs/corpus2/main/heldout_screen_eval.txt: vs_ref_top5_top1
    = 1.02 / 1.50 / 1.52 A), and best-of-40 < 2 A holds vs both the
    pose-0 and delivered readouts."""
    s = corpus2_readout["_summary"]
    assert s["n"] == 3
    assert s["frac_best_lt2"] == 1.0
    assert s["parity_frac_delivered_best_lt2"] == 1.0
    assert s["parity_frac_top5_best_lt2"] == 1.0
    assert s["parity_frac_top5_top1_lt2"] == 1.0
