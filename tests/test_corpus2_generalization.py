"""Gates for the corpus-v2 scaffold-held-out battery (round-5).

Round-4 verdict items 1/2/3/4/8: the v1 generalization claim was not
adversarial (same-scaffold test split, small semi-rigid ligands, no
discrimination measurement, clamped calibration tail, fitness-label
confidence default, 2/3 sQC transfer).  These gates pin the corpus-v2
artifacts that answer each:

- `runs/corpus2/main/eval_ood60/`: cli.evaluate battery on ligands built
  ONLY from held-out ring systems at reference scale (heavy 19-42,
  torsions 3-14), + `stratified.json` torsion-stratified readout.
- `runs/corpus2/main/enrichment/enrichment.json`: actives-vs-decoys
  discrimination (the reference's actual use case,
  reference inference.py:321-350, baselines/run_phore.py:449,509).
- `runs/corpus2/main/heldout_screen_eval` (pipeline log artifact): the
  sQC transfer parity readout.

Tests skip while an artifact is absent (mid-pipeline) and gate once it
is committed.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL = os.path.join(ROOT, "runs/corpus2/main/eval_ood60")
ENR = os.path.join(ROOT, "runs/corpus2/main/enrichment/enrichment.json")
SCREEN_EVAL = os.path.join(ROOT, "runs/corpus2/main/heldout_screen_eval.txt")


def _metrics():
    path = os.path.join(EVAL, "performance_metrics.json")
    if not os.path.exists(path):
        pytest.skip("corpus2 battery not yet committed")
    return json.load(open(path))


def test_scaffold_ood_top1_battery():
    """Done-criterion from the round-4 verdict: fitscore-ranked top-1
    < 2 A on >= 70% of the scaffold-held-out test ligands."""
    m = _metrics()
    names = json.load(open(os.path.join(EVAL, "names.json")))
    assert len(names) >= 50, "battery must cover >= 50 held-out ligands"
    assert all(n.startswith("ood_") for n in names), \
        "battery rows must come from held-out scaffolds only"
    assert m["rankbyFitscore_top1_rmsds_below_2"] >= 70.0
    assert m["rmsds_below_2"] >= 70.0  # best-of-40 should be much higher


def test_torsion_stratified_readout():
    """The flexible regime (T >= 8) has its own row - where torsional
    diffusion is the whole point (round-4 verdict item 1 done-criterion)."""
    path = os.path.join(EVAL, "stratified.json")
    if not os.path.exists(path):
        pytest.skip("stratified readout not yet committed")
    s = json.load(open(path))
    assert "torsions_ge8" in s and "torsions_le5" in s
    assert s["torsions_ge8"]["n"] >= 25
    assert s["torsions_ge8"]["torsion_range"][0] >= 8
    assert "rankbyFitscore_top1_rmsds_below_2" in s["torsions_ge8"]


def test_calibrated_percentile_keys_non_degenerate():
    """Round-4 weak #1: the old calibration clamp collapsed >= 75% of
    battery poses onto one value, so every fitscore percentile key was a
    constant.  With the slope-extrapolated tail the percentiles must be
    pairwise distinct."""
    m = _metrics()
    p25 = m["fitscore_percentile_25"]
    p50 = m["fitscore_percentile_50"]
    p75 = m["fitscore_percentile_75"]
    assert p25 < p50 < p75, (p25, p50, p75)
    # and the raw battery array is not clamp-dominated
    fits = np.load(os.path.join(EVAL, "fitscore.npy"))
    assert len(np.unique(np.round(fits, 6))) > 0.5 * fits.size


def test_confidence_classifier_ranks_at_least_as_well():
    """Round-4 verdict item 4 done-criterion: the committed rmsd_lt2
    classifier beats (>=) fitscore ranking on the corpus-v2 battery."""
    m = _metrics()
    if "rankbyConfidence_top1_rmsds_below_2" not in m:
        pytest.skip("confidence head not wired into this battery run")
    assert (m["rankbyConfidence_top1_rmsds_below_2"]
            >= m["rankbyFitscore_top1_rmsds_below_2"] - 1e-9)


def test_enrichment_discrimination():
    """Round-4 verdict item 2 done-criterion: median per-phore ROC-AUC
    >= 0.8 for actives-vs-decoys ranking (>= 30 phores, >= 50 decoys
    each), else this gate documents the negative."""
    if not os.path.exists(ENR):
        pytest.skip("enrichment screen not yet committed")
    e = json.load(open(ENR))
    assert e["n_phores"] >= 30
    assert e["n_decoys"] >= 50
    assert e["aggregate"]["fitscore"]["median_auc"] >= 0.8
