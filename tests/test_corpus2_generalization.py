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
    """Round-4 verdict item 1: the >= 70% overall target was NOT met;
    this gate pins the measured result + the root-caused analysis path
    the verdict allowed instead (runs/corpus2/README.md "Results").

    Measured (committed battery, 57 ligands from held-out ring systems
    only, heavy 19-42, torsions 3-14): fitscore-ranked top-1 < 2 A
    = 52.63% overall; 84.21% on the semi-rigid stratum (T <= 5, where
    the >= 70 target IS met); oracle best-of-40 (`top1_rmsds_below_2`,
    reference evaluate.py key semantics) = 75.44%.  Ranked top-5 EQUALS
    the oracle in every torsion stratum, i.e. scoring saturates sampling
    - the binding constraint in the flexible-OOD regime is sampling
    coverage at 40 poses, not the scorer (see the sample-scaling study
    in runs/corpus2/README.md)."""
    m = _metrics()
    names = json.load(open(os.path.join(EVAL, "names.json")))
    assert len(names) >= 50, "battery must cover >= 50 held-out ligands"
    assert all(n.startswith("ood_") for n in names), \
        "battery rows must come from held-out scaffolds only"
    assert m["rankbyFitscore_top1_rmsds_below_2"] >= 50.0
    assert m["top1_rmsds_below_2"] >= 70.0          # oracle best-of-40
    assert m["rankbyFitscore_top1_exclusion_clash_fraction"] == 0.0
    # scoring saturates sampling: ranked top-5 recovers every oracle hit
    assert (m["rankbyFitscore_top5_rmsds_below_2"]
            == m["top1_rmsds_below_2"])


def test_torsion_stratified_readout():
    """The flexible regime (T >= 8) has its own row - where torsional
    diffusion is the whole point (round-4 verdict item 1 done-criterion).
    Measured: top-1 84.21 (T<=5) / 77.78 (T6-7) / 24.14 (T>=8); oracle
    best-of-40 100 / 88.89 / 55.17 - recall, not ranking, degrades with
    torsion count (analysis in runs/corpus2/README.md)."""
    path = os.path.join(EVAL, "stratified.json")
    if not os.path.exists(path):
        pytest.skip("stratified readout not yet committed")
    s = json.load(open(path))
    assert "torsions_ge8" in s and "torsions_le5" in s
    assert s["torsions_ge8"]["n"] >= 25
    assert s["torsions_ge8"]["torsion_range"][0] >= 8
    assert "rankbyFitscore_top1_rmsds_below_2" in s["torsions_ge8"]
    # the semi-rigid stratum meets the verdict's >= 70 bar outright
    assert s["torsions_le5"]["rankbyFitscore_top1_rmsds_below_2"] >= 70.0
    # ranking saturates the oracle within every stratum
    for key in ("torsions_le5", "torsions_6to7", "torsions_ge8"):
        assert (s[key]["rankbyFitscore_top5_rmsds_below_2"]
                == s[key]["top1_rmsds_below_2"]), key


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


def test_confidence_classifier_ood_disposition():
    """Round-4 verdict item 4: DOCUMENTED NEGATIVE on scaffold-OOD.

    The rmsd_lt2 classifier decisively won the round-4 IN-DISTRIBUTION
    A/B (98.3 vs 96.7 top-1, runs/corpus/README.md), but on the
    scaffold-held-out corpus-v2 battery it trails analytic fitscore
    ranking (47.37 vs 52.63 top-1 < 2 A) - it ties exactly on the
    semi-rigid stratum (84.21 both) and degrades on flexible-OOD
    ligands (20.69 vs 24.14, T >= 8), i.e. the learned head inherits
    the train-scaffold distribution while the analytic scorer does not.
    Docs therefore recommend fitscore ranking for OOD chemistry and the
    classifier for in-distribution screens.  This gate pins both halves
    of that finding."""
    m = _metrics()
    if "rankbyConfidence_top1_rmsds_below_2" not in m:
        pytest.skip("confidence head not wired into this battery run")
    s = json.load(open(os.path.join(EVAL, "stratified.json")))
    # ties the analytic ranker in-distribution-like (semi-rigid) chemistry
    assert (s["torsions_le5"]["rankbyConfidence_top1_rmsds_below_2"]
            >= s["torsions_le5"]["rankbyFitscore_top1_rmsds_below_2"])
    # and stays within 6 points overall (the documented OOD gap)
    assert (m["rankbyConfidence_top1_rmsds_below_2"]
            >= m["rankbyFitscore_top1_rmsds_below_2"] - 6.0)


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
