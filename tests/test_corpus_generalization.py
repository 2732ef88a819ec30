"""Gate the corpus-scale generalization results (VERDICT r3 items 1/4/7/8).

runs/corpus is the synthetic PDBbind-surrogate experiment (see its README):
350 never-before-trained synthetic ligands + the 15 sQC examples train the
full reference recipe (ligand-only pretrain -> warmup + CCSampler
fine-tune), then `cli.evaluate` runs the paper metric battery on 60
NEVER-SEEN test ligands with both fitscore and trained-confidence ranking
(reference `src/evaluate.py:66-67,199-343`).  These tests pin the committed
artifacts so the generalization claim can never silently regress.

Measured this round: rankbyFitscore_top1_rmsds_below_2 = 96.67 on n=60
(VERDICT done-criterion was >= 60 on >= 50), confidence-ranked top-1 86.67,
top-1 exclusion clashes 0.0, best-of-40 < 2 A on 100%.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
EVAL = os.path.join(ROOT, "runs", "corpus", "main", "eval_test60")
CONF_DIR = os.path.join(ROOT, "runs", "corpus", "confidence")


@pytest.fixture(scope="module")
def battery():
    with open(os.path.join(EVAL, "performance_metrics.json")) as f:
        return json.load(f)


def test_sixty_never_seen_complexes():
    r = np.load(os.path.join(EVAL, "rmsds.npy"))
    assert r.shape == (60, 40)
    # best-of-40 recovery on every never-seen ligand
    assert (r.min(axis=1) < 2.0).mean() == 1.0


def test_fitscore_ranked_top1_generalization(battery):
    """The VERDICT r3 item-1 done-criterion (>=60) with margin: the
    committed battery measured 96.67."""
    assert battery["rankbyFitscore_top1_rmsds_below_2"] >= 90.0
    assert battery["rankbyFitscore_top5_rmsds_below_2"] >= 95.0


def test_confidence_ranked_battery_present(battery):
    """rankbyConfidence_* lands next to rankbyFitscore_* via the trained
    committed confidence checkpoint (VERDICT r3 item 4)."""
    assert battery["rankbyConfidence_top1_rmsds_below_2"] >= 60.0
    conf = np.load(os.path.join(EVAL, "confidence.npy"))
    assert conf.shape == (60, 40)
    assert np.isfinite(conf).all()


def test_rmsd_lt2_confidence_head_beats_fitscore_ranking():
    """The DiffDock-style correctness-classifier head
    (runs/corpus/confidence_rmsd, --confidence_label rmsd_lt2): the A/B
    measured confidence-ranked top-1 < 2 A on 98.33 vs 86.67 for the
    fitness-regression head and 96.67 for analytic-fitscore ranking --
    the best delivered-pose ranking in the repo (median top-1 0.57 A)."""
    with open(os.path.join(os.path.dirname(EVAL), "eval_test60_confrmsd",
                           "performance_metrics.json")) as f:
        b = json.load(f)
    assert b["rankbyConfidence_top1_rmsds_below_2"] >= 90.0
    assert b["rankbyConfidence_top1_rmsds_below_2"] >= \
        b["rankbyFitscore_top1_rmsds_below_2"]


def test_exclusion_clashes_bounded(battery):
    """VERDICT r3 item 7: delivered-pose clash fraction < 5%."""
    assert battery["rankbyFitscore_top1_exclusion_clash_fraction"] < 5.0
    assert battery["top1_exclusion_clash_fraction"] < 5.0
    assert battery["self_intersect_fraction"] == 0.0


def test_calibrated_fitscore_keys_non_degenerate(battery):
    """VERDICT r3 item 3 downstream check: after the isotonic calibration
    the fitscore_above_* battery keys are informative, not 0/100."""
    assert 50.0 < battery["fitscore_above_0.4"] <= 100.0
    assert battery["rankbyFitscore_top1_fitscore_above_0.4"] >= 90.0


def test_run_time_reporting_steady_state(battery):
    """VERDICT r3 item 8: compile excluded, std commensurate with mean."""
    assert battery["run_times_std"] < battery["run_times_mean"]


def test_confidence_checkpoint_committed():
    from diffphore_tpu.utils import checkpoints

    path = os.path.join(CONF_DIR, checkpoints.BEST_EMA_MODEL)
    if not os.path.exists(path):
        path = os.path.join(CONF_DIR, checkpoints.LAST_MODEL)
    assert os.path.exists(path), "no committed confidence checkpoint"


@pytest.mark.slow
def test_confidence_checkpoint_loads_and_predicts():
    """Load the committed confidence checkpoint through the public path and
    predict on a real complex (the phase-C integration in miniature)."""
    import jax

    from diffphore_tpu.chem import parse_sdf
    from diffphore_tpu.data.graphs import build_complex, repeat_batch
    from diffphore_tpu.data.phore import parse_phore
    from diffphore_tpu.models.confidence import ConfidenceModel
    from diffphore_tpu.utils import checkpoints

    cfg = checkpoints.load_config_yaml(CONF_DIR)
    model = ConfidenceModel(cfg)
    mol = parse_sdf("/root/reference/examples/ligands/STK243239.sdf")[0].remove_hs()
    phore = parse_phore(
        "/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
    batch = repeat_batch(build_complex("c", mol, phore), 4)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    path = os.path.join(CONF_DIR, checkpoints.BEST_EMA_MODEL)
    if not os.path.exists(path):
        path = os.path.join(CONF_DIR, checkpoints.LAST_MODEL)
    variables = checkpoints.load_variables(variables, path)
    preds = model.apply(variables, batch, deterministic=True)
    fit = np.asarray(preds[0] if isinstance(preds, tuple) else preds)
    assert fit.shape[0] == 4
    assert np.isfinite(fit).all()
