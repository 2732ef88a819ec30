"""Confidence-model pose ranking through FitEngine and the inference CLI.

The reference threads an optional confidence model through sampling
(sampling.py:153-168 scores final poses at t=0) and declares the
--confidence_model_dir/--confidence_ckpt flag pair (evaluate.py:66-67).
Here the trained head is a first-class ranking signal: FitEngine scores
every final pose inside the jitted dispatch, results gain a "confidence"
row, ranked_poses order by it, and the metric battery grows
rankbyConfidence_* variants.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.cli.pipeline import FitEngine
from diffphore_tpu.data.graphs import build_complex
from diffphore_tpu.data.phore import parse_phore
from diffphore_tpu.models import ScoreModel, ScoreModelConfig
from diffphore_tpu.models.confidence import ConfidenceModel
from diffphore_tpu.sampler.sampling import SamplerSettings
from diffphore_tpu.train.metrics import evaluate_results
from diffphore_tpu.utils import checkpoints

SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
MAPPED = "/root/reference/examples/output/2/mapping_process"
NAME = "sQC_Substrate__STK441223"
SDF = os.path.join(MAPPED, NAME, f"{NAME}.sdf")


def _tiny_cfg():
    return ScoreModelConfig(ns=8, nv=4, num_conv_layers=2, dropout=0.0,
                            no_batch_norm=True, compute_dtype="float32")


def test_engine_confidence_rows():
    cfg = _tiny_cfg()
    phore = parse_phore(SQC)[0]
    mol = parse_sdf(SDF)[0].remove_hs()
    dummy = build_complex(NAME, mol, phore)
    svars = jax.jit(ScoreModel(cfg).init)(jax.random.PRNGKey(0), dummy)
    cmodel = ConfidenceModel(cfg)
    cvars = jax.jit(cmodel.init)(jax.random.PRNGKey(1), dummy)
    eng = FitEngine(cfg, svars, samples_per_complex=3,
                    settings=SamplerSettings(inference_steps=3), seed=0,
                    confidence=(cmodel, cvars))
    job = eng.prepare(NAME, SDF, SQC)
    res = eng.run_complex(job)
    assert "confidence" in res and len(res["confidence"]) == 3
    assert np.all(np.isfinite(res["confidence"]))
    # the raw row also rides the scores dict for downstream consumers
    assert "confidence" in res["scores"]


def test_metrics_rankby_confidence_battery():
    rng = np.random.default_rng(0)
    rmsds = rng.uniform(0.3, 12.0, (4, 6))
    fits = rng.uniform(0.0, 0.6, (4, 6))
    conf = -rmsds + rng.normal(0, 1e-3, rmsds.shape)  # near-oracle ranker
    base = evaluate_results(rmsds, fits, rmsds, rmsds + 3, rmsds + 3)
    m = evaluate_results(rmsds, fits, rmsds, rmsds + 3, rmsds + 3,
                         confidence=conf)
    assert "rankbyConfidence_top1_rmsds_below_2" in m
    # near-oracle confidence must match the rank-by-rmsd oracle top-1
    assert m["rankbyConfidence_top1_rmsds_below_2"] == m["top1_rmsds_below_2"]
    # and the fitscore battery is unchanged by the extra ranker
    for k, v in base.items():
        assert m[k] == v, k


@pytest.mark.slow
def test_cli_confidence_ranking_e2e(tmp_path):
    """--confidence_model_dir orders ranked_poses by the head's predictions."""
    cfg = _tiny_cfg()
    phore = parse_phore(SQC)[0]
    mol = parse_sdf(SDF)[0].remove_hs()
    dummy = build_complex(NAME, mol, phore)

    model_dir = tmp_path / "model"
    conf_dir = tmp_path / "conf"
    for d in (model_dir, conf_dir):
        d.mkdir()
        checkpoints.save_config_yaml(cfg, str(d))
    svars = jax.jit(ScoreModel(cfg).init)(jax.random.PRNGKey(0), dummy)
    checkpoints.save_variables(
        svars, os.path.join(model_dir, checkpoints.BEST_EMA_MODEL))
    cvars = jax.jit(ConfidenceModel(cfg).init)(jax.random.PRNGKey(1), dummy)
    checkpoints.save_variables(
        cvars, os.path.join(conf_dir, checkpoints.BEST_EMA_MODEL))

    out_dir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    proc = subprocess.run(
        [sys.executable, "-m", "diffphore_tpu.cli.inference",
         "--phore", SQC, "--ligand", SDF, "--out_dir", str(out_dir),
         "--model_dir", str(model_dir),
         "--confidence_model_dir", str(conf_dir),
         "--sample_per_complex", "3", "--inference_steps", "3"],
        capture_output=True, text=True, env=env, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    log = json.load(open(next(iter(
        (out_dir / "mapping_process").glob("*/*_dock.log")))))
    assert len(log["confidence"]) == 3
    # ranked sdf carries both properties, ordered by confidence descending
    sdf_text = next(iter((out_dir / "ranked_poses").glob("*_ranked.sdf"))).read_text()
    assert "confidence" in sdf_text
    confs = [float(x) for x in log["confidence"]]
    # the dock log keeps pose order; the sdf is sorted - parse its props
    import re
    written = [float(v) for v in re.findall(
        r"<confidence>[^\n]*\n([-\d.eE+]+)", sdf_text)]
    # sdf props go through %.6g - compare with matching tolerance
    np.testing.assert_allclose(written, sorted(confs, reverse=True), rtol=1e-5)
