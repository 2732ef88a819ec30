"""End-to-end CLI test for cli.evaluate: the paper metric battery.

Command-level equivalent of the reference's `src/evaluate.py` run (artifact
names evaluate.py:345, metric battery evaluate.py:350-400): sample poses for
every test-CSV complex, then write performance_metrics.json + numpy dumps.
Runs tiny (2 complexes x 3 poses x 3 steps, random init) on CPU.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
MAPPED = "/root/reference/examples/output/2/mapping_process"


@pytest.fixture(scope="module")
def eval_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval_cli")
    out_dir = tmp / "out"
    model_dir = tmp / "model"
    model_dir.mkdir()
    (model_dir / "model_parameters.yml").write_text(
        "ns: 8\nnv: 4\nnum_conv_layers: 2\ndropout: 0.0\n"
    )
    names = ["sQC_Substrate__STK936575", "sQC_Substrate__STK243239"]
    csv_path = tmp / "test.csv"
    with open(csv_path, "w") as f:
        f.write("name,ligand_description,phore,pose_index\n")
        for n in names:
            f.write(f"{n},{MAPPED}/{n}/{n}.sdf,{SQC},0\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    cmd = [
        sys.executable, "-m", "diffphore_tpu.cli.evaluate",
        "--test_csv", str(csv_path), "--out_dir", str(out_dir),
        "--model_dir", str(model_dir), "--allow_random_init", "true",
        "--sample_per_complex", "3", "--inference_steps", "3",
        "--cache_path", str(tmp / "cache"),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
    return out_dir, proc, names


def test_evaluate_exits_cleanly(eval_run):
    out_dir, proc, _ = eval_run
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_evaluate_artifact_contract(eval_run):
    """Same artifact set as reference evaluate.py:345."""
    out_dir, proc, names = eval_run
    assert (out_dir / "performance_metrics.json").exists()
    for arr in ("rmsds", "fitscore", "centroid_distances",
                "min_ex_cross_distances", "min_self_distances", "run_times"):
        assert (out_dir / f"{arr}.npy").exists(), arr
    rmsds = np.load(out_dir / "rmsds.npy")
    assert rmsds.shape == (len(names), 3)
    assert np.isfinite(rmsds).all()


def test_evaluate_metric_battery_keys(eval_run):
    """The reference's metric-key families must all be present and finite
    (evaluate.py:350-400 quantities via train/metrics.py)."""
    out_dir, proc, _ = eval_run
    metrics = json.load(open(out_dir / "performance_metrics.json"))
    for key in (
        "mean_rmsd", "rmsds_below_2", "rmsds_below_5", "mean_centroid",
        "centroid_below_2", "mean_fitscore", "fitscore_above_0.4",
        "exclusion_clash_fraction", "self_intersect_fraction",
        "rmsds_percentile_25", "rmsds_percentile_50", "rmsds_percentile_75",
        "top1_rmsds_below_2",
        "rankbyFitscore_top1_rmsds_below_2",
        "run_times_mean",
    ):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), key
    # top-k families beyond k=1 only exist when N >= k (reference takes
    # top-5/10 of the 40-pose default); with 3 poses they must be absent
    assert "rankbyFitscore_top5_rmsds_below_2" not in metrics
    # percentage metrics stay in [0, 100]
    assert 0.0 <= metrics["rmsds_below_2"] <= 100.0
    assert 0.0 <= metrics["rankbyFitscore_top1_rmsds_below_2"] <= 100.0


def test_committed_eval_artifact_battery():
    """The committed trained-checkpoint battery (runs/posed_probe/eval,
    40 poses) carries the full top-k family and its headline numbers."""
    path = "runs/posed_probe/eval/performance_metrics.json"
    if not os.path.exists(path):
        pytest.skip("committed eval artifact not present")
    metrics = json.load(open(path))
    for k in (1, 5, 10):
        for stem in ("rmsds_below_2", "rmsds_below_5", "centroid_below_2"):
            key = f"rankbyFitscore_top{k}_{stem}"
            assert key in metrics and 0.0 <= metrics[key] <= 100.0, key
    # trained-model floor: the fitscore-ranked top-1 pose recovers < 2 A on
    # at least half of the 15 training complexes (measured: 80%)
    assert metrics["rankbyFitscore_top1_rmsds_below_2"] >= 50.0
    assert metrics["top1_rmsds_below_2"] == 100.0
