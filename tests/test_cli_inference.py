"""End-to-end CLI test: single pair -> reference-schema artifacts + resume."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
LIG = "/root/reference/examples/ligands/STK936575.sdf"


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("cli_out")
    model_dir = tmp_path_factory.mktemp("model")
    (model_dir / "model_parameters.yml").write_text(
        "ns: 8\nnv: 4\nnum_conv_layers: 2\ndropout: 0.0\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    cmd = [
        sys.executable, "-m", "diffphore_tpu.cli.inference",
        "--phore", SQC, "--ligand", LIG, "--out_dir", str(out_dir),
        "--model_dir", str(model_dir), "--allow_random_init", "true",
        "--sample_per_complex", "3", "--inference_steps", "4",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    return out_dir, proc, cmd, env


def test_cli_exits_cleanly(cli_run):
    out_dir, proc, *_ = cli_run
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Pharmacophore Alignment Summary" in proc.stdout


def test_cli_artifact_contract(cli_run):
    out_dir, proc, *_ = cli_run
    name = "sQC_Substrate__STK936575"
    # reference artifact layout (inference.py:180-261,321-350,449-455)
    assert (out_dir / "inference_results.json").exists()
    assert (out_dir / "ranked_results.csv").exists()
    assert (out_dir / "ranked_poses" / f"{name}_ranked.sdf").exists()
    proc_dir = out_dir / "mapping_process" / name
    assert (proc_dir / f"{name}.score").exists()
    assert (proc_dir / f"{name}_dock.log").exists()

    header = open(out_dir / "ranked_results.csv").readline().strip().split("\t")
    golden = open("/root/reference/examples/output/2/ranked_results.csv").readline().strip().split("\t")
    assert header == golden

    results = json.load(open(out_dir / "inference_results.json"))
    assert results["name"] == [name]
    assert len(results["fitscore"][0]) == 3
    assert all(np.isfinite(results["fitscore"][0]))

    # score-file column-index contract: raw[-4] is the DfScore1 column
    row = open(proc_dir / f"{name}.score").readline().strip().split("\t")
    assert len(row) >= 17
    log = json.load(open(proc_dir / f"{name}_dock.log"))
    assert abs(float(row[-4]) - log["fitscore"][0]) < 1e-4


def test_cli_resume_journal(cli_run):
    out_dir, proc, cmd, env = cli_run
    # second run must reuse the per-complex journal (no re-sampling)
    proc2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=120)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    r1 = json.load(open(out_dir / "inference_results.json"))
    assert "Alignment Summary" in proc2.stdout


def test_cli_visualisation_config_splitfile(tmp_path):
    """--config YAML override + --split_file filtering + --save_visualisation
    trajectory SDF, in one run (regression: FitEngine's compiled run now
    returns a trajectory slot consumed by two call sites)."""
    out_dir = tmp_path / "out"
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "model_parameters.yml").write_text(
        "ns: 8\nnv: 4\nnum_conv_layers: 2\ndropout: 0.0\n"
    )
    (tmp_path / "cfg.yml").write_text("sample_per_complex: 2\ninference_steps: 3\n")
    name = "sQC_Substrate__STK936575"
    (tmp_path / "keep.txt").write_text(f"{name}\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    cmd = [
        sys.executable, "-m", "diffphore_tpu.cli.inference",
        "--phore", SQC, "--ligand", LIG, "--out_dir", str(out_dir),
        "--model_dir", str(model_dir), "--allow_random_init", "true",
        "--config", str(tmp_path / "cfg.yml"),
        "--split_file", str(tmp_path / "keep.txt"),
        "--save_visualisation", "true",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    ranked = (out_dir / "ranked_poses" / f"{name}_ranked.sdf").read_text()
    assert ranked.count("$$$$") == 2  # sample_per_complex from --config
    viz = (out_dir / "mapping_process" / name / f"{name}_visualisation.sdf").read_text()
    assert viz.count("$$$$") == 3    # one model per inference step
    assert f"{name}_step_0" in viz

    # split_file that excludes everything -> clean no-samples exit
    (tmp_path / "none.txt").write_text("nothing\n")
    cmd2 = [c if c != str(tmp_path / "keep.txt") else str(tmp_path / "none.txt")
            for c in cmd] + ["--out_dir", str(tmp_path / "out2")]
    proc2 = subprocess.run(cmd2, capture_output=True, text=True, env=env, timeout=120)
    assert "No valid fitting samples" in proc2.stdout + proc2.stderr


def test_cli_batched_dispatch(tmp_path):
    """--batch_complexes packs same-bucket complexes into one dispatch; the
    artifact contract must be identical to the per-complex path."""
    import csv as _csv

    out_dir = tmp_path / "out"
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "model_parameters.yml").write_text(
        "ns: 8\nnv: 4\nnum_conv_layers: 2\ndropout: 0.0\n"
    )
    csv_path = tmp_path / "screen.csv"
    with open(csv_path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["phore", "ligand_description"])
        for lig in ("STK936575", "STK243239"):
            w.writerow([SQC, f"/root/reference/examples/ligands/{lig}.sdf"])
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    cmd = [
        sys.executable, "-m", "diffphore_tpu.cli.inference",
        "--phore_ligand_csv", str(csv_path), "--out_dir", str(out_dir),
        "--model_dir", str(model_dir), "--allow_random_init", "true",
        "--sample_per_complex", "3", "--inference_steps", "3",
        "--batch_complexes", "2",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = json.load(open(out_dir / "inference_results.json"))
    assert len(results["name"]) == 2
    for name in results["name"]:
        assert (out_dir / "ranked_poses" / f"{name}_ranked.sdf").exists()
        assert (out_dir / "mapping_process" / name / f"{name}.score").exists()
