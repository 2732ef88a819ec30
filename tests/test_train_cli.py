"""Training-driver E2E: the loop learns, checkpoints, restarts.

Reference counterpart: the unshipped train driver reconstructed from
parsing.py/training.py (SURVEY section 1).  Proof-of-learning on real
example complexes: train loss must drop, best-EMA/last checkpoints must be
written by the val-inference early-stop machinery, and --restart_dir +
--restart_lr must resume from the saved optimizer state.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

LIGS = ["STK243239", "STK255897", "STK324209"]
SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"

TINY = [
    "--ns", "4", "--nv", "2", "--num_conv_layers", "2", "--dropout", "0.0",
    "--batch_size", "8", "--lr", "5e-3",
]


@pytest.fixture(scope="module")
def train_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "train.csv"
    rows = ["name,phore,ligand_description"] + [
        f"{n},{SQC},/root/reference/examples/ligands/{n}.sdf" for n in LIGS
    ]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def _read_metrics(run_dir):
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    train = [l for l in lines if "mode" not in l and "valinf_rmsds_lt2" not in l]
    return lines, train


def test_train_step_learns(tmp_path):
    """Proof of learning at unit level: with a FIXED noise draw the step must
    memorize the targets (tr/tor losses collapse; per-epoch losses under
    random noise are too high-variance for a fast test - the committed
    runs/overfit_golden artifact covers the stochastic regime)."""
    import jax

    from diffphore_tpu.data.dataset import DatasetSettings, PhoreDataset
    from diffphore_tpu.models import ScoreModelConfig
    from diffphore_tpu.train.state import create_train_state, make_train_step

    recs = [{"name": "STK243239", "phore": SQC,
             "ligand_description": "/root/reference/examples/ligands/STK243239.sdf"}]
    ds = PhoreDataset(recs, DatasetSettings(), str(tmp_path / "cache"), name="fix")
    b = ds[0].replace(names=(), meta=())
    cfg = ScoreModelConfig(ns=4, nv=2, num_conv_layers=2, dropout=0.0)
    state, tx = create_train_state(cfg, b, lr=5e-3)
    step = jax.jit(make_train_step(cfg, tx))
    fix = jax.random.PRNGKey(7)
    first = None
    for i in range(150):
        state, m = step(state, b, fix, np.float32(0.0))
        if i == 0:
            first = {k: float(m[k]) for k in ("loss", "tr_loss", "tor_loss")}
    last = {k: float(m[k]) for k in ("loss", "tr_loss", "tor_loss")}
    assert last["tr_loss"] < 0.1 * first["tr_loss"], (first, last)
    assert last["tor_loss"] < 0.2 * first["tor_loss"], (first, last)
    assert last["loss"] < 0.6 * first["loss"], (first, last)


def test_train_checkpoints_and_restart(train_csv, tmp_path):
    from diffphore_tpu.cli.train import main as train_main
    from diffphore_tpu.utils import checkpoints

    run_dir = str(tmp_path / "run")
    train_main([
        "--train_csv", train_csv, "--val_csv", train_csv,
        "--cache_path", str(tmp_path / "cache"), "--run_dir", run_dir,
        "--n_epochs", "4", "--val_inference_freq", "2",
        "--inference_samples", "2", "--inference_steps", "4",
        "--seed", "0", *TINY,
    ])
    lines, train = _read_metrics(run_dir)
    assert len(train) == 4
    assert all(np.isfinite(l["loss"]) for l in train)
    assert os.path.exists(os.path.join(run_dir, checkpoints.LAST_MODEL))
    # val-inference ran and selected a best-EMA checkpoint
    assert any("valinf_rmsds_lt2" in l for l in lines)
    assert os.path.exists(os.path.join(run_dir, checkpoints.BEST_EMA_MODEL))

    # restart from the checkpoint with an LR override: must pick up the epoch
    # counter and keep training without error
    run2 = str(tmp_path / "run2")
    train_main([
        "--train_csv", train_csv, "--val_csv", train_csv,
        "--cache_path", str(tmp_path / "cache"), "--run_dir", run2,
        "--restart_dir", run_dir, "--restart_lr", "1e-4",
        "--n_epochs", "6", "--val_inference_freq", "0",
        "--seed", "0", *TINY,
    ])
    _, train2 = _read_metrics(run2)
    assert train2, "restarted run produced no epochs"
    assert all(abs(l["lr"] - 1e-4) < 1e-12 for l in train2)
    assert train2[0]["epoch"] >= 3  # resumed epoch counter, not from 0

    # pretrained init (--pretrain_model_pt): params transplant with a fresh
    # optimizer and epoch counter - fine-tune semantics, not resume
    run3 = str(tmp_path / "run3")
    train_main([
        "--train_csv", train_csv, "--val_csv", train_csv,
        "--cache_path", str(tmp_path / "cache"), "--run_dir", run3,
        "--pretrain_model_pt",
        os.path.join(run_dir, checkpoints.LAST_MODEL),
        "--n_epochs", "2", "--val_inference_freq", "0",
        "--seed", "0", *TINY,
    ])
    _, train3 = _read_metrics(run3)
    assert train3[0]["epoch"] == 0  # fresh epoch counter
    # inherited params: first-epoch loss well below the from-scratch start
    assert train3[0]["loss"] < 0.8 * train[0]["loss"], (train3[0], train[0])


def test_warmup_subset_epochs(train_csv, tmp_path):
    """--warmup_epochs trains the first epochs on a reduced sample set."""
    from diffphore_tpu.cli.train import main as train_main

    run_dir = str(tmp_path / "warm")
    train_main([
        "--train_csv", train_csv, "--val_csv", train_csv,
        "--cache_path", str(tmp_path / "cache"), "--run_dir", run_dir,
        "--n_epochs", "2", "--warmup_epochs", "1", "--warmup_number", "1",
        "--val_inference_freq", "0", "--seed", "0", *TINY,
    ])
    _, train = _read_metrics(run_dir)
    assert len(train) == 2


def test_early_stop_patience(train_csv, tmp_path):
    """--early_stop_patience actually stops training (round-1 dead flag)."""
    from diffphore_tpu.cli.train import main as train_main

    run_dir = str(tmp_path / "es")
    train_main([
        "--train_csv", train_csv, "--val_csv", train_csv,
        "--cache_path", str(tmp_path / "cache"), "--run_dir", run_dir,
        "--n_epochs", "40", "--val_inference_freq", "2",
        "--inference_samples", "1", "--inference_steps", "2",
        "--early_stop_patience", "1",
        # an impossible goal so the metric never improves after round 1
        "--inference_earlystop_goal", "min",
        "--seed", "0", *TINY,
    ])
    _, train = _read_metrics(run_dir)
    # stopped long before 40 epochs: first round sets best, second triggers
    assert len(train) <= 8, len(train)


def test_checkpoint_fc_migration(tmp_path):
    """Pre-refactor checkpoints stored the channelwise edge-MLP as a nested
    `fc` MLP submodule (Dense_0/Dense_1); load_variables must rename those to
    the explicit fc_w1/fc_b1/fc_w2/fc_b2 params."""
    import numpy as np
    from flax import serialization

    from diffphore_tpu.utils import checkpoints

    w1, b1 = np.ones((4, 8), np.float32), np.zeros(8, np.float32)
    w2, b2 = np.full((8, 3), 2.0, np.float32), np.ones(3, np.float32)
    old = {"params": {"conv": {"fc": {
        "Dense_0": {"kernel": w1, "bias": b1},
        "Dense_1": {"kernel": w2, "bias": b2},
    }}}}
    path = str(tmp_path / "old.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(old))
    template = {"params": {"conv": {
        "fc_w1": np.zeros_like(w1), "fc_b1": np.zeros_like(b1),
        "fc_w2": np.zeros_like(w2), "fc_b2": np.zeros_like(b2),
    }}}
    out = checkpoints.load_variables(template, path)
    np.testing.assert_array_equal(out["params"]["conv"]["fc_w1"], w1)
    np.testing.assert_array_equal(out["params"]["conv"]["fc_b2"], b2)
    # new-format checkpoints still round-trip unchanged
    new_path = str(tmp_path / "new.msgpack")
    checkpoints.save_variables(template, new_path)
    out2 = checkpoints.load_variables(template, new_path)
    np.testing.assert_array_equal(out2["params"]["conv"]["fc_w2"],
                                  template["params"]["conv"]["fc_w2"])
