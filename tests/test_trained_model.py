"""E2E capability tests against the COMMITTED trained checkpoint.

runs/posed_probe holds the round-3 5000-epoch run (see its README): trained
on AncPhore-mapped poses at the pharmacophore, it reached
valinf_rmsds_lt2 = 0.67 and a full 40-pose screen placed a < 2 A pose on
all 15 complexes.  These tests reproduce the pose-recovery claim from the
committed weights through the public FitEngine path, so the capability can
never silently regress (reference analogue: the shipped
weights/diffphore_calibrated_warmuped_ft checkpoint + its RMSD<2 gates,
src/utils/training.py:370-555).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.rmsd import plain_rmsd
from diffphore_tpu.cli.pipeline import FitEngine
from diffphore_tpu.sampler.sampling import SamplerSettings
from diffphore_tpu.utils import checkpoints

MODEL_DIR = os.path.join(os.path.dirname(__file__), "..", "runs", "posed_probe")
SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"
MAPPED = "/root/reference/examples/output/2/mapping_process"
# complexes where the committed screen measured best-of-40 RMSD < 1 A
COMPLEXES = ["sQC_Substrate__STK441223", "sQC_Substrate__STK617139"]


@pytest.fixture(scope="module")
def engine():
    from diffphore_tpu.chem.embed import embed_molecule
    from diffphore_tpu.chem.smiles import mol_from_smiles
    from diffphore_tpu.data.graphs import build_complex
    from diffphore_tpu.data.phore import Phore, PhoreFeature
    from diffphore_tpu.models import ScoreModel

    cfg = checkpoints.load_config_yaml(MODEL_DIR)
    model = ScoreModel(cfg)
    dummy_mol = mol_from_smiles("CCO")
    embed_molecule(dummy_mol)
    dummy_phore = Phore("d", [
        PhoreFeature("HA", 1.0, 1.2, 1, (0.0, 0.0, 0.0), False, (0, 0, 0)),
        PhoreFeature("HD", 1.0, 1.2, 1, (1.0, 0.0, 0.0), False, (0, 0, 0)),
    ], [])
    dummy = build_complex("d", dummy_mol, dummy_phore)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
    variables = checkpoints.load_variables(
        variables, os.path.join(MODEL_DIR, checkpoints.BEST_EMA_MODEL))
    return FitEngine(cfg, variables, samples_per_complex=8,
                     settings=SamplerSettings(inference_steps=20), seed=3)


@pytest.mark.parametrize("name", COMPLEXES)
def test_trained_model_recovers_pose_lt2A(engine, name):
    """Best-of-8 sampled pose within 2 A of the AncPhore-mapped reference
    pose, sampling from the N(0,5A) x uniform SO(3)/torsion prior."""
    lig_id = name.split("__")[1]
    job = engine.prepare(name, f"/root/reference/examples/ligands/{lig_id}.sdf", SQC)
    assert job is not None
    result = engine.run_complex(job)
    gold = parse_sdf(os.path.join(MAPPED, name, f"{name}.sdf"))[0].remove_hs().coords
    rmsds = [plain_rmsd(p, gold) for p in result["poses"]]
    assert min(rmsds) < 2.0, rmsds
    # and the fitness-ranked best pose is at worst mediocre, not garbage
    best = int(np.argmax(result["fitscore"]))
    assert rmsds[best] < 5.0, (rmsds, best)
