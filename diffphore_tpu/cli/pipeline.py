"""The fitting engine: featurize -> sample -> score, one compile per bucket.

Device-side everything-at-once design: for each complex, all
``samples_per_complex`` poses are rows of one batch; randomization, the
20-step reverse diffusion and fitness scoring run as a single jitted
function.  The reference pipeline (inference.py:139-268) crosses the host
boundary 20+ times per complex and shells out to AncPhore; here the only
host work is featurization and file IO.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..chem import mol_from_smiles, parse_sdf
from ..chem.mol import Molecule, vdw_radius
from ..chem.sdf import read_molecule
from ..data.graphs import ComplexBatch, build_complex, repeat_batch
from ..data.phore import Phore, parse_phore
from ..models import ScoreModel, ScoreModelConfig
from ..ops.fitscore import PhoreArrays, fitness_by_index, fitscore, make_phore_arrays
from ..sampler import randomize_position, reverse_diffusion
from ..sampler.sampling import SamplerSettings
from ..utils.logging import PhaseTimers, log_info, log_warn

#: device-side vdW radius table indexed by (atomic_num - 1) feature column
VDW_TABLE = np.asarray([vdw_radius(z) for z in range(1, 120)], np.float32)


def _bucket(x: int, step: int, minimum: int) -> int:
    return max(minimum, ((x + step - 1) // step) * step)


@dataclasses.dataclass
class ComplexJob:
    name: str
    batch: ComplexBatch        # B=1, bucket-padded
    ref: PhoreArrays           # centered frame, bucket-padded
    mol: Molecule              # H-free ligand (topology + input coords)


class FitEngine:
    """Caches one compiled sampler per (A, P, T) bucket."""

    def __init__(
        self,
        cfg: ScoreModelConfig,
        variables,
        samples_per_complex: int = 40,
        settings: Optional[SamplerSettings] = None,
        fitness: int = 1,
        seed: int = 0,
        use_running_average: bool = True,
        save_trajectory: bool = False,
    ):
        self.cfg = cfg
        self.variables = variables
        self.n = samples_per_complex
        self.settings = settings or SamplerSettings()
        self.fitness = fitness
        self.model = ScoreModel(cfg)
        self.key = jax.random.PRNGKey(seed)
        self.use_running_average = use_running_average
        #: also return the per-step pose trajectory (reference
        #: --save_visualisation / keep_update, inference.py + sampling.py)
        self.save_trajectory = save_trajectory
        self.timers = PhaseTimers()
        self._compiled: Dict[Tuple[int, int, int], callable] = {}

    # ------------------------------------------------------------ featurize
    def load_ligand(self, description: str, keep_local_structures: bool = True) -> Optional[Molecule]:
        """SDF/MOL/MOL2/PDB path or SMILES string -> H-free 3D Molecule."""
        if os.path.exists(description):
            mol = read_molecule(description, remove_hs=True)
            if mol is not None and not keep_local_structures:
                from ..chem.embed import embed_molecule

                embed_molecule(mol)
            return mol
        try:
            mol = mol_from_smiles(description)
        except Exception as e:  # noqa: BLE001 - report and skip like the reference
            log_warn(f"Failed to parse ligand description `{description}`: {e}")
            return None
        from ..chem.embed import embed_molecule

        embed_molecule(mol)
        return mol

    def prepare(self, name: str, ligand_description: str, phore_path: str,
                keep_local_structures: bool = True) -> Optional[ComplexJob]:
        with self.timers.phase("featurize"):
            mol = self.load_ligand(ligand_description, keep_local_structures)
            if mol is None or mol.num_atoms < 2:
                return None
            phores = parse_phore(phore_path)
            if not phores:
                log_warn(f"No pharmacophore parsed from `{phore_path}`")
                return None
            phore = phores[0]
            from ..chem.topology import rotatable_bonds

            a_pad = _bucket(mol.num_atoms, 8, 16)
            p_pad = _bucket(len(phore.all_points), 16, 16)
            t_pad = _bucket(max(len(rotatable_bonds(mol)[0]), 1), 4, 4)
            batch = build_complex(
                name, mol, phore, a_pad=a_pad, p_pad=p_pad, t_pad=t_pad,
                meta={"phore_file": phore_path},
            )
            ref = make_phore_arrays(phore, pad=p_pad)
            ref = ref.replace(coord=ref.coord - np.asarray(batch.orig_center[0]))
            return ComplexJob(name, batch, ref, mol)

    # -------------------------------------------------------------- sampling
    def calibrate_batch_stats(self, job: "ComplexJob", iters: int = 80) -> None:
        """Populate batchnorm running statistics by forwarding randomized
        poses at random diffusion times.

        Only needed when running without a trained checkpoint: fresh running
        stats are identity, so eval-mode activations compound to overflow
        through the conv stack (torch BatchNorm in the reference behaves the
        same before training).
        """
        model, cfg = self.model, self.cfg
        batch = repeat_batch(job.batch, min(self.n, 8))

        @jax.jit
        def step(variables, key):
            k1, k2, k3 = jax.random.split(key, 3)
            b = randomize_position(batch, k1, tr_sigma_max=cfg.tr_sigma_max)
            b = b.replace(t=jax.random.uniform(k2, (batch.batch_size,)))
            _, new_state = model.apply(
                variables, b, use_running_average=False, mutable=["batch_stats"]
            )
            return {**variables, "batch_stats": new_state["batch_stats"]}

        variables = self.variables
        for _ in range(iters):
            self.key, sub = jax.random.split(self.key)
            variables = step(variables, sub)
        self.variables = jax.tree_util.tree_map(lambda x: x, variables)
        log_info("Batch-stats calibration done (random-init mode)")

    def _compile(self, shapes: Tuple[int, int, int]):
        if shapes in self._compiled:
            return self._compiled[shapes]

        settings, cfg, model = self.settings, self.cfg, self.model
        ura = self.use_running_average
        save_traj = self.save_trajectory

        @jax.jit
        def run(variables, batch, ref: PhoreArrays, key):
            def score_fn(b):
                return model.apply(variables, b, use_running_average=ura)

            vdw = jnp.asarray(VDW_TABLE)[batch.lig_feat[0, :, 0]]
            fitness_fn = None
            if settings.random_samples > 1:
                # per-step candidate selection by on-device fitness
                fitness_fn = lambda b: fitscore(
                    b.lig_pos, b.lig_mask[0], b.lig_phorefp[0], vdw, ref
                )["phscore1"]

            k1, k2 = jax.random.split(key)
            b = randomize_position(batch, k1, settings.no_torsion, False, cfg.tr_sigma_max)
            out = reverse_diffusion(score_fn, b, k2, cfg.sigma_schedule, settings,
                                    return_trajectory=save_traj,
                                    fitness_fn=fitness_fn)
            b, traj = out if save_traj else (out, None)
            scores = fitscore(
                b.lig_pos, b.lig_mask[0], b.lig_phorefp[0], vdw, ref
            )
            return b.lig_pos, scores, traj

        self._compiled[shapes] = run
        return run

    def run_complex(self, job: ComplexJob) -> Dict:
        """Sample + score all poses of one complex.  Returns result dict with
        poses in the ORIGINAL (un-centered) frame."""
        batch = repeat_batch(job.batch, self.n)
        shapes = (batch.num_atoms, batch.num_phore, batch.num_torsions)
        first = shapes not in self._compiled
        with self.timers.phase("compile" if first else "denoise"):
            run = self._compile(shapes)
            self.key, sub = jax.random.split(self.key)
            pos, scores, traj = run(self.variables, batch, job.ref, sub)
            pos = np.asarray(jax.block_until_ready(pos))
        n_atoms = job.mol.num_atoms
        center = np.asarray(job.batch.orig_center[0])
        poses = pos[:, :n_atoms, :] + center
        fit = np.asarray(fitness_by_index(scores, self.fitness))
        result = {
            "name": job.name,
            "poses": poses,
            "fitscore": [float(x) for x in fit],
            "scores": {k: np.asarray(v) for k, v in scores.items()},
        }
        if traj is not None:
            # (steps, B, A, 3) -> original frame, heavy atoms only
            result["trajectory"] = np.asarray(traj)[:, :, :n_atoms, :] + center
        return result
