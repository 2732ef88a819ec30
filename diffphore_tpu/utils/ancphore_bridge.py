"""Subprocess bridge to the native ancphore scorer CLI.

API-compatible with the reference's AncPhore bridge
(process_pharmacophore.py:885-1000: calc_phore_fitting / parse_score_file),
pointed at our C++ twin (native/ancphore_cli).  The on-device JAX scorer
(ops/fitscore.py) is the hot path; this bridge exists for file-level
interoperability and external tooling.
"""

from __future__ import annotations

import os
import subprocess
from typing import List, Optional, Union

from .logging import log_error, log_warn

#: default binary location (built by `make -C native/ancphore_cli`)
ANCPHORE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "ancphore_cli", "ancphore",
)

_FITNESS_INDEX = {1: -4, 2: -3, 3: -2, 4: -1, 5: -5, 6: -6}


def ensure_built(path: str = ANCPHORE) -> Optional[str]:
    """Build (or rebuild after source changes) the CLI; make is a cheap
    no-op when the binary is already up to date."""
    src_dir = os.path.dirname(path)
    try:
        subprocess.run(["make", "-C", src_dir], check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        if os.path.exists(path):
            return path  # prebuilt binary, no toolchain present
        log_warn(f"Could not build ancphore CLI: {e}")
        return None
    return path if os.path.exists(path) else None


def parse_score_file(score_file: str, return_all: bool = False, fitness: int = 1):
    """Reference column-index contract (process_pharmacophore.py:918)."""
    try:
        lines = [l.strip().split("\t") for l in open(score_file)]
        if return_all:
            return [[float(x) for x in row[-6:-1]] for row in lines]
        idx = _FITNESS_INDEX.get(fitness, -4)
        return [float(row[idx]) for row in lines]
    except (OSError, ValueError, IndexError) as e:
        log_error(f"Failed to parse the score file {score_file}: {e}")
        return None


def calc_phore_fitting(
    ligand_file: str,
    phore_file: str,
    score_file: str,
    dbphore_file: str = "",
    log_file: str = "",
    overwrite: bool = False,
    return_all: bool = False,
    exVolume_cutoff: float = 500,
    overlap_coeff: float = -1,
    percent_coeff: float = -1,
    anchor_coeff: float = -1,
    ancphore_path: str = ANCPHORE,
    target_fishing: bool = False,
    fitness: int = 1,
    timeout: float = 200.0,
):
    """Score a (multi-)pose SDF against a reference pharmacophore file."""
    fitness = 5 if target_fishing else fitness
    binary = ensure_built(ancphore_path)
    if binary is None:
        return None
    if not os.path.exists(score_file) or overwrite:
        cmd = [binary, "-d", ligand_file, "--refphore", phore_file,
               "--scores", score_file, "usedMultiConformerFile", "formodel"]
        if exVolume_cutoff != 500:
            cmd += ["--exvolume_cutoff", str(exVolume_cutoff)]
        if overlap_coeff != -1:
            cmd += ["--overlap_coeff", str(overlap_coeff)]
        if percent_coeff != -1:
            cmd += ["--percent_coeff", str(percent_coeff)]
        if anchor_coeff != -1:
            cmd += ["--anchor_coeff", str(anchor_coeff)]
        try:
            result = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
            if log_file:
                with open(log_file, "w") as f:
                    f.write(result.stdout + result.stderr)
            if result.returncode != 0:
                log_error(f"ancphore failed ({result.returncode}): {result.stderr[:500]}")
        except subprocess.TimeoutExpired:
            log_error(f"ancphore timed out after {timeout}s for {ligand_file}")
            return None
    if not os.path.exists(score_file):
        log_error(f"No score file generated for {ligand_file}")
        return None
    return parse_score_file(score_file, return_all=return_all, fitness=fitness)


def generate_complex_phore(
    ligand_file: str,
    protein_file: str,
    pdb_id: str,
    tmp_dir: str = "data/complex_phores",
    ancphore_path: str = ANCPHORE,
) -> str:
    """Reference-signature complex->phore generation
    (process_pharmacophore.py:854-883: shells out to
    ``AncPhore -l lig -p prot --refphore out``).

    The closed-source binary cannot generate phores, so this delegates to the
    native host implementation (chem/complex_phore.py) while keeping the
    reference's file contract: writes
    ``{tmp_dir}/complex_phores/{pdb_id}_complex.phore`` and returns the file
    content (empty string on failure)."""
    out_file = os.path.join(tmp_dir, f"complex_phores/{pdb_id}_complex.phore")
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    if not os.path.exists(out_file):
        try:
            from ..chem.complex_phore import generate_complex_phore as _gen
            from ..chem.sdf import read_molecule

            mol = read_molecule(ligand_file, remove_hs=True)
            if mol is None:
                raise ValueError(f"could not read ligand {ligand_file}")
            _gen(protein_file, mol, out_file=out_file,
                 name=f"{pdb_id}_complex", overwrite=False)
        except Exception as e:  # noqa: BLE001 - reference prints and continues
            log_error(f"complex phore generation failed for {pdb_id}: {e}")
    if os.path.exists(out_file):
        with open(out_file) as f:
            return f.read()
    return ""
