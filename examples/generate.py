"""Deterministically regenerate the examples/ demo set.

Three synthetic drug-like ligands (seeded library enumeration + DG conformer
embedding) and a ligand-derived pharmacophore with exclusion-volume shells,
written in the AncPhore `.phore` grammar plus a reference-schema task CSV
(role of the reference's `examples/task_file.csv`, `src/inference.py:99-137`).
"""

import csv
import os

from diffphore_tpu.chem.embed import embed_molecule
from diffphore_tpu.chem.sdf import write_sdf
from diffphore_tpu.chem.smiles import mol_from_smiles
from diffphore_tpu.data.phore import write_phore
from diffphore_tpu.data.phore_sampling import random_ligand_phore
from diffphore_tpu.data.synth_library import generate_library


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    smis = generate_library(n=12, seed=7)
    chosen = [smis[0], smis[4], smis[9]]
    rows = []
    for i, smi in enumerate(chosen):
        mol = mol_from_smiles(smi)
        mol.coords = embed_molecule(mol, seed=11 + i)
        name = f"EX{i + 1:02d}"
        mol.name = name
        sdf = os.path.join(here, f"{name}.sdf")
        write_sdf(mol, sdf)
        rows.append((name, os.path.relpath(sdf)))
        if i == 0:
            phore = random_ligand_phore(mol, "example_phore", seed=3)
            assert phore is not None and len(phore.features) >= 4
            write_phore(phore, os.path.join(here, "example.phore"),
                        overwrite=True)
    with open(os.path.join(here, "task.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "ligand_description", "phore"])
        for name, sdf in rows:
            w.writerow([name, sdf, os.path.relpath(os.path.join(here, "example.phore"))])
    print(f"[I] wrote {len(rows)} ligands + example.phore + task.csv -> {here}")


if __name__ == "__main__":
    main()
