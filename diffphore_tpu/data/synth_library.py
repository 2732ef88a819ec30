"""Synthetic drug-like ligand library for ligand-only pretraining.

The reference's calibration recipe pretrains the score model on ~1M
ChEMBL/ZINC ligands with randomly generated pharmacophores
(pdbbind_phore.py:820-918: embed a conformer, derive a random sub-phore,
train on the (conformer, phore) pair).  That dataset is not shipped, so
this module provides the same *capability* from first principles: a
combinatorial generator of valid drug-like SMILES (scaffold x substituent
enumeration with random decoration), validated through the from-scratch
chem kernel (parse -> implicit H -> 3D embed -> phore perception), written
as a ``--ligand_only`` training CSV.

Chemistry is biased toward the pharmacophore types the model trains
against (aromatic rings, H-bond donors/acceptors, anions/cations,
hydrophobes) so random sub-phores exercise every feature channel.

Usage:
    python -m diffphore_tpu.data.synth_library --n 500 --out lib.csv
    python -m diffphore_tpu.cli.train --train_csv lib.csv --ligand_only ...
"""

from __future__ import annotations

import argparse
import csv
from typing import List, Optional, Sequence

import numpy as np

# Scaffolds carry attachment sites: {R*} on carbon, {N*} on nitrogen.
# All strings are plain SMILES once the placeholders are substituted.
# Scaffolds only use ring-closure digits 1/2; substituents use 8/9 so a
# ring substituent can never collide with an open scaffold ring index.
# Kept deliberately small (8-20 heavy atoms before decoration) so the
# decorated molecules stay inside the dataset bucket caps.
SCAFFOLDS: Sequence[str] = (
    "c1ccc({R1})cc1",                      # benzene
    "c1ccc2[nH]c({R1})cc2c1",              # indole
    "c1ccc2nc({R1})[nH]c2c1",              # benzimidazole
    "c1cnc({R1})cn1",                      # pyrazine
    "c1cc({R1})cnc1",                      # pyridine (3-subst)
    "c1csc({R1})n1",                       # thiazole
    "c1cnn({N1})c1",                       # N-subst pyrazole
    "c1nc({R1})no1",                       # oxadiazole
    "C1CCN({N1})CC1",                      # piperidine
    "C1CN({N1})CCN1{N2}",                  # piperazine (two sites)
    "C1COCCN1{N1}",                        # morpholine
    "c1ccc({R1})c({R2})c1",                # ortho-disubst benzene
    "c1cc({R1})cc({R2})c1",                # meta-disubst benzene
    "O=C(c1ccc({R1})cc1)N{N2}",            # benzamide
    "O=C(N{N1})c1cncc({R2})c1",            # nicotinamide
    "O=S(=O)(c1ccc({R1})cc1)N{N2}",        # aryl sulfonamide
    "c1ccc(-c2ccc({R1})cc2)cc1",           # biphenyl
    "c1ccc(C{R1})cc1",                     # benzyl
    "O=C(O)C({R1})N{N2}",                  # amino-acid backbone
    "c1cc2cccnc2c({R1})c1",                # quinoline
)

# Carbon-site substituents; "" is a plain H (site vanishes).  Ring
# fragments use closure digits 8/9 only (see SCAFFOLDS note).
SUBSTITUENTS: Sequence[str] = (
    "",            # H
    "C",           # methyl
    "CC",          # ethyl
    "C(C)C",       # isopropyl
    "O",           # hydroxyl (as -OH via implicit H)
    "OC",          # methoxy
    "N",           # amino
    "NC",          # methylamino
    "N(C)C",       # dimethylamino
    "F", "Cl", "Br",
    "C#N",         # nitrile
    "C(F)(F)F",    # trifluoromethyl
    "C(=O)O",      # carboxylic acid  (anion channel)
    "C(=O)OC",     # ester
    "C(=O)N",      # primary amide
    "C(=O)NC",     # N-methyl amide
    "NC(=O)C",     # acetamido
    "S(=O)(=O)N",  # sulfonamide
    "S(=O)(=O)C",  # methylsulfonyl
    "CN",          # aminomethyl   (cation channel when protonated)
    "CCN",         # aminoethyl
    "C(=O)C",      # acetyl
    "OC(F)F",      # difluoromethoxy
    "c8ccccc8",    # phenyl
    "c8ccncc8",    # pyridyl
    "C8CC8",       # cyclopropyl
    "NC(N)=O",     # urea
)

# Nitrogen-site substituents: only bonds that make chemical sense on an
# amine/amide nitrogen (alkyl, acyl, sulfonyl, aryl); no halogens or
# N-O/N-N single bonds.
N_SUBSTITUENTS: Sequence[str] = (
    "",            # H
    "C",           # N-methyl
    "CC",          # N-ethyl
    "C(C)C",       # N-isopropyl
    "Cc8ccccc8",   # N-benzyl
    "c8ccccc8",    # N-phenyl
    "c8ccncc8",    # N-pyridyl
    "C(=O)C",      # N-acetyl
    "S(=O)(=O)C",  # N-mesyl
    "CC(=O)N",     # amide-terminated ethyl
    "CCO",         # hydroxyethyl
    "C8CC8",       # N-cyclopropyl
)


def _fill_site(out: str, site: str, sub: str) -> str:
    if sub == "":
        # drop the site; remove an enclosing "()" when the site was the
        # whole group
        return out.replace("(" + site + ")", "").replace(site, "")
    return out.replace("(" + site + ")", "(" + sub + ")").replace(site, sub)


def _substitute(scaffold: str, rng: np.random.Generator) -> str:
    """Fill every {R*} (carbon) / {N*} (nitrogen) site with a random
    substituent from the matching pool."""
    out = scaffold
    for site in ("{R1}", "{R2}"):
        if site in out:
            out = _fill_site(out, site, str(rng.choice(SUBSTITUENTS)))
    for site in ("{N1}", "{N2}"):
        if site in out:
            out = _fill_site(out, site, str(rng.choice(N_SUBSTITUENTS)))
    return out


def _validate(smiles: str, seed: int, min_atoms: int, max_atoms: int,
              min_features: int) -> bool:
    """A candidate is kept when it parses, embeds to 3D, fits the bucket
    caps, and perceives enough pharmacophore features to support random
    sub-phore extraction (phore_sampling.extract_random_phore)."""
    from ..chem.embed import embed_molecule
    from ..chem.pharmacophore_rules import ligand_phore_features
    from ..chem.smiles import mol_from_smiles

    try:
        mol = mol_from_smiles(smiles)
        if not (min_atoms <= mol.num_atoms <= max_atoms):
            return False
        embed_molecule(mol, seed=seed)
        if not np.isfinite(mol.coords).all():
            return False
        fp, _, _, _, _ = ligand_phore_features(mol)
        return int((fp[:, :-1].sum(axis=1) > 0).sum()) >= min_features
    except Exception:  # noqa: BLE001 - generator: invalid candidates are fine
        return False


def generate_library(
    n: int,
    seed: int = 0,
    min_atoms: int = 8,
    max_atoms: int = 48,
    min_features: int = 4,
    max_tries: Optional[int] = None,
) -> List[str]:
    """Generate ``n`` distinct validated drug-like SMILES."""
    rng = np.random.default_rng(seed)
    out: List[str] = []
    seen = set()
    tries = 0
    budget = max_tries if max_tries is not None else max(20 * n, 200)
    while len(out) < n and tries < budget:
        tries += 1
        scaffold = str(rng.choice(SCAFFOLDS))
        smiles = _substitute(scaffold, rng)
        if smiles in seen:
            continue
        seen.add(smiles)
        if _validate(smiles, seed=seed + tries, min_atoms=min_atoms,
                     max_atoms=max_atoms, min_features=min_features):
            out.append(smiles)
    return out


def write_library_csv(path: str, smiles: Sequence[str],
                      name_prefix: str = "synth") -> None:
    """Write a --ligand_only training CSV: ligand_description = SMILES, no
    phore column (featurize_record then derives a random ligand phore)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "ligand_description"])
        for i, s in enumerate(smiles):
            w.writerow([f"{name_prefix}_{i:05d}", s])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--min_atoms", type=int, default=8)
    p.add_argument("--max_atoms", type=int, default=48)
    p.add_argument("--min_features", type=int, default=4)
    args = p.parse_args(argv)
    lib = generate_library(args.n, args.seed, args.min_atoms,
                           args.max_atoms, args.min_features)
    write_library_csv(args.out, lib)
    print(f"[I] wrote {len(lib)} ligands -> {args.out}")


if __name__ == "__main__":
    main()
