"""Build the corpus-v2 CSVs: scaffold-held-out split at reference scale.

Round-4 verdict items 1 (missing #2/#3): the v1 corpus's 60 "never-seen"
test ligands were new decorations of the SAME 20 scaffolds the training
set used, and every ligand was small/semi-rigid (heavy 8-20, torsions
0-5).  Corpus v2 splits at the SCAFFOLD level and operates at the
reference's envelope:

- pretrain: 150 v1-small ligands (v1 scaffold pool) + 180 v2 flexible
  train-side ligands, ligand-only mode.
- train: 220 v2 flexible train-side + 40 v1-small + the 15 sQC example
  complexes (targets = the reference's DELIVERED argmax-fitscore pose,
  not generation-order pose 0 - see runs/heldout_aug2/DIAGNOSIS.md).
- val: 30 v2 flexible train-side.
- test: 60 ligands built ONLY from held-out ring systems
  (synth_library.CORES_V2_HELDOUT x CAPS_HELDOUT), never present in any
  training phase; stratified 20 semi-rigid (T 2-5) + 40 flexible
  (T 6-15) for the torsion-stratified battery readout.

The analogous reference guard is the time split + no-receptor-overlap
subset (reference data/splits/timesplit_test_no_rec_overlap;
datasets/pdbbind_phore.py:920).  A manifest.json records every scaffold
pool and per-ligand ring systems so the split is auditable.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python analysis/make_corpus2.py \
        --out runs/corpus2
"""

from __future__ import annotations

import argparse
import ast
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from diffphore_tpu.data.synth_library import (  # noqa: E402
    CAPS_HELDOUT, CAPS_TRAIN, CORES_V2_HELDOUT, CORES_V2_TRAIN,
    generate_library_v2)

COLUMNS = ["name", "ligand_description", "aug_num_ex", "phore",
           "pose_index", "conf_seed"]


def _write(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=COLUMNS)
        w.writeheader()
        for r in rows:
            w.writerow({c: r.get(c, "") for c in COLUMNS})
    print(f"[I] wrote {len(rows):4d} rows -> {path}")


def _synth_rows(smiles, names, aug_num_ex=3):
    return [{"name": n, "ligand_description": s, "aug_num_ex": aug_num_ex}
            for n, s in zip(names, smiles)]


def _v1_small_rows(n_pretrain=150, n_train=40):
    """Reuse committed, already-validated v1 small ligands (train-side
    scaffolds only; the v1 generator pool is disjoint from the held-out
    ring systems except quinoline, which is why quinolinyl is excluded
    from CAPS_HELDOUT)."""
    import pandas as pd

    pre = pd.read_csv("runs/pretrain_synth/train594.csv")
    v1 = pd.read_csv("runs/corpus/train365.csv")
    synth = v1[v1["phore"].isna()]
    pre_rows = [{"name": f"pre_{r['name']}", "ligand_description":
                 r["ligand_description"]}
                for _, r in pre.head(n_pretrain).iterrows()]
    train_rows = [{"name": f"v1_{r['name']}",
                   "ligand_description": r["ligand_description"],
                   "aug_num_ex": 3}
                  for _, r in synth.head(n_train).iterrows()]
    return pre_rows, train_rows


def _sqc_rows():
    """The 15 sQC example complexes with the DELIVERED pose as target:
    pose_index = argmax of the reference's committed fitscore list
    (mapping_process SDFs are generation-order; ranked_results.csv's
    fitscore column is index-aligned with them)."""
    import pandas as pd

    rr = pd.read_csv("/root/reference/examples/output/2/ranked_results.csv",
                     sep="\t")
    rows = []
    for _, r in rr.iterrows():
        name = r["name"]
        sdf = ("/root/reference/examples/output/2/mapping_process/"
               f"{name}/{name}.sdf")
        if not os.path.exists(sdf):
            continue
        fs = np.asarray(ast.literal_eval(r["fitscore"]), float)
        rows.append({"name": name, "ligand_description": sdf,
                     "phore": "/root/reference/examples/phore/"
                              "sQC_QFA_complex.phore",
                     "pose_index": int(np.argmax(fs))})
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/corpus2")
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # ---- train-side flexible pool: ONE generator call so pretrain /
    # train / val slices are disjoint by construction
    flex, flex_meta = generate_library_v2(430, seed=args.seed)
    assert len(flex) == 430, f"only {len(flex)} train-side candidates"
    names = [f"flex_{i:05d}" for i in range(len(flex))]
    pre_flex = _synth_rows(flex[:180], names[:180])
    train_flex = _synth_rows(flex[180:400], names[180:400])
    val_flex = _synth_rows(flex[400:430], names[400:430])

    # ---- held-out test pool: flexible + semi-rigid strata
    ood_f, ood_f_meta = generate_library_v2(40, seed=args.seed + 1000,
                                            heldout=True)
    ood_s, ood_s_meta = generate_library_v2(
        20, seed=args.seed + 2000, heldout=True, min_atoms=14,
        max_atoms=40, min_torsions=2, max_torsions=5)
    assert len(ood_f) == 40 and len(ood_s) == 20
    test_rows = (_synth_rows(ood_f, [f"ood_f{i:04d}" for i in range(40)]) +
                 _synth_rows(ood_s, [f"ood_s{i:04d}" for i in range(20)]))

    pre_small, train_small = _v1_small_rows()
    sqc = _sqc_rows()

    _write(os.path.join(args.out, "pretrain.csv"), pre_small + pre_flex)
    _write(os.path.join(args.out, "train.csv"),
           train_flex + train_small + sqc)
    _write(os.path.join(args.out, "val.csv"), val_flex)
    _write(os.path.join(args.out, "test.csv"), test_rows)

    manifest = {
        "split": "scaffold-held-out (ring systems disjoint from all "
                 "training phases)",
        "train_cores": sorted(CORES_V2_TRAIN),
        "train_caps": sorted(CAPS_TRAIN),
        "heldout_cores": sorted(CORES_V2_HELDOUT),
        "heldout_caps": sorted(CAPS_HELDOUT),
        "notes": [
            "v1 scaffolds (synth_library.SCAFFOLDS) are train-side via the "
            "pre_/v1_ small-ligand rows; quinolinyl was excluded from the "
            "held-out caps because quinoline is a v1 scaffold",
            "closest train/heldout pairs (family-similar but distinct ring "
            "systems): quinoline~quinazoline, indole~indazole, "
            "benzofuran~benzothiophene",
            "linkers and acyclic substituents are shared across the split; "
            "the split is at the ring-system (scaffold) level, like "
            "Murcko-scaffold splits",
            "sQC rows target the reference's delivered (argmax-fitscore) "
            "pose, not generation-order pose 0",
        ],
        "ligands": {
            "flex": [{"name": n, **m} for n, m in zip(names, flex_meta)],
            "test": ([{"name": f"ood_f{i:04d}", **m}
                      for i, m in enumerate(ood_f_meta)] +
                     [{"name": f"ood_s{i:04d}", **m}
                      for i, m in enumerate(ood_s_meta)]),
        },
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"[I] manifest -> {args.out}/manifest.json")

    # hard audit: no held-out ring SMILES fragment appears in any
    # training-side SMILES (cheap string-level guard on top of the
    # pool-level construction)
    held_frags = [v.replace("{R1}", "C").replace("{R2}", "C")
                  for v in CORES_V2_HELDOUT.values()]
    train_smis = [r["ligand_description"] for r in
                  pre_small + pre_flex + train_flex + train_small + val_flex]
    for cap in CAPS_HELDOUT.values():
        for s in train_smis:
            assert cap not in s, f"held-out cap {cap} leaked into {s}"
    print(f"[I] audit ok: {len(train_smis)} training-side ligands contain "
          f"no held-out cap fragment; cores disjoint by pool construction "
          f"({len(held_frags)} held-out cores)")


if __name__ == "__main__":
    main()
