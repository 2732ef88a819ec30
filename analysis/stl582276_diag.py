"""Diagnose the STL582276 held-out failure (VERDICT r3 item 2 / weak #1).

heldout_aug2 recovered 2/3 never-seen sQC ligands below 2 A, but STL582276
sat at 3.94 A best-of-40 / 6.19 A top-1.  The round-3 README guessed
"largest, most flexible" - WRONG: STL582276 has 19 heavy atoms and ONE
rotatable bond (this script prints the check).  A near-rigid ligand failing
best-of-40 means the rigid placement itself is systematically off: every
pose lands in a wrong basin, which points at the knowledge-guided type
matching, not at torsion-space coverage.

This script quantifies, from the committed screen artifacts:
  1. size/torsion stats of all 15 sQC ligands (train + held-out);
  2. per-type pharmacophore fingerprint counts of STL582276 vs the train
     set (is a type over/under-represented?);
  3. the geometry of the failure: RMSD of each pose, the residual after
     optimal rigid alignment (is the CONFORMER wrong or the PLACEMENT?),
     and which phore features the delivered poses match vs the ones the
     ground-truth pose matches;
  4. the fitscore margin: does the analytic scorer PREFER the wrong basin
     (ranking failure) or rank the closest pose on top (sampling failure)?

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python analysis/stl582276_diag.py \
        [--screen runs/heldout_aug2/screen]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.mol import vdw_radius
from diffphore_tpu.chem.pharmacophore_rules import (PHORETYPES,
                                                    ligand_phore_features,
                                                    scoring_phore_fp)
from diffphore_tpu.chem.rmsd import symmetry_rmsd
from diffphore_tpu.chem.topology import rotatable_bonds
from diffphore_tpu.data.phore import parse_phore
from diffphore_tpu.ops.fitscore import fitscore, make_phore_arrays
from diffphore_tpu.ops.geometry import rigid_align

MAP = "/root/reference/examples/output/2/mapping_process"
PHORE = "/root/reference/examples/phore/sQC_QFA_complex.phore"
TRAIN12 = ["STK243239", "STK255897", "STK324209", "STK441223", "STK536739",
           "STK617139", "STK674854", "STK779818", "STK944352", "STK954214",
           "STL420760", "STL432840"]
HELDOUT = ["STK498014", "STK936575", "STL582276"]


def lig(name):
    return parse_sdf(f"{MAP}/sQC_Substrate__{name}/sQC_Substrate__{name}.sdf")[0].remove_hs()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--screen", default="runs/heldout_aug2/screen")
    args = ap.parse_args()

    phore = parse_phore(PHORE)[0]
    ref_arr = make_phore_arrays(phore)
    feat_types = [f.type for f in phore.features]
    print(f"sQC phore: {len(phore.features)} features "
          f"({dict((t, feat_types.count(t)) for t in set(feat_types))}), "
          f"{len(phore.exclusion_volumes)} EX")

    # ---- 1+2: size/torsion/type stats
    print("\n[1] ligand stats (train → held-out):")
    train_fp_sum = np.zeros(len(PHORETYPES) - 1)
    for name in TRAIN12 + HELDOUT:
        m = lig(name)
        ntor = len(rotatable_bonds(m)[0])
        fp, _, _, _, _ = ligand_phore_features(m)
        counts = fp[:, :-1].sum(0)
        tag = "HELD-OUT" if name in HELDOUT else "train"
        if name in TRAIN12:
            train_fp_sum += counts
        nz = {PHORETYPES[i]: int(c) for i, c in enumerate(counts) if c}
        print(f"  {name:12s} {tag:8s} A={m.num_atoms:2d} T={ntor} fp={nz}")
    print(f"  train fp totals: "
          f"{ {PHORETYPES[i]: int(c) for i, c in enumerate(train_fp_sum) if c} }")

    # ---- 3: failure geometry from the committed screen
    name = "STL582276"
    m = lig(name)
    gt = m.coords
    sdfs = glob.glob(os.path.join(args.screen, "ranked_poses", f"*{name}_ranked.sdf"))
    if not sdfs:
        print(f"\n[!] no committed screen poses under {args.screen}; stopping")
        return
    poses = parse_sdf(sdfs[0])
    coords = np.stack([p.coords for p in poses])  # ranked order
    rmsds = np.array([symmetry_rmsd(m, c, gt) for c in coords])
    # conformer-only residual: optimal rigid alignment onto the ground truth
    conf_res = []
    for c in coords:
        aligned = np.asarray(rigid_align(c, gt))
        conf_res.append(float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean())))
    conf_res = np.array(conf_res)
    print(f"\n[3] {name}: {len(poses)} committed poses (ranked)")
    print(f"    pose RMSD:    best {rmsds.min():.2f}  median {np.median(rmsds):.2f}  top-1 {rmsds[0]:.2f}")
    print(f"    conformer residual after optimal rigid align: "
          f"best {conf_res.min():.2f}  median {np.median(conf_res):.2f}")
    print("    => placement error = pose RMSD - conformer residual: "
          f"median {np.median(rmsds - conf_res):.2f} A")

    # which features does the ground truth match vs the delivered poses?
    sfp = scoring_phore_fp(m).astype(np.float32)
    vdw = np.array([vdw_radius(a.atomic_num) for a in m.atoms], np.float32)
    mask = np.ones(m.num_atoms, bool)
    s_gt = fitscore(gt[None].astype(np.float32), mask, sfp, vdw, ref_arr)
    s_poses = fitscore(coords.astype(np.float32), mask, sfp, vdw, ref_arr)
    print(f"    ground truth: phscore1={float(np.asarray(s_gt['phscore1'])[0]):.3f} "
          f"(raw {float(np.asarray(s_gt['phscore1_raw'])[0]):.3f}), "
          f"n_matched={int(np.asarray(s_gt['n_matched'])[0])}/{len(phore.features)}")
    p1 = np.asarray(s_poses["phscore1"])
    nm = np.asarray(s_poses["n_matched"])
    print(f"    poses: phscore1 top-1 {p1[0]:.3f}, max {p1.max():.3f} "
          f"(pose {int(p1.argmax())}, rmsd {rmsds[int(p1.argmax())]:.2f}); "
          f"n_matched median {int(np.median(nm))}")
    best_rmsd_i = int(rmsds.argmin())
    print(f"    closest pose (#{best_rmsd_i}, {rmsds[best_rmsd_i]:.2f} A): "
          f"phscore1 {p1[best_rmsd_i]:.3f}, scorer rank "
          f"{int((p1 > p1[best_rmsd_i]).sum()) + 1}/{len(p1)}")
    # 4: ranking vs sampling attribution
    rho = float(np.corrcoef(p1, -rmsds)[0, 1])
    print(f"\n[4] score-vs-(-rmsd) Pearson over the 40 poses: {rho:.2f} "
          f"(positive = scorer prefers closer poses)")
    lt2, lt5 = int((rmsds < 2).sum()), int((rmsds < 5).sum())
    print(f"    poses <2A: {lt2}  <5A: {lt5}  -> "
          + ("SAMPLING failure (no pose near the truth to rank)" if lt2 == 0
             else "RANKING failure (close poses exist but rank low)"))


if __name__ == "__main__":
    main()
