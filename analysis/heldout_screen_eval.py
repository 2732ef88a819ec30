"""Evaluate a CLI screen against reference (AncPhore-mapped) poses.

For every complex in a val/test CSV, reads the screen's
``ranked_poses/{name}_ranked.sdf`` (all sampled poses, ranked) and the
CSV's ligand_description SDF at pose_index (the mapped ground-truth pose),
and reports per-ligand best-of-N symmetry-corrected RMSD, the count of
poses under 2/5 A, and the rank of the best pose.  This is the held-out
generalization readout used by runs/heldout* (reference quantity:
evaluate.py rmsds_lt2 on top-N poses).

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python analysis/heldout_screen_eval.py \
        --screen runs/heldout_aug2/screen --csv runs/heldout/val3.csv
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.rmsd import symmetry_rmsd


def eval_screen(screen_dir: str, csv_path: str) -> dict:
    import pandas as pd

    rows = pd.read_csv(csv_path).to_dict("records")
    out = {}
    for r in rows:
        name = r["name"]
        ref_mol = parse_sdf(str(r["ligand_description"]))[int(r.get("pose_index", 0))]
        ref_mol = ref_mol.remove_hs()
        # ranked SDF name may be prefixed by the screen's complex naming
        cands = glob.glob(os.path.join(screen_dir, "ranked_poses", f"*{name}_ranked.sdf"))
        if not cands:
            out[name] = {"error": "no ranked sdf"}
            continue
        poses = [m.remove_hs() for m in parse_sdf(cands[0])]
        rmsds = np.asarray([
            symmetry_rmsd(ref_mol, ref_mol.coords, p.coords) for p in poses
        ])
        out[name] = {
            "n_poses": int(len(rmsds)),
            "best_rmsd": float(rmsds.min()),
            "best_rank": int(rmsds.argmin()),
            "top1_rmsd": float(rmsds[0]),
            "n_lt2": int((rmsds < 2.0).sum()),
            "n_lt5": int((rmsds < 5.0).sum()),
        }
    ok = [v for v in out.values() if "best_rmsd" in v]
    if ok:
        out["_summary"] = {
            "mean_best_rmsd": float(np.mean([v["best_rmsd"] for v in ok])),
            "frac_best_lt2": float(np.mean([v["best_rmsd"] < 2.0 for v in ok])),
            "frac_best_lt5": float(np.mean([v["best_rmsd"] < 5.0 for v in ok])),
            "frac_top1_lt2": float(np.mean([v["top1_rmsd"] < 2.0 for v in ok])),
            "n": len(ok),
        }
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--screen", required=True)
    p.add_argument("--csv", required=True)
    args = p.parse_args()
    res = eval_screen(args.screen, args.csv)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
