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
import ast
import glob
import json
import os

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.rmsd import symmetry_rmsd


def _parity_readout(row: dict, ref_mol, poses) -> dict:
    """RMSD vs the reference model's DELIVERED pose (argmax fitscore).

    ``pose_index=0`` in the task CSVs is the reference's first GENERATED
    pose (mapping_process SDFs are in generation order, index-aligned with
    the fitscore list in ranked_results.csv) -- an arbitrary sampler draw,
    sometimes a failure pose (STL582276 pose 0 ranks 39/40 at -0.039).
    The reference's actual output is the argmax-fitscore pose
    (inference.py:321-350), so parity is measured against that, plus the
    nearest reference top-5 pose (the reference sampler is multi-modal;
    matching any of its best basins is success).  Silently skipped when no
    ranked_results.csv sits two levels above the ligand SDF.
    """
    lig_path = str(row["ligand_description"])
    out_dir = os.path.dirname(os.path.dirname(os.path.dirname(lig_path)))
    rr = os.path.join(out_dir, "ranked_results.csv")
    if not os.path.exists(rr):
        return {}
    import pandas as pd

    name = os.path.basename(lig_path)[:-len(".sdf")]
    df = pd.read_csv(rr, sep="\t")
    hit = df[df["name"] == name]
    if not len(hit):
        return {}
    # the fitscore cell is a "[...]" float list; the CSV lives under the
    # (untrusted) reference tree, so parse it as a literal, never eval it
    fs = np.array(ast.literal_eval(hit.iloc[0]["fitscore"]))
    ref_poses = [m.remove_hs() for m in parse_sdf(lig_path)]
    if len(fs) != len(ref_poses):
        return {}
    order = np.argsort(-fs)
    deliv = ref_poses[int(order[0])].coords
    d_del = np.array([symmetry_rmsd(ref_mol, deliv, p.coords) for p in poses])
    top5 = np.stack([
        np.array([symmetry_rmsd(ref_mol, ref_poses[int(i)].coords, p.coords)
                  for p in poses])
        for i in order[:5]
    ])  # (5, n_poses)
    return {
        "vs_delivered_best": float(d_del.min()),
        "vs_delivered_top1": float(d_del[0]),
        "vs_ref_top5_best": float(top5.min()),
        "vs_ref_top5_top1": float(top5[:, 0].min()),
    }


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
        out[name].update(_parity_readout(r, ref_mol, poses))
    ok = [v for v in out.values() if "best_rmsd" in v]
    if ok:
        out["_summary"] = {
            "mean_best_rmsd": float(np.mean([v["best_rmsd"] for v in ok])),
            "frac_best_lt2": float(np.mean([v["best_rmsd"] < 2.0 for v in ok])),
            "frac_best_lt5": float(np.mean([v["best_rmsd"] < 5.0 for v in ok])),
            "frac_top1_lt2": float(np.mean([v["top1_rmsd"] < 2.0 for v in ok])),
            "n": len(ok),
        }
        par = [v for v in ok if "vs_delivered_best" in v]
        if par:
            out["_summary"].update({
                "parity_frac_delivered_best_lt2": float(np.mean(
                    [v["vs_delivered_best"] < 2.0 for v in par])),
                "parity_frac_top5_best_lt2": float(np.mean(
                    [v["vs_ref_top5_best"] < 2.0 for v in par])),
                "parity_frac_top5_top1_lt2": float(np.mean(
                    [v["vs_ref_top5_top1"] < 2.0 for v in par])),
            })
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
