"""Torsion-stratified battery readout (round-4 verdict item 1).

Joins a cli.evaluate output directory (names.json + the npy artifacts)
with the corpus manifest's per-ligand torsion counts and re-runs the
metric battery per stratum: semi-rigid (T <= 5) vs flexible (T >= 8),
plus the midband and the whole set, so the flexible-ligand regime -
where torsional diffusion is the whole point (reference
utils/torsion.py:64-111, conformer_matching.py:30-45) - has its own row.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python analysis/stratify_battery.py \
        --eval_dir runs/corpus2/main/eval_ood60 \
        --manifest runs/corpus2/manifest.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from diffphore_tpu.train.metrics import evaluate_results  # noqa: E402

HEADLINE = (
    "rankbyFitscore_top1_rmsds_below_2", "rankbyFitscore_top5_rmsds_below_2",
    "rankbyConfidence_top1_rmsds_below_2", "top1_rmsds_below_2",
    "rmsds_below_2", "min_rmsds_mean",
)


def stratify(eval_dir: str, manifest_path: str) -> dict:
    names = json.load(open(os.path.join(eval_dir, "names.json")))
    man = json.load(open(manifest_path))
    tors = {x["name"]: x["torsions"]
            for pool in man["ligands"].values() for x in pool}

    load = lambda f: np.load(os.path.join(eval_dir, f))
    rmsds, fits = load("rmsds.npy"), load("fitscore.npy")
    cent, exd = load("centroid_distances.npy"), load("min_ex_cross_distances.npy")
    selfd = load("min_self_distances.npy")
    conf_p = os.path.join(eval_dir, "confidence.npy")
    conf = np.load(conf_p) if os.path.exists(conf_p) else None

    t = np.asarray([tors.get(n, -1) for n in names])
    strata = {
        "all": t >= 0,
        "torsions_le5": (t >= 0) & (t <= 5),
        "torsions_6to7": (t >= 6) & (t <= 7),
        "torsions_ge8": t >= 8,
    }
    out = {}
    for label, m in strata.items():
        if not m.any():
            continue
        idx = np.where(m)[0]
        metrics = evaluate_results(
            rmsds[idx], fits[idx], cent[idx], exd[idx], selfd[idx],
            confidence=conf[idx] if conf is not None else None,
        )
        row = {k: metrics[k] for k in HEADLINE if k in metrics}
        row["n"] = int(m.sum())
        row["torsion_range"] = [int(t[idx].min()), int(t[idx].max())]
        out[label] = row
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eval_dir", required=True)
    p.add_argument("--manifest", required=True)
    args = p.parse_args()
    print(json.dumps(stratify(args.eval_dir, args.manifest), indent=1))


if __name__ == "__main__":
    main()
