"""Reconstruct a (partial) enrichment artifact from the screen's log.

`analysis/enrichment_screen.py` writes `enrichment.json` only after the
LAST phore, but logs each phore's result as it completes:

    [I] [k/N] <phore>: fit auc A rank R/C, conf auc B

If the screen is interrupted (round boundary, tunnel drop), this parser
rebuilds the per-phore fitscore AUC/rank/EF1%/top-k rows and the
confidence AUC distribution from the committed log, producing
`enrichment_partial.json` with the same aggregate keys (confidence
rank-derived keys are unrecoverable from the log and omitted).

Usage:
    python analysis/enrichment_from_log.py \
        --log runs/corpus2/main/enrichment.log \
        --out runs/corpus2/main/enrichment/enrichment_partial.json
"""

from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np

LINE = re.compile(
    r"\[I\] \[(\d+)/(\d+)\] (\S+): fit auc ([\d.]+) rank (\d+)/(\d+)"
    r"(?:, conf auc ([\d.]+))?")


def parse_log(path):
    rows = []
    for line in open(path):
        m = LINE.search(line)
        if not m:
            continue
        _, _, name, fauc, rank, ncand, cauc = m.groups()
        rank, n = int(rank), int(ncand)
        top = max(1, int(round(0.01 * n)))
        row = {
            "phore": name,
            "n_candidates": n,
            "fitscore": {
                "auc": float(fauc),
                "rank": rank,
                "ef1pct": (n / 1.0) * (1.0 if rank <= top else 0.0) / top,
                "top1": rank == 1,
                "top5": rank <= 5,
            },
        }
        if cauc is not None:
            row["confidence"] = {"auc": float(cauc)}
        rows.append(row)
    return rows


def aggregate(rows):
    out = {"n_phores": len(rows),
           "n_decoys": rows[0]["n_candidates"] - 1 if rows else 0,
           "aggregate": {}, "per_phore": rows, "partial_from_log": True}
    f = np.asarray([r["fitscore"]["auc"] for r in rows])
    out["aggregate"]["fitscore"] = {
        "median_auc": float(np.median(f)), "mean_auc": float(f.mean()),
        "auc_ge_0.8_fraction": float((f >= 0.8).mean()),
        "mean_ef1pct": float(np.mean(
            [r["fitscore"]["ef1pct"] for r in rows])),
        "top1_rate": float(np.mean([r["fitscore"]["top1"] for r in rows])),
        "top5_rate": float(np.mean([r["fitscore"]["top5"] for r in rows])),
    }
    c = np.asarray([r["confidence"]["auc"] for r in rows
                    if "confidence" in r])
    if len(c):
        out["aggregate"]["confidence"] = {
            "median_auc": float(np.median(c)), "mean_auc": float(c.mean()),
            "auc_ge_0.8_fraction": float((c >= 0.8).mean()),
        }
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    rows = parse_log(args.log)
    out = aggregate(rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    a = out["aggregate"]["fitscore"]
    print(f"{out['n_phores']} phores: fitscore median AUC "
          f"{a['median_auc']:.3f}, top1 {a['top1_rate']:.2f}, "
          f"top5 {a['top5_rate']:.2f}, mean EF1% {a['mean_ef1pct']:.1f}")


if __name__ == "__main__":
    main()
