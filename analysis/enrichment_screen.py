"""Actives-vs-decoys enrichment screen (round-4 verdict item 2).

The reference's headline APPLICATION is ranking across ligands: screening
a library against one pharmacophore and surfacing actives by max_fitscore
(reference inference.py:321-350 analyze_results; DUD-E / IFPTarget
benchmark drivers baselines/run_phore.py:509,449).  Nothing in this repo
had ever measured discrimination - every evaluated ligand was an active
by construction.  This script measures it:

For each test phore (derived from ligand i's own conformer, exactly like
the battery), screen the TRUE ligand plus ``n_decoys`` decoy ligands
(other corpus test ligands, property-matched by heavy-atom count), rank
all candidates by (a) calibrated max fitscore and (b) the trained
rmsd_lt2 confidence head, and report per-phore ROC-AUC + EF1% and the
aggregate (median/mean AUC, top-1/top-5 retrieval rates).

The ligand is EMBEDDED ONCE and re-used across all phores (the CLI's
per-row featurization would re-embed per pair: 8 s x 3060 pairs; here
the host cost is one embed per ligand + a cheap graph build per pair).

Usage:
    python analysis/enrichment_screen.py --test_csv runs/corpus2/test.csv \
        --model_dir runs/corpus2/main --confidence_model_dir \
        runs/corpus2/confidence --out_dir runs/corpus2/main/enrichment
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_jobs(engine, phore, phore_owner, mols, names, center=None):
    """One ComplexJob per candidate ligand against ``phore``."""
    from diffphore_tpu.cli.pipeline import ComplexJob
    from diffphore_tpu.data.graphs import build_complex
    from diffphore_tpu.ops.fitscore import make_phore_arrays

    jobs = []
    for mol, name in zip(mols, names):
        batch = build_complex(
            f"{phore_owner}__{name}", mol, phore,
            a_pad=48, p_pad=160, t_pad=16,
        )
        ref = make_phore_arrays(phore, pad=160)
        ref = ref.replace(coord=ref.coord - np.asarray(batch.orig_center[0]))
        jobs.append(ComplexJob(f"{phore_owner}__{name}", batch, ref, mol))
    return jobs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_csv", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--confidence_ckpt",
                   default="best_ema_inference_epoch_model.msgpack")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_phores", type=int, default=0, help="0 = all")
    p.add_argument("--n_decoys", type=int, default=50)
    p.add_argument("--poses", type=int, default=20)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", default="best_ema_inference_epoch_model.msgpack")
    p.add_argument("--allow_random_init", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_compile_cache"))
    import pandas as pd

    from diffphore_tpu.chem.embed import embed_molecule
    from diffphore_tpu.chem.smiles import mol_from_smiles
    from diffphore_tpu.cli.inference import load_confidence_model, load_model
    from diffphore_tpu.cli.pipeline import FitEngine
    from diffphore_tpu.data.phore_sampling import random_ligand_phore
    from diffphore_tpu.sampler.sampling import SamplerSettings
    from diffphore_tpu.utils.logging import log_info

    rows = pd.read_csv(args.test_csv).to_dict("records")
    if args.n_phores:
        rows = rows[: args.n_phores]

    # ---- embed every candidate ligand ONCE (dataset-matching seed)
    mols, names, heavies = [], [], []
    t0 = time.time()
    for r in rows:
        mol = mol_from_smiles(str(r["ligand_description"]))
        embed_molecule(mol, seed=args.seed)
        mols.append(mol)
        names.append(str(r["name"]))
        heavies.append(mol.num_atoms)
    heavies = np.asarray(heavies)
    log_info(f"embedded {len(mols)} ligands in {time.time() - t0:.0f} s")

    # ---- phores: same derivation as the battery's featurize_record
    phores = []
    for r, mol in zip(rows, mols):
        num_ex = int(r.get("aug_num_ex", 3) or 3)
        phores.append(random_ligand_phore(
            mol, str(r["name"]), num_ex=num_ex,
            seed=args.seed + mol.num_atoms))

    cfg, variables = load_model(args)
    engine = FitEngine(
        cfg, variables, samples_per_complex=args.poses,
        settings=SamplerSettings(inference_steps=args.inference_steps),
        seed=args.seed, confidence=load_confidence_model(args),
    )

    rng = np.random.default_rng(args.seed)
    per_phore, csv_rows = [], []
    for i, (phore, owner) in enumerate(zip(phores, names)):
        if phore is None:
            continue
        if len(phore.all_points) > 160:
            # same exclusion as the battery: the (48, 160, 16) bucket caps
            # drop over-sized EX shells (3/60 corpus2 test phores)
            log_info(f"skip {owner}: phore has {len(phore.all_points)} "
                     f"points > 160 bucket cap")
            continue
        # decoys: property-matched by heavy-atom count (closest first,
        # random tie-break), never the active itself
        others = np.asarray([j for j in range(len(mols)) if j != i])
        order = np.argsort(
            np.abs(heavies[others] - heavies[i]) + 1e-3 * rng.random(len(others)))
        decoys = others[order[: args.n_decoys]]
        cand = [i] + list(decoys)

        jobs = build_jobs(engine, phore, owner,
                          [mols[j] for j in cand], [names[j] for j in cand])
        t0 = time.time()
        results = engine.run_complexes(jobs)
        fit = np.asarray([max(r["fitscore"]) for r in results])
        conf = (np.asarray([max(r["confidence"]) for r in results])
                if "confidence" in results[0] else None)

        row = {"phore": owner, "n_candidates": len(cand),
               "active_heavy": int(heavies[i]),
               "screen_time_s": round(time.time() - t0, 2)}
        for label, scores in (("fitscore", fit),) + (
                (("confidence", conf),) if conf is not None else ()):
            active, dec = scores[0], scores[1:]
            auc = float((dec < active).mean() + 0.5 * (dec == active).mean())
            rank = int(1 + (dec >= active).sum())  # worst-case rank on ties
            n = len(scores)
            # EF1%: actives found in the top 1% of the ranked list,
            # relative to random (1 active / n candidates); with one
            # active and n~51, top-1% is the single top slot
            top = max(1, int(round(0.01 * n)))
            ef1 = (n / 1.0) * (1.0 if rank <= top else 0.0) / top
            row[label] = {"auc": auc, "rank": rank, "ef1pct": ef1,
                          "top1": rank == 1, "top5": rank <= 5,
                          "active_score": float(active),
                          "best_decoy": float(dec.max())}
        per_phore.append(row)
        csv_rows.append(row)
        log_info(f"[{i + 1}/{len(phores)}] {owner}: "
                 f"fit auc {row['fitscore']['auc']:.3f} "
                 f"rank {row['fitscore']['rank']}/{len(cand)}"
                 + (f", conf auc {row['confidence']['auc']:.3f}"
                    if conf is not None else ""))

    def agg(label):
        if label not in per_phore[0]:
            return None
        a = np.asarray([r[label]["auc"] for r in per_phore])
        return {
            "median_auc": float(np.median(a)), "mean_auc": float(a.mean()),
            "auc_ge_0.8_fraction": float((a >= 0.8).mean()),
            "mean_ef1pct": float(np.mean([r[label]["ef1pct"] for r in per_phore])),
            "top1_rate": float(np.mean([r[label]["top1"] for r in per_phore])),
            "top5_rate": float(np.mean([r[label]["top5"] for r in per_phore])),
        }

    out = {
        "n_phores": len(per_phore),
        "n_decoys": args.n_decoys,
        "poses_per_candidate": args.poses,
        "aggregate": {k: v for k in ("fitscore", "confidence")
                      if (v := agg(k)) is not None},
        "per_phore": per_phore,
    }
    path = os.path.join(args.out_dir, "enrichment.json")
    json.dump(out, open(path, "w"), indent=1)
    log_info(f"enrichment -> {path}")
    for k, v in out["aggregate"].items():
        log_info(f"  {k}: median AUC {v['median_auc']:.3f}, "
                 f"mean EF1% {v['mean_ef1pct']:.1f}, top1 {v['top1_rate']:.2f}")


if __name__ == "__main__":
    main()
