"""A/B comparison for the pretrain->finetune data-scale arm.

Compares two training runs with the identical fine-tune recipe (the
runs/heldout_aug2 recipe: 12 train / 3 held-out ligands, --phore_augment 3
--conf_augment 3) that differ only in initialization:

  * baseline  : random init (runs/heldout_aug2, committed round 3)
  * pretrain  : --pretrain_model_pt from a ligand-only synthetic-library
                pretrain (runs/heldout_pre)

Because the two runs may have different lengths, the comparison is made at
MATCHED fine-tune epochs: for every val-inference epoch present in both
metrics.jsonl files, print valinf_mean_rmsd / valinf_rmsds_lt2 side by side,
plus smoothed train-loss curves at matched epochs.  This answers the arm's
question honestly even if the pretrain run is shorter: does the pretrained
init converge FASTER (lower held-out RMSD at equal fine-tune epochs), which
is the capability the reference's ligandOnly (ChEMBL/ZINC) mode exists for
(reference: src/datasets/pdbbind_phore.py ligandOnly_preprocessing,
src/parsing.py --dataset chembl/zinc flags).

Usage: python analysis/pretrain_ab.py [--a runs/heldout_aug2] [--b runs/heldout_pre]
"""

import argparse
import json
import os


def load(run_dir):
    train, valinf = {}, {}
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        for line in fh:
            row = json.loads(line)
            ep = row.get("epoch")
            if ep is None:
                continue
            if "valinf_mean_rmsd" in row:
                valinf[ep] = row
            elif "loss" in row and row.get("mode") != "val":
                train[ep] = row
    return train, valinf


def smooth(train, ep, w=50):
    vals = [train[e]["loss"] for e in range(max(0, ep - w), ep + 1) if e in train]
    return sum(vals) / len(vals) if vals else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="runs/heldout_aug2", help="baseline run (random init)")
    ap.add_argument("--b", default="runs/heldout_pre", help="pretrain-init run")
    args = ap.parse_args()

    ta, va = load(args.a)
    tb, vb = load(args.b)
    shared = sorted(set(va) & set(vb))
    print(f"# matched val-inference epochs: {len(shared)}")
    print(f"{'epoch':>6} | {'rmsd A':>7} {'rmsd B':>7} | {'lt2 A':>6} {'lt2 B':>6} | "
          f"{'loss A':>7} {'loss B':>7}   (A={args.a}, B={args.b})")
    for ep in shared:
        ra, rb = va[ep], vb[ep]
        print(f"{ep:>6} | {ra['valinf_mean_rmsd']:>7.2f} {rb['valinf_mean_rmsd']:>7.2f} | "
              f"{ra.get('valinf_rmsds_lt2', 0):>6.3f} {rb.get('valinf_rmsds_lt2', 0):>6.3f} | "
              f"{smooth(ta, ep):>7.4f} {smooth(tb, ep):>7.4f}")

    if shared:
        n_better = sum(1 for ep in shared
                       if vb[ep]["valinf_mean_rmsd"] < va[ep]["valinf_mean_rmsd"])
        last = shared[-1]
        print(f"\npretrain-init lower held-out mean RMSD at {n_better}/{len(shared)} "
              f"matched epochs; at epoch {last}: "
              f"A={va[last]['valinf_mean_rmsd']:.2f} B={vb[last]['valinf_mean_rmsd']:.2f}")


if __name__ == "__main__":
    main()
