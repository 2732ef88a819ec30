"""A/B the V_overlap combination mode against AncPhore's golden rankings.

Round-2 identification work showed AncPhore does an internal 1:1 feature
mapping; the shipped scorer approximates it with a per-reference-feature
"max" combine.  This script measures a true 1:1 *assignment* (exact
Hungarian via scipy, and the device-friendly greedy approximation) as a
scoring mode on all 15 golden complexes (600 poses), reporting
within-complex pose-ranking Spearman and the cross-complex screening
Spearman of max-PhScore1 - the two fidelity numbers from SURVEY/VERDICT.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python analysis/assignment_ab.py
"""

import glob
import os
import sys

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.stats import spearmanr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.mol import vdw_radius
from diffphore_tpu.chem.pharmacophore_rules import scoring_phore_fp
from diffphore_tpu.data.phore import PHORE_ALPHA, PHORE_WEIGHT, parse_phore
from diffphore_tpu.ops.fitscore import (
    K_ALPHA,
    _pair_volume,
    _self_volume,
    fitscore,
    make_phore_arrays,
)

BASE = "/root/reference/examples/output/2/mapping_process"
SQC = "/root/reference/examples/phore/sQC_QFA_complex.phore"


def pair_volumes(coords, fp, ref):
    """(N_poses, A, P) same-type Gaussian pair volumes + feature mask."""
    type_w = np.asarray(PHORE_WEIGHT)
    type_a = np.asarray(PHORE_ALPHA)
    feat_mask = np.asarray(ref.mask & ~ref.is_ex)
    d2 = ((coords[:, :, None, :] - np.asarray(ref.coord)[None, None]) ** 2).sum(-1)
    ref_t_alpha = (np.asarray(ref.type_onehot) * type_a).sum(-1)
    ref_t_w = (np.asarray(ref.type_onehot) * type_w).sum(-1)
    same = np.einsum("ak,pk->ap", fp, np.asarray(ref.type_onehot))
    vol = np.asarray(
        _pair_volume(
            jnp.asarray(ref.weight), jnp.asarray(ref_t_w),
            jnp.asarray(ref.alpha), jnp.asarray(ref_t_alpha), jnp.asarray(d2),
        )
    )
    vol = vol * same[None] * (feat_mask[None, None, :])
    return vol, feat_mask


def combine_overlap(vol, mode):
    """V_overlap per pose under a combination mode."""
    if mode == "sum":
        return vol.sum((-2, -1))
    if mode == "max":
        return vol.max(-2).sum(-1)
    if mode == "hungarian":
        out = np.zeros(vol.shape[0])
        for i, v in enumerate(vol):
            r, c = linear_sum_assignment(-v)
            out[i] = v[r, c].sum()
        return out
    if mode == "greedy":
        out = np.zeros(vol.shape[0])
        for i, v in enumerate(vol):
            v = v.copy()
            tot = 0.0
            for _ in range(min(v.shape)):
                a, p = np.unravel_index(np.argmax(v), v.shape)
                if v[a, p] <= 0:
                    break
                tot += v[a, p]
                v[a, :] = 0.0
                v[:, p] = 0.0
            out[i] = tot
        return out
    raise ValueError(mode)


def main():
    phore = parse_phore(SQC)[0]
    ref = make_phore_arrays(phore)
    V_ref = float(
        np.asarray(_self_volume(jnp.where(ref.mask & ~ref.is_ex, ref.weight, 0.0), ref.alpha)).sum()
    )
    modes = ["sum", "max", "greedy", "hungarian"]
    within = {m: [] for m in modes}
    mx = {m: [] for m in modes}
    gold_mx = []
    for d in sorted(glob.glob(os.path.join(BASE, "*/"))):
        scores = glob.glob(os.path.join(d, "*.score"))
        sdfs = glob.glob(os.path.join(d, "*.sdf"))
        if not scores or not sdfs:
            continue
        rows = [l.strip().split("\t") for l in open(scores[0])]
        gold = np.array([float(r[-4]) for r in rows])  # PhScore1
        poses = parse_sdf(sdfs[0])
        mol = poses[0]
        fp = np.asarray(scoring_phore_fp(mol), np.float32)
        coords = np.stack([p.coords for p in poses]).astype(np.float32)
        vdw = np.asarray([vdw_radius(a.atomic_num) for a in mol.atoms], np.float32)
        # ex_pct from the shipped scorer (identical across modes)
        s = fitscore(
            jnp.asarray(coords), jnp.ones(mol.num_atoms, bool),
            jnp.asarray(fp), jnp.asarray(vdw), ref,
        )
        ex_pct = np.asarray(s["ex_pct"])
        vol, feat_mask = pair_volumes(coords, fp, ref)
        gold_mx.append(gold.max())
        for m in modes:
            ph1 = combine_overlap(vol, m) / V_ref - ex_pct
            within[m].append(spearmanr(gold, ph1).statistic)
            mx[m].append(ph1.max())
    print(f"{'mode':<10} within-complex   cross-complex")
    for m in modes:
        cross = spearmanr(gold_mx, mx[m]).statistic
        print(f"{m:<10} {np.mean(within[m]):14.3f}   {cross:13.3f}")


if __name__ == "__main__":
    main()
